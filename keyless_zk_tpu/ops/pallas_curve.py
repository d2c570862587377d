"""Fused Pallas kernels for the BN254 G1 group law.

One kernel invocation performs a full batched mixed add (including the
doubling fallback and infinity edge cases) entirely in VMEM — ~19 field
multiplications with no HBM roundtrips or relayouts between them, versus
~60 separate XLA ops in curves/jacobian.py. This is the MSM inner loop's
hot path.

Field elements are limb lists: 16 vectors of (8, 128)-tiled u32 lanes,
limb-major. Wrappers accept the library's (..., 16) limb-minor layout.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import bn254
from ..fields.limbs import LIMB_BITS, NUM_LIMBS, int_to_limbs

MASK = 0xFFFF
TILE = 1024

_INTERPRET = False


def _sel(c, a, b):
    """Elementwise select via lax.select_n directly.

    jnp.where routes through an api.jit wrapper whose closed_call jaxpr
    trips a jax-0.9 lowering-cache KeyError when a second Pallas kernel
    containing the identical call is lowered in the same process — so
    kernel code must not use jnp.where.
    """
    dt = jnp.result_type(a, b)
    c = jnp.asarray(c)
    a = jnp.asarray(a, dt)
    b = jnp.asarray(b, dt)
    shape = jnp.broadcast_shapes(c.shape, a.shape, b.shape)
    return jax.lax.select(
        jnp.broadcast_to(c, shape),
        jnp.broadcast_to(a, shape),
        jnp.broadcast_to(b, shape),
    )

Q = bn254.Q
_P_LIMBS = [int(x) for x in int_to_limbs(Q)]
_R = 1 << (LIMB_BITS * NUM_LIMBS)
_N0_LIMBS = [int(x) for x in int_to_limbs((-pow(Q, -1, _R)) % _R)]
_PBAR_LIMBS = [0xFFFF - x for x in _P_LIMBS]
_MONT_ONE = [int(x) for x in int_to_limbs(_R % Q)]


# ---- limb-list field arithmetic (kernel-internal) ---------------------------

def _ripple(cols: list, n_out: int, carry_in=None):
    out = []
    carry = carry_in if carry_in is not None else jnp.zeros_like(cols[0])
    for i in range(n_out):
        v = (cols[i] if i < len(cols) else jnp.zeros_like(cols[0])) + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return out, carry


def _csub_p(limbs: list) -> list:
    """Canonical < 2p (16 limbs + optional overflow) -> < p."""
    res, overflow = limbs[:NUM_LIMBS], limbs[NUM_LIMBS] if len(limbs) > NUM_LIMBS else None
    diff = []
    carry = jnp.ones_like(res[0])
    for i in range(NUM_LIMBS):
        v = res[i] + _PBAR_LIMBS[i] + carry
        diff.append(v & MASK)
        carry = v >> LIMB_BITS
    geq = carry if overflow is None else carry + overflow
    geq = geq >= 1
    return [_sel(geq, d, r) for d, r in zip(diff, res)]


def _fadd(a: list, b: list) -> list:
    s, carry = _ripple([x + y for x, y in zip(a, b)], NUM_LIMBS)
    return _csub_p(s + [carry])


def _fsub(a: list, b: list) -> list:
    # a - b + p (wraps exactly once through 2^256; drop the carry-out)
    cols = [x + p + (MASK - y) for x, y, p in zip(a, b, _P_LIMBS)]
    s, _ = _ripple(cols, NUM_LIMBS, carry_in=jnp.ones_like(a[0]))
    return _csub_p(s)


def _fmul(a: list, b: list) -> list:
    """Montgomery product of canonical limb lists."""
    # T = a * b
    cols = [None] * (2 * NUM_LIMBS)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            prod = ai * bj
            lo = prod & MASK
            hi = prod >> LIMB_BITS
            k = i + j
            cols[k] = lo if cols[k] is None else cols[k] + lo
            if k + 1 < 2 * NUM_LIMBS:
                cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    t, _ = _ripple([c if c is not None else jnp.zeros_like(a[0]) for c in cols], 2 * NUM_LIMBS)

    def conv_const(x: list, c: list[int], out_cols: int) -> list:
        cc = [None] * out_cols
        for i, xi in enumerate(x):
            for j, cj in enumerate(c):
                if i + j >= out_cols or cj == 0:
                    continue
                prod = xi * cj
                lo = prod & MASK
                hi = prod >> LIMB_BITS
                cc[i + j] = lo if cc[i + j] is None else cc[i + j] + lo
                if i + j + 1 < out_cols:
                    cc[i + j + 1] = hi if cc[i + j + 1] is None else cc[i + j + 1] + hi
        return [c2 if c2 is not None else jnp.zeros_like(x[0]) for c2 in cc]

    m, _ = _ripple(conv_const(t[:NUM_LIMBS], _N0_LIMBS, NUM_LIMBS), NUM_LIMBS)
    mp = conv_const(m, _P_LIMBS, 2 * NUM_LIMBS + 1)
    scols = [mp[i] + t[i] for i in range(2 * NUM_LIMBS)] + [mp[2 * NUM_LIMBS]]
    s, _ = _ripple(scols, 2 * NUM_LIMBS + 1)
    return _csub_p(s[NUM_LIMBS : 2 * NUM_LIMBS + 1])


def _fsqr(a: list) -> list:
    return _fmul(a, a)


def _is_zero(a: list):
    acc = a[0]
    for x in a[1:]:
        acc = acc | x
    return acc == 0


def _select(mask, a: list, b: list) -> list:
    return [_sel(mask, x, y) for x, y in zip(a, b)]


def _zero_like(a: list) -> list:
    return [jnp.zeros_like(x) for x in a]


def _dbl(x1, y1, z1):
    """dbl-2009-l (jacobian.py dbl)."""
    A = _fsqr(x1)
    B = _fsqr(y1)
    C = _fsqr(B)
    t = _fsub(_fsub(_fsqr(_fadd(x1, B)), A), C)
    D = _fadd(t, t)
    E = _fadd(_fadd(A, A), A)
    F = _fsqr(E)
    x3 = _fsub(F, _fadd(D, D))
    c8 = _fadd(_fadd(C, C), _fadd(C, C))
    c8 = _fadd(c8, c8)
    y3 = _fsub(_fmul(E, _fsub(D, x3)), c8)
    z3 = _fmul(_fadd(y1, y1), z1)
    return x3, y3, z3


def _madd_core(x1, y1, z1, x2, y2, q_inf):
    """Complete mixed add on limb lists: (Jacobian acc) + (affine q, inf mask).

    Returns limb lists (x3, y3, z3) with every edge case (either input at
    infinity, P == Q doubling, P == -Q cancellation) mask-resolved —
    shared by the standalone madd kernel and the fused MSM scan kernel.
    """
    # madd-2007-bl (jacobian.py add_mixed)
    z1z1 = _fsqr(z1)
    u2 = _fmul(x2, z1z1)
    s2 = _fmul(_fmul(y2, z1), z1z1)
    h = _fsub(u2, x1)
    rr = _fsub(s2, y1)
    r2 = _fadd(rr, rr)
    hh = _fsqr(h)
    i4 = _fadd(_fadd(hh, hh), _fadd(hh, hh))
    j = _fmul(h, i4)
    v = _fmul(x1, i4)
    x3 = _fsub(_fsub(_fsqr(r2), j), _fadd(v, v))
    yj = _fmul(y1, j)
    y3 = _fsub(_fmul(r2, _fsub(v, x3)), _fadd(yj, yj))
    z3 = _fsub(_fsub(_fsqr(_fadd(z1, h)), z1z1), hh)

    p_inf = _is_zero(z1)
    h_zero = _is_zero(h) & ~p_inf & ~q_inf
    r_zero = _is_zero(rr)
    dx, dy, dz = _dbl(x1, y1, z1)
    take_dbl = h_zero & r_zero

    one = [jnp.full_like(x2[0], c) for c in _MONT_ONE]
    q_z = _select(q_inf, _zero_like(one), one)

    ox, oy, oz = [], [], []
    for i in range(NUM_LIMBS):
        xo = _sel(take_dbl, dx[i], x3[i])
        yo = _sel(take_dbl, dy[i], y3[i])
        zo = _sel(take_dbl, dz[i], z3[i])
        xo = _sel(p_inf, x2[i], xo)
        yo = _sel(p_inf, y2[i], yo)
        zo = _sel(p_inf, q_z[i], zo)
        ox.append(_sel(q_inf & ~p_inf, x1[i], xo))
        oy.append(_sel(q_inf & ~p_inf, y1[i], yo))
        oz.append(_sel(q_inf & ~p_inf, z1[i], zo))
    return ox, oy, oz


def _madd_kernel(ax_ref, ay_ref, az_ref, qx_ref, qy_ref, qinf_ref, ox_ref, oy_ref, oz_ref):
    x1 = [ax_ref[i, :] for i in range(NUM_LIMBS)]
    y1 = [ay_ref[i, :] for i in range(NUM_LIMBS)]
    z1 = [az_ref[i, :] for i in range(NUM_LIMBS)]
    x2 = [qx_ref[i, :] for i in range(NUM_LIMBS)]
    y2 = [qy_ref[i, :] for i in range(NUM_LIMBS)]
    q_inf = qinf_ref[0, :] != 0

    ox, oy, oz = _madd_core(x1, y1, z1, x2, y2, q_inf)
    for i in range(NUM_LIMBS):
        ox_ref[i, :] = ox[i]
        oy_ref[i, :] = oy[i]
        oz_ref[i, :] = oz[i]


def _add_core(x1, y1, z1, x2, y2, z2):
    """Complete Jacobian + Jacobian add on limb lists (add-2007-bl), every
    edge case mask-resolved; shared by the add kernel and the fused MSM
    reduction kernels."""
    z1z1 = _fsqr(z1)
    z2z2 = _fsqr(z2)
    u1 = _fmul(x1, z2z2)
    u2 = _fmul(x2, z1z1)
    s1 = _fmul(_fmul(y1, z2), z2z2)
    s2 = _fmul(_fmul(y2, z1), z1z1)
    h = _fsub(u2, u1)
    rr = _fsub(s2, s1)
    r2 = _fadd(rr, rr)
    i4 = _fsqr(_fadd(h, h))
    j = _fmul(h, i4)
    v = _fmul(u1, i4)
    x3 = _fsub(_fsub(_fsqr(r2), j), _fadd(v, v))
    s1j = _fmul(s1, j)
    y3 = _fsub(_fmul(r2, _fsub(v, x3)), _fadd(s1j, s1j))
    zz = _fsub(_fsub(_fsqr(_fadd(z1, z2)), z1z1), z2z2)
    z3 = _fmul(zz, h)

    p_inf = _is_zero(z1)
    q_inf = _is_zero(z2)
    both = ~p_inf & ~q_inf
    h_zero = _is_zero(h) & both
    r_zero = _is_zero(rr)
    take_dbl = h_zero & r_zero
    dx, dy, dz = _dbl(x1, y1, z1)

    ox, oy, oz = [], [], []
    for i in range(NUM_LIMBS):
        xo = _sel(take_dbl, dx[i], x3[i])
        yo = _sel(take_dbl, dy[i], y3[i])
        zo = _sel(take_dbl, dz[i], z3[i])
        xo = _sel(p_inf, x2[i], xo)
        yo = _sel(p_inf, y2[i], yo)
        zo = _sel(p_inf, z2[i], zo)
        ox.append(_sel(q_inf & ~p_inf, x1[i], xo))
        oy.append(_sel(q_inf & ~p_inf, y1[i], yo))
        oz.append(_sel(q_inf & ~p_inf, z1[i], zo))
    return ox, oy, oz


def _add_kernel(ax_ref, ay_ref, az_ref, bx_ref, by_ref, bz_ref, ox_ref, oy_ref, oz_ref):
    """Full Jacobian + Jacobian add (add-2007-bl; jacobian.py add)."""
    x1 = [ax_ref[i, :] for i in range(NUM_LIMBS)]
    y1 = [ay_ref[i, :] for i in range(NUM_LIMBS)]
    z1 = [az_ref[i, :] for i in range(NUM_LIMBS)]
    x2 = [bx_ref[i, :] for i in range(NUM_LIMBS)]
    y2 = [by_ref[i, :] for i in range(NUM_LIMBS)]
    z2 = [bz_ref[i, :] for i in range(NUM_LIMBS)]

    ox, oy, oz = _add_core(x1, y1, z1, x2, y2, z2)
    for i in range(NUM_LIMBS):
        ox_ref[i, :] = ox[i]
        oy_ref[i, :] = oy[i]
        oz_ref[i, :] = oz[i]


def _dbl_kernel(ax_ref, ay_ref, az_ref, ox_ref, oy_ref, oz_ref):
    x1 = [ax_ref[i, :] for i in range(NUM_LIMBS)]
    y1 = [ay_ref[i, :] for i in range(NUM_LIMBS)]
    z1 = [az_ref[i, :] for i in range(NUM_LIMBS)]
    x3, y3, z3 = _dbl(x1, y1, z1)
    for i in range(NUM_LIMBS):
        ox_ref[i, :] = x3[i]
        oy_ref[i, :] = y3[i]
        oz_ref[i, :] = z3[i]


def _spec():
    return pl.BlockSpec((NUM_LIMBS, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)


def _mask_spec():
    return pl.BlockSpec((8, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=8)
def _build_madd(n_tiles: int):
    shape = jax.ShapeDtypeStruct((NUM_LIMBS, n_tiles * TILE), jnp.uint32)
    return pl.pallas_call(
        _madd_kernel,
        grid=(n_tiles,),
        in_specs=[_spec()] * 5 + [_mask_spec()],
        out_specs=(_spec(), _spec(), _spec()),
        out_shape=(shape, shape, shape),
        interpret=_INTERPRET,
    )


@functools.lru_cache(maxsize=8)
def _build_add(n_tiles: int):
    shape = jax.ShapeDtypeStruct((NUM_LIMBS, n_tiles * TILE), jnp.uint32)
    return pl.pallas_call(
        _add_kernel,
        grid=(n_tiles,),
        in_specs=[_spec()] * 6,
        out_specs=(_spec(), _spec(), _spec()),
        out_shape=(shape, shape, shape),
        interpret=_INTERPRET,
    )


@functools.lru_cache(maxsize=8)
def _build_dbl(n_tiles: int):
    shape = jax.ShapeDtypeStruct((NUM_LIMBS, n_tiles * TILE), jnp.uint32)
    return pl.pallas_call(
        _dbl_kernel,
        grid=(n_tiles,),
        in_specs=[_spec()] * 3,
        out_specs=(_spec(), _spec(), _spec()),
        out_shape=(shape, shape, shape),
        interpret=_INTERPRET,
    )


# ---- limb-minor wrappers ------------------------------------------------------

def _to_major(a: jnp.ndarray, n: int, n_tiles: int) -> jnp.ndarray:
    at = a.reshape(n, NUM_LIMBS).T
    pad = n_tiles * TILE - n
    return jnp.pad(at, [(0, 0), (0, pad)]) if pad else at


def _from_major(a: jnp.ndarray, n: int, batch_shape) -> jnp.ndarray:
    return a[:, :n].T.reshape(*batch_shape, NUM_LIMBS)


def madd_pallas(acc, qx, qy, q_inf):
    """Fused mixed add; signatures match JacobianCurve.add_mixed (G1)."""
    batch = qx.shape[:-1]
    n = int(np.prod(batch))
    n_tiles = -(-n // TILE)
    args = [_to_major(c, n, n_tiles) for c in (acc.x, acc.y, acc.z, qx, qy)]
    mask = jnp.broadcast_to(
        q_inf.reshape(1, n).astype(jnp.uint32), (8, n)
    )
    pad = n_tiles * TILE - n
    if pad:
        mask = jnp.pad(mask, [(0, 0), (0, pad)], constant_values=1)
    x, y, z = _build_madd(n_tiles)(*args, mask)
    from ..curves.jacobian import JacPoint

    return JacPoint(
        _from_major(x, n, batch), _from_major(y, n, batch), _from_major(z, n, batch)
    )


def dbl_pallas(p):
    batch = p.x.shape[:-1]
    n = int(np.prod(batch))
    n_tiles = -(-n // TILE)
    args = [_to_major(c, n, n_tiles) for c in (p.x, p.y, p.z)]
    x, y, z = _build_dbl(n_tiles)(*args)
    from ..curves.jacobian import JacPoint

    return JacPoint(
        _from_major(x, n, batch), _from_major(y, n, batch), _from_major(z, n, batch)
    )


def add_pallas(p, q):
    """Fused full add; signature matches JacobianCurve.add (G1)."""
    batch = p.x.shape[:-1]
    n = int(np.prod(batch))
    n_tiles = -(-n // TILE)
    args = [_to_major(c, n, n_tiles) for c in (p.x, p.y, p.z, q.x, q.y, q.z)]
    x, y, z = _build_add(n_tiles)(*args)
    from ..curves.jacobian import JacPoint

    return JacPoint(
        _from_major(x, n, batch), _from_major(y, n, batch), _from_major(z, n, batch)
    )


class PallasG1Curve:
    """JacobianCurve facade routing the hot batched group law through the
    fused Pallas kernels (G1 only); small batches and everything else
    delegate to the XLA implementation."""

    min_batch = 256  # below this, kernel+relayout overhead beats the win

    def __init__(self, base):
        self._base = base
        self.ops = base.ops

    def __getattr__(self, name):
        return getattr(self._base, name)

    def _n(self, shape) -> int:
        return int(np.prod(shape[:-1])) if len(shape) > 1 else 1

    def add_mixed(self, p, qx, qy, q_inf):
        if self._n(qx.shape) >= self.min_batch:
            return madd_pallas(p, qx, qy, q_inf)
        return self._base.add_mixed(p, qx, qy, q_inf)

    def add(self, p, q):
        if self._n(p.x.shape) >= self.min_batch:
            return add_pallas(p, q)
        return self._base.add(p, q)

    def dbl(self, p):
        if self._n(p.x.shape) >= self.min_batch:
            return dbl_pallas(p)
        return self._base.dbl(p)
