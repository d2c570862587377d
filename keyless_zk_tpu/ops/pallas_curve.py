"""Standalone fused Pallas kernels for the BN254 G1/G2 group law.

One kernel invocation performs a full batched group-law op (including the
doubling fallback and infinity edge cases) entirely in VMEM. The field and
group-law cores live in ops/pallas_ec.py (shared with the fused MSM
kernels, ops/pallas_msm.py); this module wraps them as drop-in batched ops
matching curves/jacobian.py's signatures, used for the prover's tails and
any large batched EC work outside the MSM.

Layout: library arrays are (..., 16) limb-minor ((..., 2, 16) for Fq2);
wrappers transpose to limb-major (R, n) and tile the batch into dense
(8, 128) register blocks.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limbs import NUM_LIMBS
from . import pallas_ec
from .pallas_ec import MONT_ONE, add_core, dbl_core, field_for, madd_core, sel

# re-exports kept for existing callers
_sel = sel
_MONT_ONE = MONT_ONE
TILE = 1024
_WD = TILE // 8

_INTERPRET = False


def _pt_spec(R):
    return pl.BlockSpec((R, 1, 8, _WD), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM)


def _mask_spec():
    return pl.BlockSpec((1, 8, _WD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _madd_kernel_body(F):
    def kernel(ax, ay, az, qx, qy, qinf, ox, oy, oz):
        x1 = F.load(lambda i: ax[i, 0])
        y1 = F.load(lambda i: ay[i, 0])
        z1 = F.load(lambda i: az[i, 0])
        x2 = F.load(lambda i: qx[i, 0])
        y2 = F.load(lambda i: qy[i, 0])
        q_inf = qinf[0] != 0
        x3, y3, z3 = madd_core(F, x1, y1, z1, x2, y2, q_inf)
        F.store(lambda i, v: ox.__setitem__((i, 0), v), x3)
        F.store(lambda i, v: oy.__setitem__((i, 0), v), y3)
        F.store(lambda i, v: oz.__setitem__((i, 0), v), z3)

    return kernel


def _add_kernel_body(F):
    def kernel(ax, ay, az, bx, by, bz, ox, oy, oz):
        p = [F.load(lambda i, r=r: r[i, 0]) for r in (ax, ay, az)]
        q = [F.load(lambda i, r=r: r[i, 0]) for r in (bx, by, bz)]
        x3, y3, z3 = add_core(F, *p, *q)
        F.store(lambda i, v: ox.__setitem__((i, 0), v), x3)
        F.store(lambda i, v: oy.__setitem__((i, 0), v), y3)
        F.store(lambda i, v: oz.__setitem__((i, 0), v), z3)

    return kernel


def _dbl_kernel_body(F):
    def kernel(ax, ay, az, ox, oy, oz):
        p = [F.load(lambda i, r=r: r[i, 0]) for r in (ax, ay, az)]
        x3, y3, z3 = dbl_core(F, *p)
        F.store(lambda i, v: ox.__setitem__((i, 0), v), x3)
        F.store(lambda i, v: oy.__setitem__((i, 0), v), y3)
        F.store(lambda i, v: oz.__setitem__((i, 0), v), z3)

    return kernel


@functools.lru_cache(maxsize=16)
def _build(kind: str, tag: str, n_tiles: int):
    F = field_for(tag)
    R = F.rows
    shape = jax.ShapeDtypeStruct((R, n_tiles, 8, _WD), jnp.uint32)
    bodies = {
        "madd": (_madd_kernel_body, [_pt_spec(R)] * 5 + [_mask_spec()]),
        "add": (_add_kernel_body, [_pt_spec(R)] * 6),
        "dbl": (_dbl_kernel_body, [_pt_spec(R)] * 3),
    }
    body, in_specs = bodies[kind]
    return pl.pallas_call(
        body(F),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=(_pt_spec(R),) * 3,
        out_shape=(shape,) * 3,
        interpret=_INTERPRET,
    )


# ---- limb-minor wrappers ----------------------------------------------------

def _to_major(a: jnp.ndarray, n: int, n_tiles: int, R: int) -> jnp.ndarray:
    at = a.reshape(n, R).T
    pad = n_tiles * TILE - n
    if pad:
        at = jnp.pad(at, [(0, 0), (0, pad)])
    return at.reshape(R, n_tiles, 8, _WD)


def _from_major(a: jnp.ndarray, n: int, batch_shape, coord_shape) -> jnp.ndarray:
    R = a.shape[0]
    return a.reshape(R, -1)[:, :n].T.reshape(*batch_shape, *coord_shape)


def _shapes(qx, F):
    cnd = 1 if F is pallas_ec.KFQ else 2
    batch = qx.shape[: qx.ndim - cnd]
    coord = qx.shape[qx.ndim - cnd:]
    n = int(np.prod(batch)) if batch else 1
    return batch, coord, n


def madd_pallas(acc, qx, qy, q_inf, tag="fq"):
    """Fused mixed add; signatures match JacobianCurve.add_mixed."""
    F = field_for(tag)
    R = F.rows
    batch, coord, n = _shapes(qx, F)
    n_tiles = -(-n // TILE)
    args = [_to_major(c, n, n_tiles, R) for c in (acc.x, acc.y, acc.z, qx, qy)]
    mask = q_inf.reshape(1, n).astype(jnp.int32)
    pad = n_tiles * TILE - n
    if pad:
        mask = jnp.pad(mask, [(0, 0), (0, pad)], constant_values=1)
    mask = mask.reshape(n_tiles, 8, _WD)
    x, y, z = _build("madd", tag, n_tiles)(*args, mask)
    from ..curves.jacobian import JacPoint

    return JacPoint(
        _from_major(x, n, batch, coord),
        _from_major(y, n, batch, coord),
        _from_major(z, n, batch, coord),
    )


def dbl_pallas(p, tag="fq"):
    F = field_for(tag)
    R = F.rows
    batch, coord, n = _shapes(p.x, F)
    n_tiles = -(-n // TILE)
    args = [_to_major(c, n, n_tiles, R) for c in (p.x, p.y, p.z)]
    x, y, z = _build("dbl", tag, n_tiles)(*args)
    from ..curves.jacobian import JacPoint

    return JacPoint(
        _from_major(x, n, batch, coord),
        _from_major(y, n, batch, coord),
        _from_major(z, n, batch, coord),
    )


def add_pallas(p, q, tag="fq"):
    """Fused full add; signature matches JacobianCurve.add."""
    F = field_for(tag)
    R = F.rows
    batch, coord, n = _shapes(p.x, F)
    n_tiles = -(-n // TILE)
    args = [_to_major(c, n, n_tiles, R) for c in (p.x, p.y, p.z, q.x, q.y, q.z)]
    x, y, z = _build("add", tag, n_tiles)(*args)
    from ..curves.jacobian import JacPoint

    return JacPoint(
        _from_major(x, n, batch, coord),
        _from_major(y, n, batch, coord),
        _from_major(z, n, batch, coord),
    )


class PallasG1Curve:
    """JacobianCurve facade routing the hot batched group law through the
    fused Pallas kernels; small batches and everything else delegate to the
    XLA implementation."""

    min_batch = 256  # below this, kernel+relayout overhead beats the win
    tag = "fq"

    def __init__(self, base):
        self._base = base
        self.ops = base.ops

    def __getattr__(self, name):
        return getattr(self._base, name)

    def _n(self, shape) -> int:
        cnd = 1 if self.tag == "fq" else 2
        batch = shape[: len(shape) - cnd]
        return int(np.prod(batch)) if batch else 1

    def add_mixed(self, p, qx, qy, q_inf):
        if self._n(qx.shape) >= self.min_batch:
            return madd_pallas(p, qx, qy, q_inf, tag=self.tag)
        return self._base.add_mixed(p, qx, qy, q_inf)

    def add(self, p, q):
        if self._n(p.x.shape) >= self.min_batch:
            return add_pallas(p, q, tag=self.tag)
        return self._base.add(p, q)

    def dbl(self, p):
        if self._n(p.x.shape) >= self.min_batch:
            return dbl_pallas(p, tag=self.tag)
        return self._base.dbl(p)


class PallasG2Curve(PallasG1Curve):
    tag = "fq2"
