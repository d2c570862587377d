"""Pallas TPU kernel for batched BN254 Montgomery multiplication.

The XLA formulation of mont_mul (fields/jax_field.py) spends most of its
time in u32 one-hot contractions and carry scans that the TPU lowers to
scalar VPU loops (~63M muls/s measured on v5e). This kernel performs the
whole limb schedule — 16x16 product convolution, REDC, carry resolution,
conditional subtract — inside one VMEM-resident Pallas program operating
on (16, 1024) limb-major tiles, so every VPU op processes full (8, 128)
registers of batch elements.

Layout: XLA-side arrays are (..., 16) limb-minor; the wrapper transposes
to (16, N) limb-major, pads N to the 1024-element tile, and transposes
back. All arithmetic is unrolled statically inside the kernel.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limbs import LIMB_BITS, NUM_LIMBS, int_to_limbs

MASK = 0xFFFF  # python literal: pallas kernels cannot capture array constants
TILE = 2048  # block width; measured optimum on v5e (280M muls/s vs 124M at 128)

_INTERPRET = False  # flipped by tests on backends without Mosaic support


def _carry_resolve(cols: list, n_out: int) -> list:
    """Columns of 16-bit weight (< 2^22) -> n_out canonical 16-bit limbs.

    Sequential ripple: limb i's carry folds into column i+1 before that
    column is finalized — n_out steps of (1 shift + 1 add + 1 and) on full
    tiles, cheaper than a Kogge-Stone network at this width.
    """
    out = []
    carry = jnp.zeros_like(cols[0])
    for i in range(n_out):
        v = (cols[i] if i < len(cols) else jnp.zeros_like(cols[0])) + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return out


def _conv(a: list, b: list, out_cols: int) -> list:
    """Schoolbook convolution of 16-bit limb vectors (u32 tiles)."""
    cols = [None] * out_cols
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            if i + j >= out_cols:
                continue
            prod = ai * bj
            lo = prod & MASK
            hi = prod >> LIMB_BITS
            cols[i + j] = lo if cols[i + j] is None else cols[i + j] + lo
            if i + j + 1 < out_cols:
                cols[i + j + 1] = hi if cols[i + j + 1] is None else cols[i + j + 1] + hi
    return [c if c is not None else jnp.zeros_like(a[0]) for c in cols]


def _conv_const(a: list, b_const: list[int], out_cols: int) -> list:
    """Convolution with compile-time constant limbs (kernels cannot capture
    array constants, so the constants stay python ints)."""
    cols = [None] * out_cols
    for i, ai in enumerate(a):
        for j, bj in enumerate(b_const):
            if i + j >= out_cols or bj == 0:
                continue
            prod = ai * bj
            lo = prod & MASK
            hi = prod >> LIMB_BITS
            cols[i + j] = lo if cols[i + j] is None else cols[i + j] + lo
            if i + j + 1 < out_cols:
                cols[i + j + 1] = hi if cols[i + j + 1] is None else cols[i + j + 1] + hi
    return [c if c is not None else jnp.zeros_like(a[0]) for c in cols]


_SUB = 8  # sublane rows per tile: every VPU op runs on dense (8, 128) vregs


def _make_kernel(p: int):
    p_limbs = [int(x) for x in int_to_limbs(p)]
    r = 1 << (LIMB_BITS * NUM_LIMBS)
    n0_limbs = [int(x) for x in int_to_limbs((-pow(p, -1, r)) % r)]
    pbar_limbs = [0xFFFF - x for x in p_limbs]  # for the conditional subtract

    def kernel(a_ref, b_ref, o_ref):
        # limb i is a dense (8, TILE//8) 2-D tile — the round-3 kernel read
        # 1-D (TILE,) rows, which Mosaic lays out one sublane wide (1/8th
        # VPU register occupancy; same fix as ops/pallas_ec.py round-2)
        a = [a_ref[i, 0] for i in range(NUM_LIMBS)]
        b = [b_ref[i, 0] for i in range(NUM_LIMBS)]

        # T = a * b (32 canonical limbs)
        t = _carry_resolve(_conv(a, b, 2 * NUM_LIMBS), 2 * NUM_LIMBS)

        # m = T_lo * (-p^-1) mod R (low 16 limbs only)
        m = _carry_resolve(_conv_const(t[:NUM_LIMBS], n0_limbs, NUM_LIMBS), NUM_LIMBS)

        # s = T + m*p; low 16 limbs vanish, result = s >> 256 (< 2p)
        mp = _conv_const(m, p_limbs, 2 * NUM_LIMBS + 1)
        cols = [mp[i] + t[i] for i in range(2 * NUM_LIMBS)] + [mp[2 * NUM_LIMBS]]
        s = _carry_resolve(cols, 2 * NUM_LIMBS + 1)
        res = s[NUM_LIMBS : 2 * NUM_LIMBS + 1]  # 17 limbs, top is 0/1

        # conditional subtract: res - p  if res >= p
        diff = []
        carry = jnp.ones_like(res[0])  # +1 completes the two's complement
        for i in range(NUM_LIMBS):
            v = res[i] + pbar_limbs[i] + carry
            diff.append(v & MASK)
            carry = v >> LIMB_BITS
        geq = (carry + res[NUM_LIMBS]) >= 1  # borrow-free (+ overflow limb)
        for i in range(NUM_LIMBS):
            o_ref[i, 0] = jnp.where(geq, diff[i], res[i])

    return kernel


@functools.lru_cache(maxsize=4)
def _build_call(p: int, n_tiles: int):
    kernel = _make_kernel(p)
    lanes = TILE // _SUB
    spec = pl.BlockSpec(
        (NUM_LIMBS, 1, _SUB, lanes), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(
            (NUM_LIMBS, n_tiles, _SUB, lanes), jnp.uint32
        ),
        interpret=_INTERPRET,
    )


def mont_mul_pallas(a: jnp.ndarray, b: jnp.ndarray, spec) -> jnp.ndarray:
    """Drop-in for jax_field.mont_mul on (..., 16) uint32 arrays."""
    shape = a.shape
    n = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    at = a.reshape(n, NUM_LIMBS).T
    bt = jnp.broadcast_to(b, shape).reshape(n, NUM_LIMBS).T
    n_tiles = -(-n // TILE)
    pad = n_tiles * TILE - n
    if pad:
        at = jnp.pad(at, [(0, 0), (0, pad)])
        bt = jnp.pad(bt, [(0, 0), (0, pad)])
    lanes = TILE // _SUB
    at = at.reshape(NUM_LIMBS, n_tiles, _SUB, lanes)
    bt = bt.reshape(NUM_LIMBS, n_tiles, _SUB, lanes)
    out = _build_call(spec.p, n_tiles)(at, bt)
    return out.reshape(NUM_LIMBS, n_tiles * TILE)[:, :n].T.reshape(shape)
