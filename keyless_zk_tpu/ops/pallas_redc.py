"""Pallas kernel: lazy Montgomery reduction (+ fused twiddle multiply).

The MXU NTT (ops/mxu_ntt.py) accumulates each DFT output as 63 byte-
weighted s32 columns (T < 2^515) and needs T * 2^-320 mod p per element.
The XLA formulation of that reduction runs at the elementwise-op rate
(~26M field ops/s on v5e through the tunnel-profiled path) and dominates
the transform; this kernel runs the whole byte pipeline — carry
resolution, m = T*mu mod 2^320, S = T + m*p, shift, conditional subtract —
on (rows, width) VMEM tiles, optionally followed by an in-register
Montgomery multiply with a twiddle factor (saves a second HBM pass).

Layout: wide columns arrive column-major (64, N) u32 (row k = byte column
k, rows 63 padded), twiddles/outputs are (16, N) limb-major like
ops/pallas_field.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limbs import LIMB_BITS, NUM_LIMBS, int_to_limbs
from ..fields.jax_field import FR
from .pallas_field import MASK, _carry_resolve, _conv, _conv_const
from .mxu_ntt import MU_BYTES, P_BYTES, RED_BYTES, T_BYTES, NB

WIDE_ROWS = 64  # 63 used, padded for tiling
WIDTH = 2048

P_LIMBS = [int(x) for x in int_to_limbs(FR.p)]
PBAR_LIMBS = [0xFFFF - x for x in P_LIMBS]


def _redc_core(cols):
    """cols: 63 u32 rows (byte-weighted, < 2^28 each) -> 16 u32 16-bit limbs
    of T * 2^-320 mod p, canonical."""
    # 1. resolve T to bytes
    tb = []
    carry = jnp.zeros_like(cols[0])
    for k in range(T_BYTES):
        v = (cols[k] if k < len(cols) else carry * 0) + carry
        tb.append(v & 0xFF)
        carry = v >> 8
    # 2. m = (T mod 2^320) * mu mod 2^320
    mcols = [None] * RED_BYTES
    for i in range(RED_BYTES):
        for j in range(RED_BYTES - i):
            if MU_BYTES[j]:
                t = tb[i] * MU_BYTES[j]
                mcols[i + j] = t if mcols[i + j] is None else mcols[i + j] + t
    mb = []
    carry = jnp.zeros_like(cols[0])
    for k in range(RED_BYTES):
        v = (mcols[k] if mcols[k] is not None else carry * 0) + carry
        mb.append(v & 0xFF)
        carry = v >> 8
    # 3. S = T + m*p; result = S >> 320 (< 2p)
    n_s = max(T_BYTES, RED_BYTES + NB) + 1
    scols = [tb[k] if k < T_BYTES else None for k in range(n_s)]
    for i in range(RED_BYTES):
        for j in range(NB):
            if P_BYTES[j]:
                t = mb[i] * P_BYTES[j]
                scols[i + j] = t if scols[i + j] is None else scols[i + j] + t
    carry = jnp.zeros_like(cols[0])
    for k in range(RED_BYTES):
        v = (scols[k] if scols[k] is not None else carry * 0) + carry
        carry = v >> 8
    res = []
    for k in range(RED_BYTES, RED_BYTES + NB):
        v = (scols[k] if scols[k] is not None else carry * 0) + carry
        res.append(v & 0xFF)
        carry = v >> 8
    limbs = [res[2 * t] | (res[2 * t + 1] << 8) for t in range(NUM_LIMBS)]
    return _csub_p_rows(limbs)


def _csub_p_rows(res):
    """Conditional subtract p on 16 u32 16-bit limb rows (input < 2p)."""
    diff = []
    carry = jnp.ones_like(res[0])
    for i in range(NUM_LIMBS):
        v = res[i] + PBAR_LIMBS[i] + carry
        diff.append(v & MASK)
        carry = v >> LIMB_BITS
    geq = carry >= 1
    return [jnp.where(geq, diff[i], res[i]) for i in range(NUM_LIMBS)]


def _mont_mul_rows(a, b):
    """Montgomery product on 16-limb u32 rows (pallas_field's schedule)."""
    r = 1 << (LIMB_BITS * NUM_LIMBS)
    n0_limbs = [int(x) for x in int_to_limbs((-pow(FR.p, -1, r)) % r)]
    t = _carry_resolve(_conv(a, b, 2 * NUM_LIMBS), 2 * NUM_LIMBS)
    m = _carry_resolve(_conv_const(t[:NUM_LIMBS], n0_limbs, NUM_LIMBS), NUM_LIMBS)
    mp = _conv_const(m, P_LIMBS, 2 * NUM_LIMBS + 1)
    cols = [mp[i] + t[i] for i in range(2 * NUM_LIMBS)] + [mp[2 * NUM_LIMBS]]
    s = _carry_resolve(cols, 2 * NUM_LIMBS + 1)
    res = s[NUM_LIMBS : 2 * NUM_LIMBS]
    # res (+ overflow limb s[32]) < 2p: fold the overflow into the compare
    diff = []
    carry = jnp.ones_like(res[0])
    for i in range(NUM_LIMBS):
        v = res[i] + PBAR_LIMBS[i] + carry
        diff.append(v & MASK)
        carry = v >> LIMB_BITS
    geq = (carry + s[2 * NUM_LIMBS]) >= 1
    return [jnp.where(geq, diff[i], res[i]) for i in range(NUM_LIMBS)]


def _redc_kernel(wide_ref, o_ref):
    cols = [wide_ref[k, :] for k in range(2 * NB - 1)]
    out = _redc_core(cols)
    for i in range(NUM_LIMBS):
        o_ref[i, :] = out[i]


def _redc_tw_kernel(wide_ref, tw_ref, o_ref):
    cols = [wide_ref[k, :] for k in range(2 * NB - 1)]
    out = _redc_core(cols)
    tw = [tw_ref[i, :] for i in range(NUM_LIMBS)]
    out = _mont_mul_rows(out, tw)
    for i in range(NUM_LIMBS):
        o_ref[i, :] = out[i]


@functools.lru_cache(maxsize=8)
def _build(n_tiles: int, fused_tw: bool):
    wide_spec = pl.BlockSpec(
        (WIDE_ROWS, WIDTH), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    limb_spec = pl.BlockSpec(
        (NUM_LIMBS, WIDTH), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _redc_tw_kernel if fused_tw else _redc_kernel,
        grid=(n_tiles,),
        in_specs=[wide_spec] + ([limb_spec] if fused_tw else []),
        out_specs=limb_spec,
        out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, n_tiles * WIDTH), jnp.uint32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )


def redc_pallas(wide_cm: jnp.ndarray, tw_lm: jnp.ndarray | None = None) -> jnp.ndarray:
    """wide_cm: (64, N) u32 column-major accumulator (N multiple of 2048);
    tw_lm: optional (16, N) limb-major Montgomery twiddles. Returns
    (16, N) limb-major reduced (and twiddled) values."""
    n = wide_cm.shape[1]
    assert n % WIDTH == 0, n
    call = _build(n // WIDTH, tw_lm is not None)
    return call(wide_cm, tw_lm) if tw_lm is not None else call(wide_cm)
