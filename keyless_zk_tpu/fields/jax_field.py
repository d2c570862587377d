"""Batched prime-field arithmetic in JAX for TPU.

Replaces the reference's x86-64 asm field layer (rust-rapidsnark
src/asm/fr.asm, fq.asm and the generic C++ fallbacks fr_generic.cpp /
fq_generic.cpp) with a TPU-native design:

- an element is 16 little-endian limbs of 16 bits held in uint32 lanes
  (see fields/limbs.py for why);
- every op is *batched*: inputs have shape (..., 16) and all arithmetic is
  elementwise across the leading batch dims, so the VPU processes 8x128
  elements per instruction and XLA fuses the whole limb schedule;
- multiplication is SOS Montgomery: exact 16x16->32 products split into
  lo/hi 16-bit halves accumulated into 33 u32 columns (max column value
  ~2^22, far below the u32/i32 ceiling), followed by 16 Montgomery
  reduction steps and one exact carry ripple;
- there is no data-dependent control flow — zero/overflow handling is by
  masks — so everything jits into a single fused XLA computation.

Semantics match the reference bit-for-bit at the value level: Montgomery
form with R = 2^256, reduction to canonical [0, p). Differential-tested
against the pure-python model in tests/test_field.py.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from . import bn254
from .limbs import LIMB_BITS, LIMB_MASK, NUM_LIMBS, int_to_limbs

MASK = jnp.uint32(LIMB_MASK)


@dataclass(frozen=True)
class FieldSpec:
    """Host-side description of a prime field in limb form."""

    name: str
    p: int
    p_limbs: np.ndarray = field(init=False)
    n0: int = field(init=False)  # -p^-1 mod 2^16
    r_mod_p: int = field(init=False)  # R = 2^256 mod p  (Montgomery one)
    r2_mod_p: int = field(init=False)  # R^2 mod p
    r_inv: int = field(init=False)  # R^-1 mod p

    def __post_init__(self):
        object.__setattr__(self, "p_limbs", int_to_limbs(self.p))
        object.__setattr__(self, "n0", (-pow(self.p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS))
        R = 1 << (LIMB_BITS * NUM_LIMBS)
        object.__setattr__(self, "r_mod_p", R % self.p)
        object.__setattr__(self, "r2_mod_p", (R * R) % self.p)
        object.__setattr__(self, "r_inv", pow(R, -1, self.p))

    # ---- host-side scalar helpers (python ints) ----
    def to_mont_int(self, x: int) -> int:
        return (x << (LIMB_BITS * NUM_LIMBS)) % self.p

    def from_mont_int(self, x: int) -> int:
        return (x * self.r_inv) % self.p


FQ = FieldSpec("fq", bn254.Q)
FR = FieldSpec("fr", bn254.R_SCALAR)


def _const(spec_limbs: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(spec_limbs, dtype=jnp.uint32)


def zeros(shape=(), spec: FieldSpec = FQ) -> jnp.ndarray:
    return jnp.zeros((*shape, NUM_LIMBS), dtype=jnp.uint32)


def consts(spec: FieldSpec, value: int, shape=()) -> jnp.ndarray:
    """Broadcast a host int (already in the desired representation) to a batch."""
    v = _const(int_to_limbs(value % spec.p))
    return jnp.broadcast_to(v, (*shape, NUM_LIMBS))


def _ripple_carry(cols: list[jnp.ndarray], out_limbs: int) -> list[jnp.ndarray]:
    """Exact sequential carry propagation over u32 columns of 16-bit weight.

    One pass fully normalizes because each step resolves limb k before k+1.
    """
    out = []
    carry = None
    for k in range(out_limbs):
        v = cols[k] if k < len(cols) else jnp.zeros_like(cols[0])
        if carry is not None:
            v = v + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return out


def _csub_p(limbs: list[jnp.ndarray], spec: FieldSpec) -> list[jnp.ndarray]:
    """Conditionally subtract p: input < 2p (16 normalized limbs), output < p."""
    p = spec.p_limbs
    d = []
    borrow = None
    for k in range(NUM_LIMBS):
        v = limbs[k].astype(jnp.int32) - jnp.int32(int(p[k]))
        if borrow is not None:
            v = v + borrow
        d.append(v & 0xFFFF)
        borrow = v >> LIMB_BITS  # arithmetic: -1 when negative
    keep = borrow < 0  # a < p -> keep a
    return [jnp.where(keep, a, dd.astype(jnp.uint32)) for a, dd in zip(limbs, d)]


def _stack(cols: list[jnp.ndarray]) -> jnp.ndarray:
    return jnp.stack(cols, axis=-1).astype(jnp.uint32)


def _unstack(x: jnp.ndarray) -> list[jnp.ndarray]:
    return [x[..., k] for k in range(x.shape[-1])]


def add(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """(a + b) mod p for canonical inputs in [0, p)."""
    cols = _unstack(a + b)  # each <= 2*(2^16-1), exact in u32
    limbs = _ripple_carry(cols, NUM_LIMBS)  # a+b < 2p < 2^256: carry-out is 0
    return _stack(_csub_p(limbs, spec))


def sub(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """(a - b) mod p for canonical inputs in [0, p)."""
    p = spec.p_limbs
    d = []
    borrow = None
    for k in range(NUM_LIMBS):
        v = a[..., k].astype(jnp.int32) - b[..., k].astype(jnp.int32)
        if borrow is not None:
            v = v + borrow
        d.append(v & 0xFFFF)
        borrow = v >> LIMB_BITS
    neg = borrow < 0
    # add p back where we went negative
    out = []
    carry = None
    for k in range(NUM_LIMBS):
        v = d[k] + jnp.where(neg, jnp.int32(int(p[k])), jnp.int32(0))
        if carry is not None:
            v = v + carry
        out.append((v & 0xFFFF).astype(jnp.uint32))
        carry = v >> LIMB_BITS
    return _stack(out)


def neg(a: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """(-a) mod p; maps 0 to 0."""
    return jnp.where(is_zero(a)[..., None], a, sub(consts(spec, 0, ()), a, spec))


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mask ? a : b, with mask of batch shape (no limb dim)."""
    return jnp.where(mask[..., None], a, b)


def mont_mul(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Montgomery product a*b*R^-1 mod p, canonical in/out.

    SOS schedule. Column value bound: each of the 33 columns receives at most
    32 lo/hi terms (< 2^16) from the product, 32 from the reduction and a
    small ripple carry — max < 2^23, no u32 overflow possible.
    """
    L = NUM_LIMBS
    n0 = jnp.uint32(spec.n0)
    p_row = _const(spec.p_limbs)  # (16,)

    t = [None] * (2 * L + 1)

    def acc(idx, val):
        t[idx] = val if t[idx] is None else t[idx] + val

    # product phase
    for i in range(L):
        prod = a[..., i : i + 1] * b  # (..., 16) u32 exact
        lo = prod & MASK
        hi = prod >> LIMB_BITS
        for j in range(L):
            acc(i + j, lo[..., j])
            acc(i + j + 1, hi[..., j])

    # Montgomery reduction phase
    for i in range(L):
        m = (t[i] * n0) & MASK  # wrap mod 2^32 preserves the low 16 bits
        prod = m[..., None] * p_row  # (..., 16)
        lo = prod & MASK
        hi = prod >> LIMB_BITS
        for j in range(L):
            acc(i + j, lo[..., j])
            acc(i + j + 1, hi[..., j])
        # t[i] is now ≡ 0 mod 2^16; push its carry up before it is consumed
        acc(i + 1, t[i] >> LIMB_BITS)

    limbs = _ripple_carry(t[L : 2 * L + 1], NUM_LIMBS)  # result < 2p fits 16 limbs
    return _stack(_csub_p(limbs, spec))


def to_mont(a: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    return mont_mul(a, consts(spec, spec.r2_mod_p, ()), spec)


def from_mont(a: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    return mont_mul(a, consts(spec, 1, ()), spec)


def mont_pow(a: jnp.ndarray, e: int, spec: FieldSpec) -> jnp.ndarray:
    """a^e with a in Montgomery form (output Montgomery), e a host int.

    MSB-first square-and-multiply under lax.fori_loop so the limb schedule is
    traced once regardless of the 254-bit exponent.
    """
    nbits = max(e.bit_length(), 1)
    bits = jnp.asarray([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.uint32)
    one = jnp.broadcast_to(consts(spec, spec.r_mod_p, ()), a.shape)

    def body(i, acc):
        acc = mont_mul(acc, acc, spec)
        mul = mont_mul(acc, a, spec)
        return select(bits[i] == 1, mul, acc)

    return jax.lax.fori_loop(0, nbits, body, one)


def mont_inv(a: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """a^-1 in Montgomery form via Fermat (a^(p-2)); 0 maps to 0."""
    return mont_pow(a, spec.p - 2, spec)


# ---- host-side conversions -------------------------------------------------

def encode_ints(xs, spec: FieldSpec, mont: bool = False) -> jnp.ndarray:
    """Host ints -> device limb batch, optionally into Montgomery form."""
    from .limbs import ints_to_limbs

    if mont:
        xs = [spec.to_mont_int(x % spec.p) for x in xs]
    else:
        xs = [x % spec.p for x in xs]
    return jnp.asarray(ints_to_limbs(xs), dtype=jnp.uint32)


def decode_ints(arr, spec: FieldSpec, mont: bool = False) -> list[int]:
    """Device limb batch -> host ints, optionally out of Montgomery form."""
    from .limbs import limbs_to_ints

    vals = limbs_to_ints(np.asarray(arr))
    if mont:
        vals = [spec.from_mont_int(v) for v in vals]
    return vals
