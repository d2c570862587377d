"""Kernel-side field and group-law building blocks for the Pallas MSM stack.

This is the round-2 redesign of the limb arithmetic that lives *inside*
Mosaic kernels (the round-1 version sat in ops/pallas_curve.py and worked on
1-D (TILE,) limb vectors, which Mosaic lays out one-sublane-wide; here every
limb is a dense 2-D (8, V//8) tile so each VPU op runs at full (8, 128)
register occupancy).

Contents:

- ``KFq``: BN254 base-field ops on limb lists (16 arrays of (8, V//8) u32).
  Montgomery multiplication is CIOS-style interleaved REDC (one u = t_i * n0'
  per limb, 272 VPU multiplies total) instead of the round-1 two-convolution
  REDC (512 multiplies) — the reference's asm does the same interleaving
  (rust-rapidsnark src/asm/fr.asm mmul schedule), re-derived here for
  vector lanes with lazy (u32-column) carry accumulation.
- ``KFq2``: Fq2 = Fq[u]/(u^2+1) via Karatsuba (3 Fq muls per Fq2 mul), the
  TPU equivalent of the reference's F2Field (f2field.cpp) used for G2.
- Generic Jacobian group law (``madd_core``, ``add_core``, ``dbl_core``)
  parameterized over the field object, shared by the G1 and G2 MSM kernels
  (the reference instantiates its C++ Curve template the same way,
  alt_bn128.hpp:9-69).

An element of KFq is a python list of 16 identically-shaped u32 arrays
(little-endian 16-bit limbs); an element of KFq2 is a (c0, c1) tuple of two
such lists. Batch shape is whatever 2-D tile shape the arrays carry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields import bn254
from ..fields.limbs import LIMB_BITS, NUM_LIMBS, int_to_limbs

MASK = 0xFFFF

Q = bn254.Q
_R = 1 << (LIMB_BITS * NUM_LIMBS)
P_LIMBS = [int(x) for x in int_to_limbs(Q)]
PBAR_LIMBS = [0xFFFF - x for x in P_LIMBS]
N0_0 = int((-pow(Q, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS))  # -q^-1 mod 2^16
MONT_ONE = [int(x) for x in int_to_limbs(_R % Q)]


def sel(c, a, b):
    """Elementwise select via lax.select_n directly.

    jnp.where routes through an api.jit wrapper whose closed_call jaxpr
    trips a jax-0.9 lowering-cache KeyError when a second Pallas kernel
    containing the identical call is lowered in the same process — kernel
    code must not use jnp.where.
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


class KFq:
    """BN254 Fq ops on lists of 16 u32 limb tiles (canonical, Montgomery)."""

    rows = NUM_LIMBS  # coordinate rows a point component occupies in a ref

    # ---- ref I/O: `get(i)` / `put(i, v)` address coordinate row i ----------
    def load(self, get):
        return [get(i) for i in range(NUM_LIMBS)]

    def store(self, put, val):
        for i in range(NUM_LIMBS):
            put(i, val[i])

    def map_el(self, fn, el):
        return [fn(v) for v in el]

    # ---- constants ---------------------------------------------------------
    def zero_like(self, x):
        z = jnp.zeros_like(x[0])
        return [z] * NUM_LIMBS

    def one_like(self, x):
        return [jnp.full_like(x[0], c) for c in MONT_ONE]

    # ---- predicates / select ----------------------------------------------
    def is_zero(self, a):
        acc = a[0]
        for x in a[1:]:
            acc = acc | x
        return acc == 0

    def select(self, mask, a, b):
        return [sel(mask, x, y) for x, y in zip(a, b)]

    # ---- ring ops ----------------------------------------------------------
    def _ripple(self, cols, n_out, carry_in=None):
        out = []
        carry = carry_in if carry_in is not None else jnp.zeros_like(cols[0])
        for i in range(n_out):
            v = (cols[i] if i < len(cols) else jnp.zeros_like(cols[0])) + carry
            out.append(v & MASK)
            carry = v >> LIMB_BITS
        return out, carry

    def _csub_p(self, res, overflow=None):
        """Canonical 16 limbs (+ optional 0/1 overflow limb), value < 2p -> < p."""
        diff = []
        carry = jnp.ones_like(res[0])
        for i in range(NUM_LIMBS):
            v = res[i] + PBAR_LIMBS[i] + carry
            diff.append(v & MASK)
            carry = v >> LIMB_BITS
        geq = carry if overflow is None else carry + overflow
        geq = geq >= 1
        return [sel(geq, d, r) for d, r in zip(diff, res)]

    def add(self, a, b):
        s, carry = self._ripple([x + y for x, y in zip(a, b)], NUM_LIMBS)
        return self._csub_p(s, carry)

    def sub(self, a, b):
        # a - b + p (wraps exactly once through 2^256; drop the carry-out)
        cols = [x + p + (MASK - y) for x, y, p in zip(a, b, P_LIMBS)]
        s, _ = self._ripple(cols, NUM_LIMBS, carry_in=jnp.ones_like(a[0]))
        return self._csub_p(s)

    def neg_raw(self, a):
        """p - a for canonical a <= p. Maps 0 to p (≡ 0) — callers in the MSM
        only negate y-coordinates of curve points, where y != 0 (odd-order
        curve) or the value is masked by an infinity flag."""
        cols = [p + (MASK - x) for x, p in zip(a, P_LIMBS)]
        s, _ = self._ripple(cols, NUM_LIMBS, carry_in=jnp.ones_like(a[0]))
        return s

    def dbl_el(self, a):
        return self.add(a, a)

    def mul(self, a, b):
        """Montgomery product with interleaved (CIOS) reduction.

        T = a*b accumulates as lazy u32 columns of 16-bit weight; each of the
        16 REDC rounds kills one low column with u_i = t_i * (-q^-1) mod 2^16
        and folds its carry forward. Column values stay < 2^23 (audited in
        tests against the XLA mont_mul).
        """
        cols = self._conv(a, b)
        return self._redc(cols)

    def sqr(self, a):
        cols = self._conv_sym(a)
        return self._redc(cols)

    def _conv(self, a, b):
        """Schoolbook 16x16 product -> 32 lazy u32 columns (< 2^21)."""
        cols = [None] * (2 * NUM_LIMBS)

        def acc(k, v):
            cols[k] = v if cols[k] is None else cols[k] + v

        for i in range(NUM_LIMBS):
            ai = a[i]
            for j in range(NUM_LIMBS):
                prod = ai * b[j]
                acc(i + j, prod & MASK)
                if i + j + 1 < 2 * NUM_LIMBS:
                    acc(i + j + 1, prod >> LIMB_BITS)
        return [c if c is not None else jnp.zeros_like(a[0]) for c in cols]

    def _conv_sym(self, a):
        """Squaring convolution: off-diagonal products counted twice by
        adding them twice (saves 120 of 256 multiplies)."""
        cols = [None] * (2 * NUM_LIMBS)

        def acc(k, v):
            cols[k] = v if cols[k] is None else cols[k] + v

        for i in range(NUM_LIMBS):
            for j in range(i, NUM_LIMBS):
                prod = a[i] * a[j]
                lo, hi = prod & MASK, prod >> LIMB_BITS
                acc(i + j, lo)
                if i + j + 1 < 2 * NUM_LIMBS:
                    acc(i + j + 1, hi)
                if i != j:
                    acc(i + j, lo)
                    if i + j + 1 < 2 * NUM_LIMBS:
                        acc(i + j + 1, hi)
        return [c if c is not None else jnp.zeros_like(a[0]) for c in cols]

    def _redc(self, cols):
        """Interleaved Montgomery reduction of 32 lazy columns."""
        for i in range(NUM_LIMBS):
            u = ((cols[i] & MASK) * N0_0) & MASK
            for j in range(NUM_LIMBS):
                prod = u * P_LIMBS[j]
                cols[i + j] = cols[i + j] + (prod & MASK)
                if i + j + 1 < 2 * NUM_LIMBS:
                    cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
            # column i is now ≡ 0 mod 2^16: fold its carry into column i+1
            cols[i + 1] = cols[i + 1] + (cols[i] >> LIMB_BITS)
        res, carry = self._ripple(cols[NUM_LIMBS:], NUM_LIMBS)
        # (T + m*p)/R < 2p < 2^256, so the ripple's carry-out is the only
        # 17th-limb content and feeds the conditional subtract
        return self._csub_p(res, carry)


class KFq2:
    """Fq2 ops: an element is a (c0, c1) tuple of KFq limb lists."""

    rows = 2 * NUM_LIMBS

    def __init__(self):
        self.fq = KFq()

    def load(self, get):
        return (
            [get(i) for i in range(NUM_LIMBS)],
            [get(NUM_LIMBS + i) for i in range(NUM_LIMBS)],
        )

    def store(self, put, val):
        c0, c1 = val
        for i in range(NUM_LIMBS):
            put(i, c0[i])
            put(NUM_LIMBS + i, c1[i])

    def map_el(self, fn, el):
        return ([fn(v) for v in el[0]], [fn(v) for v in el[1]])

    def zero_like(self, x):
        return (self.fq.zero_like(x[0]), self.fq.zero_like(x[0]))

    def one_like(self, x):
        return (self.fq.one_like(x[0]), self.fq.zero_like(x[0]))

    def is_zero(self, a):
        acc = a[0][0]
        for x in a[0][1:]:
            acc = acc | x
        for x in a[1]:
            acc = acc | x
        return acc == 0

    def select(self, mask, a, b):
        f = self.fq
        return (f.select(mask, a[0], b[0]), f.select(mask, a[1], b[1]))

    def add(self, a, b):
        f = self.fq
        return (f.add(a[0], b[0]), f.add(a[1], b[1]))

    def sub(self, a, b):
        f = self.fq
        return (f.sub(a[0], b[0]), f.sub(a[1], b[1]))

    def neg_raw(self, a):
        f = self.fq
        return (f.neg_raw(a[0]), f.neg_raw(a[1]))

    def mul(self, a, b):
        """Karatsuba: (a0+a1 u)(b0+b1 u) with u^2 = -1 — 3 Fq muls
        (f2field.cpp mul re-derived for limb lists)."""
        f = self.fq
        t0 = f.mul(a[0], b[0])
        t1 = f.mul(a[1], b[1])
        t2 = f.mul(f.add(a[0], a[1]), f.add(b[0], b[1]))
        re = f.sub(t0, t1)
        im = f.sub(f.sub(t2, t0), t1)
        return (re, im)

    def sqr(self, a):
        """(a0^2 - a1^2, 2 a0 a1) — 2 Fq muls."""
        f = self.fq
        re = f.mul(f.add(a[0], a[1]), f.sub(a[0], a[1]))
        t = f.mul(a[0], a[1])
        return (re, f.add(t, t))


KFQ = KFq()
KFQ2 = KFq2()


def field_for(tag: str):
    return KFQ if tag == "fq" else KFQ2


# ---- generic Jacobian group law (dbl-2009-l / add-2007-bl / madd-2007-bl) --

def dbl_core(F, x1, y1, z1):
    A = F.sqr(x1)
    B = F.sqr(y1)
    C = F.sqr(B)
    t = F.sub(F.sub(F.sqr(F.add(x1, B)), A), C)
    D = F.add(t, t)
    E = F.add(F.add(A, A), A)
    Ff = F.sqr(E)
    x3 = F.sub(Ff, F.add(D, D))
    c8 = F.add(F.add(C, C), F.add(C, C))
    c8 = F.add(c8, c8)
    y3 = F.sub(F.mul(E, F.sub(D, x3)), c8)
    z3 = F.mul(F.add(y1, y1), z1)
    return x3, y3, z3


def dbl_affine_core(F, x, y):
    """Double an affine point (z == 1): the madd doubling fallback. One mul
    cheaper than dbl_core (z3 = 2y needs no multiply)."""
    A = F.sqr(x)
    B = F.sqr(y)
    C = F.sqr(B)
    t = F.sub(F.sub(F.sqr(F.add(x, B)), A), C)
    D = F.add(t, t)
    E = F.add(F.add(A, A), A)
    Ff = F.sqr(E)
    x3 = F.sub(Ff, F.add(D, D))
    c8 = F.add(F.add(C, C), F.add(C, C))
    c8 = F.add(c8, c8)
    y3 = F.sub(F.mul(E, F.sub(D, x3)), c8)
    z3 = F.add(y, y)
    return x3, y3, z3


def madd_core(F, x1, y1, z1, x2, y2, q_inf, assume_distinct=False):
    """Complete mixed add: (Jacobian acc) + (affine q, inf mask).

    Every edge case (either input at infinity, P == Q doubling, P == -Q
    cancellation) is mask-resolved. With ``assume_distinct`` the P == Q
    doubling fallback is skipped — valid when the accumulated subsets can
    never sum to the incoming table point (random zkey tables; engineering a
    collision means finding a nontrivial linear relation among random curve
    points, i.e. breaking DLOG); the Groth16 pipeline re-verifies each proof
    before responding, so the 2^-200 event degrades to a 500, never a wrong
    proof.
    """
    z1z1 = F.sqr(z1)
    u2 = F.mul(x2, z1z1)
    s2 = F.mul(F.mul(y2, z1), z1z1)
    h = F.sub(u2, x1)
    rr = F.sub(s2, y1)
    r2 = F.add(rr, rr)
    hh = F.sqr(h)
    i4 = F.add(F.add(hh, hh), F.add(hh, hh))
    j = F.mul(h, i4)
    v = F.mul(x1, i4)
    x3 = F.sub(F.sub(F.sqr(r2), j), F.add(v, v))
    yj = F.mul(y1, j)
    y3 = F.sub(F.mul(r2, F.sub(v, x3)), F.add(yj, yj))
    z3 = F.sub(F.sub(F.sqr(F.add(z1, h)), z1z1), hh)

    p_inf = F.is_zero(z1)
    if not assume_distinct:
        h_zero = F.is_zero(h) & ~p_inf & ~q_inf
        r_zero = F.is_zero(rr)
        take_dbl = h_zero & r_zero
        dx, dy, dz = dbl_affine_core(F, x2, y2)
        x3 = F.select(take_dbl, dx, x3)
        y3 = F.select(take_dbl, dy, y3)
        z3 = F.select(take_dbl, dz, z3)

    q_z = F.select(q_inf, F.zero_like(x2), F.one_like(x2))
    x3 = F.select(p_inf, x2, x3)
    y3 = F.select(p_inf, y2, y3)
    z3 = F.select(p_inf, q_z, z3)
    keep = q_inf & ~p_inf
    x3 = F.select(keep, x1, x3)
    y3 = F.select(keep, y1, y3)
    z3 = F.select(keep, z1, z3)
    return x3, y3, z3


def add_core(F, x1, y1, z1, x2, y2, z2):
    """Complete Jacobian + Jacobian add (add-2007-bl), mask-resolved."""
    z1z1 = F.sqr(z1)
    z2z2 = F.sqr(z2)
    u1 = F.mul(x1, z2z2)
    u2 = F.mul(x2, z1z1)
    s1 = F.mul(F.mul(y1, z2), z2z2)
    s2 = F.mul(F.mul(y2, z1), z1z1)
    h = F.sub(u2, u1)
    rr = F.sub(s2, s1)
    r2 = F.add(rr, rr)
    i4 = F.sqr(F.add(h, h))
    j = F.mul(h, i4)
    v = F.mul(u1, i4)
    x3 = F.sub(F.sub(F.sqr(r2), j), F.add(v, v))
    s1j = F.mul(s1, j)
    y3 = F.sub(F.mul(r2, F.sub(v, x3)), F.add(s1j, s1j))
    zz = F.sub(F.sub(F.sqr(F.add(z1, z2)), z1z1), z2z2)
    z3 = F.mul(zz, h)

    p_inf = F.is_zero(z1)
    q_inf = F.is_zero(z2)
    both = ~p_inf & ~q_inf
    h_zero = F.is_zero(h) & both
    r_zero = F.is_zero(rr)
    take_dbl = h_zero & r_zero
    dx, dy, dz = dbl_core(F, x1, y1, z1)

    x3 = F.select(take_dbl, dx, x3)
    y3 = F.select(take_dbl, dy, y3)
    z3 = F.select(take_dbl, dz, z3)
    x3 = F.select(p_inf, x2, x3)
    y3 = F.select(p_inf, y2, y3)
    z3 = F.select(p_inf, z2, z3)
    keep = q_inf & ~p_inf
    x3 = F.select(keep, x1, x3)
    y3 = F.select(keep, y1, y3)
    z3 = F.select(keep, z1, z3)
    return x3, y3, z3
