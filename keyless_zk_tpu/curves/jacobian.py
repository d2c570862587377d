"""Batched Jacobian-coordinate group law for BN254 G1/G2 on TPU.

Replaces the reference's C++ ZZ-coordinate Curve template
(rust-rapidsnark/rapidsnark/src/curve.cpp, curve.hpp:18-140) with a fully
batched, branch-free design: every edge case (infinity, P==Q, P==-Q) is
resolved by masks so the whole group law jits into straight-line vector code.

A point batch is a (x, y, z) triple of coordinate arrays (Montgomery form);
z == 0 encodes infinity. Formulas are the standard a=0 Jacobian ones
(dbl-2009-l, add-2007-bl, madd-2007-bl). BN254 has prime (odd) order so
y == 0 never occurs on the curve and doubling is total.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .field_ops import FQ2_OPS, FQ_OPS, Fq2Ops, FqOps
from . import ref_curve
from ..fields import bn254


class JacPoint(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


class JacobianCurve:
    def __init__(self, ops):
        self.ops = ops

    # ---- constructors ----
    def infinity(self, shape=()):
        f = self.ops
        return JacPoint(f.zeros(shape), f.zeros(shape), f.zeros(shape))

    def from_affine(self, x, y, inf_mask=None):
        """Affine coordinate arrays (+ optional infinity mask) -> Jacobian."""
        f = self.ops
        batch = x.shape[: x.ndim - f.coord_ndim]
        one = f.const(1, batch)
        z = one
        if inf_mask is not None:
            z = f.select(inf_mask, f.zeros(batch), one)
        return JacPoint(x, y, z)

    def is_infinity(self, p: JacPoint):
        return self.ops.is_zero(p.z)

    def select(self, mask, p: JacPoint, q: JacPoint) -> JacPoint:
        f = self.ops
        return JacPoint(f.select(mask, p.x, q.x), f.select(mask, p.y, q.y), f.select(mask, p.z, q.z))

    def neg(self, p: JacPoint) -> JacPoint:
        return JacPoint(p.x, self.ops.neg(p.y), p.z)

    # ---- group law ----
    def dbl(self, p: JacPoint) -> JacPoint:
        f = self.ops
        A = f.sqr(p.x)
        B = f.sqr(p.y)
        C = f.sqr(B)
        t = f.sub(f.sub(f.sqr(f.add(p.x, B)), A), C)
        D = f.add(t, t)  # 2((X+B)^2 - A - C)
        E = f.add(f.add(A, A), A)
        F = f.sqr(E)
        x3 = f.sub(F, f.add(D, D))
        c8 = f.add(f.add(C, C), f.add(C, C))
        c8 = f.add(c8, c8)
        y3 = f.sub(f.mul(E, f.sub(D, x3)), c8)
        z3 = f.mul(f.add(p.y, p.y), p.z)
        return JacPoint(x3, y3, z3)  # z==0 stays 0: infinity doubles to infinity

    def add(self, p: JacPoint, q: JacPoint) -> JacPoint:
        f = self.ops
        z1z1 = f.sqr(p.z)
        z2z2 = f.sqr(q.z)
        u1 = f.mul(p.x, z2z2)
        u2 = f.mul(q.x, z1z1)
        s1 = f.mul(f.mul(p.y, q.z), z2z2)
        s2 = f.mul(f.mul(q.y, p.z), z1z1)
        h = f.sub(u2, u1)
        rr = f.sub(s2, s1)
        r2 = f.add(rr, rr)
        i = f.sqr(f.add(h, h))
        j = f.mul(h, i)
        v = f.mul(u1, i)
        x3 = f.sub(f.sub(f.sqr(r2), j), f.add(v, v))
        s1j = f.mul(s1, j)
        y3 = f.sub(f.mul(r2, f.sub(v, x3)), f.add(s1j, s1j))
        zz = f.sub(f.sub(f.sqr(f.add(p.z, q.z)), z1z1), z2z2)
        z3 = f.mul(zz, h)
        out = JacPoint(x3, y3, z3)

        p_inf = self.is_infinity(p)
        q_inf = self.is_infinity(q)
        both = ~p_inf & ~q_inf
        h_zero = f.is_zero(h) & both
        r_zero = f.is_zero(rr)
        # P == Q  -> double;  P == -Q -> infinity (z3 = h*zz = 0 already)
        out = self.select(h_zero & r_zero, self.dbl(p), out)
        out = self.select(p_inf, q, out)
        out = self.select(q_inf, p, out)
        return out

    def add_mixed(self, p: JacPoint, qx, qy, q_inf) -> JacPoint:
        """p (Jacobian) + q (affine with explicit infinity mask). ~40% cheaper."""
        f = self.ops
        z1z1 = f.sqr(p.z)
        u2 = f.mul(qx, z1z1)
        s2 = f.mul(f.mul(qy, p.z), z1z1)
        h = f.sub(u2, p.x)
        rr = f.sub(s2, p.y)
        r2 = f.add(rr, rr)
        hh = f.sqr(h)
        i = f.add(f.add(hh, hh), f.add(hh, hh))
        j = f.mul(h, i)
        v = f.mul(p.x, i)
        x3 = f.sub(f.sub(f.sqr(r2), j), f.add(v, v))
        yj = f.mul(p.y, j)
        y3 = f.sub(f.mul(r2, f.sub(v, x3)), f.add(yj, yj))
        z3 = f.sub(f.sub(f.sqr(f.add(p.z, h)), z1z1), hh)
        out = JacPoint(x3, y3, z3)

        p_inf = self.is_infinity(p)
        h_zero = f.is_zero(h) & ~p_inf & ~q_inf
        r_zero = f.is_zero(rr)
        out = self.select(h_zero & r_zero, self.dbl(p), out)
        batch = qx.shape[: qx.ndim - f.coord_ndim]
        q_jac = JacPoint(qx, qy, f.select(q_inf, f.zeros(batch), f.const(1, batch)))
        out = self.select(p_inf, q_jac, out)
        out = self.select(q_inf, p, out)
        return out

    def scalar_mul_bits(self, p: JacPoint, bits: jnp.ndarray) -> JacPoint:
        """MSB-first double-and-add with a (nbits,) 0/1 array (shared exponent)."""
        import jax

        def body(i, acc):
            acc = self.dbl(acc)
            added = self.add(acc, p)
            return self.select(bits[i] == 1, added, acc)

        batch = p.x.shape[: p.x.ndim - self.ops.coord_ndim]
        return jax.lax.fori_loop(0, bits.shape[0], body, self.infinity(batch))

    # ---- affine conversion (device) ----
    def to_affine(self, p: JacPoint):
        """Returns (x, y, inf_mask); uses one batched Fermat inversion."""
        f = self.ops
        inf = self.is_infinity(p)
        # avoid inverting 0: substitute 1
        batch = p.x.shape[: p.x.ndim - f.coord_ndim]
        z = f.select(inf, f.const(1, batch), p.z)
        zi = f.inv(z)
        zi2 = f.sqr(zi)
        x = f.mul(p.x, zi2)
        y = f.mul(p.y, f.mul(zi2, zi))
        return x, y, inf

    # ---- host codecs ----
    def encode_affine(self, pts):
        """List of host affine points (None = infinity) -> (x, y, inf) arrays."""
        zero = 0 if self.ops.coord_ndim == 1 else (0, 0)
        xs = [zero if p is None else p[0] for p in pts]
        ys = [zero if p is None else p[1] for p in pts]
        inf = jnp.asarray([p is None for p in pts], dtype=bool)
        return self.ops.encode(xs), self.ops.encode(ys), inf

    def decode_jacobian(self, p: JacPoint):
        """Device Jacobian batch -> list of host affine points (None = inf).

        to_affine runs as ONE jitted graph: eager dispatch of its Fermat
        inversion chain (~380 tiny kernels) cost ~100 ms per decode over
        the device tunnel — ~0.5 s of the warm full proof across the five
        MSM results."""
        if "_to_affine_fn" not in self.__dict__:
            self._to_affine_fn = jax.jit(lambda q: self.to_affine(q))
        x, y, inf = jax.device_get(self._to_affine_fn(p))  # ONE readback RTT
        xs = self.ops.decode(x)
        ys = self.ops.decode(y)
        return [None if i else (xx, yy) for xx, yy, i in zip(xs, ys, list(inf))]


G1_CURVE = JacobianCurve(FQ_OPS)
G2_CURVE = JacobianCurve(FQ2_OPS)
