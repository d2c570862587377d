"""Differential tests: batched Jacobian group law vs python-int affine model.

Mirrors the reference's alt_bn128_test.cpp curve tests: random points,
identity/inverse/doubling edge cases, on both G1 (Fq) and G2 (Fq2).
"""

import random

import jax
import jax.numpy as jnp
import pytest

from keyless_zk_tpu.curves import G1_CURVE, G2_CURVE, ref_curve
from keyless_zk_tpu.curves.ref_curve import G1, G2, G1_GEN, G2_GEN

rng = random.Random(99)


def host_points(group, gen, n):
    """Random points incl. edge cases: infinity, generator, P and -P pairs."""
    pts = [None, gen, group.neg(gen)]
    while len(pts) < n:
        pts.append(group.mul(gen, rng.randrange(1, 1 << 64)))
    return pts[:n]


CASES = [(G1_CURVE, G1, G1_GEN, "g1"), (G2_CURVE, G2, G2_GEN, "g2")]


@pytest.mark.parametrize("curve,group,gen,_id", CASES, ids=[c[-1] for c in CASES])
def test_add_dbl_batch(curve, group, gen, _id):
    n = 16
    ps = host_points(group, gen, n)
    qs = list(reversed(ps))  # includes inf+P, P+(-P), P+P pairings
    px, py, pinf = curve.encode_affine(ps)
    qx, qy, qinf = curve.encode_affine(qs)
    P = curve.from_affine(px, py, pinf)
    Q = curve.from_affine(qx, qy, qinf)

    got_add = curve.decode_jacobian(curve.add(P, Q))
    got_dbl = curve.decode_jacobian(curve.dbl(P))
    got_mixed = curve.decode_jacobian(curve.add_mixed(P, qx, qy, qinf))

    for p, q, ga, gm in zip(ps, qs, got_add, got_mixed):
        expect = group.add(p, q)
        assert ga == expect, f"add mismatch p={p} q={q}"
        assert gm == expect, f"mixed add mismatch"
    for p, gd in zip(ps, got_dbl):
        assert gd == group.add(p, p)


@pytest.mark.parametrize("curve,group,gen,_id", CASES, ids=[c[-1] for c in CASES])
def test_scalar_mul_bits(curve, group, gen, _id):
    k = rng.randrange(1, ref_curve.bn254.R_SCALAR)
    nbits = k.bit_length()
    bits = jnp.asarray([(k >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.uint32)
    px, py, pinf = curve.encode_affine([gen])
    P = curve.from_affine(px, py, pinf)
    got = curve.decode_jacobian(curve.scalar_mul_bits(P, bits))[0]
    assert got == group.mul(gen, k)


def test_on_curve_sanity():
    # decoded double of generator is on curve
    px, py, pinf = G1_CURVE.encode_affine([G1_GEN])
    P = G1_CURVE.from_affine(px, py, pinf)
    pt = G1_CURVE.decode_jacobian(G1_CURVE.dbl(P))[0]
    assert G1.is_on_curve(pt)
