"""Kernel-side field ops (ops/pallas_ec.py) vs host integers / XLA field.

Runs the limb-list arithmetic inside tiny interpret-mode Pallas kernels on
dense (8, 128) tiles and compares bit-exactly with the python model.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # large jitted limb graphs: minutes-scale XLA:CPU compile

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from keyless_zk_tpu.fields import bn254
from keyless_zk_tpu.fields.limbs import NUM_LIMBS, ints_to_limbs, limbs_to_ints
from keyless_zk_tpu.ops import pallas_ec
from keyless_zk_tpu.ops.pallas_ec import KFQ, KFQ2

Q = bn254.Q
N = 1024  # one (8, 128) tile


def _encode(vals):
    """ints -> (16, 8, 128) limb-major tile."""
    arr = ints_to_limbs([v % Q for v in vals])  # (N, 16)
    return jnp.asarray(arr.T.reshape(NUM_LIMBS, 8, 128))


def _decode(arr):
    return limbs_to_ints(np.asarray(arr).reshape(NUM_LIMBS, N).T)


def _run_fq(op, n_in):
    """Run a KFq op on (16, 8, 128) tiles under plain jit.

    The limb ops are ordinary jnp code; wrapping them in interpret-mode
    pallas_call sends XLA:CPU's native compile of the unrolled mul schedule
    into tens of minutes, so numerics are tested bare and the pallas
    ref-plumbing is covered by test_pallas_ref_plumbing below (add only,
    which compiles quickly) and by the on-hardware suite.
    """

    @jax.jit
    def call(*args):
        ins = [[a[i] for i in range(NUM_LIMBS)] for a in args]
        out = op(ins)
        return jnp.stack(out)

    return call


def test_pallas_ref_plumbing():
    """KFQ.load/store through real pallas Refs (interpret mode, cheap op)."""
    rng = np.random.default_rng(10)
    a, b = _rand_vals(rng), _rand_vals(rng)

    def kernel(ra, rb, ro):
        x = KFQ.load(lambda i: ra[i])
        y = KFQ.load(lambda i: rb[i])
        KFQ.store(lambda i, v: ro.__setitem__(i, v), KFQ.add(x, y))

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, 8, 128), jnp.uint32),
        interpret=True,
    )(_encode(a), _encode(b))
    assert _decode(out) == [(x + y) % Q for x, y in zip(a, b)]


def _rand_vals(rng, n=N):
    vals = [int.from_bytes(rng.bytes(32), "little") % Q for _ in range(n)]
    vals[0] = 0
    vals[1] = Q - 1
    vals[2] = 1
    return vals


def test_kfq_mul_add_sub_sqr():
    rng = np.random.default_rng(11)
    a = _rand_vals(rng)
    b = _rand_vals(rng)
    b[3] = Q - 1
    A, B = _encode(a), _encode(b)
    R = 1 << 256
    r_inv = pow(R, -1, Q)

    got = _decode(_run_fq(lambda ins: KFQ.mul(ins[0], ins[1]), 2)(A, B))
    want = [(x * y * r_inv) % Q for x, y in zip(a, b)]
    assert got == want

    got = _decode(_run_fq(lambda ins: KFQ.sqr(ins[0]), 1)(A))
    want = [(x * x * r_inv) % Q for x in a]
    assert got == want

    got = _decode(_run_fq(lambda ins: KFQ.add(ins[0], ins[1]), 2)(A, B))
    assert got == [(x + y) % Q for x, y in zip(a, b)]

    got = _decode(_run_fq(lambda ins: KFQ.sub(ins[0], ins[1]), 2)(A, B))
    assert got == [(x - y) % Q for x, y in zip(a, b)]

    # neg_raw: p - a (maps 0 to p, callers mask that case)
    got = _decode(_run_fq(lambda ins: KFQ.neg_raw(ins[0]), 1)(A))
    assert got == [Q - x for x in a]


def test_kfq2_mul_sqr():
    """KFq2 Karatsuba on plain arrays (the limb ops are ordinary jnp ops;
    XLA:CPU's native compile of the large fused interpret-mode kernels is
    pathologically slow, and the in-pallas path is already covered by
    test_kfq_mul_add_sub_sqr + the on-chip scripts)."""
    rng = np.random.default_rng(12)
    a0, a1 = _rand_vals(rng), _rand_vals(rng)
    b0, b1 = _rand_vals(rng), _rand_vals(rng)
    R = 1 << 256
    r_inv = pow(R, -1, Q)

    @jax.jit
    def run(r0, r1, s0, s1):
        a = ([r0[i] for i in range(NUM_LIMBS)], [r1[i] for i in range(NUM_LIMBS)])
        b = ([s0[i] for i in range(NUM_LIMBS)], [s1[i] for i in range(NUM_LIMBS)])
        c = KFQ2.mul(a, b)
        return jnp.stack(c[0]), jnp.stack(c[1])

    o0, o1 = run(_encode(a0), _encode(a1), _encode(b0), _encode(b1))
    g0, g1 = _decode(o0), _decode(o1)
    for i in range(N):
        # (a0 + a1 u)(b0 + b1 u), u^2 = -1, Montgomery domain
        re = (a0[i] * b0[i] - a1[i] * b1[i]) * r_inv % Q
        im = (a0[i] * b1[i] + a1[i] * b0[i]) * r_inv % Q
        assert g0[i] == re and g1[i] == im, i


def test_madd_core_interpret():
    """Generic madd_core (plain arrays) vs the XLA Jacobian curve (G1)."""
    from keyless_zk_tpu.curves import ref_curve
    from keyless_zk_tpu.curves.jacobian import G1_CURVE, JacPoint

    rng = np.random.default_rng(13)
    n = N
    ks = rng.integers(1, 1 << 30, n)
    pts = [ref_curve.G1.mul(ref_curve.G1_GEN, int(k)) for k in ks]
    qts = [ref_curve.G1.mul(ref_curve.G1_GEN, int(k) + 7) for k in ks]
    qts[5] = pts[5]  # P == Q doubling
    qts[6] = (pts[6][0], Q - pts[6][1])  # P == -Q
    px, py, pinf = G1_CURVE.encode_affine(pts)
    qx, qy, qinf = G1_CURVE.encode_affine(qts)
    pinf = pinf.at[3].set(True)
    qinf = qinf.at[4].set(True)

    acc = G1_CURVE.from_affine(px, py, pinf)
    want = G1_CURVE.decode_jacobian(G1_CURVE.add_mixed(acc, qx, qy, qinf))

    def to_major(a):
        return jnp.asarray(np.asarray(a).T.reshape(NUM_LIMBS, 8, 128))

    @jax.jit
    def run(axr, ayr, azr, qxr, qyr, qir):
        x1 = KFQ.load(lambda i: axr[i])
        y1 = KFQ.load(lambda i: ayr[i])
        z1 = KFQ.load(lambda i: azr[i])
        x2 = KFQ.load(lambda i: qxr[i])
        y2 = KFQ.load(lambda i: qyr[i])
        qi = qir[0] != 0
        x3, y3, z3 = pallas_ec.madd_core(KFQ, x1, y1, z1, x2, y2, qi)
        return jnp.stack(x3), jnp.stack(y3), jnp.stack(z3)

    outs = run(
        to_major(acc.x), to_major(acc.y), to_major(acc.z),
        to_major(qx), to_major(qy),
        jnp.asarray(np.asarray(qinf).astype(np.int32).reshape(1, 8, 128)),
    )

    def from_major(a):
        return jnp.asarray(np.asarray(a).reshape(NUM_LIMBS, n).T)

    got = G1_CURVE.decode_jacobian(JacPoint(*[from_major(o) for o in outs]))
    assert got == want


def test_extract_digits_signed_roundtrip():
    from keyless_zk_tpu.fields.jax_field import FR
    from keyless_zk_tpu.ops import msm as M

    rng = np.random.default_rng(14)
    vals = [int.from_bytes(rng.bytes(32), "little") % FR.p for _ in range(64)]
    vals[0] = 0
    vals[1] = FR.p - 1
    vals[2] = 1
    scalars = jnp.asarray(ints_to_limbs(vals))
    for c in (8, 13, 16):
        keys, negs = M.extract_digits_signed(scalars, c)
        keys = np.asarray(keys)
        negs = np.asarray(negs)
        half = 1 << (c - 1)
        assert keys.min() >= 0 and keys.max() <= half
        for j, v in enumerate(vals):
            acc = 0
            for w in range(keys.shape[0]):
                sgn = -1 if negs[w, j] else 1
                acc += sgn * int(keys[w, j]) << (c * w)
            assert acc == v, (c, j)


def test_searchsorted_matches_numpy():
    from keyless_zk_tpu.ops.msm import _searchsorted

    rng = np.random.default_rng(15)
    keys = np.sort(rng.integers(-1, 50, 257)).astype(np.int32)
    vals = np.arange(-2, 55, dtype=np.int32)
    got = np.asarray(_searchsorted(jnp.asarray(keys), jnp.asarray(vals)))
    want = np.searchsorted(keys, vals, side="left")
    assert np.array_equal(got, want)
