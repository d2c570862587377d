"""MSM kernels vs the host-int reference implementation."""

import numpy as np
import pytest

from keyless_zk_tpu.curves import ref_curve
from keyless_zk_tpu.curves.jacobian import G1_CURVE, G2_CURVE
from keyless_zk_tpu.fields import bn254
from keyless_zk_tpu.fields import jax_field as jf
from keyless_zk_tpu.fields.jax_field import FR
from keyless_zk_tpu.ops.msm import extract_digits, msm


def _rand_scalars(rng, n):
    return [int(x) % bn254.R_SCALAR for x in rng.integers(1, 1 << 63, n) ** 2]


def _rand_points(rng, n, group=ref_curve.G1, gen=ref_curve.G1_GEN):
    return [group.mul(gen, int(k)) for k in rng.integers(1, 1 << 30, n)]


def test_extract_digits_roundtrip():
    rng = np.random.default_rng(3)
    vals = _rand_scalars(rng, 5)
    arr = jf.encode_ints(vals, FR)
    for c in (13, 16):
        digits = np.asarray(extract_digits(arr, c))
        for i, v in enumerate(vals):
            rec = sum(int(digits[w, i]) << (c * w) for w in range(digits.shape[0]))
            assert rec == v


@pytest.mark.slow
def test_msm_small_path():
    rng = np.random.default_rng(4)
    n = 7
    scalars = _rand_scalars(rng, n)
    pts = _rand_points(rng, n)
    pts[3] = None  # include an infinity
    px, py, pinf = G1_CURVE.encode_affine(pts)
    out = msm(px, py, pinf, jf.encode_ints(scalars, FR), curve=G1_CURVE)
    got = G1_CURVE.decode_jacobian(_as_batch(out))[0]
    assert got == ref_curve.G1.msm(scalars, pts)


@pytest.mark.slow
def test_msm_pippenger_path():
    rng = np.random.default_rng(5)
    n = 300
    scalars = _rand_scalars(rng, n)
    scalars[0] = 0  # zero scalar
    pts = _rand_points(rng, n)
    pts[1] = None
    px, py, pinf = G1_CURVE.encode_affine(pts)
    out = msm(
        px, py, pinf, jf.encode_ints(scalars, FR), curve=G1_CURVE,
        c=13, lanes=32, small_threshold=0,
    )
    got = G1_CURVE.decode_jacobian(_as_batch(out))[0]
    assert got == ref_curve.G1.msm(scalars, pts)


@pytest.mark.slow
def test_msm_g2_small():
    rng = np.random.default_rng(6)
    n = 4
    scalars = _rand_scalars(rng, n)
    pts = _rand_points(rng, n, ref_curve.G2, ref_curve.G2_GEN)
    px, py, pinf = G2_CURVE.encode_affine(pts)
    out = msm(px, py, pinf, jf.encode_ints(scalars, FR), curve=G2_CURVE)
    got = G2_CURVE.decode_jacobian(_as_batch(out))[0]
    assert got == ref_curve.G2.msm(scalars, pts)


def test_segment_sum_mod():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    n, segs = 64, 10
    vals = _rand_scalars(rng, n)
    ids = np.sort(rng.integers(0, segs, n)).astype(np.int32)
    # pre-scale by R so the trailing REDC cancels (see segment_sum_mod doc)
    pre = jf.mont_mul(
        jf.encode_ints(vals, FR), jf.consts(FR, FR.r2_mod_p), FR
    )
    out = jf.segment_sum_mod(pre, jnp.asarray(ids), segs, FR)
    got = jf.decode_ints(out, FR)
    for k in range(segs):
        want = sum(v for v, i in zip(vals, ids) if i == k) % bn254.R_SCALAR
        assert got[k] == want


def _as_batch(pt):
    import jax

    return type(pt)(*jax.tree.map(lambda v: v[None], pt))
