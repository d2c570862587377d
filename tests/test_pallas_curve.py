"""Fused Pallas G1 kernels vs the XLA Jacobian group law (interpreter mode)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode Mosaic kernels: XLA:CPU compile is minutes-scale


def _rand_points(n, rng):
    from keyless_zk_tpu.curves import ref_curve
    from keyless_zk_tpu.curves.jacobian import G1_CURVE

    pts = [ref_curve.G1.mul(ref_curve.G1_GEN, int(k)) for k in rng.integers(1, 1 << 30, n)]
    return G1_CURVE.encode_affine(pts)


def test_pallas_madd_and_dbl_match_xla():
    import jax.numpy as jnp

    from keyless_zk_tpu.curves.jacobian import G1_CURVE, JacPoint
    from keyless_zk_tpu.ops import pallas_curve

    pallas_curve._INTERPRET = True
    try:
        rng = np.random.default_rng(3)
        n = 64
        px, py, pinf = _rand_points(n, rng)
        qx, qy, qinf = _rand_points(n, rng)
        # force edge cases: infinity acc, infinity q, P == Q (doubling), P == -Q
        pinf = pinf.at[0].set(True)
        qinf = qinf.at[1].set(True)
        qx = qx.at[2].set(px[2]); qy = qy.at[2].set(py[2])  # P == Q
        from keyless_zk_tpu.fields import jax_field as jf
        from keyless_zk_tpu.fields.jax_field import FQ
        qx = qx.at[3].set(px[3]); qy = qy.at[3].set(jf.neg(py[3:4], FQ)[0])  # P == -Q
        pinf = pinf.at[4].set(True); qinf = qinf.at[4].set(True)  # both inf

        acc = G1_CURVE.from_affine(px, py, pinf)
        want = G1_CURVE.add_mixed(acc, qx, qy, qinf)
        got = pallas_curve.madd_pallas(acc, qx, qy, qinf)
        # compare as decoded affine points (z-coordinate representations differ
        # only projectively)
        w = G1_CURVE.decode_jacobian(want)
        g = G1_CURVE.decode_jacobian(got)
        assert w == g

        want_d = G1_CURVE.dbl(acc)
        got_d = pallas_curve.dbl_pallas(acc)
        assert G1_CURVE.decode_jacobian(want_d) == G1_CURVE.decode_jacobian(got_d)
    finally:
        pallas_curve._INTERPRET = False
