"""Fused Pallas MSM path — on-hardware validation.

These tests need a real TPU: Mosaic compiles the fused kernels, and
interpret mode is unusable here — the dynamic-roll interpret graphs send
XLA:CPU's compiler into tens-of-minutes territory on the CPU test box, so
the suite (which forces the CPU backend, conftest.py) skips them.

On-hardware coverage of the same path: scripts/check_msm_tpu.py compares
the full fused msm() against the host reference curve, and the driver's
bench run exercises it at 2^16. The XLA Pippenger (`_msm_pippenger`) that
the fused path mirrors stage-for-stage is covered on CPU by test_msm.py.
"""

import numpy as np
import pytest

import jax


needs_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="fused MSM kernels need Mosaic/TPU"
)


@needs_tpu
def test_fused_msm_matches_host_reference():
    import jax.numpy as jnp

    from keyless_zk_tpu.curves import ref_curve
    from keyless_zk_tpu.curves.jacobian import G1_CURVE, JacPoint
    from keyless_zk_tpu.fields.jax_field import FR
    from keyless_zk_tpu.fields.limbs import ints_to_limbs
    from keyless_zk_tpu.ops import msm as M

    n = 1 << 12
    rng = np.random.default_rng(7)
    pts = [ref_curve.G1.mul(ref_curve.G1_GEN, int(k)) for k in rng.integers(1, 1 << 30, n)]
    pts[3] = None
    scalars = [int(x) % FR.p for x in rng.integers(0, 1 << 62, n)]
    scalars[0] = 0
    for i in range(0, n, 5):
        scalars[i] = scalars[1]  # digit collisions
    px, py, pinf = G1_CURVE.encode_affine(pts)
    slimbs = jnp.asarray(ints_to_limbs(scalars))

    want = None
    for p, k in zip(pts, scalars):
        if p is None or k == 0:
            continue
        want = ref_curve.G1.add(want, ref_curve.G1.mul(p, k))

    for lanes in (4096, 1024):  # L == 1 and L == 4 paths
        got = M.msm(px, py, pinf, slimbs, curve=G1_CURVE, lanes=lanes)
        [dec] = G1_CURVE.decode_jacobian(JacPoint(got.x[None], got.y[None], got.z[None]))
        assert dec == want, f"lanes={lanes}"
