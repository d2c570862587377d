"""Fused-MSM orchestration vs host reference, with kernels simulated.

Monkeypatches the five Pallas kernel entry points (ops/pallas_msm.py) with
their portable XLA contract simulators (ops/msm_sim.py) and runs the full
`_msm_pippenger_fused` pipeline on CPU. This covers everything in
ops/msm.py's fused path — signed digits, the batched sort, step-major
flattening, the interior-run emit-buffer gather, boundary bookkeeping —
bit-for-bit against the host integer curve. The Mosaic kernels themselves
are validated against the same contracts on hardware (test_pallas_msm.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from keyless_zk_tpu.curves import ref_curve
from keyless_zk_tpu.curves.jacobian import G1_CURVE, G2_CURVE, JacPoint
from keyless_zk_tpu.fields.jax_field import FR
from keyless_zk_tpu.fields.limbs import ints_to_limbs
from keyless_zk_tpu.ops import msm as M
from keyless_zk_tpu.ops import msm_sim


@pytest.fixture
def sim_kernels(monkeypatch):
    from keyless_zk_tpu.ops import pallas_msm

    for name in ("window_scan", "boundary_merge", "weighted_bucket_total", "horner_total"):
        monkeypatch.setattr(pallas_msm, name, getattr(msm_sim, name))


def _host_msm(group, pts, scalars):
    want = None
    for p, k in zip(pts, scalars):
        if p is None or k == 0:
            continue
        want = group.add(want, group.mul(p, k))
    return want


def _scalars(rng, n, p):
    vals = [int.from_bytes(rng.bytes(32), "little") % p for _ in range(n)]
    vals[0] = 0
    vals[1] = p - 1
    for i in range(0, n // 2, 3):
        vals[i] = vals[2]  # long equal-digit runs spanning lane boundaries
    return vals


@pytest.mark.slow
@pytest.mark.parametrize("n", [1000, 2048 + 17])
def test_fused_g1_matches_host(sim_kernels, n):
    rng = np.random.default_rng(21)
    pts = [ref_curve.G1.mul(ref_curve.G1_GEN, 1 + int(k)) for k in rng.integers(0, 1 << 40, n)]
    pts[5] = None
    vals = _scalars(rng, n, FR.p)
    px, py, pinf = G1_CURVE.encode_affine(pts)
    Wn = -(-M.SCALAR_BITS // 8)
    cap = 1 << (Wn * n - 1).bit_length()
    # chunk < cap on the second size: exercises the cross-chunk stream
    # path (chunk boundaries must behave exactly like lane boundaries)
    chunk = cap if n == 1000 else cap // 4
    got = M._msm_pippenger_fused(
        px, py, pinf, jnp.asarray(ints_to_limbs(vals)),
        tag="fq", c=8, v=1024, cap=cap, chunk=chunk, assume_distinct=True,
    )
    [dec] = G1_CURVE.decode_jacobian(JacPoint(got.x[None], got.y[None], got.z[None]))
    assert dec == _host_msm(ref_curve.G1, pts, vals)


@pytest.mark.slow
def test_fused_g2_matches_host(sim_kernels):
    n = 1000
    rng = np.random.default_rng(22)
    pts = [ref_curve.G2.mul(ref_curve.G2_GEN, 1 + int(k)) for k in rng.integers(0, 1 << 40, n)]
    pts[7] = None
    vals = _scalars(rng, n, FR.p)
    px, py, pinf = G2_CURVE.encode_affine(pts)
    Wn = -(-M.SCALAR_BITS // 8)
    cap = 1 << (Wn * n - 1).bit_length()
    got = M._msm_pippenger_fused(
        px, py, pinf, jnp.asarray(ints_to_limbs(vals)),
        tag="fq2", c=8, v=1024, cap=cap, chunk=cap, assume_distinct=True,
    )
    [dec] = G2_CURVE.decode_jacobian(
        JacPoint(got.x[None], got.y[None], got.z[None])
    )
    assert dec == _host_msm(ref_curve.G2, pts, vals)


@pytest.mark.slow
def test_fused_compacted_sparse_matches_host(sim_kernels):
    """Bit-heavy scalars (the keyless witness shape) with cap << Wn*n:
    compaction must drop only zero-digit slots."""
    n = 1500
    rng = np.random.default_rng(23)
    pts = [ref_curve.G1.mul(ref_curve.G1_GEN, 1 + int(k)) for k in rng.integers(0, 1 << 40, n)]
    vals = [int(rng.integers(0, 2)) for _ in range(n)]  # bits
    for i in range(0, n, 7):  # sprinkle full-range scalars
        vals[i] = int.from_bytes(rng.bytes(32), "little") % FR.p
    px, py, pinf = G1_CURVE.encode_affine(pts)
    sc = jnp.asarray(ints_to_limbs(vals))
    c = 8
    nnz = int(M._count_nonzero_digits(sc, c=c))
    Wn = -(-M.SCALAR_BITS // c)
    assert nnz < Wn * n // 2  # compaction actually engages
    cap = 1 << max((nnz - 1).bit_length(), 10)
    got = M._msm_pippenger_fused(
        px, py, pinf, sc,
        tag="fq", c=c, v=1024, cap=cap, chunk=cap, assume_distinct=True,
    )
    [dec] = G1_CURVE.decode_jacobian(JacPoint(got.x[None], got.y[None], got.z[None]))
    assert dec == _host_msm(ref_curve.G1, pts, vals)


@pytest.mark.slow
def test_fused_batched_matches_host(sim_kernels):
    """batch=3 scalar vectors against one table == 3 host MSMs (the
    BatchProver device sweep: one sort/scan, batch-offset bucket ids)."""
    n = 700
    B = 3
    rng = np.random.default_rng(31)
    pts = [ref_curve.G1.mul(ref_curve.G1_GEN, 1 + int(k)) for k in rng.integers(0, 1 << 40, n)]
    pts[4] = None
    vecs = [_scalars(rng, n, FR.p) for _ in range(B)]
    vecs[1] = [int(rng.integers(0, 2)) for _ in range(n)]  # sparse element
    px, py, pinf = G1_CURVE.encode_affine(pts)
    sc = jnp.stack([jnp.asarray(ints_to_limbs(v)) for v in vecs])
    c = 8
    Wn = -(-M.SCALAR_BITS // c)
    cap = 1 << (B * Wn * n - 1).bit_length()
    got = M._msm_pippenger_fused(
        px, py, pinf, sc,
        tag="fq", c=c, v=1024, cap=cap, chunk=cap // 2,
        assume_distinct=True, batch=B,
    )
    for b in range(B):
        [dec] = G1_CURVE.decode_jacobian(
            JacPoint(got.x[b][None], got.y[b][None], got.z[b][None])
        )
        assert dec == _host_msm(ref_curve.G1, pts, vecs[b]), f"batch element {b}"
