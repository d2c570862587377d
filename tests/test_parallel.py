"""Sharded kernels over the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax

from keyless_zk_tpu.curves import ref_curve
from keyless_zk_tpu.curves.jacobian import G1_CURVE
from keyless_zk_tpu.fields import bn254
from keyless_zk_tpu.fields import jax_field as jf
from keyless_zk_tpu.fields.jax_field import FR
from keyless_zk_tpu.fields.limbs import limbs_to_ints
from keyless_zk_tpu.ops.ntt import get_plan
from keyless_zk_tpu.parallel import make_mesh, sharded_msm, sharded_ntt_batch


@pytest.mark.slow
def test_sharded_msm_matches_host():
    n_dev = len(jax.devices())
    assert n_dev == 8
    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(11)
    n = 8 * n_dev
    scalars = [int(x) % bn254.R_SCALAR for x in rng.integers(1, 1 << 63, n) ** 2]
    pts = [ref_curve.G1.mul(ref_curve.G1_GEN, int(k)) for k in rng.integers(1, 1 << 30, n)]
    px, py, pinf = G1_CURVE.encode_affine(pts)
    out = sharded_msm(px, py, pinf, jf.encode_ints(scalars, FR), curve=G1_CURVE, mesh=mesh)
    got = G1_CURVE.decode_jacobian(type(out)(*jax.tree.map(lambda v: v[None], out)))[0]
    assert got == ref_curve.G1.msm(scalars, pts)


@pytest.mark.slow
def test_sharded_ntt_batch_matches_single():
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    domain_pow = 3
    n = 1 << domain_pow
    rng = np.random.default_rng(12)
    vals = [int(x) % bn254.R_SCALAR for x in rng.integers(1, 1 << 62, n_dev * n)]
    polys = jf.encode_ints(vals, FR, mont=True).reshape(n_dev, n, 16)
    out = sharded_ntt_batch(polys, domain_pow=domain_pow, mesh=mesh)
    plan = get_plan(domain_pow)
    want = plan.ntt(polys)
    assert np.array_equal(np.asarray(out), np.asarray(want))


@pytest.mark.slow
def test_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


@pytest.mark.slow
def test_four_step_ntt_matches_single():
    """Intra-transform sharding (four-step, one all-to-all) vs one-device NTT."""
    from keyless_zk_tpu.parallel.sharded import four_step_ntt

    mesh = make_mesh(len(jax.devices()))
    domain_pow = 10
    n = 1 << domain_pow
    rng = np.random.default_rng(13)
    vals = [int(x) % bn254.R_SCALAR for x in rng.integers(1, 1 << 62, n)]
    x = jf.encode_ints(vals, FR, mont=True)
    plan = get_plan(domain_pow)

    got = four_step_ntt(x, domain_pow=domain_pow, mesh=mesh)
    want = plan.ntt(x)
    assert np.array_equal(np.asarray(got), np.asarray(want))

    gotI = four_step_ntt(x, domain_pow=domain_pow, mesh=mesh, inverse=True)
    wantI = plan.intt(x)
    assert np.array_equal(np.asarray(gotI), np.asarray(wantI))


def test_distributed_single_process_fallback():
    from keyless_zk_tpu.parallel import distributed

    assert distributed.initialize() is False  # no coordinator configured
    mesh = distributed.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    s, e = distributed.local_batch_slice(10)
    assert (s, e) == (0, 10)  # one process owns the whole batch


@pytest.mark.slow
def test_sharded_prover_matches_single_chip():
    """Full prove step sharded over the mesh (5 sharded MSMs + four-step
    NTTs) must produce the exact proof of the single-device prover for the
    same blinding, and verify."""
    from keyless_zk_tpu.circuits import ConstraintSystem, groth16_setup
    from keyless_zk_tpu.circuits.r1cs_file import r1cs_from_cs
    from keyless_zk_tpu.groth16 import Groth16Prover, verify_groth16
    from keyless_zk_tpu.parallel.sharded_prover import ShardedGroth16Prover

    cs = ConstraintSystem()
    a = cs.public_wire()
    cs.set_input_hint([a], "a")
    b = cs.new_wire()
    cs.set_input_hint([b], "b")
    x = b
    for _ in range(100):  # a == b^101: 101 constraints -> domain 128
        x = cs.mul(cs.lc(x), cs.lc(b))
    cs.constrain_eq(cs.lc(x), cs.lc(a))

    w = cs.compute_witness(a=pow(3, 101, bn254.R_SCALAR), b=3)
    assert cs.check_witness(w) is None

    res = groth16_setup(
        r1cs_from_cs(cs), toxic={"tau": 999, "alpha": 3, "beta": 4, "gamma": 5, "delta": 6}
    )
    mesh = make_mesh(len(jax.devices()))
    sharded = ShardedGroth16Prover(res.pk, mesh)
    proof = sharded.prove(cs.witness_np(w), r=7, s=8)
    assert verify_groth16(res.vk, [w[a]], proof.to_json_dict())

    single = Groth16Prover(res.pk).prove(cs.witness_np(w), r=7, s=8)
    assert proof.to_json_dict() == single.to_json_dict()
