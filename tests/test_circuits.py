"""Native circuit framework tests: R1CS builder, .r1cs parsing, own setup.

Anchors against the reference toy artifacts
(prover-service/resources/toy_circuit/): the parsed toy.r1cs must
reproduce toy_1.zkey's coefficient table exactly, and proofs under our own
native setup must pass the pairing check — the full
circom-free equivalent of the reference's procurement + prove pipeline
(scripts/python/setups/testing_setup.py, tests/prover_handler.rs:279-290).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # builds/satisfies mid-size circuits

TOY = "/root/reference/prover-service/resources/toy_circuit/"

needs_toy = pytest.mark.skipif(
    not os.path.isdir(TOY), reason="reference toy artifacts unavailable"
)


def test_constraint_system_basics():
    from keyless_zk_tpu.circuits import ConstraintSystem

    cs = ConstraintSystem()
    a = cs.public_wire()
    cs.set_input_hint([a], "a")
    b = cs.new_wire()
    cs.set_input_hint([b], "b")
    c = cs.mul(cs.lc(a), cs.lc(b))
    cs.constrain_eq(cs.lc(c), cs.const(6))

    w = cs.compute_witness(a=2, b=3)
    assert w == [1, 2, 3, 6]
    assert cs.check_witness(w) is None
    bad = cs.compute_witness(a=2, b=4)
    assert cs.check_witness(bad) is not None


def test_to_bits_gadget():
    from keyless_zk_tpu.circuits import ConstraintSystem

    cs = ConstraintSystem()
    x = cs.new_wire()
    cs.set_input_hint([x], "x")
    bits = cs.to_bits(cs.lc(x), 8)
    w = cs.compute_witness(x=0b10110001)
    assert [w[b] for b in bits] == [1, 0, 0, 0, 1, 1, 0, 1]
    assert cs.check_witness(w) is None


@needs_toy
def test_parse_toy_r1cs():
    from keyless_zk_tpu.circuits.r1cs_file import load_r1cs
    from keyless_zk_tpu.fields import bn254
    from keyless_zk_tpu.groth16 import load_wtns

    r = load_r1cs(TOY + "toy.r1cs")
    assert r.prime == bn254.R_SCALAR
    w = load_wtns(TOY + "toy.wtns")
    assert w.n_vars == r.n_wires

    # the shipped witness satisfies the parsed system
    from keyless_zk_tpu.fields.limbs import limbs_to_ints

    wv = limbs_to_ints(w.values)
    p = bn254.R_SCALAR
    for q in range(r.n_constraints):
        ev = lambda row: sum(c * wv[i] for i, c in row.items()) % p
        assert ev(r.A[q]) * ev(r.B[q]) % p == ev(r.C[q])


@needs_toy
def test_r1cs_roundtrip(tmp_path):
    from keyless_zk_tpu.circuits.r1cs_file import load_r1cs, save_r1cs

    r = load_r1cs(TOY + "toy.r1cs")
    path = str(tmp_path / "rt.r1cs")
    save_r1cs(path, r)
    r2 = load_r1cs(path)
    assert (r2.n_wires, r2.n_public, r2.n_constraints) == (
        r.n_wires,
        r.n_public,
        r.n_constraints,
    )
    assert r2.A == r.A and r2.B == r.B and r2.C == r.C


@needs_toy
def test_setup_coef_table_matches_snarkjs():
    """Our setup's coefficient table == toy_1.zkey's (set-wise).

    The coef table is setup-randomness-independent (it is the R1CS A/B
    matrices plus binding rows), so snarkjs's table is an exact oracle for
    our matrix conventions.
    """
    from keyless_zk_tpu.circuits.r1cs_file import load_r1cs
    from keyless_zk_tpu.circuits.setup import groth16_setup
    from keyless_zk_tpu.fields import bn254
    from keyless_zk_tpu.fields.limbs import limbs_to_ints
    from keyless_zk_tpu.groth16 import load_zkey

    r = load_r1cs(TOY + "toy.r1cs")
    zk = load_zkey(TOY + "toy_1.zkey")
    res = groth16_setup(r, toxic={"tau": 7, "alpha": 11, "beta": 13, "gamma": 17, "delta": 19})
    pk = res.pk

    assert pk.n_vars == zk.n_vars
    assert pk.n_public == zk.n_public
    assert pk.domain_size == zk.domain_size
    assert pk.n_coefs == zk.n_coefs

    r_inv = pow(1 << 256, -1, bn254.R_SCALAR)

    def table(p):
        vals = limbs_to_ints(p.coef_val)
        return sorted(
            (int(m), int(c), int(s), v * r_inv % bn254.R_SCALAR)
            for m, c, s, v in zip(p.coef_m, p.coef_c, p.coef_s, vals)
        )

    assert table(pk) == table(zk)
    # table sizes match snarkjs exactly
    assert pk.points_a.x.shape == zk.points_a.x.shape
    assert pk.points_c.x.shape == zk.points_c.x.shape
    assert pk.points_h.x.shape == zk.points_h.x.shape


@needs_toy
def test_native_setup_prove_verify_toy():
    """Full circom/snarkjs-free pipeline on the toy relation."""
    from keyless_zk_tpu.circuits.r1cs_file import load_r1cs
    from keyless_zk_tpu.circuits.setup import groth16_setup
    from keyless_zk_tpu.fields.limbs import limbs_to_ints
    from keyless_zk_tpu.groth16 import Groth16Prover, load_wtns, verify_groth16

    r = load_r1cs(TOY + "toy.r1cs")
    res = groth16_setup(r, toxic={"tau": 1234, "alpha": 55, "beta": 66, "gamma": 77, "delta": 88})
    w = load_wtns(TOY + "toy.wtns")

    prover = Groth16Prover(res.pk)
    proof = prover.prove(w.values, r=42, s=43)
    pub = limbs_to_ints(w.values[1 : 1 + res.pk.n_public])
    assert verify_groth16(res.vk, pub, proof.to_json_dict())
    bad = proof.to_json_dict()
    bad["pi_c"][1] = str(int(bad["pi_c"][1]) + 1)
    assert not verify_groth16(res.vk, pub, bad)


def test_native_cs_end_to_end():
    """Build, setup, prove, verify a native ConstraintSystem (no reference
    artifacts involved anywhere)."""
    from keyless_zk_tpu.circuits import ConstraintSystem, groth16_setup
    from keyless_zk_tpu.circuits.r1cs_file import r1cs_from_cs
    from keyless_zk_tpu.fields.limbs import limbs_to_ints
    from keyless_zk_tpu.groth16 import Groth16Prover, verify_groth16

    cs = ConstraintSystem()
    a = cs.public_wire()
    cs.set_input_hint([a], "a")
    b = cs.new_wire()
    cs.set_input_hint([b], "b")
    # prove knowledge of b with a == b^3 + b + 5
    b2 = cs.mul(cs.lc(b), cs.lc(b))
    b3 = cs.mul(cs.lc(b2), cs.lc(b))
    cs.constrain_eq(cs.lc(b3) + cs.lc(b) + cs.const(5), cs.lc(a))

    w = cs.compute_witness(a=3**3 + 3 + 5, b=3)
    assert cs.check_witness(w) is None

    res = groth16_setup(
        r1cs_from_cs(cs), toxic={"tau": 999, "alpha": 3, "beta": 4, "gamma": 5, "delta": 6}
    )
    prover = Groth16Prover(res.pk)
    proof = prover.prove(cs.witness_np(w), r=7, s=8)
    assert verify_groth16(res.vk, [w[a]], proof.to_json_dict())
    assert not verify_groth16(res.vk, [w[a] + 1], proof.to_json_dict())
