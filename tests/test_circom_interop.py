"""Circom-setup interop: witnesses in circom wire order (SURVEY M5).

Anchors against the reference's own circom-produced artifacts
(prover-service/resources/toy_circuit/): our solver must reproduce
`toy.wtns` bit-for-bit from `toy_input.json` + `toy.r1cs`, and a proof
under the snarkjs `toy_1.zkey` built from OUR witness must verify against
`toy_vk.json`.
"""

import json

import numpy as np
import pytest

TOY = "/root/reference/prover-service/resources/toy_circuit"


def test_solver_reproduces_reference_wtns():
    from keyless_zk_tpu.circuits.circom_interop import witness_from_input_json
    from keyless_zk_tpu.groth16.wtns import load_wtns
    from keyless_zk_tpu.fields.limbs import limbs_to_ints

    w = witness_from_input_json(f"{TOY}/toy.r1cs", f"{TOY}/toy_input.json")
    ref = limbs_to_ints(load_wtns(f"{TOY}/toy.wtns").values)
    assert list(w) == list(ref)


def test_sym_table_mapping(tmp_path):
    from keyless_zk_tpu.circuits.circom_interop import (
        input_assignments,
        load_r1cs,
        load_sym,
        solve_witness,
    )

    # hand-written .sym in circom's format for the toy circuit; `c` was
    # substituted out by the compiler (the .r1cs has only 3 wires), which
    # circom reports as wire -1 — the parser must skip it
    sym = tmp_path / "toy.sym"
    sym.write_text("1,1,0,main.a\n2,2,0,main.b\n3,-1,0,main.c\n")
    table = load_sym(str(sym))
    assert table == {"main.a": 1, "main.b": 2}

    r1cs = load_r1cs(f"{TOY}/toy.r1cs")
    known = input_assignments(r1cs, {"b": 3, "a": 2}, sym=table)  # order-proof
    w = solve_witness(r1cs, known)
    assert list(w) == [1, 2, 3]


def test_solver_detects_violation():
    from keyless_zk_tpu.circuits.circom_interop import (
        input_assignments,
        load_r1cs,
        solve_witness,
    )

    r1cs = load_r1cs(f"{TOY}/toy.r1cs")
    known = input_assignments(r1cs, {"a": 2, "b": 4})  # a*b != 6
    with pytest.raises(ValueError, match="violated"):
        solve_witness(r1cs, known)


@pytest.mark.slow
def test_prove_under_snarkjs_zkey_with_our_witness():
    """End-to-end: snarkjs zkey + our circom-wire-order witness -> proof
    verifying under the snarkjs VK (fullprover.cpp:164-250 parity)."""
    from keyless_zk_tpu.circuits.circom_interop import witness_from_input_json
    from keyless_zk_tpu.fields.limbs import ints_to_limbs
    from keyless_zk_tpu.groth16.pairing import verify_groth16
    from keyless_zk_tpu.groth16.prover import Groth16Prover
    from keyless_zk_tpu.groth16.zkey import load_zkey

    w = witness_from_input_json(f"{TOY}/toy.r1cs", f"{TOY}/toy_input.json")
    pk = load_zkey(f"{TOY}/toy_1.zkey")
    proof = Groth16Prover(pk).prove(ints_to_limbs([int(x) for x in w]))
    vk = json.load(open(f"{TOY}/toy_vk.json"))
    public_inputs = [int(w[i]) for i in range(1, 1 + pk.n_public)]
    assert verify_groth16(vk, public_inputs, proof.to_json_dict())
