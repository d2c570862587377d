"""Groth16 engine tests against the reference toy-circuit artifacts.

The toy setup (a*b === c with one public input) ships with the reference at
prover-service/resources/toy_circuit/ and is its own prover smoke test
(prover-service/src/tests/prover_handler.rs:279-290). Proving under its
zkey and verifying against its snarkjs VK exercises every layer: binfile
parsing, Montgomery codecs, MSM, the coset-NTT pipeline, segment-sum
scatter, the blinding tail, and the pairing verifier.
"""

import json
import os

import numpy as np
import pytest

TOY = "/root/reference/prover-service/resources/toy_circuit/"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TOY), reason="reference toy artifacts unavailable"
)


def _load():
    from keyless_zk_tpu.groth16 import load_wtns, load_zkey

    return load_zkey(TOY + "toy_1.zkey"), load_wtns(TOY + "toy.wtns")


def test_zkey_header_and_vk():
    from keyless_zk_tpu.fields import bn254
    from keyless_zk_tpu.curves import ref_curve

    pk, w = _load()
    assert pk.q == bn254.Q and pk.r == bn254.R_SCALAR
    assert w.prime == bn254.R_SCALAR
    assert pk.n_vars == w.n_vars

    vk = json.load(open(TOY + "toy_vk.json"))
    assert pk.vk_alpha1 == (int(vk["vk_alpha_1"][0]), int(vk["vk_alpha_1"][1]))
    assert pk.vk_delta2 == (
        (int(vk["vk_delta_2"][0][0]), int(vk["vk_delta_2"][0][1])),
        (int(vk["vk_delta_2"][1][0]), int(vk["vk_delta_2"][1][1])),
    )
    # all parsed points must be on their curves (standard form spot check)
    assert ref_curve.G1.is_on_curve(pk.vk_beta1)
    assert ref_curve.G2.is_on_curve(pk.vk_beta2)
    assert ref_curve.G2.is_on_curve(pk.vk_gamma2)


def test_point_tables_on_curve():
    from keyless_zk_tpu.curves import ref_curve
    from keyless_zk_tpu.fields import bn254
    from keyless_zk_tpu.fields.limbs import limbs_to_ints

    pk, _ = _load()
    r_inv = pow(1 << 256, -1, bn254.Q)
    for table in (pk.points_a, pk.points_b1, pk.points_c, pk.points_h):
        xs = limbs_to_ints(table.x)
        ys = limbs_to_ints(table.y)
        for x, y, inf in zip(xs, ys, table.inf):
            if not inf:
                assert ref_curve.G1.is_on_curve((x * r_inv % bn254.Q, y * r_inv % bn254.Q))


def test_wtns_roundtrip(tmp_path):
    from keyless_zk_tpu.groth16 import load_wtns, save_wtns

    _, w = _load()
    p = tmp_path / "roundtrip.wtns"
    save_wtns(str(p), w)
    w2 = load_wtns(str(p))
    assert w2.prime == w.prime and w2.n_vars == w.n_vars
    assert np.array_equal(w2.values, w.values)


def test_toy_prove_and_verify():
    from keyless_zk_tpu.fields.limbs import limbs_to_ints
    from keyless_zk_tpu.groth16 import Groth16Prover, verify_groth16

    pk, w = _load()
    prover = Groth16Prover(pk)
    proof = prover.prove(w.values, r=12345, s=67890)
    vk = json.load(open(TOY + "toy_vk.json"))
    pub = limbs_to_ints(w.values[1 : 1 + pk.n_public])
    assert verify_groth16(vk, pub, proof.to_json_dict())
    # tampered proof must fail
    bad = proof.to_json_dict()
    bad["pi_a"][0] = str(int(bad["pi_a"][0]) + 1)
    assert not verify_groth16(vk, pub, bad)
