"""Native C pairing (native/bn254_pairing.c) vs the pure-Python tower.

The Python verifier (groth16/pairing.py) is the independent oracle: the
native library must agree with it on full pairing values (same tower
basis), bilinearity products, and Groth16 verification outcomes.
"""

import json
import random

import pytest

from keyless_zk_tpu.curves import ref_curve
from keyless_zk_tpu.fields import bn254
from keyless_zk_tpu.groth16 import pairing as pp
from keyless_zk_tpu.groth16 import pairing_native as pn

pytestmark = pytest.mark.skipif(not pn.available(), reason="gcc/native build unavailable")

TOY = "/root/reference/prover-service/resources/toy_circuit"


def test_fq_mul_differential():
    rng = random.Random(1)
    for _ in range(100):
        a, b = rng.randrange(bn254.Q), rng.randrange(bn254.Q)
        assert pn.fq_mul_test(a, b) == a * b % bn254.Q


def test_pairing_value_matches_python():
    """Full e(G1, G2) equals the Python FQ12 value after basis conversion
    (w^6 = 9+u in both towers; ours stores (a, b) per w^i with u = w^6-9)."""
    g1, g2 = ref_curve.G1_GEN, ref_curve.G2_GEN
    mine = pn.pairing(g1, g2)
    ref = pp.pairing(g2, g1, final_exp=True)
    co = [0] * 12
    for i in range(6):
        a, b = mine[i]
        co[i] = (a - 9 * b) % bn254.Q
        co[i + 6] = b % bn254.Q
    assert tuple(co) == ref.c


def test_bilinearity_products():
    G1, G2 = ref_curve.G1, ref_curve.G2
    g1, g2 = ref_curve.G1_GEN, ref_curve.G2_GEN
    rng = random.Random(7)
    for _ in range(3):
        a, b = rng.randrange(1, 1 << 60), rng.randrange(1, 1 << 60)
        P, Qp = G1.mul(g1, a), G2.mul(g2, b)
        nab = G1.neg(G1.mul(g1, a * b))
        assert pn.pairing_check([(P, Qp), (nab, g2)])
        assert not pn.pairing_check([(P, Qp), (G1.neg(G1.mul(g1, a * b + 1)), g2)])
    # infinity pairs are skipped (e(O, Q) = 1)
    assert pn.pairing_check([(None, g2), (g1, None)])


def test_groth16_verify_native_and_python_agree():
    vk = json.load(open(f"{TOY}/toy_vk.json"))
    proof = {
        "pi_a": ["19752960375546761713063621697917555601190324224392061988530181264956062557007",
                  "3680708583043086106257066605481404758157275279792672477407758280053192312553", "1"],
        "pi_b": [["21083888279312532872305623476201001732512104747074667230135379463725867801867",
                   "17449390502036574557839703409234249271648311922007686838653371851897856178092"],
                  ["20473272527826501933220915471870336745207134779467219942669738638875180322367",
                   "15374782284516409640548162252074764366246935481992459564187884508590005764275"],
                  ["1", "0"]],
        "pi_c": ["21820135442271429300481624027131901785354684504999551210316129700243634134",
                  "9348377870127766300268815512655827957604498501108753744431742564669765896762", "1"],
        "protocol": "groth16",
    }
    # verify_groth16 routes through the native path when available
    assert pp.verify_groth16(vk, [2], proof)
    bad = dict(proof, pi_c=[proof["pi_a"][0], proof["pi_a"][1], "1"])
    assert not pp.verify_groth16(vk, [2], bad)
    # cross-check the python fallback on the same inputs
    def g1(v):
        x, y = int(v[0]), int(v[1])
        return None if x == 0 and y == 0 else (x, y)

    def g2(v):
        return ((int(v[0][0]), int(v[0][1])), (int(v[1][0]), int(v[1][1])))

    ic = [g1(p) for p in vk["IC"]]
    acc = pp._add(ic[0], pp.multiply(ic[1], 2))
    pairs = [
        (pp.g1_neg(g1(proof["pi_a"])), g2(proof["pi_b"])),
        (g1(vk["vk_alpha_1"]), g2(vk["vk_beta_2"])),
        (acc, g2(vk["vk_gamma_2"])),
        (g1(proof["pi_c"]), g2(vk["vk_delta_2"])),
    ]
    assert pp.pairing_product_is_one(pairs) == pn.pairing_check(pairs)
