"""BCS signing-message layout (service/bcs.py) byte-level tests.

Anchors:
- gamma_g2 compressed hex documented on-chain (keyless-common/src/types.rs:43-60)
  equals compress_g2(G2 generator) — pins the ark point compression that the
  BCS body is made of (already covered in test_tooling, re-checked here on
  the bcs path).
- structural pins: 160-byte body (32+64+32+32 — fixed arrays carry no BCS
  length prefix), 32-byte sha3 domain seed, EphemeralSignature enum framing
  (variant 0 + ULEB length 0x40).
"""

from keyless_zk_tpu.curves import ref_curve
from keyless_zk_tpu.fields import bn254
from keyless_zk_tpu.service import bcs


GAMMA_G2_HEX = (
    "edf692d95cbdde46ddda5ef7d422436779445c5e66006a42761e1f12efde0018"
    "c212f3aeb785e49712e7a9353349aaf1255dfb31b7bf60723a480d9293938e19"
)


def _proof_json():
    g1 = ref_curve.G1_GEN
    g2 = ref_curve.G2_GEN
    a = ref_curve.G1.mul(g1, 5)
    c = ref_curve.G1.mul(g1, 7)
    return {
        "pi_a": [str(a[0]), str(a[1]), "1"],
        "pi_b": [[str(g2[0][0]), str(g2[0][1])], [str(g2[1][0]), str(g2[1][1])], ["1", "0"]],
        "pi_c": [str(c[0]), str(c[1]), "1"],
        "protocol": "groth16",
    }


def test_uleb128():
    assert bcs.uleb128(0) == b"\x00"
    assert bcs.uleb128(64) == b"\x40"
    assert bcs.uleb128(127) == b"\x7f"
    assert bcs.uleb128(128) == b"\x80\x01"
    assert bcs.uleb128(300) == b"\xac\x02"


def test_seed_shape_and_domain():
    import hashlib

    assert len(bcs.GROTH16_PROOF_AND_STATEMENT_SEED) == 32
    assert bcs.GROTH16_PROOF_AND_STATEMENT_SEED == hashlib.sha3_256(
        b"APTOS::Groth16ProofAndStatement"
    ).digest()


def test_proof_and_statement_layout():
    pj = _proof_json()
    body = bcs.proof_and_statement_bcs(pj, 12345)
    assert len(body) == 160
    # pi_b is the standard G2 generator: its compressed bytes must equal the
    # documented on-chain gamma_g2 hex
    assert body[32:96].hex() == GAMMA_G2_HEX
    # statement tail: little-endian public inputs hash
    assert body[128:].hex() == (12345).to_bytes(32, "little").hex()
    # G1 generator x=1, y=2: y is not lexicographically largest -> no flags
    g1c = bcs.compress_g1(ref_curve.G1_GEN)
    assert g1c == (1).to_bytes(32, "little")
    assert bcs.compress_g1(None)[-1] == 0x40

    msg = bcs.proof_and_statement_signing_message(pj, 12345)
    assert msg == bcs.GROTH16_PROOF_AND_STATEMENT_SEED + body


def test_ephemeral_signature_roundtrip():
    sig = bytes(range(64))
    blob = bcs.ephemeral_signature_bcs(sig)
    assert blob[:2] == b"\x00\x40" and len(blob) == 66
    assert bcs.ephemeral_signature_from_bcs(blob) == sig


def test_y_largest_flag():
    # 5*G1 has a concrete y; flag must reflect y > q - y
    a = ref_curve.G1.mul(ref_curve.G1_GEN, 5)
    c = bcs.compress_g1(a)
    want_flag = 0x80 if a[1] > bn254.Q - a[1] else 0
    assert c[-1] & 0xC0 == want_flag
    x = int.from_bytes(c[:31] + bytes([c[31] & 0x3F]), "little")
    assert x == a[0]


def test_success_response_wire_shape():
    """Reference response shape (types.rs:43-57): compressed point arrays,
    hex LE public_inputs_hash, hex bcs(EphemeralSignature)."""
    from keyless_zk_tpu.service.bcs import ephemeral_signature_bcs
    from keyless_zk_tpu.service.types import success_response

    resp = success_response(_proof_json(), 12345, ephemeral_signature_bcs(bytes(64)).hex())
    assert sorted(resp) == ["proof", "public_inputs_hash", "training_wheels_signature"]
    assert len(resp["proof"]["a"]) == 32 and len(resp["proof"]["b"]) == 64
    assert len(resp["proof"]["c"]) == 32
    assert all(isinstance(v, int) for v in resp["proof"]["a"])
    assert bytes.fromhex(resp["public_inputs_hash"]) == (12345).to_bytes(32, "little")
    blob = bytes.fromhex(resp["training_wheels_signature"])
    assert blob[:2] == b"\x00\x40" and len(blob) == 66
    # pi_b bytes in the response equal the documented gamma_g2 compression
    assert bytes(resp["proof"]["b"]).hex() == GAMMA_G2_HEX
