"""Synthetic JWT fixture shared by circuit/service tests.

Plays the role of the reference's TestJWTPayload + ProofTestCase builders
(prover-service/src/tests/types.rs:47-255): a fresh RSA-2048 keypair signs
a crafted JWT whose nonce commits to the test ephemeral pubkey.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from keyless_zk_tpu.input_processing.hashing import compute_nonce
from keyless_zk_tpu.input_processing.jwt import DecodedJWT, JwtParts, b64url_encode
from keyless_zk_tpu.input_processing.types import VerifiedInput

EPK_BYTES = bytes([0x00, 0x20]) + bytes(range(32))  # fake BCS ed25519 epk
EPK_BLINDER = 42
PEPPER = 76
EXP_DATE = 1700005000
EXP_HORIZON = 10_000_000
IAT = 1700000000


@dataclass
class TestJwt:
    vi: VerifiedInput
    rsa_key: object
    jwt_str: str


def make_test_jwt(
    iss: str = "test.oidc.provider",
    aud: str = "test-aud",
    uid_key: str = "sub",
    uid_val: str = "user-1",
    extra_field: str | None = None,
    kid: str = "test-kid-01",
    payload_extras: dict | None = None,
    idc_aud: str | None = None,
    skip_aud_checks: bool = False,
) -> TestJwt:
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import padding, rsa

    nonce = compute_nonce(EXP_DATE, EPK_BYTES, EPK_BLINDER)
    payload = {
        "iss": iss,
        "aud": aud,
        uid_key: uid_val,
        "iat": IAT,
        "nonce": str(nonce),
    }
    if uid_key == "email":
        payload["email_verified"] = True
    if payload_extras:
        payload.update(payload_extras)

    header_json = json.dumps(
        {"alg": "RS256", "typ": "JWT", "kid": kid}, separators=(",", ":")
    )
    payload_json = json.dumps(payload, separators=(",", ":"))
    unsigned = b64url_encode(header_json.encode()) + "." + b64url_encode(payload_json.encode())

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    sig = key.sign(unsigned.encode(), padding.PKCS1v15(), hashes.SHA256())
    jwt_str = unsigned + "." + b64url_encode(sig)

    vi = VerifiedInput(
        jwt=DecodedJWT.from_b64(jwt_str),
        jwt_parts=JwtParts.from_b64(jwt_str),
        pubkey_modulus=key.public_key().public_numbers().n,
        epk_bytes=EPK_BYTES,
        epk_blinder_fr=EPK_BLINDER,
        exp_date_secs=EXP_DATE,
        exp_horizon_secs=EXP_HORIZON,
        pepper_fr=PEPPER,
        uid_key=uid_key,
        uid_val=uid_val,
        extra_field=extra_field,
        idc_aud=idc_aud,
        skip_aud_checks=skip_aud_checks,
    )
    return TestJwt(vi=vi, rsa_key=key, jwt_str=jwt_str)
