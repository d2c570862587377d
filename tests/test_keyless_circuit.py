"""End-to-end keyless relation test at a scaled-down parameterization.

The native analog of the reference's full-circuit satisfiability tests:
derive the ~70 input signals from a synthetic RS256 JWT
(input_signals.rs:18-96 mirror), evaluate the witness through the native
keyless ConstraintSystem, and check (a) all constraints hold, (b) the
in-circuit Poseidon(14) equals the host-derived public-inputs hash, and
(c) tampered inputs violate constraints.
"""

import pytest

from keyless_zk_tpu.circuits.keyless_circuit import (
    KeylessConfig,
    build_keyless_circuit,
    to_circuit_config,
    witness_kwargs,
)
from keyless_zk_tpu.input_processing.input_signals import derive_circuit_input_signals

from jwt_fixture import make_test_jwt

# Scaled-down but structurally identical parameterization (4 SHA blocks).
# aud value max stays in [94, 124] so the circuit's chunk count matches the
# host's fixed MAX_AUD_VAL_BYTES=115 packing (public_inputs_hash.rs).
SMALL = KeylessConfig(
    max_b64u_jwt_no_sig_len=384,
    max_b64u_jwt_header_w_dot_len=64,
    max_b64u_jwt_payload_sha2_padded_len=320,
    max_aud_kv_pair_len=128,
    max_aud_name_len=8,
    max_aud_value_len=116,
    max_iss_kv_pair_len=32,
    max_iss_name_len=8,
    max_iss_value_len=24,
    max_iat_kv_pair_len=32,
    max_iat_name_len=8,
    max_iat_value_len=24,
    max_nonce_kv_pair_len=96,
    max_nonce_name_len=8,
    max_nonce_value_len=80,
    max_ev_kv_pair_len=30,
    max_ev_name_len=20,
    max_ev_value_len=10,
    max_uid_kv_pair_len=32,
    max_uid_name_len=12,
    max_uid_value_len=24,
    max_extra_kv_pair_len=24,
)


@pytest.fixture(scope="module")
def small_circuit():
    return build_keyless_circuit(SMALL)


def _signals(tj):
    cc = to_circuit_config(SMALL)
    return derive_circuit_input_signals(cc, tj.vi)


def test_keyless_satisfiable_sub(small_circuit):
    cs = small_circuit
    tj = make_test_jwt()
    signals, pub_hash = _signals(tj)
    w = cs.compute_witness(**witness_kwargs(signals))
    bad = cs.check_witness(w)
    assert bad is None, f"constraint {bad} violated"
    assert w[1] == pub_hash  # the single public input

    # tampered public input -> the Poseidon(14) equality breaks
    w[1] = (w[1] + 1) % (1 << 250)
    assert cs.check_witness(w) is not None


def test_keyless_satisfiable_email_uid(small_circuit):
    cs = small_circuit
    tj = make_test_jwt(uid_key="email", uid_val="a@b.io")
    signals, pub_hash = _signals(tj)
    w = cs.compute_witness(**witness_kwargs(signals))
    assert cs.check_witness(w) is None
    assert w[1] == pub_hash


def test_keyless_wrong_nonce_fails(small_circuit):
    cs = small_circuit
    tj = make_test_jwt()
    signals, _ = _signals(tj)
    kw = witness_kwargs(signals)
    kw["epk_blinder"] = kw["epk_blinder"] + 1  # nonce no longer matches
    w = cs.compute_witness(**kw)
    assert cs.check_witness(w) is not None


def test_keyless_flipped_signature_fails(small_circuit):
    cs = small_circuit
    tj = make_test_jwt()
    signals, _ = _signals(tj)
    kw = witness_kwargs(signals)
    kw["signature"] = [kw["signature"][0] ^ 1] + kw["signature"][1:]
    w = cs.compute_witness(**kw)
    assert cs.check_witness(w) is not None
