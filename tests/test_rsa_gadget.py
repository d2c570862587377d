"""RSA gadget tests: FpMul polynomial-identity modmul and PKCS#1 v1.5.

Mirrors the reference's rsa tests (circuit/src/rsa.rs:22-133): positive
verification with a fresh RSA-2048 keypair and bit-flip negatives.
"""

import hashlib
import secrets

import pytest

from keyless_zk_tpu.circuits import ConstraintSystem
from keyless_zk_tpu.circuits.rsa_gadget import fp_mul, fp_pow_65537, rsa_pkcs1_verify


def _limbs(v: int, n_bits: int, k: int) -> list[int]:
    mask = (1 << n_bits) - 1
    return [(v >> (n_bits * i)) & mask for i in range(k)]


def _setup_limbs(cs, name, k):
    ws = cs.new_wires(k)
    cs.set_input_hint(ws, name)
    for w in ws:
        cs.to_bits(cs.lc(w), 64)
    return ws


def test_fp_mul_small_limbs():
    n_bits, k = 8, 4
    cs = ConstraintSystem()
    a = cs.new_wires(k)
    b = cs.new_wires(k)
    p = cs.new_wires(k)
    for ws, nm in ((a, "a"), (b, "b"), (p, "p")):
        cs.set_input_hint(ws, nm)
        for w in ws:
            cs.to_bits(cs.lc(w), n_bits)
    out = fp_mul(cs, a, b, p, n_bits, k)

    mod = (1 << 31) - 1  # fits 4x8-bit limbs
    for _ in range(5):
        av, bv = secrets.randbelow(mod), secrets.randbelow(mod)
        w = cs.compute_witness(
            a=_limbs(av, n_bits, k), b=_limbs(bv, n_bits, k), p=_limbs(mod, n_bits, k)
        )
        assert cs.check_witness(w) is None
        got = sum(w[out[i]] << (n_bits * i) for i in range(k))
        assert got == av * bv % mod
    # corrupted remainder must fail
    w[out[0]] = (w[out[0]] + 1) % mod
    assert cs.check_witness(w) is not None


def test_fp_pow_65537_small():
    n_bits, k = 8, 4
    cs = ConstraintSystem()
    base = cs.new_wires(k)
    p = cs.new_wires(k)
    for ws, nm in ((base, "base"), (p, "p")):
        cs.set_input_hint(ws, nm)
        for w in ws:
            cs.to_bits(cs.lc(w), n_bits)
    out = fp_pow_65537(cs, base, p, n_bits, k)
    mod = (1 << 31) - 1
    bv = 0x12345
    w = cs.compute_witness(base=_limbs(bv, n_bits, k), p=_limbs(mod, n_bits, k))
    assert cs.check_witness(w) is None
    got = sum(w[out[i]] << (n_bits * i) for i in range(k))
    assert got == pow(bv, 65537, mod)


def test_rsa_pkcs1_v1_5_full():
    """Real RSA-2048 signature verified in-circuit (rsa.rs:22-133 analog)."""
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding, rsa

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    msg = b"the keyless jwt goes here"
    sig = key.sign(msg, padding.PKCS1v15(), hashes.SHA256())
    sig_int = int.from_bytes(sig, "big")
    n_int = key.public_key().public_numbers().n

    digest = hashlib.sha256(msg).digest()
    # digest limbs: 4 x 64-bit, least-significant limb first, of the
    # big-endian digest value
    d_int = int.from_bytes(digest, "big")
    hashed = _limbs(d_int, 64, 4)

    cs = ConstraintSystem()
    sign_w = _setup_limbs(cs, "sig", 32)
    mod_w = _setup_limbs(cs, "mod", 32)
    h_w = cs.new_wires(4)
    cs.set_input_hint(h_w, "hashed")
    rsa_pkcs1_verify(cs, sign_w, mod_w, [cs.lc(h) for h in h_w])

    w = cs.compute_witness(
        sig=_limbs(sig_int, 64, 32), mod=_limbs(n_int, 64, 32), hashed=hashed
    )
    assert cs.check_witness(w) is None

    # bit-flipped signature must not satisfy the constraints
    w_bad = cs.compute_witness(
        sig=_limbs(sig_int ^ 1, 64, 32), mod=_limbs(n_int, 64, 32), hashed=hashed
    )
    assert cs.check_witness(w_bad) is not None
