"""base64url, hash-to-field, and Fiat-Shamir string gadget tests.

Anchored against the host implementations that are themselves pinned by
reference golden vectors (tests/test_poseidon.py, test_input_processing.py),
mirroring the reference's per-template tests (circuit/src/base64.rs,
hash_to_field.rs, strings tests)."""

import base64

from keyless_zk_tpu.circuits import ConstraintSystem
from keyless_zk_tpu.circuits.base64_gadget import (
    base64url_decode,
    base64url_decoded_length,
    base64url_lookup,
)
from keyless_zk_tpu.circuits.hash_gadget import (
    assert_is_concatenation,
    assert_is_substring,
    hash_bytes_to_field_with_len,
    is_substring,
)


def _bytes_input(cs, n, name):
    ws = cs.new_wires(n)
    cs.set_input_hint(ws, name)
    return ws


def test_base64url_lookup():
    alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_"
    cs = ConstraintSystem()
    ch = cs.new_wire()
    cs.set_input_hint([ch], "c")
    out = base64url_lookup(cs, cs.lc(ch))
    for i, c in enumerate(alphabet):
        w = cs.compute_witness(c=ord(c))
        assert cs.check_witness(w) is None
        assert cs.eval_lc(out, w) == i
    for pad in (0, ord("=")):
        w = cs.compute_witness(c=pad)
        assert cs.check_witness(w) is None
        assert cs.eval_lc(out, w) == 0
    # invalid character unsatisfiable
    w = cs.compute_witness(c=ord("!"))
    assert cs.check_witness(w) is not None


def test_base64url_decode():
    msg = b'{"alg":"RS256","typ":"JWT"}'
    enc = base64.urlsafe_b64encode(msg).rstrip(b"=")
    n = len(msg)
    m = (4 * n + 2) // 3
    cs = ConstraintSystem()
    ws = _bytes_input(cs, m, "enc")
    out = base64url_decode(cs, [cs.lc(w) for w in ws], n)
    padded = enc + b"\x00" * (m - len(enc))
    w = cs.compute_witness(enc=list(padded))
    assert cs.check_witness(w) is None
    got = bytes(cs.eval_lc(o, w) for o in out)
    assert got == msg


def test_base64url_decoded_length():
    cs = ConstraintSystem()
    mw = cs.new_wire()
    cs.set_input_hint([mw], "m")
    out = base64url_decoded_length(cs, cs.lc(mw), 64)
    for enc_len, dec_len in [(0, 0), (2, 1), (3, 2), (4, 3), (6, 4), (43, 32)]:
        w = cs.compute_witness(m=enc_len)
        assert cs.check_witness(w) is None
        assert cs.eval_lc(out, w) == dec_len


def test_hash_bytes_to_field_matches_host():
    from keyless_zk_tpu.hashes.poseidon import poseidon_bytes_with_len

    for max_len, data in [(16, b"hello"), (40, b"a" * 33), (64, b"x" * 20)]:
        cs = ConstraintSystem()
        ws = _bytes_input(cs, max_len, "data")
        ln = cs.new_wire()
        cs.set_input_hint([ln], "len")
        out = hash_bytes_to_field_with_len(cs, [cs.lc(w) for w in ws], cs.lc(ln))
        padded = data + b"\x00" * (max_len - len(data))
        w = cs.compute_witness(data=list(padded), len=len(data))
        assert cs.check_witness(w) is None
        assert cs.eval_lc(out, w) == poseidon_bytes_with_len(data, max_len)


def _substring_circuit(max_str, max_sub):
    from keyless_zk_tpu.hashes.poseidon import poseidon_bytes_with_len

    cs = ConstraintSystem()
    s = _bytes_input(cs, max_str, "s")
    sub = _bytes_input(cs, max_sub, "sub")
    h = cs.new_wire()
    cs.set_input_hint([h], "h")
    ln = cs.new_wire()
    cs.set_input_hint([ln], "len")
    idx = cs.new_wire()
    cs.set_input_hint([idx], "idx")
    ok = is_substring(
        cs, [cs.lc(x) for x in s], cs.lc(h), [cs.lc(x) for x in sub], cs.lc(ln), cs.lc(idx)
    )
    return cs, ok


def test_is_substring():
    from keyless_zk_tpu.hashes.poseidon import poseidon_bytes_with_len

    max_str, max_sub = 24, 8
    cs, ok = _substring_circuit(max_str, max_sub)
    s = b'{"iss":"google"}'
    h = poseidon_bytes_with_len(s, max_str)

    def run(sub: bytes, idx: int):
        w = cs.compute_witness(
            s=list(s + b"\x00" * (max_str - len(s))),
            sub=list(sub + b"\x00" * (max_sub - len(sub))),
            h=h,
            len=len(sub),
            idx=idx,
        )
        assert cs.check_witness(w) is None
        return w[ok]

    assert run(b'"iss"', 1) == 1
    assert run(b"google", 8) == 1
    assert run(b"google", 7) == 0  # wrong index
    assert run(b"goggle", 8) == 0  # wrong substring


def test_assert_is_concatenation():
    max_full, max_l, max_r = 20, 12, 12
    cs = ConstraintSystem()
    full = _bytes_input(cs, max_full, "full")
    left = _bytes_input(cs, max_l, "left")
    right = _bytes_input(cs, max_r, "right")
    ll = cs.new_wire()
    cs.set_input_hint([ll], "ll")
    rl = cs.new_wire()
    cs.set_input_hint([rl], "rl")
    assert_is_concatenation(
        cs,
        [cs.lc(x) for x in full],
        [cs.lc(x) for x in left],
        [cs.lc(x) for x in right],
        cs.lc(ll),
        cs.lc(rl),
    )

    def run(l: bytes, r: bytes, full_bytes: bytes):
        return cs.compute_witness(
            full=list(full_bytes + b"\x00" * (max_full - len(full_bytes))),
            left=list(l + b"\x00" * (max_l - len(l))),
            right=list(r + b"\x00" * (max_r - len(r))),
            ll=len(l),
            rl=len(r),
        )

    w = run(b"header.", b"payload", b"header.payload")
    assert cs.check_witness(w) is None
    # wrong concatenation fails
    w = run(b"header.", b"payload", b"header.payloax")
    assert cs.check_witness(w) is not None
