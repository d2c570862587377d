"""Per-gadget size sweeps: small / default / large parameterizations.

Mirrors the reference's wrapper-circuit corpus (circuit/tests/ holds 63
wrappers, most in _small/_test/_large triples driven from circuit/src/*.rs,
e.g. array_selector_test_small/large arrays.rs:124-170). Each sweep builds
the gadget at three sizes and checks satisfiability at the edges plus one
adversarial case per size.
"""

import random

import pytest

from keyless_zk_tpu.circuits import ConstraintSystem
from keyless_zk_tpu.circuits import gadgets as g
from keyless_zk_tpu.circuits import misc_gadgets as mg
from keyless_zk_tpu.circuits import base64_gadget as b64
from keyless_zk_tpu.circuits.r1cs import P

rng = random.Random(9)

SIZES = [3, 8, 64]  # small / default / large


def _input(cs, name, n=None):
    if n is None:
        w = cs.new_wire()
        cs.set_input_hint([w], name)
        return w
    ws = cs.new_wires(n)
    cs.set_input_hint(ws, name)
    return ws


@pytest.mark.parametrize("length", SIZES)
def test_single_one_array_sweep(length):
    cs = ConstraintSystem()
    idx = _input(cs, "i")
    outs = g.single_one_array(cs, cs.lc(idx), length)
    for v in {0, 1, length // 2, length - 1}:
        w = cs.compute_witness(i=v)
        assert cs.check_witness(w) is None
        assert [w[o] for o in outs] == [int(j == v) for j in range(length)]
    w = cs.compute_witness(i=length)  # out of range -> unsatisfiable
    assert cs.check_witness(w) is not None


@pytest.mark.parametrize("length", SIZES)
def test_left_right_array_selector_sweep(length):
    cs = ConstraintSystem()
    idx = _input(cs, "i")
    left = g.left_array_selector(cs, cs.lc(idx), length)
    for v in {0, 1, length - 1, length}:
        w = cs.compute_witness(i=v)
        assert cs.check_witness(w) is None
        assert [w[o] for o in left] == [int(j < v) for j in range(length)]

    cs2 = ConstraintSystem()
    idx2 = _input(cs2, "i")
    right = g.right_array_selector(cs2, cs2.lc(idx2), length)
    for v in {0, length // 2, length - 1}:
        w = cs2.compute_witness(i=v)
        assert cs2.check_witness(w) is None
        assert [w[o] for o in right] == [int(j > v) for j in range(length)]


@pytest.mark.parametrize("length", SIZES)
def test_array_selector_sweep(length):
    cs = ConstraintSystem()
    s, e = _input(cs, "s"), _input(cs, "e")
    outs = g.array_selector(cs, cs.lc(s), cs.lc(e), length)
    cases = [(0, length), (0, 1), (length - 1, length), (1, max(2, length // 2))]
    for vs, ve in cases:
        if vs >= ve:
            continue
        w = cs.compute_witness(s=vs, e=ve)
        assert cs.check_witness(w) is None
        assert [w[o] for o in outs] == [int(vs <= j < ve) for j in range(length)]


@pytest.mark.parametrize("length", SIZES)
def test_select_array_value_sweep(length):
    cs = ConstraintSystem()
    idx = _input(cs, "i")
    arr = _input(cs, "arr", length)
    out = g.select_array_value(cs, [cs.lc(w) for w in arr], cs.lc(idx))
    vals = [rng.randrange(P) for _ in range(length)]
    for v in {0, length // 2, length - 1}:
        w = cs.compute_witness(i=v, arr=vals)
        assert cs.check_witness(w) is None
        assert cs.eval_lc(out, w) == vals[v]


@pytest.mark.parametrize("n_chars", [4, 16, 64])
def test_base64url_decode_sweep(n_chars):
    import base64 as b64lib

    n_out = n_chars // 4 * 3
    cs = ConstraintSystem()
    chars = _input(cs, "c", n_chars)
    outs = b64.base64url_decode(cs, [cs.lc(w) for w in chars], n_out)
    raw = bytes(rng.randrange(256) for _ in range(n_out))
    enc = b64lib.urlsafe_b64encode(raw).rstrip(b"=")
    w = cs.compute_witness(c=list(enc.ljust(n_chars, b"A")))
    assert cs.check_witness(w) is None
    got = bytes(w[o] if isinstance(o, int) else cs.eval_lc(o, w) for o in outs)
    assert got[: len(raw)] == raw
    # adversarial: non-base64url byte
    bad = bytearray(enc.ljust(n_chars, b"A"))
    bad[0] = ord("!")
    w = cs.compute_witness(c=list(bad))
    assert cs.check_witness(w) is not None


@pytest.mark.parametrize("n_digits", [2, 4, 8])
def test_ascii_digits_to_scalar_sweep(n_digits):
    cs = ConstraintSystem()
    ds = _input(cs, "d", n_digits)
    ln = _input(cs, "len")
    out = mg.ascii_digits_to_scalar(cs, [cs.lc(w) for w in ds], cs.lc(ln))
    # the gadget one-hots length over [1, n-1] (circom AsciiDigitsToScalar
    # with len < maxLen), so drive it at its max usable length n-1
    k = n_digits - 1
    val = rng.randrange(10 ** (k - 1), 10**k) if k > 1 else 7
    s = str(val)
    w = cs.compute_witness(d=list(s.encode().ljust(n_digits, b"\x00")), len=len(s))
    assert cs.check_witness(w) is None
    assert cs.eval_lc(out, w) == val
    # adversarial: a non-digit inside the claimed length
    if n_digits > 1:
        w = cs.compute_witness(d=list(b"1;".ljust(n_digits, b"\x00")), len=2)
        assert cs.check_witness(w) is not None


@pytest.mark.parametrize("n_limbs", [1, 4, 32])
def test_big_less_than_sweep(n_limbs):
    cs = ConstraintSystem()
    a = _input(cs, "a", n_limbs)
    b = _input(cs, "b", n_limbs)
    out = mg.big_less_than(cs, [cs.lc(w) for w in a], [cs.lc(w) for w in b])
    lo = [3] * n_limbs
    hi = [3] * n_limbs
    hi[-1] = 4  # differ in the most significant limb
    for va, vb, expect in [(lo, hi, 1), (hi, lo, 0), (lo, lo, 0)]:
        w = cs.compute_witness(a=va, b=vb)
        assert cs.check_witness(w) is None
        assert cs.eval_lc(out, w) == expect


@pytest.mark.parametrize("width", [2, 16, 64])
def test_bits_to_num_sweep(width):
    cs = ConstraintSystem()
    bits = _input(cs, "bits", width)
    for b in bits:
        cs.constrain(cs.lc(b), cs.lc(b) - cs.const(1), cs.const(0))
    out = g.bits_to_num(cs, bits)
    val = rng.randrange(1 << width)
    w = cs.compute_witness(bits=[(val >> i) & 1 for i in range(width)])
    assert cs.check_witness(w) is None
    assert cs.eval_lc(out, w) == val
