"""Tests for ascii-digit, bit-packing, BigLessThan, SHA2-padding gadgets."""

from keyless_zk_tpu.circuits import ConstraintSystem
from keyless_zk_tpu.circuits.misc_gadgets import (
    ascii_digits_to_scalar,
    big_endian_bits_to_scalars,
    big_less_than,
    sha2_padding_verify,
)


def _inp(cs, n, name):
    ws = cs.new_wires(n)
    cs.set_input_hint(ws, name)
    return [cs.lc(w) for w in ws]


def test_ascii_digits_to_scalar():
    cs = ConstraintSystem()
    ds = _inp(cs, 12, "d")
    ln = cs.new_wire()
    cs.set_input_hint([ln], "l")
    out = ascii_digits_to_scalar(cs, ds, cs.lc(ln))
    # note: the reference template (AsciiDigitsToScalar.circom) is only
    # satisfiable for len < MAX_LEN, so lengths go up to 11 here
    for val in (7, 42, 1700000000, 99999999999):
        s = str(val).encode()
        w = cs.compute_witness(d=list(s + b"\x00" * (12 - len(s))), l=len(s))
        assert cs.check_witness(w) is None
        assert cs.eval_lc(out, w) == val
    # non-digit inside len -> unsatisfiable
    w = cs.compute_witness(d=list(b"12a4" + b"\x00" * 8), l=4)
    assert cs.check_witness(w) is not None


def test_big_less_than():
    cs = ConstraintSystem()
    a = _inp(cs, 4, "a")
    b = _inp(cs, 4, "b")
    out = big_less_than(cs, a, b, 64)

    def limbs(v):
        return [(v >> (64 * i)) & ((1 << 64) - 1) for i in range(4)]

    cases = [(5, 9, 1), (9, 5, 0), (5, 5, 0), (1 << 200, (1 << 200) + 1, 1), ((1 << 255) - 1, 1 << 255, 1)]
    for av, bv, expect in cases:
        w = cs.compute_witness(a=limbs(av), b=limbs(bv))
        assert cs.check_witness(w) is None
        assert w[out] == expect if isinstance(out, int) else cs.eval_lc(out, w) == expect


def test_big_endian_bits_to_scalars():
    cs = ConstraintSystem()
    bits = _inp(cs, 11, "b")
    out = big_endian_bits_to_scalars(cs, bits, 4)
    w = cs.compute_witness(b=[0, 0, 0, 0, 0, 0, 0, 1, 0, 1, 1])
    assert [cs.eval_lc(o, w) for o in out] == [0, 1, 3]


def test_sha2_padding_verify():
    from keyless_zk_tpu.input_processing.sha_padding import with_sha_padding_bytes

    msg = b"a" * 70  # 2 blocks after padding
    padded = with_sha_padding_bytes(msg)
    max_len = 192
    cs = ConstraintSystem()
    data = _inp(cs, max_len, "data")
    nb = cs.new_wire()
    cs.set_input_hint([nb], "nb")
    ps = cs.new_wire()
    cs.set_input_hint([ps], "ps")
    lbe = _inp(cs, 8, "lbe")
    pwl = _inp(cs, 64, "pwl")
    sha2_padding_verify(cs, data, cs.lc(nb), cs.lc(ps), lbe, pwl)

    L = 8 * len(msg)
    k = len(padded) * 8 - L - 65
    pad_no_len = bytes([128] + [0] * 63)
    l_bytes = L.to_bytes(8, "big")
    kwargs = dict(
        data=list(padded + b"\x00" * (max_len - len(padded))),
        nb=len(padded) // 64,
        ps=len(msg),
        lbe=list(l_bytes),
        pwl=list(pad_no_len),
    )
    w = cs.compute_witness(**kwargs)
    assert cs.check_witness(w) is None
    # wrong claimed length -> fails
    bad = dict(kwargs, ps=len(msg) - 1)
    assert cs.check_witness(cs.compute_witness(**bad)) is not None
