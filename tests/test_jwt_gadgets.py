"""JWT parsing gadget tests (circuit/src/jwt_field_parsing.rs analog:
positive parses + adversarial negatives)."""

from keyless_zk_tpu.circuits import ConstraintSystem
from keyless_zk_tpu.circuits.jwt_gadget import (
    brackets_depth_map,
    brackets_map,
    email_verified_check,
    enforce_not_nested,
    parse_jwt_field_quoted,
    parse_jwt_field_unquoted,
    string_bodies,
)


def _bytes_input(cs, n, name):
    ws = cs.new_wires(n)
    cs.set_input_hint(ws, name)
    return [cs.lc(w) for w in ws]


def _pad(b: bytes, n: int) -> list[int]:
    return list(b + b"\x00" * (n - len(b)))


def _calc_string_bodies(s: bytes) -> list[int]:
    """Host mirror (reference keyless-common calc_string_bodies /
    input_gen.py:20-31)."""
    quotes = [0] * len(s)
    bodies = [0] * len(s)
    backslashes = [0] * len(s)
    quote_parity = [0] * len(s)
    for i in range(len(s)):
        if i:
            backslashes[i] = int(s[i] == 92 and backslashes[i - 1] == 0) if s[i] == 92 else 0
            quotes[i] = int(s[i] == 34 and backslashes[i - 1] == 0)
            quote_parity[i] = quote_parity[i - 1] ^ quotes[i]
        else:
            backslashes[0] = int(s[0] == 92)
            quotes[0] = int(s[0] == 34)
            quote_parity[0] = quotes[0]
    bodies[0] = 0
    for i in range(1, len(s)):
        bodies[i] = quote_parity[i] & quote_parity[i - 1]
    return bodies


def test_string_bodies():
    s = b'{"name" : "va\\"l"}'
    cs = ConstraintSystem()
    chars = _bytes_input(cs, len(s), "s")
    out = string_bodies(cs, chars)
    w = cs.compute_witness(s=list(s))
    assert cs.check_witness(w) is None
    got = [cs.eval_lc(o, w) for o in out]
    assert got == _calc_string_bodies(s)


def test_brackets_depth_map():
    s = b"a{aaa{a{aaa}aa}aaaa}"
    expect = [int(c) for c in "00000011222111000000"]
    cs = ConstraintSystem()
    chars = _bytes_input(cs, len(s), "s")
    depth = brackets_depth_map(cs, brackets_map(cs, chars))
    w = cs.compute_witness(s=list(s))
    assert cs.check_witness(w) is None
    assert [cs.eval_lc(d, w) for d in depth] == expect


def test_enforce_not_nested():
    s = b'{"a":{"b":1},"c":2}'
    cs = ConstraintSystem()
    chars = _bytes_input(cs, len(s), "s")
    si = cs.new_wire()
    cs.set_input_hint([si], "si")
    fl = cs.new_wire()
    cs.set_input_hint([fl], "fl")
    depth = brackets_depth_map(cs, brackets_map(cs, chars))
    enforce_not_nested(cs, cs.lc(si), cs.lc(fl), depth)
    # "c":2 field at index 13, len 6 - not nested
    w = cs.compute_witness(s=list(s), si=13, fl=6)
    assert cs.check_witness(w) is None
    # "b":1 at index 6, len 5 - nested, must fail
    w = cs.compute_witness(s=list(s), si=6, fl=5)
    assert cs.check_witness(w) is not None


def _quoted_circuit(max_field, max_name, max_value):
    cs = ConstraintSystem()
    field = _bytes_input(cs, max_field, "field")
    name = _bytes_input(cs, max_name, "name")
    value = _bytes_input(cs, max_value, "value")
    sb = _bytes_input(cs, max_field, "sb")
    ins = cs.new_wires(5)
    cs.set_input_hint(ins, "meta")  # field_len, name_len, value_index, value_len, colon_index
    skip = cs.new_wire()
    cs.set_input_hint([skip], "skip")
    parse_jwt_field_quoted(
        cs, field, name, value, sb,
        cs.lc(ins[0]), cs.lc(ins[1]), cs.lc(ins[2]), cs.lc(ins[3]), cs.lc(ins[4]),
        cs.lc(skip),
    )
    return cs


def test_parse_jwt_field_quoted():
    max_f, max_n, max_v = 24, 8, 12
    cs = _quoted_circuit(max_f, max_n, max_v)
    fld = b'"sub":"user123",'
    kwargs = dict(
        field=_pad(fld, max_f),
        name=_pad(b"sub", max_n),
        value=_pad(b"user123", max_v),
        sb=_calc_string_bodies(fld) + [0] * (max_f - len(fld)),
        # field_len, name_len, value_index, value_len, colon_index
        meta=[len(fld), 3, 7, 7, 5],
        skip=0,
    )
    w = cs.compute_witness(**kwargs)
    assert cs.check_witness(w) is None

    # wrong value -> fails
    bad = dict(kwargs, value=_pad(b"user124", max_v))
    assert cs.check_witness(cs.compute_witness(**bad)) is not None
    # but passes with skip_checks = 1
    ok = dict(bad, skip=1)
    assert cs.check_witness(cs.compute_witness(**ok)) is None
    # whitespace allowed around colon
    fld2 = b'"sub" : "user123",'
    kwargs2 = dict(
        field=_pad(fld2, max_f),
        name=_pad(b"sub", max_n),
        value=_pad(b"user123", max_v),
        sb=_calc_string_bodies(fld2) + [0] * (max_f - len(fld2)),
        meta=[len(fld2), 3, 9, 7, 6],
        skip=0,
    )
    assert cs.check_witness(cs.compute_witness(**kwargs2)) is None


def test_parse_jwt_field_unquoted():
    max_f, max_n, max_v = 24, 8, 12
    cs = ConstraintSystem()
    field = _bytes_input(cs, max_f, "field")
    name = _bytes_input(cs, max_n, "name")
    value = _bytes_input(cs, max_v, "value")
    ins = cs.new_wires(5)
    cs.set_input_hint(ins, "meta")
    skip = cs.new_wire()
    cs.set_input_hint([skip], "skip")
    parse_jwt_field_unquoted(
        cs, field, name, value,
        cs.lc(ins[0]), cs.lc(ins[1]), cs.lc(ins[2]), cs.lc(ins[3]), cs.lc(ins[4]),
        cs.lc(skip),
    )
    fld = b'"iat":1700000000,'
    kwargs = dict(
        field=_pad(fld, max_f),
        name=_pad(b"iat", max_n),
        value=_pad(b"1700000000", max_v),
        meta=[len(fld), 3, 6, 10, 5],
        skip=0,
    )
    w = cs.compute_witness(**kwargs)
    assert cs.check_witness(w) is None
    # quoted value in unquoted parser -> fails
    fld_bad = b'"iat":"170000000",'
    bad = dict(
        kwargs,
        field=_pad(fld_bad, max_f),
        value=_pad(b"170000000", max_v),
        meta=[len(fld_bad), 3, 7, 9, 5],
    )
    assert cs.check_witness(cs.compute_witness(**bad)) is not None


def test_email_verified_check():
    max_evn, max_evv, max_uid = 14, 8, 10
    cs = ConstraintSystem()
    evn = _bytes_input(cs, max_evn, "evn")
    evv = _bytes_input(cs, max_evv, "evv")
    evl = cs.new_wire()
    cs.set_input_hint([evl], "evl")
    uid = _bytes_input(cs, max_uid, "uid")
    uil = cs.new_wire()
    cs.set_input_hint([uil], "uil")
    out = email_verified_check(cs, evn, evv, cs.lc(evl), uid, cs.lc(uil))

    # uid == email: ev must be true
    w = cs.compute_witness(
        evn=_pad(b"email_verified", max_evn), evv=_pad(b"true", max_evv), evl=4,
        uid=_pad(b"email", max_uid), uil=5,
    )
    assert cs.check_witness(w) is None and cs.eval_lc(out, w) == 1
    # quoted "true" accepted
    w = cs.compute_witness(
        evn=_pad(b"email_verified", max_evn), evv=_pad(b'"true"', max_evv), evl=6,
        uid=_pad(b"email", max_uid), uil=5,
    )
    assert cs.check_witness(w) is None
    # uid == sub: ev may be anything
    w = cs.compute_witness(
        evn=_pad(b"", max_evn), evv=_pad(b"", max_evv), evl=0,
        uid=_pad(b"sub", max_uid), uil=3,
    )
    assert cs.check_witness(w) is None and cs.eval_lc(out, w) == 0
    # uid == email but ev false -> unsatisfiable
    w = cs.compute_witness(
        evn=_pad(b"email_verified", max_evn), evv=_pad(b"fals", max_evv), evl=4,
        uid=_pad(b"email", max_uid), uil=5,
    )
    assert cs.check_witness(w) is not None
