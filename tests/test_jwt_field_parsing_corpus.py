"""The reference's full jwt_field_parsing scenario corpus, table-driven.

Port of circuit/src/jwt_field_parsing.rs:322-530 — all 25 #[test] cases:
whitespace variants, closing-brace endings, missing-quote negatives,
name/value mismatches, the documented malicious index/length attacks
(Circuit Bugs #3/#4), and the email_verified spacing variants. Each quoted
negative must flip to satisfiable when skip_aud_checks-style `skip` is set
(should_pass_*_skip_checks parity).
"""

import pytest

from keyless_zk_tpu.circuits import ConstraintSystem
from keyless_zk_tpu.circuits.jwt_gadget import (
    email_verified_check,
    parse_jwt_field_quoted,
    parse_jwt_field_unquoted,
)

from test_jwt_gadgets import _bytes_input, _calc_string_bodies, _pad

MAX_F, MAX_N, MAX_V = 40, 16, 32


def _mk(quoted: bool):
    cs = ConstraintSystem()
    field = _bytes_input(cs, MAX_F, "field")
    name = _bytes_input(cs, MAX_N, "name")
    value = _bytes_input(cs, MAX_V, "value")
    args = [field, name, value]
    if quoted:
        args.append(_bytes_input(cs, MAX_F, "sb"))
    ins = cs.new_wires(5)
    cs.set_input_hint(ins, "meta")
    skip = cs.new_wire()
    cs.set_input_hint([skip], "skip")
    fn = parse_jwt_field_quoted if quoted else parse_jwt_field_unquoted
    fn(
        cs, *args,
        cs.lc(ins[0]), cs.lc(ins[1]), cs.lc(ins[2]), cs.lc(ins[3]), cs.lc(ins[4]),
        cs.lc(skip),
    )
    return cs


@pytest.fixture(scope="module")
def quoted_cs():
    return _mk(True)


@pytest.fixture(scope="module")
def unquoted_cs():
    return _mk(False)


def _run(cs, quoted, fld: bytes, name: bytes, value: bytes, *, skip=0,
         field_len=None, value_index=None, value_len=None, colon_index=None):
    """jwt_field_str parity: indices derived by find() unless overridden."""
    kwargs = dict(
        field=_pad(fld, MAX_F),
        name=_pad(name, MAX_N),
        value=_pad(value, MAX_V),
        meta=[
            len(fld) if field_len is None else field_len,
            len(name),
            fld.find(value) if value_index is None else value_index,
            len(value) if value_len is None else value_len,
            fld.find(b":") if colon_index is None else colon_index,
        ],
        skip=skip,
    )
    if quoted:
        kwargs["sb"] = _calc_string_bodies(fld) + [0] * (MAX_F - len(fld))
    return cs.check_witness(cs.compute_witness(**kwargs)) is None


CASES = [
    # (id, quoted, field, name, value, overrides, expect_pass)
    ("simple_quoted", True, b'"name": "value",', b"name", b"value", {}, True),
    ("simple_unquoted", False, b'"name": value,', b"name", b"value", {}, True),
    ("no_whitespace_quoted", True, b'"name":"value",', b"name", b"value", {}, True),
    ("no_whitespace_unquoted", False, b'"name":value,', b"name", b"value", {}, True),
    ("end_with_curly_bracket", True, b'"name": "value"}', b"name", b"value", {}, True),
    ("end_with_curly_bracket_unquoted", False, b'"name": value}', b"name", b"value", {}, True),
    # malicious_value_1: escaped quote inside value; truncated field_len
    ("malicious_value_1", True, b'"sub": "a\\",b",', b"sub", b"a\\",
     {"field_len": b'"sub": "a\\",b",'.find(b",") + 1}, False),
    # malicious_value_2: value spanning into the next field
    ("malicious_value_2", True, b'"name1":"value1","name2":"value2",', b"name1",
     b'value1","name2":"value2', {}, False),
    ("name_no_first_quote", True, b'name": "value",', b"name", b"value", {}, False),
    ("name_no_second_quote", True, b'"name: "value",', b"name", b"value", {}, False),
    ("name_no_quotes", True, b'name: "value",', b"name", b"value", {}, False),
    ("name_not_equal_quoted", True, b'"name": "value",', b"fake", b"value", {}, False),
    ("name_not_equal_unquoted", False, b'"name": value,', b"fake", b"value", {}, False),
    ("value_not_equal_quoted", True, b'"name": "value",', b"name", b"fake",
     {"value_index": b'"name": "value",'.find(b"value"), "value_len": 5}, False),
    ("value_not_equal_unquoted", False, b'"name": value,', b"name", b"fake",
     {"value_index": b'"name": value,'.find(b"value"), "value_len": 5}, False),
    # Circuit Bug #3: field_len maliciously truncated at a comma inside quotes
    ("malicious_field_len", True, b'"name":",value"', b"name", b",value",
     {"field_len": b'"name":",value"'.find(b",") + 1,
      "value_index": b'"name":",value"'.find(b",")}, False),
    # Circuit Bug #4: value truncated at an interior comma
    ("malicious_value_len_1", True, b'"sub":"user,fake",', b"sub", b"user",
     {"field_len": b'"sub":"user,fake",'.find(b",") + 1}, False),
    # unquoted truncation at a real comma is legitimate...
    ("malicious_value_len_2a", False, b'"sub":user,fake,', b"sub", b"user",
     {"field_len": b'"sub":user,fake,'.find(b",") + 1}, True),
    # ...but claiming the comma-spanning value must fail
    ("malicious_value_len_2b", False, b'"sub":user,fake,', b"sub", b"user,fake", {}, False),
]


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_jwt_field_corpus(case, quoted_cs, unquoted_cs):
    _, quoted, fld, name, value, over, expect = case
    cs = quoted_cs if quoted else unquoted_cs
    assert _run(cs, quoted, fld, name, value, **over) == expect
    if not expect:
        # skip_aud_checks parity: every negative passes with skip = 1
        assert _run(cs, quoted, fld, name, value, skip=1, **over)


EV_CASES = [
    ("ev_unquoted_no_spaces", b"true"),
    ("ev_quoted_no_spaces", b'"true"'),
]


@pytest.mark.parametrize("case", EV_CASES, ids=[c[0] for c in EV_CASES])
def test_email_verified_variants(case):
    _, evv = case
    max_evn, max_evv, max_uid = 14, 10, 10
    cs = ConstraintSystem()
    evn = _bytes_input(cs, max_evn, "evn")
    evv_in = _bytes_input(cs, max_evv, "evv")
    evl = cs.new_wire()
    cs.set_input_hint([evl], "evl")
    uid = _bytes_input(cs, max_uid, "uid")
    uil = cs.new_wire()
    cs.set_input_hint([uil], "uil")
    email_verified_check(cs, evn, evv_in, cs.lc(evl), uid, cs.lc(uil))
    w = cs.compute_witness(
        evn=_pad(b"email_verified", max_evn),
        evv=_pad(evv, max_evv),
        evl=len(evv),
        uid=_pad(b"email", max_uid),
        uil=5,
    )
    assert cs.check_witness(w) is None
