"""Gadget library tests: satisfiability + value checks per gadget.

Mirrors the reference's per-template strategy (circuit/src/*.rs — tiny
wrapper circuit per gadget, positive and adversarial cases;
SURVEY §4.1): witnesses computed by the integrated hints must satisfy the
constraints, and hand-corrupted witnesses must not.
"""

import pytest

from keyless_zk_tpu.circuits import ConstraintSystem
from keyless_zk_tpu.circuits import gadgets as g
from keyless_zk_tpu.circuits.r1cs import P


def _input(cs, name="x"):
    w = cs.new_wire()
    cs.set_input_hint([w], name)
    return w


def test_is_zero():
    cs = ConstraintSystem()
    x = _input(cs)
    out = g.is_zero(cs, cs.lc(x))
    for v, expect in [(0, 1), (5, 0), (P - 1, 0)]:
        w = cs.compute_witness(x=v)
        assert w[out] == expect
        assert cs.check_witness(w) is None
    # adversarial: claim nonzero is zero
    w = cs.compute_witness(x=5)
    w[out] = 1
    assert cs.check_witness(w) is not None


def test_is_equal_and_less_than():
    cs = ConstraintSystem()
    a, b = _input(cs, "a"), _input(cs, "b")
    eq = g.is_equal(cs, cs.lc(a), cs.lc(b))
    lt = g.less_than(cs, cs.lc(a), cs.lc(b), 16)
    for va, vb in [(3, 3), (3, 7), (7, 3), (0, 0), (65535, 65535), (0, 65535)]:
        w = cs.compute_witness(a=va, b=vb)
        assert cs.check_witness(w) is None
        assert w[eq] == int(va == vb)
        assert w[lt] == int(va < vb)


def test_select():
    cs = ConstraintSystem()
    c, a, b = _input(cs, "c"), _input(cs, "a"), _input(cs, "b")
    out = g.select(cs, cs.lc(c), cs.lc(a), cs.lc(b))
    w = cs.compute_witness(c=1, a=10, b=20)
    assert cs.eval_lc(out, w) == 10 and cs.check_witness(w) is None
    w = cs.compute_witness(c=0, a=10, b=20)
    assert cs.eval_lc(out, w) == 20 and cs.check_witness(w) is None


def test_single_one_array():
    cs = ConstraintSystem()
    idx = _input(cs, "i")
    outs = g.single_one_array(cs, cs.lc(idx), 5)
    for v in range(5):
        w = cs.compute_witness(i=v)
        assert cs.check_witness(w) is None
        assert [w[o] for o in outs] == [int(j == v) for j in range(5)]
    # out-of-range index is unsatisfiable
    w = cs.compute_witness(i=7)
    assert cs.check_witness(w) is not None


def test_left_right_array_selectors():
    cs = ConstraintSystem()
    idx = _input(cs, "i")
    left = g.left_array_selector(cs, cs.lc(idx), 4)
    for v in range(5):
        w = cs.compute_witness(i=v)
        assert cs.check_witness(w) is None
        assert [w[o] for o in left] == [int(j < v) for j in range(4)]

    cs2 = ConstraintSystem()
    idx2 = _input(cs2, "i")
    right = g.right_array_selector(cs2, cs2.lc(idx2), 4)
    for v in range(4):
        w = cs2.compute_witness(i=v)
        assert cs2.check_witness(w) is None
        assert [w[o] for o in right] == [int(j > v) for j in range(4)]


def test_array_selector():
    cs = ConstraintSystem()
    s, e = _input(cs, "s"), _input(cs, "e")
    outs = g.array_selector(cs, cs.lc(s), cs.lc(e), 6)
    for vs, ve in [(1, 4), (0, 6), (2, 3), (0, 1)]:
        w = cs.compute_witness(s=vs, e=ve)
        assert cs.check_witness(w) is None
        assert [w[o] for o in outs] == [int(vs <= j < ve) for j in range(6)]


def test_select_array_value():
    cs = ConstraintSystem()
    idx = _input(cs, "i")
    arr_wires = cs.new_wires(4)
    cs.set_input_hint(arr_wires, "arr")
    out = g.select_array_value(cs, [cs.lc(w) for w in arr_wires], cs.lc(idx))
    vals = [10, 20, 30, 40]
    for v in range(4):
        w = cs.compute_witness(i=v, arr=vals)
        assert cs.check_witness(w) is None
        assert cs.eval_lc(out, w) == vals[v]


def test_bits_to_num():
    cs = ConstraintSystem()
    x = _input(cs)
    bits = cs.to_bits(cs.lc(x), 8)
    packed = g.bits_to_num(cs, bits)
    w = cs.compute_witness(x=0xA7)
    assert cs.eval_lc(packed, w) == 0xA7


def test_poseidon_gadget_matches_host():
    from keyless_zk_tpu.hashes.poseidon import poseidon_hash

    for arity in (1, 2, 4):
        cs = ConstraintSystem()
        ins = cs.new_wires(arity)
        cs.set_input_hint(ins, "xs")
        out = g.poseidon_gadget(cs, [cs.lc(i) for i in ins])
        vals = list(range(1, arity + 1))
        w = cs.compute_witness(xs=vals)
        assert cs.check_witness(w) is None
        assert cs.eval_lc(out, w) == poseidon_hash(vals)
