"""Native witness engine: differential tests against the Python evaluator.

The engine is the production witness path (the analog of the reference's
compiled `main_c` witness generator); every op class is exercised and the
full keyless relation is cross-checked wire-for-wire.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compiles the native engine + mid-size circuits

from keyless_zk_tpu.circuits import ConstraintSystem
from keyless_zk_tpu.circuits.witness_engine import CompiledWitnessProgram


def _diff(cs, **inputs):
    prog = CompiledWitnessProgram(cs)
    w_native = prog.compute_witness(**inputs)
    w_py = cs.compute_witness(**inputs)
    got = prog.witness_ints(w_native)
    assert got == w_py
    assert prog.check_witness(w_native) is None
    return prog, w_native


def test_engine_basic_ops():
    from keyless_zk_tpu.circuits import gadgets as g

    cs = ConstraintSystem()
    a = cs.new_wire()
    cs.set_input_hint([a], "a")
    b = cs.new_wire()
    cs.set_input_hint([b], "b")
    prod = cs.mul(cs.lc(a), cs.lc(b))
    bits = cs.to_bits(cs.lc(prod), 16)
    z = g.is_zero(cs, cs.lc(a) - cs.lc(b))
    hot = g.single_one_array(cs, cs.lc(b), 5)
    lt = g.less_than(cs, cs.lc(a), cs.lc(b), 8)
    _diff(cs, a=7, b=3)
    _diff(cs, a=3, b=3)
    _diff(cs, a=0, b=4)


def test_engine_quorem_and_onehot_offset():
    from keyless_zk_tpu.circuits.base64_gadget import base64url_decoded_length
    from keyless_zk_tpu.circuits.misc_gadgets import ascii_digits_to_scalar

    cs = ConstraintSystem()
    m = cs.new_wire()
    cs.set_input_hint([m], "m")
    base64url_decoded_length(cs, cs.lc(m), 64)
    ds = cs.new_wires(6)
    cs.set_input_hint(ds, "d")
    ln = cs.new_wire()
    cs.set_input_hint([ln], "l")
    ascii_digits_to_scalar(cs, [cs.lc(d) for d in ds], cs.lc(ln))
    _diff(cs, m=43, d=list(b"1234\x00\x00"), l=4)


def test_engine_bigdiv_bigcarry():
    from keyless_zk_tpu.circuits.rsa_gadget import fp_pow_65537

    n_bits, k = 8, 4
    cs = ConstraintSystem()
    base = cs.new_wires(k)
    p = cs.new_wires(k)
    for ws, nm in ((base, "base"), (p, "p")):
        cs.set_input_hint(ws, nm)
        for w in ws:
            cs.to_bits(cs.lc(w), n_bits)
    fp_pow_65537(cs, base, p, n_bits, k)
    mod = (1 << 31) - 1

    def limbs(v):
        return [(v >> (n_bits * i)) & ((1 << n_bits) - 1) for i in range(k)]

    _diff(cs, base=limbs(0x1234567), p=limbs(mod))


def test_engine_full_keyless():
    import sys

    sys.path.insert(0, "tests")
    from jwt_fixture import make_test_jwt
    from test_keyless_circuit import SMALL
    from keyless_zk_tpu.circuits.keyless_circuit import (
        build_keyless_circuit,
        to_circuit_config,
        witness_kwargs,
    )
    from keyless_zk_tpu.input_processing.input_signals import derive_circuit_input_signals

    cs = build_keyless_circuit(SMALL)
    tj = make_test_jwt()
    signals, pub_hash = derive_circuit_input_signals(to_circuit_config(SMALL), tj.vi)
    kw = witness_kwargs(signals)

    prog = CompiledWitnessProgram(cs)
    import time

    t0 = time.monotonic()
    w = prog.compute_witness(**kw)
    t_native = time.monotonic() - t0
    assert prog.check_witness(w) is None

    ints = prog.witness_ints(w)
    assert ints[1] == pub_hash

    # limb conversion matches the slow path
    limbs = prog.witness_limbs(w)
    from keyless_zk_tpu.fields.limbs import ints_to_limbs

    assert np.array_equal(limbs[:100], ints_to_limbs(ints[:100]))
    print(f"native witness: {t_native * 1e3:.0f} ms for {cs.n_wires} wires")


def test_program_save_load_roundtrip(tmp_path):
    """Serialized program tables (the analog of circom's prebuilt main_c,
    testing_setup.py:72-79) must reproduce the witness bit-for-bit without
    the ConstraintSystem."""
    import sys

    sys.path.insert(0, "tests")
    from jwt_fixture import make_test_jwt
    from test_keyless_circuit import SMALL
    from keyless_zk_tpu.circuits.keyless_circuit import (
        build_keyless_circuit,
        to_circuit_config,
        witness_kwargs,
    )
    from keyless_zk_tpu.input_processing.input_signals import derive_circuit_input_signals

    cs = build_keyless_circuit(SMALL)
    tj = make_test_jwt()
    signals, _ = derive_circuit_input_signals(to_circuit_config(SMALL), tj.vi)
    kw = witness_kwargs(signals)

    prog = CompiledWitnessProgram(cs)
    want = prog.compute_witness(**kw)

    path = str(tmp_path / "witness_program.npz")
    prog.save(path)
    loaded = CompiledWitnessProgram.load(path)
    assert loaded.cs is None
    got = loaded.compute_witness(**kw)
    assert np.array_equal(got, want)
    assert np.array_equal(loaded.witness_limbs(got), prog.witness_limbs(want))
    with pytest.raises(RuntimeError, match="ConstraintSystem"):
        loaded.check_witness(got)


def test_engine_inversion_differential():
    """xGCD inverse in OP_ISZERO vs the Python witness path across random
    wide field values (and p-1, 1)."""
    import random

    from keyless_zk_tpu.circuits import gadgets as g

    cs = ConstraintSystem()
    ws = cs.new_wires(10)
    cs.set_input_hint(ws, "vals")
    for w in ws:
        g.is_zero(cs, cs.lc(w))
    rng = random.Random(99)
    from keyless_zk_tpu.circuits.witness_engine import P

    vals = [1, P - 1, 2, (P + 1) // 2] + [rng.randrange(1, P) for _ in range(5)] + [0]
    _diff(cs, vals=vals)
