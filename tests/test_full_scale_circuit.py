"""Full-parameterization circuit invariants (slow tier).

Pins the wire/constraint counts of the keyless circuit at the reference's
production parameters (circuit/templates/main.circom:5-43; published counts
circuit/README.md:77-82: 1,376,867 constraints / 1,343,588 wires for the
circom build — ours is an independent implementation of the same relation,
so the counts differ but must stay STABLE: a regression in any gadget
changes them). Also runs one witness-engine evaluation at full scale.
"""

import pytest

# exact values measured from the round-2 builder (verified independently by
# the round-2 review at this parameterization)
FULL_WIRES = 1_377_553
FULL_CONSTRAINTS = 1_406_751


@pytest.mark.slow
def test_full_config_builds_with_pinned_counts():
    from keyless_zk_tpu.circuits.keyless_circuit import (
        KeylessConfig,
        build_keyless_circuit,
    )

    cs = build_keyless_circuit(KeylessConfig())
    assert cs.n_wires == FULL_WIRES, (
        f"full-circuit wire count changed: {cs.n_wires} != {FULL_WIRES}"
    )
    assert len(cs.constraints) == FULL_CONSTRAINTS, (
        f"full-circuit constraint count changed: "
        f"{len(cs.constraints)} != {FULL_CONSTRAINTS}"
    )


@pytest.mark.slow
def test_full_config_witness_engine_satisfies():
    """Build the full circuit, compile the witness program, evaluate one
    real JWT witness, and check every constraint natively (r1cs_check)."""
    from jwt_fixture import make_test_jwt

    from keyless_zk_tpu.circuits.keyless_circuit import (
        KeylessConfig,
        build_keyless_circuit,
        to_circuit_config,
        witness_kwargs,
    )
    from keyless_zk_tpu.circuits.witness_engine import CompiledWitnessProgram
    from keyless_zk_tpu.input_processing.input_signals import (
        derive_circuit_input_signals,
    )

    cfg = KeylessConfig()
    cs = build_keyless_circuit(cfg)
    prog = CompiledWitnessProgram(cs)
    tj = make_test_jwt()
    signals, pub_hash = derive_circuit_input_signals(to_circuit_config(cfg), tj.vi)
    wires = prog.compute_witness(**witness_kwargs(signals))
    assert prog.check_witness(wires) is None
    got_pub = (
        int(wires[1, 0])
        | int(wires[1, 1]) << 64
        | int(wires[1, 2]) << 128
        | int(wires[1, 3]) << 192
    )
    assert got_pub == pub_hash
