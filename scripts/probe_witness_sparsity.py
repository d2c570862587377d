"""Digit statistics of a real keyless witness (CPU, no chip needed).

Quantifies the zero-digit fraction per MSM table: bit-valued and
small-valued wires (SHA-256 internals, base64 bytes, selectors) have
nonzero digits only in the lowest window(s), so most (window, element)
slots in the Pippenger scan carry digit 0 — each still costs a full mixed
add today. This probe measures how much a nonzero-compacted scan would
save on the flagship proof.

    python scripts/probe_witness_sparsity.py
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import numpy as np


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from keyless_zk_tpu.circuits.keyless_circuit import KeylessConfig
    from keyless_zk_tpu.service.jwk import RsaJwk
    from keyless_zk_tpu.service.prover_state import ProverServiceState, witness_kwargs
    from keyless_zk_tpu.input_processing.input_signals import derive_circuit_input_signals
    from jwt_fixture import make_test_jwt

    # load ONLY the compiled witness program (no 9.3 GB zkey parse, no
    # device tables — raw-witness digit stats are what we need)
    from keyless_zk_tpu.circuits.witness_engine import CompiledWitnessProgram
    from keyless_zk_tpu.tooling.setup_tool import circuit_checksum

    state = ProverServiceState.new_for_testing(keyless_config=KeylessConfig())
    setup_dir = os.path.join(
        state.config.resources_dir, circuit_checksum(state.keyless_config)
    )
    state.witness_prog = CompiledWitnessProgram.load(
        os.path.join(setup_dir, "witness_program.npz")
    )
    tj = make_test_jwt()
    state.jwk_cache.insert(
        tj.vi.jwt.payload.iss,
        RsaJwk(kid="test-kid-01", n=tj.rsa_key.public_key().public_numbers().n),
    )
    signals, _ = derive_circuit_input_signals(
        state.circuit_config, tj.vi, state.config.max_committed_epk_bytes
    )
    kw = witness_kwargs(signals)
    w64 = state.witness_prog.compute_witness(**kw)
    w = state.witness_prog.witness_limbs(w64)  # (nVars, 16) u32
    print(f"witness built: {w.shape}", file=sys.stderr, flush=True)

    def digit_stats(scalars, c=16):
        """scalars (n, 16) u32 -> fraction of (window, elem) slots with
        digit 0 under unsigned c-bit windows (signed rebalance changes
        counts negligibly)."""
        n = scalars.shape[0]
        n_win = -(-254 // c)
        zero = 0
        total = n_win * n
        for wnd in range(n_win):
            lo = wnd * c
            li, off = lo // 16, lo % 16
            d = scalars[:, li].astype(np.uint32) >> off
            if off + c > 16 and li + 1 < 16:
                d = d | (scalars[:, li + 1].astype(np.uint32) << (16 - off))
            d &= (1 << c) - 1
            zero += int((d == 0).sum())
        return {"n": int(n), "slots": total, "zero_frac": round(zero / total, 4)}

    out = {"raw_witness_digits": digit_stats(w)}
    print("raw", out["raw_witness_digits"], file=sys.stderr, flush=True)

    # value histogram of the raw witness for context
    ints = w.astype(np.uint64)
    top = (ints[:, 1:] != 0).any(axis=1)
    small = ~top
    v0 = w[:, 0].astype(np.uint64)
    out["witness"] = {
        "n_vars": int(w.shape[0]),
        "frac_lt_2^16": round(float(small.mean()), 4),
        "frac_bit": round(float(((v0 <= 1) & small).mean()), 4),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
