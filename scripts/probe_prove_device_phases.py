"""Per-device-phase timings of the FULL keyless generate_proof on the chip.

BENCH_r04 showed generate_proof = 22.2 s but nothing says how that splits
across the five MSMs, the coefficient evaluation, and the NTT pipeline.
This probe loads the persisted full setup, builds one witness, and times
each device phase with a host readback between phases (block_until_ready
is a no-op over the axon tunnel).

    python scripts/probe_prove_device_phases.py [--config small|full]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from keyless_zk_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1] if hasattr(leaf, "ravel") else leaf))
    return x


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="full", choices=["small", "full"])
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from keyless_zk_tpu.circuits.keyless_circuit import KeylessConfig
    from keyless_zk_tpu.curves.jacobian import G1_CURVE, G2_CURVE, JacPoint
    from keyless_zk_tpu.ops.msm import msm
    from keyless_zk_tpu.service.jwk import RsaJwk
    from keyless_zk_tpu.service.prover_state import ProverServiceState

    if args.config == "small":
        from test_keyless_circuit import SMALL as cfg
    else:
        cfg = KeylessConfig()

    from jwt_fixture import (
        EPK_BLINDER,
        EPK_BYTES,
        EXP_DATE,
        EXP_HORIZON,
        PEPPER,
        make_test_jwt,
    )

    t0 = time.monotonic()
    state = ProverServiceState.new_for_testing(keyless_config=cfg)
    state.init_prover_from_native_setup(persist=True)
    print(f"setup load: {time.monotonic()-t0:.1f}s", file=sys.stderr, flush=True)
    prover = state.prover
    pk = prover.pk

    # build one witness through the service path
    tj = make_test_jwt()
    state.jwk_cache.insert(
        tj.vi.jwt.payload.iss,
        RsaJwk(kid="test-kid-01", n=tj.rsa_key.public_key().public_numbers().n),
    )
    from keyless_zk_tpu.input_processing.input_signals import derive_circuit_input_signals
    from keyless_zk_tpu.service.prover_state import witness_kwargs

    signals, _ = derive_circuit_input_signals(
        state.circuit_config, tj.vi, state.config.max_committed_epk_bytes
    )
    kw = witness_kwargs(signals)
    t0 = time.monotonic()
    w64 = state.witness_prog.compute_witness(**kw)
    w_np = state.witness_prog.witness_limbs(w64)
    print(f"witness: {time.monotonic()-t0:.1f}s", file=sys.stderr, flush=True)

    w = jnp.asarray(w_np)
    phases = {}

    def mark(name, fn, *a, **k):
        out = None
        for i in range(args.iters):
            t0 = time.monotonic()
            out = sync(fn(*a, **k))
            dt = time.monotonic() - t0
            phases.setdefault(name, []).append(round(dt * 1e3, 1))
        print(f"{name}: {phases[name]}", file=sys.stderr, flush=True)
        return out

    ms = Groth16 = prover
    wa = mark("merge_a", ms._merge_scalars, w, ms._merge_a)
    wb1 = mark("merge_b1", ms._merge_scalars, w, ms._merge_b1)
    wb2 = mark("merge_b2", ms._merge_scalars, w, ms._merge_b2)
    wc = mark("merge_c", ms._merge_scalars, w, ms._merge_c)

    mark("msm_a", lambda: msm(*ms.points_a, wa, curve=G1_CURVE, lanes=ms.lanes))
    mark("msm_b1", lambda: msm(*ms.points_b1, wb1, curve=G1_CURVE, lanes=ms.lanes))
    mark("msm_b2", lambda: msm(*ms.points_b2, wb2, curve=G2_CURVE, lanes=ms.lanes))
    mark("msm_c", lambda: msm(*ms.points_c, wc, curve=G1_CURVE, lanes=ms.lanes))

    # eager, exactly as prove() runs them (a whole-function jit would
    # capture the multi-GB coef tables as constants and blow the remote
    # compile body limit)
    ab = mark("eval_ab", ms._eval_ab, w)
    h = mark("h_scalars(incl eval_ab)", ms._h_scalars, w)
    hm = mark("merge_h", ms._merge_scalars, h, ms._merge_h)
    mark("msm_h", lambda: msm(*ms.points_h, hm, curve=G1_CURVE, lanes=ms.lanes))

    t0 = time.monotonic()
    proof = prover.prove(w_np)
    full = time.monotonic() - t0
    print(f"full prove (warm): {full:.2f}s", file=sys.stderr, flush=True)

    print(json.dumps({
        "config": args.config,
        "n_vars": pk.n_vars,
        "domain": pk.domain_size,
        "phases_ms": {k: v for k, v in phases.items()},
        "full_prove_s": round(full, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
