"""Drive the full service prove pipeline on the real TPU chip.

Runs outside pytest so the axon TPU backend is used (tests force CPU).
Procures a native setup for the scaled-down keyless config, then serves
one prove request end-to-end and reports per-phase timings.

    python scripts/full_prove_tpu.py [--config small|full]
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="small", choices=["small", "full"])
    args = ap.parse_args()

    from keyless_zk_tpu.circuits.keyless_circuit import KeylessConfig
    from keyless_zk_tpu.service.handler import handle_request
    from keyless_zk_tpu.service.jwk import RsaJwk
    from keyless_zk_tpu.service.prover_state import ProverServiceState

    if args.config == "small":
        from test_keyless_circuit import SMALL as cfg
    else:
        cfg = KeylessConfig()

    from jwt_fixture import EPK_BLINDER, EPK_BYTES, EXP_DATE, EXP_HORIZON, PEPPER, make_test_jwt

    t0 = time.monotonic()
    state = ProverServiceState.new_for_testing(keyless_config=cfg)
    state.init_prover_from_native_setup(persist=True)  # content-addressed cache
    t1 = time.monotonic()
    print(f"setup: {t1 - t0:.1f}s "
          f"(n_vars={state.prover.pk.n_vars}, domain={state.prover.pk.domain_size})",
          file=sys.stderr)

    tj = make_test_jwt()
    state.jwk_cache.insert(
        tj.vi.jwt.payload.iss,
        RsaJwk(kid="test-kid-01", n=tj.rsa_key.public_key().public_numbers().n),
    )
    body = json.dumps(
        {
            "jwt_b64": tj.jwt_str,
            "epk": EPK_BYTES.hex(),
            "epk_blinder": EPK_BLINDER.to_bytes(31, "little").hex(),
            "exp_date_secs": EXP_DATE,
            "exp_horizon_secs": EXP_HORIZON,
            "pepper": PEPPER.to_bytes(31, "little").hex(),
            "uid_key": "sub",
        }
    ).encode()

    for i in range(2):  # second run = warm compile cache
        t2 = time.monotonic()
        code, _, payload = handle_request(state, "POST", "/v0/prove", body)
        t3 = time.monotonic()
        assert code == 200, payload
        print(f"prove request {i}: {t3 - t2:.1f}s  OK", file=sys.stderr)
    print(json.dumps({"status": "ok", "prove_s": round(t3 - t2, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
