"""Benchmark suite for the TPU Groth16 stack (BASELINE.md configs[1]).

Structured to survive driver timeouts (round-2 lesson): the headline metric
is measured FIRST and printed the moment it is known; every other metric runs
under its own watchdog thread with a per-metric budget; BENCH_LOCAL.json is
flushed after every metric; and the headline line is re-printed after each
metric so the LAST complete JSON line is (almost) always the headline even if
the process is killed mid-run.

Anchors for vs_baseline derive from the reference profile (SURVEY §6): a
rapidsnark-class 16-core CPU proves the full 1.38M-constraint circuit in
single-digit seconds. Decomposing that profile (4x 1.34M-point G1/G2 MSMs +
1x 2.1M MSM + 6x 2^21 transforms in ~3 s):

  msm_g1_2^16  ~100 ms      msm_g1_2^20   ~1.6 s (16x points)
  msm_g2_2^16  ~300 ms      (G2 ~3x G1, multiexp.cpp:311-312)
  ntt_2^16     ~4 ms        ntt_2^21      ~125 ms
  mont_mul     ~1.0e9/s     (16 cores x ~65M 254-bit Montgomery muls/s)
  full proof   ~3 s

Env knobs: BENCH_QUICK=1 -> headline only; BENCH_FULL=1 -> adds the full
keyless proof (long first-compile).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import traceback

_REPO = os.path.dirname(os.path.abspath(__file__))
RESULTS = []
HEADLINE = [None]  # mutable slot; re-printed after every later metric


def _flush_local():
    try:
        with open(os.path.join(_REPO, "BENCH_LOCAL.json"), "w") as f:
            json.dump(RESULTS, f, indent=1)
    except OSError:
        pass


def sync(out):
    """Force completion via a tiny host readback.

    jax.block_until_ready is a NO-OP over the axon TPU tunnel (measured:
    returns in 0.1 ms while the computation takes 64 ms) — every timing
    must round-trip a value to the host instead."""
    import jax
    import numpy as np

    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1] if hasattr(leaf, "ravel") else leaf))
    return out


def timeit(fn, iters=3, warmup=1):
    for _ in range(warmup):
        sync(fn())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn())
        times.append(time.perf_counter() - t0)
    return min(times)


def emit(metric, value, unit, baseline, headline=False):
    rec = {
        "metric": metric,
        "value": round(value, 3),
        "unit": unit,
        "vs_baseline": round(baseline / value, 3) if baseline else None,
    }
    RESULTS.append(rec)
    _flush_local()
    print(json.dumps(rec), flush=True)
    if headline:
        HEADLINE[0] = rec
    elif HEADLINE[0] is not None:
        # keep the headline as the last complete line at any truncation point
        print(json.dumps(HEADLINE[0]), flush=True)
    return rec


def emit_error(metric, err):
    rec = {"metric": metric, "error": str(err)[:300], "value": None, "unit": None, "vs_baseline": None}
    RESULTS.append(rec)
    _flush_local()
    print(json.dumps(rec), flush=True)
    if HEADLINE[0] is not None:
        print(json.dumps(HEADLINE[0]), flush=True)


def guarded(metric, budget_s, fn):
    """Run fn() in a watchdog thread; on timeout/exception, record and move on."""
    box = {}

    def run():
        try:
            fn()
            box["ok"] = True
        except Exception:  # noqa: BLE001
            box["err"] = traceback.format_exc(limit=3)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(budget_s)
    if t.is_alive():
        emit_error(metric, f"watchdog timeout after {budget_s}s")
        return False
    if "err" in box:
        emit_error(metric, box["err"].strip().splitlines()[-1])
        return False
    return True


def _probe_backend(timeout_s: float = 600.0):
    """jax.devices() in a watchdog thread: the axon TPU tunnel sometimes
    hangs indefinitely; better to report that than to wedge the bench."""
    out = {}

    def probe():
        import jax

        out["devices"] = [str(d) for d in jax.devices()]

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return out.get("devices")


def main() -> int:
    from keyless_zk_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    devices = _probe_backend()
    if devices is None:
        print(
            json.dumps(
                {
                    "metric": "msm_g1_2^16",
                    "error": "device backend unavailable (axon tunnel timeout)",
                    "value": None,
                    "unit": "ms",
                    "vs_baseline": None,
                }
            ),
            flush=True,
        )
        return 0
    print(json.dumps({"devices": devices}), flush=True)

    import jax

    from keyless_zk_tpu.curves.jacobian import G1_CURVE, G2_CURVE
    from keyless_zk_tpu.fields import jax_field as jf
    from keyless_zk_tpu.fields.jax_field import FR
    from keyless_zk_tpu.groth16.prover import Groth16Prover
    from keyless_zk_tpu.ops.msm import msm

    get_plan = Groth16Prover._pick_plan  # MXU matmul NTT on TPU
    from keyless_zk_tpu.ops.testgen import random_points, random_scalars

    quick = os.environ.get("BENCH_QUICK") == "1"
    full = os.environ.get("BENCH_FULL") == "1"

    # ---- MSM 2^16 G1 (headline — measured and printed FIRST) ---------------
    n = 1 << 16
    px, py, pinf = random_points(n, seed=42)
    scalars = random_scalars(n, seed=43)
    jax.block_until_ready((px, py, scalars))

    t = timeit(lambda: msm(px, py, pinf, scalars, curve=G1_CURVE))
    emit("msm_g1_2^16", t * 1e3, "ms", 100.0, headline=True)

    if not quick:
        # ---- mont_mul throughput ------------------------------------------
        def mont_mul_bench():
            m = 1 << 22
            a = random_scalars(m, seed=1).reshape(m, 16)
            b = random_scalars(m, seed=2).reshape(m, 16)
            jax.block_until_ready((a, b))
            mm = jax.jit(lambda x, y: jf.mont_mul(x, y, FR))
            tm = timeit(lambda: mm(a, b))
            gops = m / tm / 1e9
            rec = emit("mont_mul_fr", gops, "Gops/s", None)
            rec["vs_baseline"] = round(gops / 1.0, 3)  # anchor: ~1e9 muls/s, 16 cores
            _flush_local()

        guarded("mont_mul_fr", 420, mont_mul_bench)

        # ---- EC mixed add throughput --------------------------------------
        def ec_madd_bench():
            acc = G1_CURVE.from_affine(px, py, pinf)
            madd = jax.jit(lambda p, x, y, i: G1_CURVE.add_mixed(p, x, y, i))
            te = timeit(lambda: madd(acc, px, py, pinf))
            emit("ec_madd_g1", n / te / 1e6, "Mops/s", None)

        guarded("ec_madd_g1", 300, ec_madd_bench)

        # ---- NTT 2^16 ------------------------------------------------------
        def ntt16_bench():
            plan16 = get_plan(16)
            poly = random_scalars(1 << 16, seed=3)
            ntt16 = jax.jit(plan16.ntt)
            tn = timeit(lambda: ntt16(poly))
            emit("ntt_2^16", tn * 1e3, "ms", 4.0)

        guarded("ntt_2^16", 420, ntt16_bench)

        # ---- NTT 2^21 (production domain) ---------------------------------
        def ntt21_bench():
            plan21 = get_plan(21)
            poly21 = random_scalars(1 << 21, seed=4)
            ntt21 = jax.jit(plan21.ntt)
            tn21 = timeit(lambda: ntt21(poly21), iters=2)
            emit("ntt_2^21", tn21 * 1e3, "ms", 125.0)

        guarded("ntt_2^21", 600, ntt21_bench)

        # ---- MSM 2^16 G2 ---------------------------------------------------
        def g2_bench():
            qx, qy, qinf = random_points(n, seed=44, curve=G2_CURVE)
            jax.block_until_ready(qx)
            tg2 = timeit(lambda: msm(qx, qy, qinf, scalars, curve=G2_CURVE), iters=2)
            emit("msm_g2_2^16", tg2 * 1e3, "ms", 300.0)

        guarded("msm_g2_2^16", 600, g2_bench)

        # ---- MSM 2^20 G1 ---------------------------------------------------
        def g1_20_bench():
            n20 = 1 << 20
            px20, py20, pinf20 = random_points(n20, seed=45)
            sc20 = random_scalars(n20, seed=46)
            jax.block_until_ready(px20)
            t20 = timeit(lambda: msm(px20, py20, pinf20, sc20, curve=G1_CURVE), iters=2)
            emit("msm_g1_2^20", t20 * 1e3, "ms", 1600.0)

        guarded("msm_g1_2^20", 600, g1_20_bench)

    if full:
        def full_bench():
            sys.path.insert(0, _REPO)
            from scripts.full_prove_tpu import run_full_prove

            res = run_full_prove(config="full")
            emit("full_keyless_proof", res["prove_ms"], "ms", 3000.0)

        guarded("full_keyless_proof", 3000, full_bench)

    # final line: the headline, again
    if HEADLINE[0] is not None:
        print(json.dumps(HEADLINE[0]), flush=True)
    _flush_local()
    return 0


if __name__ == "__main__":
    sys.exit(main())
