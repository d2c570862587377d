"""Headline benchmark: G1 Pippenger MSM throughput on one chip.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no wall-clock numbers (BASELINE.md); the anchor
used for vs_baseline is a rapidsnark-class 16-core CPU doing a 2^16-point
BN254 G1 MSM in ~100 ms (derived from its full-proof profile: 4x ~1.3M-point
MSMs + 1x 2M inside a single-digit-second proof, SURVEY §6). vs_baseline > 1
means faster than that anchor.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

N_POW = 16
CPU_BASELINE_MS = 100.0


def main() -> None:
    from keyless_zk_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax

    from keyless_zk_tpu.curves.jacobian import G1_CURVE
    from keyless_zk_tpu.curves import ref_curve
    from keyless_zk_tpu.fields import jax_field as jf
    from keyless_zk_tpu.fields.jax_field import FR, FQ
    from keyless_zk_tpu.fields.limbs import ints_to_limbs
    from keyless_zk_tpu.ops.msm import msm

    n = 1 << N_POW
    rng = np.random.default_rng(42)

    # random points: cheap to fabricate as random multiples of G via a few
    # host muls + batched device doublings would still be slow; instead take
    # a small pool of host points and tile it (bucket paths don't care).
    pool = 64
    pts = [
        ref_curve.G1.mul(ref_curve.G1_GEN, int(k))
        for k in rng.integers(1, 1 << 62, pool)
    ]
    px0, py0, pinf0 = G1_CURVE.encode_affine(pts)
    reps = n // pool
    px = np.tile(np.asarray(px0), (reps, 1))
    py = np.tile(np.asarray(py0), (reps, 1))
    pinf = np.tile(np.asarray(pinf0), reps)
    scalars = ints_to_limbs([int(x) % FR.p for x in rng.integers(1, 1 << 63, n) * rng.integers(1, 1 << 63, n)])

    import jax.numpy as jnp

    px, py, pinf, scalars = map(jnp.asarray, (px, py, pinf, scalars))

    def run():
        out = msm(px, py, pinf, scalars, curve=G1_CURVE)
        jax.block_until_ready(out)
        return out

    run()  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    ms = min(times) * 1e3
    print(
        json.dumps(
            {
                "metric": f"msm_g1_2^{N_POW}",
                "value": round(ms, 2),
                "unit": "ms",
                "vs_baseline": round(CPU_BASELINE_MS / ms, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
