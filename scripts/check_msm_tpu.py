"""Quick numeric sanity check of the fused MSM path on the real TPU chip.

Compares msm() against the host reference on small instances (exercises the
Mosaic-compiled window_scan / boundary_merge / weighted_total / horner
kernels, including pltpu.roll semantics that interpret-mode tests cannot
cover), for G1 and G2, at L == 1 and L > 1 slab counts.

Writes a tracked evidence artifact (TPU_CHECK_<round>.json, env
TPU_CHECK_OUT) recording per-case pass/fail + wall time, so on-chip kernel
correctness is auditable from the repo — the analog of the reference's CI
full-prove proof-of-work (.github/workflows/run-tests.yaml:27-48).
"""

import json
import os, sys, time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from keyless_zk_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import jax.numpy as jnp

from keyless_zk_tpu.curves import ref_curve
from keyless_zk_tpu.curves.jacobian import G1_CURVE, G2_CURVE, JacPoint
from keyless_zk_tpu.fields.jax_field import FR
from keyless_zk_tpu.fields.limbs import ints_to_limbs
from keyless_zk_tpu.ops import msm as M

n = int(os.environ.get("N", 1 << 12))
rng = np.random.default_rng(7)
ks = rng.integers(1, 1 << 40, n)
scalars = [int(x) % FR.p for x in rng.integers(0, 1 << 62, n)]
scalars[0] = 0
for i in range(0, n, 5):
    scalars[i] = scalars[1]  # digit collisions
slimbs = jnp.asarray(ints_to_limbs(scalars))

failures = 0
cases = []
for label, group, curve in (("G1", ref_curve.G1, G1_CURVE), ("G2", ref_curve.G2, G2_CURVE)):
    gen = ref_curve.G1_GEN if label == "G1" else ref_curve.G2_GEN
    pts = [group.mul(gen, int(k)) for k in ks]
    pts[3] = None
    px, py, pinf = curve.encode_affine(pts)
    want = None
    for p, k in zip(pts, scalars):
        if p is None or k == 0:
            continue
        want = group.add(want, group.mul(p, k))

    for v in (4096, 1024):  # L == 1 and L == 4
        t0 = time.monotonic()
        got = M.msm(px, py, pinf, slimbs, curve=curve, scan_v=v)
        [dec] = curve.decode_jacobian(JacPoint(got.x[None], got.y[None], got.z[None]))
        status = "OK" if dec == want else "MISMATCH"
        dt = time.monotonic() - t0
        print(f"{label} V={v}: {status}  ({dt:.1f}s)", flush=True)
        cases.append({"group": label, "scan_v": v, "n": n, "ok": dec == want,
                      "wall_s": round(dt, 1)})
        failures += dec != want

out_path = os.environ.get(
    "TPU_CHECK_OUT", os.path.join(_REPO, "TPU_CHECK_r03.json")
)
import jax

with open(out_path, "w") as f:
    json.dump(
        {
            "devices": [str(d) for d in jax.devices()],
            "cases": cases,
            "ok": failures == 0,
        },
        f,
        indent=1,
    )
print(f"wrote {out_path}", flush=True)
sys.exit(1 if failures else 0)
