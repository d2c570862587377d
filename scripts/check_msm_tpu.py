"""Quick numeric sanity check of the fused MSM path on the real TPU chip.

Compares msm() against the host reference on a small instance (exercises
the Mosaic-compiled window_scan / boundary_merge / weighted_total kernels,
including pltpu.roll semantics that interpret-mode tests cannot cover).
"""

import os, sys, time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from keyless_zk_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import jax.numpy as jnp

from keyless_zk_tpu.curves import ref_curve
from keyless_zk_tpu.curves.jacobian import G1_CURVE, JacPoint
from keyless_zk_tpu.fields.jax_field import FR
from keyless_zk_tpu.fields.limbs import ints_to_limbs
from keyless_zk_tpu.ops import msm as M

n = 1 << 12
rng = np.random.default_rng(7)
pts = [ref_curve.G1.mul(ref_curve.G1_GEN, int(k)) for k in rng.integers(1, 1 << 30, n)]
pts[3] = None
scalars = [int(x) % FR.p for x in rng.integers(0, 1 << 62, n)]
scalars[0] = 0
for i in range(0, n, 5):
    scalars[i] = scalars[1]  # digit collisions
px, py, pinf = G1_CURVE.encode_affine(pts)
slimbs = jnp.asarray(ints_to_limbs(scalars))

want = None
for p, k in zip(pts, scalars):
    if p is None or k == 0:
        continue
    want = ref_curve.G1.add(want, ref_curve.G1.mul(p, k))

for lanes in (4096, 1024):  # L == 1 and L == 4
    t0 = time.monotonic()
    got = M.msm(px, py, pinf, slimbs, curve=G1_CURVE, lanes=lanes)
    [dec] = G1_CURVE.decode_jacobian(JacPoint(got.x[None], got.y[None], got.z[None]))
    status = "OK" if dec == want else "MISMATCH"
    print(f"lanes={lanes}: {status}  ({time.monotonic()-t0:.1f}s)", flush=True)
    if dec != want:
        sys.exit(1)
print("all ok")
