"""Cumulative stage timings of the CURRENT fused MSM (round-4 folded form).

Variants (each its own jit, early-exiting the real pipeline):
  A. digits + packed sort
  B. A + folded gather + ONE window_scan over g*V lanes
  C. B + boundary merge + batched searchsorted + bucket-table gathers
  D. full msm()
Deltas give: sort | scan kernel | merge+gather | reduce+horner.

    N_POW=16 python scripts/probe_fused_stages.py
"""

import os, sys, time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from keyless_zk_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import jax, jax.numpy as jnp

from keyless_zk_tpu.curves.jacobian import G1_CURVE
from keyless_zk_tpu.ops import msm as M
from keyless_zk_tpu.ops import pallas_msm
from keyless_zk_tpu.ops.pallas_ec import field_for
from keyless_zk_tpu.ops.testgen import random_points, random_scalars

N_POW = int(os.environ.get("N_POW", "16"))
n = 1 << N_POW
V = 1 << int(os.environ.get("V_POW", "13"))

px, py, pinf = random_points(n, seed=42)
scalars = random_scalars(n, seed=43)
jax.block_until_ready((px, py, scalars))

c = int(os.environ.get("C_BITS", "0")) or M.fused_window_bits(n)
tag = "fq"
R = field_for(tag).rows
Wn = -(-M.SCALAR_BITS // c)
nnz = int(M._count_nonzero_digits(scalars, c=c))
cap = min(max(V, 1 << max(nnz - 1, 1).bit_length()),
          1 << (Wn * n - 1).bit_length())
chunk = min(cap, M._flat_chunk_entries(tag))
print(
    f"n=2^{N_POW} flat c={c} windows={Wn} V={V} nnz={nnz} cap={cap} chunk={chunk}",
    flush=True,
)


def cut(stage):
    """Build a jit that runs _msm_pippenger_fused but stops after `stage`
    by monkeypatching downstream kernels to cheap passthroughs."""

    real_scan = pallas_msm.window_scan
    real_merge = pallas_msm.boundary_merge
    real_wt = pallas_msm.weighted_bucket_total
    real_h = pallas_msm.horner_total

    class Stop(Exception):
        pass

    box = {}

    def fake_scan(*a, **k):
        box["out"] = sum(jnp.sum(x.astype(jnp.uint32)) for x in a[1:3])
        raise Stop

    def fake_merge(tag, keys, *pts):
        box["out"] = sum(jnp.sum(p) for p in pts) + jnp.sum(keys).astype(jnp.uint32)
        raise Stop

    def fake_wt(tag, bx, by, bz):
        box["out"] = jnp.sum(bx) + jnp.sum(by) + jnp.sum(bz)
        raise Stop

    patches = {
        "sort": {"window_scan": fake_scan},
        "scan": {"boundary_merge": fake_merge},
        "tables": {"weighted_bucket_total": fake_wt},
        "full": {},
    }[stage]

    def run(px_, py_, pinf_, sc_):
        for name, fn in patches.items():
            setattr(pallas_msm, name, fn)
        try:
            out = M._msm_pippenger_fused.__wrapped__(
                px_, py_, pinf_, sc_, tag=tag, c=c, v=V, cap=cap, chunk=chunk,
                assume_distinct=True,
            )
            return out.x.sum() + out.y.sum() + out.z.sum()
        except Stop:
            return box["out"]
        finally:
            pallas_msm.window_scan = real_scan
            pallas_msm.boundary_merge = real_merge
            pallas_msm.weighted_bucket_total = real_wt
            pallas_msm.horner_total = real_h

    return jax.jit(run)


def timeit(name, fn, *args, iters=3):
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[:1]))
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[:1]))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.2f} ms", flush=True)


timeit("A sort          ", cut("sort"), px, py, pinf, scalars)
timeit("B +scan         ", cut("scan"), px, py, pinf, scalars)
timeit("C +merge+gather ", cut("tables"), px, py, pinf, scalars)
timeit("D full          ", cut("full"), px, py, pinf, scalars)
