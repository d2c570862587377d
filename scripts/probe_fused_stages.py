"""Per-stage cost split of the CURRENT flat-stream fused MSM.

Measures by SUBSTITUTION: each variant replaces ONE real Pallas kernel
with a shape-correct fake whose outputs still depend on its inputs (so
XLA cannot dead-code the upstream stages), then re-times the whole
pipeline. full - variant = that kernel's cost; the all-fakes variant is
the residual XLA work (digit extract, sort, compaction, stream/table
gathers, bucket geometry).

    N_POW=20 [C_BITS=..] [V_POW=..] python scripts/probe_fused_stages.py
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

px, py, pinf = random_points(n, seed=42)
scalars = random_scalars(n, seed=43)
jax.block_until_ready((px, py, scalars))

c = int(os.environ.get("C_BITS", "0")) or M.fused_window_bits(n)
tag = "fq"
V = 1 << int(os.environ.get("V_POW", "0")) if os.environ.get("V_POW") else M._default_scan_v(tag)
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

REAL = {
    name: getattr(pallas_msm, name)
    for name in ("window_scan", "boundary_merge", "weighted_bucket_total", "horner_total")
}


def _tap(*arrays):
    """A scalar that depends on every input (keeps upstream live)."""
    return sum(jnp.sum(a.astype(jnp.uint32)) for a in arrays)


def fake_scan(tag, keys, flags, px_, py_, *, V, assume_distinct=True):
    L, _, Wd = keys.shape
    t = _tap(keys, flags, px_, py_)
    emit = jnp.broadcast_to(t, (R, L, 8, Wd)).astype(jnp.uint32)
    k1 = jnp.zeros((1, 8, Wd), jnp.int32) + t.astype(jnp.int32) * 0
    p1 = jnp.broadcast_to(t, (R, 1, 8, Wd)).astype(jnp.uint32)
    return (emit, emit, emit, k1, p1, p1, p1, k1, p1, p1, p1)


def fake_merge(tag, keys, px_, py_, pz_, max_steps=None):
    t = _tap(keys, px_, py_, pz_) + (0 if max_steps is None else max_steps.astype(jnp.uint32) * 0)
    return tuple(jnp.broadcast_to(t, p.shape).astype(jnp.uint32) for p in (px_, py_, pz_))


def fake_wt(tag, bx, by, bz):
    t = _tap(bx, by, bz)
    shp = (bx.shape[0], R)
    return tuple(jnp.broadcast_to(t, shp).astype(jnp.uint32) for _ in range(3))


def fake_horner(tag, wx, wy, wz, c):
    t = _tap(wx, wy, wz)
    return tuple(jnp.broadcast_to(t, (R,)).astype(jnp.uint32) for _ in range(3))


FAKES = {
    "window_scan": fake_scan,
    "boundary_merge": fake_merge,
    "weighted_bucket_total": fake_wt,
    "horner_total": fake_horner,
}


def variant(replaced):
    """jit of the pipeline with `replaced` kernels faked."""

    def run(px_, py_, pinf_, sc_):
        for name in REAL:
            setattr(pallas_msm, name, FAKES[name] if name in replaced else REAL[name])
        try:
            out = M._msm_pippenger_fused.__wrapped__(
                px_, py_, pinf_, sc_, tag=tag, c=c, v=V, cap=cap, chunk=chunk,
                assume_distinct=True,
            )
            return jnp.sum(out.x) + jnp.sum(out.y) + jnp.sum(out.z)
        finally:
            for name, fn in REAL.items():
                setattr(pallas_msm, name, fn)

    return jax.jit(run)


def timeit(name, fn, iters=3):
    t0 = time.perf_counter()
    out = fn(px, py, pinf, scalars)
    np.asarray(jax.device_get(out.ravel()[:1]))
    print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(px, py, pinf, scalars)
        np.asarray(jax.device_get(out.ravel()[:1]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best * 1e3:.1f} ms", flush=True)
    return best


full = timeit("full", variant(frozenset()))
no_scan = timeit("no_scan", variant(frozenset({"window_scan"})))
no_merge = timeit("no_merge", variant(frozenset({"boundary_merge"})))
no_wt = timeit("no_wt", variant(frozenset({"weighted_bucket_total", "horner_total"})))
residual = timeit("residual(all fakes)", variant(frozenset(FAKES)))

print(
    f"\nsplit @ n=2^{N_POW}: scan={1e3 * (full - no_scan):.1f}ms "
    f"merge={1e3 * (full - no_merge):.1f}ms "
    f"reduce+horner={1e3 * (full - no_wt):.1f}ms "
    f"sort+gather+geometry(residual)={1e3 * residual:.1f}ms "
    f"full={1e3 * full:.1f}ms",
    flush=True,
)
