"""Stage-level timing of the fused G1 MSM on the chip (round-3 pipeline).

Replicates `_msm_pippenger_fused` (ops/msm.py) stage by stage, each under
its own jit, with host-readback sync (block_until_ready is a no-op over
the axon tunnel):

  0. raw u32 multiply throughput (VPU ceiling)
  1. signed digits + one batched sort (all windows)
  2. master-table gather (step-major, all windows)
  3. window_scan pallas kernels (all windows, via lax.map)
  4. tail: searchsorted + boundary merge + weighted reduction + horner
  5. FULL msm (the AOT-cached production entry)

Env: N_POW (default 16), SCAN_V (default 1024).
"""

import os, sys, time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from keyless_zk_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import jax, jax.numpy as jnp

from keyless_zk_tpu.curves.jacobian import G1_CURVE
from keyless_zk_tpu.curves import ref_curve
from keyless_zk_tpu.fields.jax_field import FR
from keyless_zk_tpu.fields.limbs import NUM_LIMBS, ints_to_limbs
from keyless_zk_tpu.ops import msm as M
from keyless_zk_tpu.ops import pallas_msm
from keyless_zk_tpu.ops.pallas_ec import sel as _sel

N_POW = int(os.environ.get("N_POW", "16"))
V = int(os.environ.get("SCAN_V", "1024"))
n = 1 << N_POW
rng = np.random.default_rng(42)
pool = 64
pts = [ref_curve.G1.mul(ref_curve.G1_GEN, int(k)) for k in rng.integers(1, 1 << 62, pool)]
px0, py0, pinf0 = G1_CURVE.encode_affine(pts)
reps = n // pool
px = jnp.asarray(np.tile(np.asarray(px0), (reps, 1)))
py = jnp.asarray(np.tile(np.asarray(py0), (reps, 1)))
pinf = jnp.asarray(np.tile(np.asarray(pinf0), reps))
vals = [int.from_bytes(rng.bytes(32), "little") % FR.p for _ in range(n)]
scalars = jnp.asarray(ints_to_limbs(vals))

c = M.fused_window_bits(n)
Wd = V // 8
L = -(-n // V)
n_p = V * L
half = 1 << (c - 1)
NB = half + 1
NB_pad = -(-NB // pallas_msm.RV) * pallas_msm.RV
print(f"n=2^{N_POW}  c={c}  V={V}  L={L}  NB_pad={NB_pad}", flush=True)


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1] if hasattr(leaf, "ravel") else leaf))
    return out


def timeit(name, fn, *args, iters=3):
    t0 = time.perf_counter()
    out = _sync(fn(*args))
    print(f"  [compile {time.perf_counter()-t0:.1f}s]", end="", flush=True)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f" {name}: {min(ts)*1e3:.2f} ms", flush=True)
    return out


# ---- 0. raw u32 mult throughput via pallas ---------------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS_MUL = 64
TILE = 2048


def _mult_kernel(a_ref, b_ref, o_ref):
    a = a_ref[:]
    b = b_ref[:]
    acc = jnp.zeros_like(a)
    for i in range(REPS_MUL):
        acc = acc + ((a + i) * b & jnp.uint32(0xFFFF))
    o_ref[:] = acc


def raw_mult(a, b):
    return pl.pallas_call(
        _mult_kernel,
        grid=(a.shape[1] // TILE,),
        in_specs=[pl.BlockSpec((NUM_LIMBS, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((NUM_LIMBS, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
    )(a, b)


NT = 128
big = jnp.asarray(rng.integers(0, 1 << 16, (NUM_LIMBS, NT * TILE)), dtype=jnp.uint32)
nmul = REPS_MUL * NUM_LIMBS * NT * TILE
r = timeit(f"raw u32 mult [{nmul/1e6:.0f}M mults]", jax.jit(raw_mult), big, big)
del r, big

# ---- 1. signed digits + batched sort ----------------------------------------
keys0, negs0 = M.extract_digits_signed(scalars, c)
Wn = keys0.shape[0]
iota = jax.lax.iota(jnp.int32, n)
pad = n_p - n


@jax.jit
def extract_sort(scalars):
    keys, negs = M.extract_digits_signed(scalars, c)
    payload = jnp.broadcast_to(iota, (Wn, n)) | (negs << 30)
    if pad:
        keys = jnp.concatenate([jnp.full((Wn, pad), -1, jnp.int32), keys], axis=1)
        payload = jnp.concatenate([jnp.full((Wn, pad), n, jnp.int32), payload], axis=1)
    return jax.lax.sort((keys, payload), num_keys=1, is_stable=True, dimension=1)


keys_s, pay_s = timeit("digits + batched sort (all windows)", extract_sort, scalars)

# ---- 2. gather (step-major, all windows) ------------------------------------
zrow = jnp.zeros((1, NUM_LIMBS), jnp.uint32)
pxm = jnp.concatenate([px, zrow]).T
pym = jnp.concatenate([py, zrow]).T
pinf_ext = jnp.concatenate([pinf, jnp.ones((1,), bool)])


@jax.jit
def gather(pay_s):
    idx = pay_s & ((1 << 30) - 1)
    ord_sm = idx.reshape(Wn, V, L).transpose(0, 2, 1).reshape(Wn, n_p)
    gx = pxm[:, ord_sm.reshape(-1)].reshape(NUM_LIMBS, Wn, n_p)
    gy = pym[:, ord_sm.reshape(-1)].reshape(NUM_LIMBS, Wn, n_p)
    return gx, gy, ord_sm


gx, gy, ord_sm = timeit("gather all windows (limb-major)", gather, pay_s)

# ---- 3. window_scan kernels (all windows) ------------------------------------
@jax.jit
def scans(keys_s, pay_s, gx, gy):
    def one(args):
        kw, pw, x, y = args
        neg = (pw >> 30) & 1
        o = pw & ((1 << 30) - 1)
        osm = o.reshape(V, L).T.reshape(n_p)
        ksm = kw.reshape(V, L).T.reshape(n_p)
        nsm = neg.reshape(V, L).T.reshape(n_p)
        inf_sm = pinf_ext[osm] | (ksm == 0)
        flags = inf_sm.astype(jnp.int32) | (nsm << 1)
        return pallas_msm.window_scan(
            "fq",
            ksm.reshape(L, 8, Wd),
            flags.reshape(L, 8, Wd),
            x.reshape(NUM_LIMBS, L, 8, Wd),
            y.reshape(NUM_LIMBS, L, 8, Wd),
            V=V,
            assume_distinct=True,
        )

    return jax.lax.map(
        one, (keys_s, pay_s, gx.transpose(1, 0, 2), gy.transpose(1, 0, 2))
    )


outs = timeit("window_scan (all windows)", scans, keys_s, pay_s, gx, gy)

# ---- 4. tail: searchsorted + merge + weighted + horner -----------------------
bvals = jax.lax.iota(jnp.int32, NB_pad)


@jax.jit
def tail(keys_s, outs):
    def one(args):
        kw, ex, ey, ez, hk, hx, hy, hz, tk, tx, ty, tz = args
        R = NUM_LIMBS
        bkeys = jnp.stack([hk.reshape(V), tk.reshape(V)], axis=1).reshape(2 * V)
        bkeys = jax.lax.cummax(bkeys)

        def inter(h, t):
            return jnp.stack([h.reshape(R, V), t.reshape(R, V)], axis=2).reshape(R, 2 * V)

        mx, my, mz = pallas_msm.boundary_merge(
            "fq", bkeys[None], inter(hx, tx)[None], inter(hy, ty)[None], inter(hz, tz)[None]
        )
        mx, my, mz = mx[0], my[0], mz[0]
        starts = M._searchsorted(kw, bvals)
        ends = M._searchsorted(kw, bvals + 1) - 1
        interior = (
            (ends >= starts)
            & (starts // L == ends // L)
            & (starts % L != 0)
            & (ends % L != L - 1)
        )
        col = _sel(interior, (ends % L + 1) * V + ends // L, 0)
        lpos = jnp.minimum(M._searchsorted(bkeys, bvals), 2 * V - 1)
        has = (bkeys[lpos] == bvals) & ~interior
        eflat = ex.reshape(R, n_p), ey.reshape(R, n_p), ez.reshape(R, n_p)
        outs_ = []
        im = interior[None, :]
        hm = has[None, :]
        for e, mm in zip(eflat, (mx, my, mz)):
            outs_.append(_sel(im, e[:, col], _sel(hm, mm[:, lpos], jnp.uint32(0))))
        return tuple(outs_)

    (ex, ey, ez, hk, hx, hy, hz, tk, tx, ty, tz) = outs
    dxs, dys, dzs = jax.lax.map(one, (keys_s, ex, ey, ez, hk, hx, hy, hz, tk, tx, ty, tz))
    wx, wy, wz = pallas_msm.weighted_bucket_total("fq", dxs, dys, dzs)
    return pallas_msm.horner_total("fq", wx, wy, wz, c)


# window_scan returns emit keys first; rebuild the tuple for tail
timeit("tail (merge+buckets+horner)", tail, keys_s, outs)

# ---- 5. full msm --------------------------------------------------------------
timeit(
    "FULL msm (AOT path)",
    lambda a, b, c2, d: M.msm(a, b, c2, d, curve=G1_CURVE, scan_v=V),
    px, py, pinf, scalars,
)
