"""Round-2 probe: stage-level timing of the fused 2^16 G1 MSM on the chip.

Isolates, with one jit each:
  0. VPU u32-multiply throughput (raw elementwise mult on (16,1024) tiles)
  1. pure fused-madd kernel throughput
  2. digit extract + batched sort (all windows in one lax.sort)
  3. gather (master-table limb-major gather, all windows)
  4. window_scan pallas kernels alone (pre-sorted inputs)
  5. bucket scatter (.at[].set) alone
  6. boundary merge + weighted reduction + horner
  7. the full msm for reference
"""

import os, sys, time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from keyless_zk_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import functools
import numpy as np
import jax, jax.numpy as jnp

from keyless_zk_tpu.curves.jacobian import G1_CURVE, JacPoint
from keyless_zk_tpu.curves import ref_curve
from keyless_zk_tpu.fields.jax_field import FR
from keyless_zk_tpu.fields.limbs import NUM_LIMBS, ints_to_limbs
from keyless_zk_tpu.ops import msm as M
from keyless_zk_tpu.ops import pallas_msm
from keyless_zk_tpu.ops.pallas_curve import TILE, _sel

N_POW = int(os.environ.get("N_POW", "16"))
n = 1 << N_POW
rng = np.random.default_rng(42)
pool = 64
pts = [ref_curve.G1.mul(ref_curve.G1_GEN, int(k)) for k in rng.integers(1, 1 << 62, pool)]
px0, py0, pinf0 = G1_CURVE.encode_affine(pts)
reps = n // pool
px = jnp.asarray(np.tile(np.asarray(px0), (reps, 1)))
py = jnp.asarray(np.tile(np.asarray(py0), (reps, 1)))
pinf = jnp.asarray(np.tile(np.asarray(pinf0), reps))
# uniform [0, r): build from 32-byte draws mod p
vals = [int.from_bytes(rng.bytes(32), "little") % FR.p for _ in range(n)]
scalars = jnp.asarray(ints_to_limbs(vals))

c = M.msm_window_bits(n)
W = -(-254 // c)
print(f"n=2^{N_POW}  c={c}  windows={W}", flush=True)

curve = M._accelerated(G1_CURVE)


def _sync(out):
    """block_until_ready is a NO-OP over the axon tunnel; force a tiny
    host readback instead."""
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


NT = 256
big = jnp.asarray(rng.integers(0, 1 << 16, (NUM_LIMBS, NT * TILE)), dtype=jnp.uint32)
r = timeit(f"raw u32 mult x{REPS_MUL} on (16,{NT*TILE}) [{REPS_MUL*NUM_LIMBS*NT*TILE/1e6:.0f}M mults]",
           jax.jit(raw_mult), big, big)
del r

# ---- 1. fused madd kernel throughput ---------------------------------------
from keyless_zk_tpu.ops.pallas_curve import madd_pallas

V = 1 << 13
accp = curve.from_affine(px[:V], py[:V], pinf[:V])


@jax.jit
def madd_loop(acc, qx, qy, qi):
    def body(i, a):
        return curve.add_mixed(a, qx, qy, qi)
    return jax.lax.fori_loop(0, 16, body, acc)


timeit(f"fused madd x16 (V={V}; {16*V//1000}k madds)", madd_loop, accp, px[:V], py[:V], pinf[:V])

# ---- 2. extract + sort (batched over windows) ------------------------------
iota = jax.lax.iota(jnp.int32, n)

@jax.jit
def extract_sort(scalars):
    digits = M.extract_digits(scalars, c)  # (W, n)
    idx = jnp.broadcast_to(iota, (W, n))
    keys, order = jax.lax.sort((digits, idx), num_keys=1, is_stable=True, dimension=1)
    return keys, order


keys, order = timeit("extract + batched sort (all windows)", extract_sort, scalars)

# ---- 3. gather -------------------------------------------------------------
pxm = jnp.concatenate([px, jnp.zeros((1, NUM_LIMBS), px.dtype)]).T
pym = jnp.concatenate([py, jnp.zeros((1, NUM_LIMBS), py.dtype)]).T


@jax.jit
def gather(order):
    gx = pxm[:, order.reshape(-1)]
    gy = pym[:, order.reshape(-1)]
    return gx, gy


gx, gy = timeit("gather all windows (limb-major)", gather, order)

# ---- 4. scan kernels alone --------------------------------------------------
L = n // TILE
pinf_ext = jnp.concatenate([pinf, jnp.ones((1,), bool)])


@jax.jit
def scans(keys, order, gx, gy):
    def one(args):
        k, o, x, y = args
        flat = o.reshape(TILE, L).T.reshape(1, n)
        km = k.reshape(TILE, L).T.reshape(1, n)
        ginf = pinf_ext[flat] | (km == 0)
        # x,y already gathered in sorted order; need step-major relayout
        xs = x.reshape(NUM_LIMBS, TILE, L).transpose(0, 2, 1).reshape(NUM_LIMBS, n)
        ys = y.reshape(NUM_LIMBS, TILE, L).transpose(0, 2, 1).reshape(NUM_LIMBS, n)
        return pallas_msm.window_scan(km, xs, ys, ginf)

    return jax.lax.map(one, (keys, order,
                             gx.reshape(NUM_LIMBS, W, n).transpose(1, 0, 2),
                             gy.reshape(NUM_LIMBS, W, n).transpose(1, 0, 2)))


outs = timeit("window_scan kernels (all windows)", scans, keys, order, gx, gy)
(ekey, ex, ey, ez, hkey, hx, hy, hz, tkey, tx, ty, tz) = outs

# ---- 5. bucket scatter ------------------------------------------------------
n_buckets = max(1 << c, 128)
stride = n_buckets + 1
DUMP = n_buckets
win_id = jnp.arange(W, dtype=jnp.int32)
base = (win_id * stride)[:, None, None]


@jax.jit
def scatter(ekey, ex, ey, ez):
    bx = jnp.zeros((NUM_LIMBS, W * stride), jnp.uint32)
    eidx = (base + _sel(ekey >= 0, ekey, DUMP)).reshape(-1)

    def flat_e(a):
        return a.transpose(1, 0, 2).reshape(NUM_LIMBS, -1)

    bx = bx.at[:, eidx].set(flat_e(ex))
    by = jnp.zeros_like(bx).at[:, eidx].set(flat_e(ey))
    bz = jnp.zeros_like(bx).at[:, eidx].set(flat_e(ez))
    return bx, by, bz


bx, by, bz = timeit("bucket scatter (.at[].set x3)", scatter, ekey, ex, ey, ez)

# ---- 6. merge + reduction + horner -----------------------------------------
@jax.jit
def tail(bx, by, bz, hkey, hx, hy, hz, tkey, tx, ty, tz):
    bkeys = jnp.stack([hkey.reshape(W, TILE), tkey.reshape(W, TILE)], axis=2).reshape(W, 2 * TILE)

    def interleave(h, t):
        return jnp.stack([h.reshape(W, NUM_LIMBS, TILE), t.reshape(W, NUM_LIMBS, TILE)], axis=3).reshape(W, NUM_LIMBS, 2 * TILE)

    bkeys = jax.lax.cummax(bkeys, axis=1)
    mx, my, mz = pallas_msm.boundary_merge(bkeys, interleave(hx, tx), interleave(hy, ty), interleave(hz, tz))
    leader = jnp.concatenate([jnp.ones((W, 1), bool), bkeys[:, 1:] != bkeys[:, :-1]], axis=1)
    bidx = (base[:, 0] + _sel(leader & (bkeys > 0), bkeys, DUMP)).reshape(-1)
    bx = bx.at[:, bidx].set(mx.transpose(1, 0, 2).reshape(NUM_LIMBS, -1))
    by = by.at[:, bidx].set(my.transpose(1, 0, 2).reshape(NUM_LIMBS, -1))
    bz = bz.at[:, bidx].set(mz.transpose(1, 0, 2).reshape(NUM_LIMBS, -1))

    def per_window(a):
        return a.reshape(NUM_LIMBS, W, stride).transpose(1, 0, 2)[:, :, :n_buckets]

    wx, wy, wz = pallas_msm.weighted_bucket_total(per_window(bx), per_window(by), per_window(bz))
    return pallas_msm.horner_total(wx, wy, wz, c)


timeit("merge + weighted reduction + horner", tail, bx, by, bz, hkey, hx, hy, hz, tkey, tx, ty, tz)

# ---- 7. full msm -----------------------------------------------------------
timeit("FULL msm", lambda a, b, c2, d: M.msm(a, b, c2, d, curve=G1_CURVE), px, py, pinf, scalars)
