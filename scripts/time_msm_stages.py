"""Time cumulative stage variants of the fused MSM (one jit each).

Stage deltas isolate: sort+gather | scan kernel | bucket scatter |
boundary merge | weighted reduction + horner. Every variant runs the full
26-window loop under lax.map like the real MSM.
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

n = 1 << 16
c = M.msm_window_bits(n)
lanes = 1 << 12
rng = np.random.default_rng(42)
pool = 64
pts = [ref_curve.G1.mul(ref_curve.G1_GEN, int(k)) for k in rng.integers(1, 1 << 62, pool)]
px0, py0, pinf0 = G1_CURVE.encode_affine(pts)
reps = n // pool
px = jnp.asarray(np.tile(np.asarray(px0), (reps, 1)))
py = jnp.asarray(np.tile(np.asarray(py0), (reps, 1)))
pinf = jnp.asarray(np.tile(np.asarray(pinf0), reps))
scalars = jnp.asarray(ints_to_limbs([int(x) % FR.p for x in rng.integers(1, 1 << 63, n)]))

V = lanes
L = n // V
n_buckets = max(1 << c, 128)
DUMP = n_buckets


def common(points_x, points_y, points_inf, scalars):
    digits_all = M.extract_digits(scalars, c)
    pxm = jnp.concatenate([points_x, jnp.zeros((1, NUM_LIMBS), points_x.dtype)]).T
    pym = jnp.concatenate([points_y, jnp.zeros((1, NUM_LIMBS), points_y.dtype)]).T
    pinf_ext = jnp.concatenate([points_inf, jnp.ones((1,), bool)])
    return digits_all, pxm, pym, pinf_ext


def stage_sorted(digits, pxm, pym, pinf_ext):
    iota = jax.lax.iota(jnp.int32, digits.shape[0])
    keys_sorted, order = jax.lax.sort((digits, iota), num_keys=1, is_stable=True)
    idx_sm = order.reshape(V, L).T
    keys_sm = keys_sorted.reshape(V, L).T
    flat = idx_sm.reshape(-1)
    gx = pxm[:, flat].reshape(NUM_LIMBS, L, V).transpose(1, 0, 2)
    gy = pym[:, flat].reshape(NUM_LIMBS, L, V).transpose(1, 0, 2)
    ginf = pinf_ext[flat].reshape(L, V) | (keys_sm == 0)
    return keys_sm, gx, gy, ginf


@jax.jit
def v_sort(px_, py_, pinf_, s_):
    digits_all, pxm, pym, pinf_ext = common(px_, py_, pinf_, s_)

    def win(digits):
        keys_sm, gx, gy, ginf = stage_sorted(digits, pxm, pym, pinf_ext)
        return gx.sum() + gy.sum() + keys_sm.sum().astype(jnp.uint32)

    return jax.lax.map(win, digits_all).sum()


@jax.jit
def v_scan(px_, py_, pinf_, s_):
    digits_all, pxm, pym, pinf_ext = common(px_, py_, pinf_, s_)

    def win(digits):
        keys_sm, gx, gy, ginf = stage_sorted(digits, pxm, pym, pinf_ext)
        outs = pallas_msm.window_scan(keys_sm, gx, gy, ginf)
        return sum(o.sum().astype(jnp.uint32) for o in outs[1:4])

    return jax.lax.map(win, digits_all).sum()


@jax.jit
def v_scatter(px_, py_, pinf_, s_):
    digits_all, pxm, pym, pinf_ext = common(px_, py_, pinf_, s_)

    def win(digits):
        keys_sm, gx, gy, ginf = stage_sorted(digits, pxm, pym, pinf_ext)
        (ekey, ex, ey, ez, *_rest) = pallas_msm.window_scan(keys_sm, gx, gy, ginf)
        bx = jnp.zeros((NUM_LIMBS, n_buckets + 1), jnp.uint32)
        by = jnp.zeros_like(bx)
        bz = jnp.zeros_like(bx)
        eidx = _sel(ekey >= 0, ekey, DUMP).reshape(-1)
        bx = bx.at[:, eidx].set(ex.transpose(1, 0, 2).reshape(NUM_LIMBS, L * V))
        by = by.at[:, eidx].set(ey.transpose(1, 0, 2).reshape(NUM_LIMBS, L * V))
        bz = bz.at[:, eidx].set(ez.transpose(1, 0, 2).reshape(NUM_LIMBS, L * V))
        return bx.sum() + by.sum() + bz.sum()

    return jax.lax.map(win, digits_all).sum()


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)


timeit("sort+gather      ", v_sort, px, py, pinf, scalars)
timeit("  + scan kernel  ", v_scan, px, py, pinf, scalars)
timeit("  + scatter      ", v_scatter, px, py, pinf, scalars)


def full(px_, py_, pinf_, s_):
    return M.msm(px_, py_, pinf_, s_, curve=G1_CURVE)


timeit("full msm         ", full, px, py, pinf, scalars)
