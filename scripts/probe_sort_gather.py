"""Compare sort/gather strategies for the MSM on the real chip.

Variants:
  A. per-window lax.sort under lax.map + column gather   (current)
  B. one batched lax.sort over all windows + column gather
  C. one batched lax.sort + row gather ((n,16) table, gather rows)
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

n = 1 << 16
c = M.msm_window_bits(n)
rng = np.random.default_rng(42)
pool = 64
pts = [ref_curve.G1.mul(ref_curve.G1_GEN, int(k)) for k in rng.integers(1, 1 << 62, pool)]
px0, py0, pinf0 = G1_CURVE.encode_affine(pts)
reps = n // pool
px = jnp.asarray(np.tile(np.asarray(px0), (reps, 1)))
py = jnp.asarray(np.tile(np.asarray(py0), (reps, 1)))
scalars = jnp.asarray(ints_to_limbs([int(x) % FR.p for x in rng.integers(1, 1 << 63, n)]))


@jax.jit
def v_a(px_, py_, s_):
    digits_all = M.extract_digits(s_, c)
    pxm = px_.T
    pym = py_.T

    def win(digits):
        iota = jax.lax.iota(jnp.int32, n)
        keys, order = jax.lax.sort((digits, iota), num_keys=1, is_stable=True)
        gx = pxm[:, order]
        gy = pym[:, order]
        return gx.sum() + gy.sum() + keys.sum().astype(jnp.uint32)

    return jax.lax.map(win, digits_all).sum()


@jax.jit
def v_b(px_, py_, s_):
    digits_all = M.extract_digits(s_, c)  # (Wn, n)
    pxm = px_.T
    pym = py_.T
    wn = digits_all.shape[0]
    iota = jnp.broadcast_to(jax.lax.iota(jnp.int32, n), (wn, n))
    keys, order = jax.lax.sort((digits_all, iota), dimension=1, num_keys=1, is_stable=True)
    flat = order.reshape(-1)
    gx = pxm[:, flat]
    gy = pym[:, flat]
    return gx.sum() + gy.sum() + keys.sum().astype(jnp.uint32)


@jax.jit
def v_c(px_, py_, s_):
    digits_all = M.extract_digits(s_, c)
    wn = digits_all.shape[0]
    iota = jnp.broadcast_to(jax.lax.iota(jnp.int32, n), (wn, n))
    keys, order = jax.lax.sort((digits_all, iota), dimension=1, num_keys=1, is_stable=True)
    flat = order.reshape(-1)
    gx = px_[flat]  # (Wn*n, 16) row gather
    gy = py_[flat]
    return gx.sum() + gy.sum() + keys.sum().astype(jnp.uint32)


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)


timeit("A per-win sort + col gather ", v_a, px, py, scalars)
timeit("B batched sort + col gather ", v_b, px, py, scalars)
timeit("C batched sort + row gather ", v_c, px, py, scalars)
