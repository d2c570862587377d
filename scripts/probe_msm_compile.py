"""Find which MSM stage breaks the TPU compile (axon helper OOM)."""
import os, sys, time
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import functools
import numpy as np
import jax, jax.numpy as jnp

from keyless_zk_tpu.curves.jacobian import G1_CURVE, JacPoint
from keyless_zk_tpu.curves import ref_curve
from keyless_zk_tpu.fields import jax_field as jf
from keyless_zk_tpu.fields.jax_field import FR
from keyless_zk_tpu.fields.limbs import ints_to_limbs
from keyless_zk_tpu.ops import msm as M

n = 1 << 16
rng = np.random.default_rng(0)
pool = 64
pts = [ref_curve.G1.mul(ref_curve.G1_GEN, int(k)) for k in rng.integers(1, 1 << 62, pool)]
px0, py0, pinf0 = G1_CURVE.encode_affine(pts)
reps = n // pool
px = jnp.asarray(np.tile(np.asarray(px0), (reps, 1)))
py = jnp.asarray(np.tile(np.asarray(py0), (reps, 1)))
pinf = jnp.asarray(np.tile(np.asarray(pinf0), reps))
scalars = jnp.asarray(ints_to_limbs([int(x) % FR.p for x in rng.integers(1, 1 << 63, n)]))

def timed(name, fn, *args):
    t0 = time.monotonic()
    out = fn(*args)
    out = jax.block_until_ready(out)
    print(f"{name}: {time.monotonic()-t0:.1f}s", flush=True)
    return out

# stage 1: digit extraction + sort + gathers
@jax.jit
def s1(scalars, px, py, pinf):
    digits = M.extract_digits(scalars, 16)
    d0 = digits[0]
    order = jnp.argsort(d0)
    return (jnp.take(d0, order), jnp.take(px, order, axis=0),
            jnp.take(py, order, axis=0), jnp.take(pinf, order, axis=0) | (jnp.take(d0, order) == 0))

keys, spx, spy, spinf = timed("sort+gather", s1, scalars, px, py, pinf)

# stage 2: the bucket-accumulation scan (V lanes x L steps)
V = 1 << 12
L = n // V
@jax.jit
def s2(keys, spx, spy, spinf):
    curve = G1_CURVE
    keys2 = keys.reshape(V, L); px2 = spx.reshape(V, L, 16); py2 = spy.reshape(V, L, 16); pi2 = spinf.reshape(V, L)
    buckets = curve.infinity((65537,))
    def seed():
        acc0 = curve.from_affine(px2[:, 0], py2[:, 0], pi2[:, 0])
        return (keys2[:, 0], acc0, jnp.ones((V,), bool), jnp.full((V,), -2, keys.dtype), curve.infinity((V,)), buckets)
    def step(t, state):
        cur_key, acc, is_head, head_key, head_pt, bk = state
        k = jax.lax.dynamic_index_in_dim(keys2, t, axis=1, keepdims=False)
        x = jax.lax.dynamic_index_in_dim(px2, t, axis=1, keepdims=False)
        y = jax.lax.dynamic_index_in_dim(py2, t, axis=1, keepdims=False)
        pi = jax.lax.dynamic_index_in_dim(pi2, t, axis=1, keepdims=False)
        same = k == cur_key
        to_head = ~same & is_head
        head_key = jnp.where(to_head, cur_key, head_key)
        head_pt = curve.select(to_head, acc, head_pt)
        idx = jnp.where(~same & ~is_head, cur_key, 65536)
        bk = JacPoint(bk.x.at[idx].set(acc.x), bk.y.at[idx].set(acc.y), bk.z.at[idx].set(acc.z))
        is_head = is_head & same
        fresh = curve.from_affine(x, y, pi)
        grown = curve.add_mixed(acc, x, y, pi)
        acc = curve.select(same, grown, fresh)
        return k, acc, is_head, head_key, head_pt, bk
    out = jax.lax.fori_loop(1, L, step, seed())
    return out[5].x

timed("bucket-scan", s2, keys, spx, spy, spinf)

# stage 3: weighted bucket suffix reduction over 2^16 buckets
@jax.jit
def s3(bx):
    curve = G1_CURVE
    bk = JacPoint(bx, bx, bx)
    mth = 1 << 16
    suf = bk
    s = 1
    while s < mth:
        shifted = jax.tree.map(lambda a: jnp.roll(a, -s, axis=0), suf)
        valid = jnp.arange(mth) < mth - s
        suf = curve.select(valid, curve.add(suf, JacPoint(*shifted)), suf)
        s <<= 1
    seg = JacPoint(*jax.tree.map(lambda a: a[1:], suf))
    return M.tree_reduce_points(curve, seg, mth - 1).x

bx = jnp.asarray(np.tile(np.asarray(px0), (1024, 1)))  # (65536, 16)
timed("bucket-reduce", s3, bx)
print("ALL OK", flush=True)
