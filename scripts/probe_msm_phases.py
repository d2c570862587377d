"""Measure where the 2^16 G1 MSM time goes on the real TPU chip.

Times each phase of ops/msm.py's Pippenger in isolation:
  - madd throughput (pure group-law kernel, V-wide)
  - digit extract + sort + gather
  - the L-step chunk scan (with its per-step bucket scatters)
  - boundary merge + weighted bucket reduction
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
from keyless_zk_tpu.fields import jax_field as jf
from keyless_zk_tpu.fields.jax_field import FR
from keyless_zk_tpu.fields.limbs import ints_to_limbs
from keyless_zk_tpu.ops import msm as M

N_POW = 16
n = 1 << N_POW
rng = np.random.default_rng(0)
pool = 64
pts = [ref_curve.G1.mul(ref_curve.G1_GEN, int(k)) for k in rng.integers(1, 1 << 62, pool)]
px0, py0, pinf0 = G1_CURVE.encode_affine(pts)
reps = n // pool
px = jnp.asarray(np.tile(np.asarray(px0), (reps, 1)))
py = jnp.asarray(np.tile(np.asarray(py0), (reps, 1)))
pinf = jnp.asarray(np.tile(np.asarray(pinf0), reps))
scalars = jnp.asarray(ints_to_limbs([int(x) % FR.p for x in rng.integers(1, 1 << 63, n)]))

c = M.msm_window_bits(n)
print(f"n=2^{N_POW}  window c={c}  windows={-(-254 // c)}", flush=True)

curve = M._accelerated(G1_CURVE)


def timeit(name, fn, *args, iters=3):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.2f} ms", flush=True)
    return out


# --- pure madd throughput ---------------------------------------------------
V = 1 << 12
accp = curve.from_affine(px[:V], py[:V], pinf[:V])


@jax.jit
def madd_loop(acc, qx, qy, qi):
    def body(i, a):
        return curve.add_mixed(a, qx, qy, qi)

    return jax.lax.fori_loop(0, 16, body, acc)


out = timeit("madd x16 (V=4096; 65536 madds)", madd_loop, accp, px[:V], py[:V], pinf[:V])

# --- digit extract + sort + gather -----------------------------------------
@jax.jit
def sort_gather(scalars, px, py, pinf):
    digits = M.extract_digits(scalars, c)
    d0 = digits[0]
    order = jnp.argsort(d0)
    return (
        jnp.take(d0, order),
        jnp.take(px, order, axis=0),
        jnp.take(py, order, axis=0),
        jnp.take(pinf, order),
    )


timeit("extract+sort+gather (1 window)", sort_gather, scalars, px, py, pinf)

# --- full single window (scan + merge + reduction) ---------------------------
@functools.partial(jax.jit, static_argnames=())
def one_window(scalars, px, py, pinf):
    digits = M.extract_digits(scalars, c)

    # replicate _msm_pippenger's window_sum on window 0 only
    def window_sum(digits):
        pass

    # call internals by running _msm_pippenger with a single-window digit set
    return digits


# time the whole MSM for reference
@jax.jit
def full(px, py, pinf, scalars):
    return M.msm(px, py, pinf, scalars, curve=G1_CURVE)


timeit("full msm 2^16", lambda a, b, c2, d: M.msm(a, b, c2, d, curve=G1_CURVE), px, py, pinf, scalars)

# --- suffix scan over bucket table (weighted reduction cost) -----------------
nb = 1 << c
k = min(nb, V)
bk = curve.infinity((nb,))
bk = JacPoint(
    bk.x.at[:k].set(out.x[:k]), bk.y.at[:k].set(out.y[:k]), bk.z.at[:k].set(out.z[:k])
)


@jax.jit
def reduction(bk):
    suf = M.suffix_sum_points(curve, bk)
    seg = JacPoint(*jax.tree.map(lambda a: a[1:], suf))
    return M.tree_reduce_points(curve, seg, nb - 1)


timeit(f"weighted reduction (2^{c} buckets) x1 window", reduction, bk)

# --- scatter cost: V-wide bucket write --------------------------------------
@jax.jit
def scatter_once(bk, idx, pt):
    return JacPoint(
        bk.x.at[idx].set(pt.x), bk.y.at[idx].set(pt.y), bk.z.at[idx].set(pt.z)
    )


idx = jnp.asarray(rng.integers(0, nb, V), dtype=jnp.int32)
timeit("bucket scatter (V=4096) x1", scatter_once, bk, idx, out)
