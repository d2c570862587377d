"""Capture a JAX profiler trace of the 2^16 MSM on the real chip."""

import os, sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from keyless_zk_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import jax, jax.numpy as jnp

from keyless_zk_tpu.curves.jacobian import G1_CURVE
from keyless_zk_tpu.curves import ref_curve
from keyless_zk_tpu.fields.jax_field import FR
from keyless_zk_tpu.fields.limbs import ints_to_limbs
from keyless_zk_tpu.ops.msm import msm

n = 1 << 16
rng = np.random.default_rng(42)
pool = 64
pts = [ref_curve.G1.mul(ref_curve.G1_GEN, int(k)) for k in rng.integers(1, 1 << 62, pool)]
px0, py0, pinf0 = G1_CURVE.encode_affine(pts)
reps = n // pool
px = jnp.asarray(np.tile(np.asarray(px0), (reps, 1)))
py = jnp.asarray(np.tile(np.asarray(py0), (reps, 1)))
pinf = jnp.asarray(np.tile(np.asarray(pinf0), reps))
scalars = jnp.asarray(ints_to_limbs([int(x) % FR.p for x in rng.integers(1, 1 << 63, n)]))

out = jax.block_until_ready(msm(px, py, pinf, scalars, curve=G1_CURVE))  # compile

with jax.profiler.trace("/tmp/jax_trace"):
    out = jax.block_until_ready(msm(px, py, pinf, scalars, curve=G1_CURVE))
print("trace written")
