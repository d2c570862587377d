"""Microprobes: raw VPU/MXU rates on the attached TPU.

Measures the primitive rates that bound any field-multiply design:
  - u32 elementwise multiply inside a Pallas kernel (CIOS building block)
  - u32 add / shift / and (carry machinery)
  - s8 x s8 -> s32 matmul (MXU byte-plane path)
  - existing mont_mul_pallas (CIOS kernel) throughput
  - existing jf.mont_mul (XLA) throughput
Prints one JSON line per probe.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))
    return out


def timeit(fn, iters=5, warmup=2):
    for _ in range(warmup):
        sync(fn())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn())
        times.append(time.perf_counter() - t0)
    return min(times)


def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


# ---- 1. VPU op-rate kernels -------------------------------------------------

def _mul_kernel(reps):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        acc = a
        for _ in range(reps):
            acc = (acc * b) & 0xFFFF
        o_ref[...] = acc

    return kernel


def _mad_kernel(reps):
    """mult + add + shift + and: one CIOS product step."""
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        acc = a
        lo = a
        for _ in range(reps):
            p = acc * b
            lo = lo + (p & 0xFFFF)
            acc = acc + (p >> 16)
        o_ref[...] = acc + lo

    return kernel


def probe_vpu(name, mk, reps=256, rows=64, width=2048):
    call = pl.pallas_call(
        mk(reps),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, width), jnp.uint32),
    )
    a = jnp.ones((rows, width), jnp.uint32) * 3
    b = jnp.ones((rows, width), jnp.uint32) * 5
    f = jax.jit(lambda x, y: call(x, y))
    t = timeit(lambda: f(a, b))
    lanes = rows * width
    emit(name, ns_total=t * 1e9, gops=lanes * reps / t / 1e9)


# ---- 2. MXU matmul rates ----------------------------------------------------

def probe_matmul(dtype, M, K, N, acc_type, reps=8):
    a = jnp.ones((M, K), dtype)
    b = jnp.ones((K, N), dtype)

    @jax.jit
    def f(a, b):
        out = None
        for i in range(reps):
            r = jax.lax.dot_general(
                a + jnp.array(i, dtype), b,
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_type,
            )
            out = r if out is None else out + r
        return out

    t = timeit(lambda: f(a, b))
    macs = M * K * N * reps
    emit(
        f"matmul_{dtype.__name__}_{M}x{K}x{N}",
        ms=t * 1e3,
        tops=macs * 2 / t / 1e12,
    )


def main():
    emit("devices", devices=[str(d) for d in jax.devices()])

    probe_vpu("vpu_u32_mul", _mul_kernel)
    probe_vpu("vpu_u32_mad", _mad_kernel)

    probe_matmul(jnp.int8, 4096, 1024, 64, jnp.int32)
    probe_matmul(jnp.int8, 4096, 1024, 256, jnp.int32)
    probe_matmul(jnp.int8, 8192, 8192, 8192, jnp.int32)
    probe_matmul(jnp.bfloat16, 8192, 8192, 8192, jnp.float32)
    probe_matmul(jnp.int8, 16384, 32, 32, jnp.int32)
    probe_matmul(jnp.int8, 16384, 128, 128, jnp.int32)

    # existing kernels
    from keyless_zk_tpu.fields import jax_field as jf
    from keyless_zk_tpu.fields.jax_field import FR
    from keyless_zk_tpu.ops.pallas_field import mont_mul_pallas
    from keyless_zk_tpu.ops.testgen import random_scalars

    m = 1 << 21
    a = random_scalars(m, seed=1).reshape(m, 16)
    b = random_scalars(m, seed=2).reshape(m, 16)
    jax.block_until_ready((a, b))

    f_pallas = jax.jit(lambda x, y: mont_mul_pallas(x, y, FR))
    t = timeit(lambda: f_pallas(a, b))
    emit("mont_mul_pallas", ms=t * 1e3, gops=m / t / 1e9)

    f_xla = jax.jit(lambda x, y: jf.mont_mul(x, y, FR))
    t = timeit(lambda: f_xla(a, b))
    emit("mont_mul_xla", ms=t * 1e3, gops=m / t / 1e9)

    # limb-major variant (no transposes in the wrapper): measures the kernel
    # itself
    at = a.T.copy()
    bt = b.T.copy()
    from keyless_zk_tpu.ops.pallas_field import _build_call, TILE

    n_tiles = m // TILE
    call = _build_call(FR.p, n_tiles)
    f_lm = jax.jit(lambda x, y: call(x, y))
    jax.block_until_ready((at, bt))
    t = timeit(lambda: f_lm(at, bt))
    emit("mont_mul_pallas_limbmajor", ms=t * 1e3, gops=m / t / 1e9)


if __name__ == "__main__":
    sys.exit(main())
