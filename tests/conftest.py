"""Test config: run everything on a virtual 8-device CPU mesh.

Per-chip TPU numerics are identical (the field code is exact integer math),
and the sharded paths need multiple devices, which only the CPU backend can
fake. The axon sitecustomize imports jax and registers the TPU backend
before any user code, so the env var alone does not stick — the config
update below is what actually forces CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the limb-arithmetic graphs are expensive for
# XLA:CPU on this 1-core box; pay compile once per kernel shape, ever.
from keyless_zk_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()
