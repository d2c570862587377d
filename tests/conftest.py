"""Test config: run everything on a virtual 8-device CPU mesh.

Per-chip TPU numerics are identical (the field code is exact integer math),
and the sharded paths need multiple devices, which only the CPU backend can
fake. Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
