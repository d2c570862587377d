"""Process-level feature flags, read ONCE at import.

Kernel-dispatch decisions (Pallas vs portable XLA) are made at trace time
and frozen into jit caches, so flipping the environment mid-process would
silently apply to some shapes and not others. Reading the flags here, at
first import, makes the contract explicit: set KEYLESS_NO_PALLAS=1 before
the process traces anything (e.g. in the test conftest), never mid-run.
"""

import os

# Disable every Pallas/Mosaic kernel path (MSM, field mul, MXU NTT) and use
# the portable XLA formulations instead. Used by the CPU test tier.
NO_PALLAS = os.environ.get("KEYLESS_NO_PALLAS") == "1"
