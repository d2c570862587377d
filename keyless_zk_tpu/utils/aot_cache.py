"""Disk cache of traced+lowered (exported) computations.

The proving kernels are huge integer graphs: *tracing + lowering* them costs
minutes of host Python per shape (the EC group law alone is ~400 primitives
per field multiply), and that cost is paid by every fresh process even when
the XLA persistent compile cache hits. The reference has no analog problem —
its kernels are ahead-of-time compiled C++ (multiexp.cpp/fft.cpp compile once
at build time).

This module gives our kernels the same property: the first process ever to
call a computation exports it (jax.export — StableHLO bytes), saves it under
~/.cache/keyless_zk_tpu/aot/, and every later process deserializes in
milliseconds and goes straight to XLA compile — which then also hits the
persistent compile cache, because the module bytes (and thus the cache key)
are identical across processes by construction.

Keying: name + jax version + platform + abstract arg signature (incl. pytree
structure) + a content hash of the kernel source modules + an explicit
`version` salt. The source hash means any edit to the compute-path modules
auto-invalidates every entry — a hand-bumped salt alone silently replayed
stale compiled graphs across processes (round-3 advisor finding). Stale
entries are harmless (orphaned files).
"""

from __future__ import annotations

import functools
import hashlib
import os
import threading

_CACHE_ROOT = os.path.join(
    os.path.expanduser("~"), ".cache", "keyless_zk_tpu", "aot"
)

_memo: dict[str, object] = {}
_lock = threading.Lock()


_registered = False


def _register_pytrees() -> None:
    """Register custom pytree containers appearing in exported signatures."""
    global _registered
    if _registered:
        return
    import jax

    from ..curves.jacobian import JacPoint

    try:
        jax.export.register_namedtuple_serialization(
            JacPoint, serialized_name="keyless_zk_tpu.JacPoint"
        )
    except ValueError:
        pass  # already registered
    _registered = True


def _platform() -> str:
    import jax

    # axon tunnels report platform "tpu"-compatible lowering; key by the
    # lowering platform so CPU test runs and TPU runs never collide.
    return jax.default_backend()


def _sig_of(args, kwargs) -> str:
    import jax

    leaves, treedef = jax.tree.flatten((args, kwargs))
    parts = []
    for leaf in leaves:
        aval = jax.api_util.shaped_abstractify(leaf)
        parts.append(f"{aval.dtype}{list(aval.shape)}{aval.weak_type}")
    return ",".join(parts) + "/" + str(treedef)


@functools.lru_cache(maxsize=1)
def _source_hash() -> str:
    """Content hash of every compute-path module an exported graph can
    capture; a code edit anywhere in them invalidates all entries."""
    import keyless_zk_tpu

    pkg = os.path.dirname(keyless_zk_tpu.__file__)
    h = hashlib.sha256()
    for sub in ("fields", "curves", "ops", "groth16", "parallel"):
        root = os.path.join(pkg, sub)
        for dirpath, _, files in sorted(os.walk(root)):
            for fname in sorted(files):
                if fname.endswith(".py"):
                    with open(os.path.join(dirpath, fname), "rb") as f:
                        h.update(fname.encode())
                        h.update(f.read())
    return h.hexdigest()[:16]


def aot_call(name: str, version: int, fn, *args, **kwargs):
    """Call `fn(*args, **kwargs)` through the AOT export cache.

    fn must be a jitted callable (jax.jit output) that is shape-polymorphic
    only through this cache's keying — each distinct arg signature gets its
    own entry. Returns fn's outputs.
    """
    import jax

    _register_pytrees()
    key_raw = "|".join(
        [
            name,
            str(version),
            jax.__version__,
            _platform(),
            _source_hash(),
            _sig_of(args, kwargs),
        ]
    )
    key = hashlib.sha256(key_raw.encode()).hexdigest()[:24]
    with _lock:
        exported = _memo.get(key)
    if exported is None:
        path = os.path.join(_CACHE_ROOT, f"{name}-{key}.jaxexport")
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    exported = jax.export.deserialize(f.read())
            except Exception:
                exported = None  # version-incompatible blob: re-export
        if exported is None:
            exported = jax.export.export(fn)(*args, **kwargs)
            try:
                os.makedirs(_CACHE_ROOT, exist_ok=True)
                tmp = f"{path}.tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(exported.serialize())
                os.replace(tmp, path)
            except Exception:
                pass  # caching is best-effort
        caller = jax.jit(exported.call)  # re-jit: traces the tiny call
        with _lock:                      # wrapper once per process
            _memo[key] = caller
        exported = caller
    return exported(*args, **kwargs)
