"""eval_ab cost split on the chip: mont_mul | cumsum | boundary gathers,
plus the coef-table segment-length histogram that decides whether a
short-segment direct-gather scheme can replace the cumsums.

    python scripts/probe_eval_ab.py
"""

import os, sys, time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from keyless_zk_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import jax, jax.numpy as jnp

from keyless_zk_tpu.fields import jax_field as jf
from keyless_zk_tpu.fields.jax_field import FR

N = 1 << 22
rng = np.random.default_rng(7)
a = jnp.asarray(rng.integers(0, 1 << 16, (N, 16), dtype=np.uint32))
b = jnp.asarray(rng.integers(0, 1 << 16, (N, 16), dtype=np.uint32))
e_pos = jnp.asarray(np.sort(rng.integers(0, N, N)).astype(np.int32))
s_pos = jnp.concatenate([jnp.zeros((1,), jnp.int32), e_pos[:-1]])
jax.block_until_ready((a, b, e_pos))


def bench(name, fn, *args):
    jfn = jax.jit(fn)
    out = jfn(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[:1]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = jfn(*args)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[:1]))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best * 1e3:.1f} ms", flush=True)


bench("mont_mul 2^22", lambda x, y: jf.mont_mul(x, y, FR), a, b)
bench("split8 2^22", lambda x: jf.split8(x), a)
bench("cumsum 2^22x16 u32", lambda x: jnp.cumsum(x, axis=0, dtype=jnp.uint32), a)


def boundary(x, s, e):
    cs = jnp.cumsum(x, axis=0, dtype=jnp.uint32)
    return jnp.take(cs, e, axis=0) - jnp.take(cs, s, axis=0)


bench("cumsum+2 takes", boundary, a, s_pos, e_pos)


def direct4(x, s, e):
    # segment sums for len<=4 segments via 4 masked gathers
    out = jnp.zeros_like(jnp.take(x, s, axis=0))
    for j in range(4):
        idx = jnp.minimum(s + j, N - 1)
        m = (s + j < e)[:, None]
        out = out + jnp.where(m, jnp.take(x, idx, axis=0), 0)
    return out


bench("direct4 masked gathers", direct4, a, s_pos, e_pos)

# ---- real coef-table segment stats (from the cached full setup) -----------
try:
    from keyless_zk_tpu.circuits.keyless_circuit import KeylessConfig
    from keyless_zk_tpu.tooling.setup_tool import DEFAULT_SETUP_ROOT, circuit_checksum
    from keyless_zk_tpu.groth16.zkey import load_zkey

    d = os.path.join(DEFAULT_SETUP_ROOT, circuit_checksum(KeylessConfig()))
    pk = load_zkey(os.path.join(d, "prover_key.zkey"))
    dest = pk.coef_m.astype(np.int64) * pk.domain_size + pk.coef_c
    dest = np.sort(dest)
    bounds = np.searchsorted(dest, np.arange(2 * pk.domain_size + 1))
    lens = np.diff(bounds)
    hist = {}
    for t in (0, 1, 2, 3, 4, 8, 16, 64, 1024, 1 << 30):
        hist[str(t)] = int((lens <= t).sum())
    print(
        f"coef rows={len(dest)} dest_rows={2 * pk.domain_size} "
        f"max_len={lens.max()} le: {hist}",
        flush=True,
    )
except Exception as e:  # noqa: BLE001
    print(f"coef stats skipped: {e}", flush=True)
