"""Number-theoretic transform over BN254 Fr for TPU.

Replaces the reference's TBB radix-2 FFT (rust-rapidsnark/rapidsnark/src/
fft.cpp:191-246) with a fully vectorized, branch-free design:

- iterative decimation-in-frequency: 21 butterfly levels of whole-array
  adds/subs/twiddle muls (each an (n/2)-wide batched field op), followed by
  one bit-reversal gather — no per-element loops anywhere;
- twiddle tables are built *on device* by log-doubling geometric products
  (the reference builds its root table on the host, fft.cpp:39-136);
- the transform convention matches the reference exactly:
  ``ntt(x)[k] = sum_j x[j] w^(jk)`` with w = nqr^((r-1)/2^s) (bn254.py),
  ``intt`` uses w^-1 and scales by n^-1; the Groth16 coset shift multiplies
  by powers of the 2^(s+1)-th root (groth16.cpp:182-190).

All values are Fr in Montgomery form, shape (..., n, 16) uint32.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import bn254
from ..fields.jax_field import FR
from ..fields import jax_field as jf


def _bit_reverse_perm(domain_pow: int) -> np.ndarray:
    n = 1 << domain_pow
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(domain_pow):
        rev |= ((idx >> b) & 1) << (domain_pow - 1 - b)
    return rev.astype(np.int32)


def geometric_powers(base_mont: jnp.ndarray, n: int) -> jnp.ndarray:
    """[1, g, g^2, ..., g^(n-1)] in Montgomery form, built by log-doubling."""
    assert n & (n - 1) == 0
    pows = jf.encode_ints([FR.r_mod_p], FR)  # [R] = mont(1), shape (1, 16)
    base = base_mont.reshape(1, 16)
    cur = base  # g^(len(pows))
    while pows.shape[0] < n:
        pows = jnp.concatenate([pows, jf.mont_mul(pows, cur, FR)], axis=0)
        cur = jf.mont_mul(cur, cur, FR)
    return pows


@jax.jit
def _transform_jit(x: jnp.ndarray, perm: jnp.ndarray, tables) -> jnp.ndarray:
    """DIF butterfly levels + bit-reversal gather (fft.cpp:191-219's loop
    nest as whole-array ops). len(tables) levels; x shape (..., n, 16)."""
    batch = x.shape[:-2]
    n = x.shape[-2]
    for d in range(len(tables)):
        half = n >> (d + 1)
        v = x.reshape(*batch, 1 << d, 2, half, 16)
        e = v[..., 0, :, :]
        o = v[..., 1, :, :]
        lo = jf.add(e, o, FR)
        hi = jf.mont_mul(jf.sub(e, o, FR), tables[d], FR)
        x = jnp.stack([lo, hi], axis=-3).reshape(*batch, n, 16)
    return jnp.take(x, perm, axis=-2)


class NTTPlan:
    """Precomputed twiddles for one 2^domain_pow domain (device-resident).

    The tables are pure constants of the domain, but building them runs
    ~2*domain_pow distinct-shape mont_mul computations — each a fresh XLA
    compile (minutes on the CPU backend, a remote-tunnel round trip each on
    TPU). They are therefore disk-cached per domain_pow (the analog of the
    reference precomputing its root table once in the FFT ctor,
    fft.cpp:39-136) and reloaded as one npz.
    """

    def __init__(self, domain_pow: int, cache: bool = True):
        if domain_pow > bn254.TWO_ADICITY:
            raise ValueError("domain size too big for the curve")  # fft.cpp:80-83
        self.domain_pow = domain_pow
        self.n = 1 << domain_pow
        w = bn254.fr_root_of_unity(domain_pow)
        w_inv = pow(w, -1, FR.p)
        self.n_inv_mont = jf.encode_ints([pow(self.n, -1, FR.p)], FR, mont=True)[0]
        self._coset = None
        if cache and self._load_cached():
            return
        # per-level twiddle tables: level d needs (w^(2^d))^c for c < n/2^(d+1)
        self.twiddles = self._build(w)
        self.twiddles_inv = self._build(w_inv)
        self.perm = jnp.asarray(_bit_reverse_perm(domain_pow))
        if cache:
            self._save_cache()

    def _cache_path(self) -> str:
        import os

        root = os.path.join(os.path.expanduser("~"), ".cache", "keyless_zk_tpu")
        os.makedirs(root, exist_ok=True)
        return os.path.join(root, f"ntt_plan_{self.domain_pow}.npz")

    def _load_cached(self) -> bool:
        import os

        path = self._cache_path()
        if not os.path.exists(path):
            return False
        try:
            z = np.load(path, allow_pickle=False)
            self.twiddles = [
                jnp.asarray(z[f"t{d}"]) for d in range(self.domain_pow)
            ]
            self.twiddles_inv = [
                jnp.asarray(z[f"i{d}"]) for d in range(self.domain_pow)
            ]
            self.perm = jnp.asarray(z["perm"])
            self._coset = jnp.asarray(z["coset"])
            return True
        except Exception:
            return False  # corrupt/stale: rebuild

    def _save_cache(self) -> None:
        import os

        arrays = {f"t{d}": np.asarray(t) for d, t in enumerate(self.twiddles)}
        arrays |= {f"i{d}": np.asarray(t) for d, t in enumerate(self.twiddles_inv)}
        arrays["perm"] = np.asarray(self.perm)
        arrays["coset"] = np.asarray(self.coset_powers())
        path = self._cache_path()
        try:
            np.savez(path + f".tmp{os.getpid()}.npz", **arrays)
            os.replace(path + f".tmp{os.getpid()}.npz", path)
        except Exception:
            pass  # caching is best-effort

    def _build(self, w: int):
        tables = []
        for d in range(self.domain_pow):
            base = jf.encode_ints([pow(w, 1 << d, FR.p)], FR, mont=True)[0]
            tables.append(geometric_powers(base, self.n >> (d + 1)))
        return tables

    def _transform(self, x: jnp.ndarray, tables) -> jnp.ndarray:
        """DIF butterflies + bit-reversal gather; x shape (..., n, 16).

        Twiddles/perm ride as ARGUMENTS of the jitted graph (not closed-over
        constants): at 2^21 the tables are ~256 MB and baking them into the
        module would bloat every export/compile-cache entry with them."""
        return _transform_jit(x, self.perm, tuple(tables))

    def ntt(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._transform(x, self.twiddles)

    def intt(self, x: jnp.ndarray) -> jnp.ndarray:
        y = self._transform(x, self.twiddles_inv)
        return jf.mont_mul(y, self.n_inv_mont, FR)

    def coset_powers(self) -> jnp.ndarray:
        """eta^i for i < n with eta the 2^(domain_pow+1)-th root of unity.

        This is the shift the reference applies between iFFT and FFT
        (groth16.cpp:182-190, root(domainPow+1, i)). Memoized (and part of
        the on-disk plan cache).
        """
        if self._coset is None:
            eta = bn254.fr_root_of_unity(self.domain_pow + 1)
            base = jf.encode_ints([eta], FR, mont=True)[0]
            self._coset = geometric_powers(base, self.n)
        return self._coset


@functools.lru_cache(maxsize=4)
def get_plan(domain_pow: int) -> NTTPlan:
    return NTTPlan(domain_pow)
