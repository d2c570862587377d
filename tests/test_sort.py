"""Bitonic sort network tests (ops/sort.py) against numpy sorting."""

import numpy as np
import jax.numpy as jnp
import pytest

from keyless_zk_tpu.ops.sort import bitonic_sort


@pytest.mark.parametrize(
    "shape", [(7,), (1, 64), (3, 1000), (20, 4096), (5, 1), (2, 3, 64)]
)
def test_bitonic_sort_keys(shape):
    rng = np.random.default_rng(hash(shape) % 2**31)
    x = rng.integers(-(2**31), 2**31 - 1, size=shape, dtype=np.int32)
    got = np.asarray(bitonic_sort(jnp.asarray(x)))
    assert np.array_equal(got, np.sort(x, axis=-1))


def test_bitonic_sort_with_payload():
    rng = np.random.default_rng(5)
    x = rng.integers(0, 50, size=(4, 2048), dtype=np.int32)
    p = rng.integers(0, 2**30, size=(4, 2048), dtype=np.int32)
    ks, ps = bitonic_sort(jnp.asarray(x), jnp.asarray(p))
    ks, ps = np.asarray(ks), np.asarray(ps)
    assert np.array_equal(ks, np.sort(x, axis=-1))
    for r in range(4):
        # (key, payload) pairs form the same multiset, keys ordered
        assert sorted(zip(ks[r], ps[r])) == sorted(zip(x[r], p[r]))


def test_bitonic_sort_nonpow2_payload_and_duplicates():
    rng = np.random.default_rng(6)
    x = rng.integers(-3, 3, size=(2, 777), dtype=np.int32)
    p = np.arange(2 * 777, dtype=np.int32).reshape(2, 777)
    ks, ps = bitonic_sort(jnp.asarray(x), jnp.asarray(p))
    ks, ps = np.asarray(ks), np.asarray(ps)
    assert np.array_equal(ks, np.sort(x, axis=-1))
    for r in range(2):
        assert sorted(zip(ks[r], ps[r])) == sorted(zip(x[r], p[r]))
