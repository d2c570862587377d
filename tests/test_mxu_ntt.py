"""MXU (matmul) NTT vs the butterfly NTT and algebraic ground truth.

The radix-128 byte-plane matmul formulation (ops/mxu_ntt.py) must agree
bit-for-bit with ops/ntt.py's DIF transform (which is itself anchored to
the reference convention, fft.cpp:191-246) on every domain shape class:
single-pass (n <= 128), 128 x tail, and multi-128-pass.
"""

import random

import pytest

from keyless_zk_tpu.fields import bn254
from keyless_zk_tpu.fields.jax_field import FR
from keyless_zk_tpu.fields import jax_field as jf
from keyless_zk_tpu.ops.mxu_ntt import (
    MxuNTTPlan,
    digit_reverse_perm,
    factorize,
    get_mxu_plan,
)
from keyless_zk_tpu.ops.ntt import get_plan

R = bn254.R_SCALAR
rng = random.Random(9)


def test_factorize():
    assert factorize(1 << 21) == [128, 128, 128]
    assert factorize(1 << 16) == [128, 128, 4]
    assert factorize(1 << 7) == [128]
    assert factorize(1 << 3) == [8]


def test_digit_reverse_perm_radix2_is_bit_reverse():
    import numpy as np

    from keyless_zk_tpu.ops.ntt import _bit_reverse_perm

    assert np.array_equal(digit_reverse_perm([2] * 6), _bit_reverse_perm(6))


@pytest.mark.parametrize("domain_pow", [2, 7, 8, 10])
def test_matches_butterfly_ntt(domain_pow):
    n = 1 << domain_pow
    vals = [rng.randrange(R) for _ in range(n)]
    x = jf.encode_ints(vals, FR, mont=True)
    ref = jf.decode_ints(get_plan(domain_pow).ntt(x), FR, mont=True)
    plan = get_mxu_plan(domain_pow)
    got = jf.decode_ints(plan.ntt(x), FR, mont=True)
    assert got == ref
    back = jf.decode_ints(plan.intt(plan.ntt(x)), FR, mont=True)
    assert back == vals


def test_batched():
    plan = get_mxu_plan(8)
    n, b = 256, 3
    rows = [[rng.randrange(R) for _ in range(n)] for _ in range(b)]
    import jax.numpy as jnp

    x = jnp.stack([jf.encode_ints(r, FR, mont=True) for r in rows])
    out = plan.ntt(x)
    ref_plan = get_plan(8)
    for i, r in enumerate(rows):
        want = jf.decode_ints(
            ref_plan.ntt(jf.encode_ints(r, FR, mont=True)), FR, mont=True
        )
        assert jf.decode_ints(out[i], FR, mont=True) == want


@pytest.mark.slow
def test_matches_butterfly_2_14():
    """Two full radix-128 passes (the 2^21 shape class, scaled down)."""
    dp = 14
    n = 1 << dp
    vals = [rng.randrange(R) for _ in range(n)]
    x = jf.encode_ints(vals, FR, mont=True)
    ref = get_plan(dp).ntt(x)
    got = MxuNTTPlan(dp).ntt(x)
    import jax.numpy as jnp

    assert jnp.array_equal(got, ref)
