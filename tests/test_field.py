"""Differential tests: JAX limb field vs python-int ground truth.

Mirrors the role of the reference's test_prover.cpp Fr/Fq op vectors
(rust-rapidsnark/rapidsnark/src/test_prover.cpp): random and adversarial
operand classes (0, 1, p-1, small, sparse-limb) across all ops.
"""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from keyless_zk_tpu.fields import FQ, FR, bn254
from keyless_zk_tpu.fields import jax_field as jf
from keyless_zk_tpu.fields.limbs import int_to_limbs, limbs_to_int, bytes_le_to_limbs, limbs_to_bytes_le

rng = random.Random(1234)


def sample_operands(spec, n=64):
    edge = [0, 1, 2, spec.p - 1, spec.p - 2, (1 << 255) % spec.p, 0xFFFF, 1 << 128]
    vals = edge + [rng.randrange(spec.p) for _ in range(n - len(edge))]
    return vals[:n]


@pytest.mark.parametrize("spec", [FQ, FR], ids=["fq", "fr"])
def test_limb_roundtrip(spec):
    for v in sample_operands(spec, 16):
        assert limbs_to_int(int_to_limbs(v)) == v


def test_bytes_roundtrip():
    vals = sample_operands(FQ, 8)
    arr = np.stack([int_to_limbs(v) for v in vals])
    buf = limbs_to_bytes_le(arr)
    back = bytes_le_to_limbs(buf)
    assert np.array_equal(arr, back)
    # independent check against int.to_bytes
    assert buf[:32] == vals[0].to_bytes(32, "little")


@pytest.mark.parametrize("spec", [FQ, FR], ids=["fq", "fr"])
def test_add_sub_neg(spec):
    xs = sample_operands(spec)
    ys = list(reversed(xs))
    a = jf.encode_ints(xs, spec)
    b = jf.encode_ints(ys, spec)
    got_add = jf.decode_ints(jf.add(a, b, spec), spec)
    got_sub = jf.decode_ints(jf.sub(a, b, spec), spec)
    got_neg = jf.decode_ints(jf.neg(a, spec), spec)
    for x, y, ga, gs, gn in zip(xs, ys, got_add, got_sub, got_neg):
        assert ga == (x + y) % spec.p
        assert gs == (x - y) % spec.p
        assert gn == (-x) % spec.p


@pytest.mark.parametrize("spec", [FQ, FR], ids=["fq", "fr"])
def test_mont_mul(spec):
    xs = sample_operands(spec)
    ys = list(reversed(xs))
    a = jf.encode_ints(xs, spec, mont=True)
    b = jf.encode_ints(ys, spec, mont=True)
    got = jf.decode_ints(jf.mont_mul(a, b, spec), spec, mont=True)
    for x, y, g in zip(xs, ys, got):
        assert g == (x * y) % spec.p


@pytest.mark.parametrize("spec", [FQ, FR], ids=["fq", "fr"])
def test_mont_roundtrip(spec):
    xs = sample_operands(spec)
    a = jf.encode_ints(xs, spec)
    m = jf.to_mont(a, spec)
    back = jf.decode_ints(jf.from_mont(m, spec), spec)
    assert back == xs
    # in-Montgomery decode agrees too
    assert jf.decode_ints(m, spec, mont=True) == xs


@pytest.mark.parametrize("spec", [FQ, FR], ids=["fq", "fr"])
def test_inv_and_pow(spec):
    xs = [x for x in sample_operands(spec, 16) if x != 0]
    a = jf.encode_ints(xs, spec, mont=True)
    inv = jf.decode_ints(jf.mont_inv(a, spec), spec, mont=True)
    for x, g in zip(xs, inv):
        assert (x * g) % spec.p == 1
    p7 = jf.decode_ints(jf.mont_pow(a, 7, spec), spec, mont=True)
    for x, g in zip(xs, p7):
        assert g == pow(x, 7, spec.p)


def test_root_of_unity():
    w = bn254.fr_root_of_unity(21)
    assert pow(w, 1 << 21, bn254.R_SCALAR) == 1
    assert pow(w, 1 << 20, bn254.R_SCALAR) != 1
