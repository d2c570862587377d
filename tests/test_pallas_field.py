"""Pallas mont_mul kernel: differential test vs the XLA formulation.

Runs in interpreter mode on the CPU backend (Mosaic needs real TPU);
the TPU path is exercised by scripts/bench and the prover drives.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # mont_mul kernel compile


def test_mont_mul_pallas_matches_xla():
    from keyless_zk_tpu.fields import jax_field as jf
    from keyless_zk_tpu.fields.jax_field import FR, FQ
    from keyless_zk_tpu.ops import pallas_field

    pallas_field._INTERPRET = True
    try:
        rng = np.random.default_rng(7)
        for spec in (FR, FQ):
            for n in (1, 5, 1024, 1500):
                a = jf.encode_ints(
                    [int(x) for x in rng.integers(0, 1 << 63, n)] , spec, mont=True
                )
                b = jf.encode_ints(
                    [spec.p - 1] + [int(x) for x in rng.integers(0, 1 << 63, n - 1)],
                    spec,
                    mont=True,
                ) if n > 1 else jf.encode_ints([spec.p - 1], spec, mont=True)
                want = jf.mont_mul(a, b, spec)
                got = pallas_field.mont_mul_pallas(a, b, spec)
                assert np.array_equal(np.asarray(got), np.asarray(want)), (spec.name, n)
        # edge cases: 0 * x, (p-1)^2
        for spec in (FR, FQ):
            a = jf.encode_ints([0, spec.p - 1, 1], spec)
            b = jf.encode_ints([spec.p - 1, spec.p - 1, 1], spec)
            want = jf.mont_mul(a, b, spec)
            got = pallas_field.mont_mul_pallas(a, b, spec)
            assert np.array_equal(np.asarray(got), np.asarray(want))
    finally:
        pallas_field._INTERPRET = False
