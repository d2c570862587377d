"""Poseidon-BN254 against circomlib's published test vectors.

These pin the Grain-LFSR parameter generation (hashes/poseidon_params.py)
and permutation order; the aptos-specific packing conventions are covered
end-to-end by tests/test_input_processing.py's golden public-inputs hash.
"""

from keyless_zk_tpu.hashes.poseidon import poseidon_hash


def test_circomlib_vectors():
    assert (
        poseidon_hash([1])
        == 18586133768512220936620570745912940619677854269274689475585506675881198879027
    )
    assert (
        poseidon_hash([1, 2])
        == 7853200120776062878684798364095072458815029376092732009249414926327459813530
    )
    assert (
        poseidon_hash([1, 2, 3, 4])
        == 18821383157269793795438455681495246036402687001665670618754263018637548127333
    )
    assert (
        poseidon_hash([1, 2, 3, 4, 5, 6])
        == 20400040500897583745843009878988256314335038853985262692600694741116813247201
    )


def test_zero_inputs():
    # determinism and domain separation across widths
    assert poseidon_hash([0]) != poseidon_hash([0, 0])
    assert poseidon_hash([0, 0]) != poseidon_hash([0, 0, 0])


def test_max_arity():
    v = poseidon_hash(list(range(16)))
    assert 0 < v < (1 << 254)
