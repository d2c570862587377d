"""Hash primitives: circomlib-compatible Poseidon-BN254 (host + params)."""

from .poseidon import hash_elems, poseidon_hash, poseidon_permutation

__all__ = ["hash_elems", "poseidon_hash", "poseidon_permutation"]
