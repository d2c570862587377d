"""Groth16 proving/verification over BN254 (snarkjs-compatible artifacts).

Replaces the reference's C++ prover core (rust-rapidsnark/rapidsnark/src/
groth16.cpp, fullprover.cpp) and its file-format layer (zkey_utils.hpp,
wtns_utils.hpp, binfile_utils.cpp) with a JAX pipeline plus host-side
parsing/verification.
"""

from .prover import Groth16Prover, Proof
from .zkey import ProvingKey, load_zkey
from .wtns import Witness, load_wtns, save_wtns, witness_from_ints
from .pairing import verify_groth16

__all__ = [
    "Groth16Prover",
    "Proof",
    "ProvingKey",
    "load_zkey",
    "Witness",
    "load_wtns",
    "save_wtns",
    "witness_from_ints",
    "verify_groth16",
]
