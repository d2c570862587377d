"""SHA-256 circuit gadget vs hashlib (reference cross-checks its circuit
against the `sha2` crate the same way, circuit/src/sha.rs:24-60)."""

import hashlib

from keyless_zk_tpu.circuits import ConstraintSystem
from keyless_zk_tpu.circuits.sha256_gadget import (
    bytes_to_bits,
    sha256_prepadded,
)
from keyless_zk_tpu.input_processing.sha_padding import with_sha_padding_bytes


def _run_sha(msg: bytes, max_blocks: int):
    padded = with_sha_padding_bytes(msg)
    n_blocks = len(padded) // 64
    padded = padded + b"\x00" * (64 * (max_blocks - n_blocks))

    cs = ConstraintSystem()
    byte_wires = cs.new_wires(64 * max_blocks)
    cs.set_input_hint(byte_wires, "msg")
    tb = cs.new_wire()
    cs.set_input_hint([tb], "t_block")

    bits = bytes_to_bits(cs, byte_wires)
    digest_bits = sha256_prepadded(cs, bits, cs.lc(tb), max_blocks)

    w = cs.compute_witness(msg=list(padded), t_block=n_blocks - 1)
    assert cs.check_witness(w) is None

    got = 0
    for b in digest_bits:
        got = (got << 1) | cs.eval_lc(b, w)
    return got.to_bytes(32, "big"), cs


def test_sha256_one_block():
    msg = b"abc"
    digest, cs = _run_sha(msg, 1)
    assert digest == hashlib.sha256(msg).digest()


def test_sha256_two_blocks_with_mux():
    # message needing 2 blocks, hashed inside a 3-block circuit: exercises
    # the t_block one-hot mux
    msg = b"a" * 60
    digest, cs = _run_sha(msg, 3)
    assert digest == hashlib.sha256(msg).digest()


def test_sha256_tampered_witness_fails():
    msg = b"abc"
    padded = with_sha_padding_bytes(msg)
    cs = ConstraintSystem()
    byte_wires = cs.new_wires(64)
    cs.set_input_hint(byte_wires, "msg")
    tb = cs.new_wire()
    cs.set_input_hint([tb], "t_block")
    bits = bytes_to_bits(cs, byte_wires)
    sha256_prepadded(cs, bits, cs.lc(tb), 1)
    w = cs.compute_witness(msg=list(padded), t_block=0)
    # flip one digest-adjacent internal wire
    w[-5] = (w[-5] + 1) % (2**64)
    assert cs.check_witness(w) is not None
