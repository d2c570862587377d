"""CLI: prove / verify with snarkjs artifacts.

Mirrors the reference's FullProver surface (rust-rapidsnark/src/lib.rs:45-98:
new(zkey) + prove(wtns) -> proof JSON) as a command line:

    python -m keyless_zk_tpu.groth16.cli prove --zkey Z --wtns W [--vk VK]
    python -m keyless_zk_tpu.groth16.cli verify --vk VK --proof P --public I
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from ..fields.limbs import limbs_to_ints
from ..utils.compile_cache import enable_compile_cache
from .pairing import verify_groth16
from .prover import Groth16Prover
from .wtns import load_wtns
from .zkey import load_zkey

enable_compile_cache()


def _public_signals(pk, wtns) -> list[int]:
    return limbs_to_ints(wtns.values[1 : 1 + pk.n_public])


def _load_witness(args):
    """Witness from --wtns, or solved from --r1cs + --input (circom wire
    order, see circuits/circom_interop.py) when no .wtns is given."""
    if args.wtns:
        return load_wtns(args.wtns)
    from types import SimpleNamespace

    from ..circuits.circom_interop import witness_from_input_json
    from ..fields.limbs import ints_to_limbs

    w = witness_from_input_json(args.r1cs, args.input, args.sym)
    return SimpleNamespace(values=ints_to_limbs([int(x) for x in w]))


def cmd_prove(args) -> int:
    if not args.wtns and not (args.r1cs and args.input):
        print("need --wtns, or --r1cs with --input", file=sys.stderr)
        return 2
    t0 = time.monotonic()
    pk = load_zkey(args.zkey)
    wtns = _load_witness(args)
    prover = Groth16Prover(pk)
    t1 = time.monotonic()
    proof = prover.prove(wtns.values)
    t2 = time.monotonic()
    public_signals = [str(v) for v in _public_signals(pk, wtns)]
    print(json.dumps(proof.to_json_dict()))
    print(json.dumps(public_signals))
    print(
        f"setup: {t1 - t0:.3f}s  prove: {t2 - t1:.3f}s",
        file=sys.stderr,
    )
    if args.vk:
        vk = json.load(open(args.vk))
        ok = verify_groth16(vk, _public_signals(pk, wtns), proof.to_json_dict())
        print(f"verified: {str(ok).lower()}", file=sys.stderr)
        return 0 if ok else 1
    return 0


def cmd_verify(args) -> int:
    vk = json.load(open(args.vk))
    proof = json.load(open(args.proof))
    public_inputs = [int(x) for x in json.load(open(args.public))]
    ok = verify_groth16(vk, public_inputs, proof)
    print(f"verified: {str(ok).lower()}")
    return 0 if ok else 1


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="keyless_zk_tpu.groth16")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("prove", help="produce a Groth16 proof from zkey + wtns")
    p.add_argument("--zkey", required=True)
    p.add_argument("--wtns", help="snarkjs witness file (as the reference consumes)")
    p.add_argument("--r1cs", help="circom .r1cs: solve the witness natively instead")
    p.add_argument("--input", help="circom input.json (with --r1cs)")
    p.add_argument("--sym", help="circom .sym table for input-name mapping")
    p.add_argument("--vk", help="snarkjs verification key JSON; verify after proving")
    p.set_defaults(fn=cmd_prove)
    v = sub.add_parser("verify", help="verify a snarkjs proof JSON")
    v.add_argument("--vk", required=True)
    v.add_argument("--proof", required=True)
    v.add_argument("--public", required=True)
    v.set_defaults(fn=cmd_verify)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
