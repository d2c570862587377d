"""circom binary ``.r1cs`` container parser.

Format as produced by `circom --r1cs` (consumed by snarkjs during setup,
reference scripts/python/setups/testing_setup.py:53-69):

  magic "r1cs", u32 version, u32 nSections, sections of (u32 type, u64 len):
    section 1 (header): u32 n8, n8-byte LE prime, u32 nWires, u32 nPubOut,
                        u32 nPubIn, u32 nPrvIn, u64 nLabels, u32 mConstraints
    section 2 (constraints): per constraint, for each of A, B, C:
                        u32 nEntries, then entries { u32 wireId, n8 LE coef }
    section 3 (wire2label): u64 per wire

Parsing reference artifacts (prover-service/resources/toy_circuit/toy.r1cs)
anchors our native ConstraintSystem semantics against circom's.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from ..groth16.binfile import BinFile, le_bytes_to_int


@dataclass
class R1CS:
    prime: int
    n_wires: int
    n_pub_out: int
    n_pub_in: int
    n_prv_in: int
    n_constraints: int
    # per-constraint sparse rows {wire: coef}
    A: list[dict]
    B: list[dict]
    C: list[dict]

    @property
    def n_public(self) -> int:
        return self.n_pub_out + self.n_pub_in


def load_r1cs(path: str) -> R1CS:
    bf = BinFile.load(path, "r1cs")
    hdr = bf.section(1)
    (n8,) = struct.unpack_from("<I", hdr, 0)
    prime = le_bytes_to_int(hdr[4 : 4 + n8])
    pos = 4 + n8
    n_wires, n_pub_out, n_pub_in, n_prv_in = struct.unpack_from("<IIII", hdr, pos)
    pos += 16
    (_n_labels,) = struct.unpack_from("<Q", hdr, pos)
    pos += 8
    (m,) = struct.unpack_from("<I", hdr, pos)

    body = bytes(bf.section(2))
    A, B, C = [], [], []
    off = 0
    for _ in range(m):
        rows = []
        for _side in range(3):
            (n_entries,) = struct.unpack_from("<I", body, off)
            off += 4
            row = {}
            for _ in range(n_entries):
                (wire,) = struct.unpack_from("<I", body, off)
                off += 4
                coef = int.from_bytes(body[off : off + n8], "little")
                off += n8
                row[wire] = coef
            rows.append(row)
        A.append(rows[0])
        B.append(rows[1])
        C.append(rows[2])

    return R1CS(
        prime=prime,
        n_wires=n_wires,
        n_pub_out=n_pub_out,
        n_pub_in=n_pub_in,
        n_prv_in=n_prv_in,
        n_constraints=m,
        A=A,
        B=B,
        C=C,
    )


def save_r1cs(path: str, r: R1CS, n8: int = 32) -> None:
    """Write a ConstraintSystem-exported R1CS in circom's container format."""
    hdr = struct.pack("<I", n8)
    hdr += r.prime.to_bytes(n8, "little")
    hdr += struct.pack(
        "<IIIIQI",
        r.n_wires,
        r.n_pub_out,
        r.n_pub_in,
        r.n_prv_in,
        r.n_wires,
        r.n_constraints,
    )

    body = bytearray()
    for q in range(r.n_constraints):
        for row in (r.A[q], r.B[q], r.C[q]):
            body += struct.pack("<I", len(row))
            for wire, coef in sorted(row.items()):
                body += struct.pack("<I", wire)
                body += (coef % r.prime).to_bytes(n8, "little")

    wire2label = b"".join(struct.pack("<Q", i) for i in range(r.n_wires))

    with open(path, "wb") as f:
        f.write(b"r1cs")
        f.write(struct.pack("<II", 1, 3))
        for s_type, payload in ((1, hdr), (2, bytes(body)), (3, wire2label)):
            f.write(struct.pack("<IQ", s_type, len(payload)))
            f.write(payload)


def r1cs_from_cs(cs) -> R1CS:
    """Export a ConstraintSystem as an R1CS (public wires = circom pub-ins)."""
    from ..fields import bn254

    A, B, C = cs.matrices()
    return R1CS(
        prime=bn254.R_SCALAR,
        n_wires=cs.n_wires,
        n_pub_out=0,
        n_pub_in=cs.n_public,
        n_prv_in=cs.n_wires - cs.n_public - 1,
        n_constraints=len(cs.constraints),
        A=[dict(a) for a in A],
        B=[dict(b) for b in B],
        C=[dict(c) for c in C],
    )


def r1cs_circom_order(cs) -> tuple[R1CS, list[int]]:
    """Re-number a native ConstraintSystem into circom wire conventions.

    circom orders wires [1, outputs, public inputs, private inputs,
    internals] (zkey_utils.hpp:72-74), and a circom-compiled witness
    generator receives ONLY the input signals — every other wire must be
    solved from the constraints. `r1cs_from_cs` declares all wires as
    inputs (the prover doesn't care), so it cannot exercise a foreign
    witness compiler; this export puts exactly the wires covered by the
    builder's input hints in the input range. Public wires that are *not*
    inputs (e.g. the in-circuit-computed public_inputs_hash) become circom
    outputs, which the compiler must solve like any internal wire.

    Returns (r1cs, perm) with perm[old_wire] = new_wire.
    """
    from ..fields import bn254

    input_wires: list[int] = []
    seen: set[int] = set()
    for opcode, params, outs, _ in cs.ops:
        if opcode == "input":
            for w in outs:
                if w not in seen:
                    seen.add(w)
                    input_wires.append(w)
    pub = list(range(1, cs.n_public + 1))
    pub_out = [w for w in pub if w not in seen]
    pub_in = [w for w in pub if w in seen]
    prv_in = [w for w in input_wires if w > cs.n_public]
    order = [0] + pub_out + pub_in + prv_in
    placed = set(order)
    order += [w for w in range(cs.n_wires) if w not in placed]
    perm = [0] * cs.n_wires
    for new, old in enumerate(order):
        perm[old] = new

    A, B, C = cs.matrices()

    def remap(row):
        return {perm[w]: c for w, c in dict(row).items()}

    return (
        R1CS(
            prime=bn254.R_SCALAR,
            n_wires=cs.n_wires,
            n_pub_out=len(pub_out),
            n_pub_in=len(pub_in),
            n_prv_in=len(prv_in),
            n_constraints=len(cs.constraints),
            A=[remap(a) for a in A],
            B=[remap(b) for b in B],
            C=[remap(c) for c in C],
        ),
        perm,
    )
