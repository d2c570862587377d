"""R1CS constraint-system builder with an integrated witness program.

Replaces the circom front end (reference circuit/templates/*.circom compiled
by the external `circom` binary) with a native builder: a gadget both adds
constraints and registers the computation that fills in its wires, so a
single definition yields the relation *and* its witness generator — the
role circom's `<==`/`<--` dual plays (e.g. FpMul's long-division hints,
circuit/templates/helpers/rsa/FpMul.circom:55-66).

Wire layout follows circom/snarkjs conventions (zkey_utils.hpp:72-74):
wire 0 is the constant one, wires 1..n_public are public (outputs then
public inputs), the rest private.  Constraints are a*b = c with each side a
sparse linear combination over wires.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..fields import bn254

P = bn254.R_SCALAR


class LinComb(dict):
    """Sparse linear combination {wire: coef mod p}; immutable by convention."""

    def __add__(self, other: "LinComb") -> "LinComb":
        out = LinComb(self)
        for w, c in other.items():
            v = (out.get(w, 0) + c) % P
            if v:
                out[w] = v
            else:
                out.pop(w, None)
        return out

    def __sub__(self, other: "LinComb") -> "LinComb":
        return self + other.scale(P - 1)

    def scale(self, k: int) -> "LinComb":
        k %= P
        if k == 0:
            return LinComb()
        return LinComb({w: (c * k) % P for w, c in self.items()})


@dataclass
class Constraint:
    a: LinComb
    b: LinComb
    c: LinComb


class ConstraintSystem:
    """Builder for an R1CS instance + its witness-generation program.

    The witness program is an ordered list of (fn, out_wires, in_wires)
    hints; `compute_witness` runs them in insertion order.  Gadgets that
    batch their computation (SHA-256 rounds, bigint limbs, ...) register a
    single hint producing many wires at once, which keeps witness
    generation vectorizable.
    """

    def __init__(self):
        self.n_wires = 1  # wire 0 == 1
        self.n_public = 0  # public wires are 1..n_public (must be allocated first)
        self.constraints: list[Constraint] = []
        self._hints: list[tuple] = []  # (fn, out_wires, in_wires)
        self._labels: dict[str, int | list[int]] = {}

    # ---- wires -----------------------------------------------------------

    def new_wire(self) -> int:
        w = self.n_wires
        self.n_wires += 1
        return w

    def new_wires(self, n: int) -> list[int]:
        ws = list(range(self.n_wires, self.n_wires + n))
        self.n_wires += n
        return ws

    def public_wire(self) -> int:
        if self.n_wires != self.n_public + 1:
            raise ValueError("public wires must be allocated before any private wire")
        self.n_public += 1
        return self.new_wire()

    def label(self, name: str, wires) -> None:
        self._labels[name] = wires

    def wires_of(self, name: str):
        return self._labels[name]

    # ---- linear combinations ----------------------------------------------

    def lc(self, *terms) -> LinComb:
        """lc((wire, coef), ...) or lc(wire) for coefficient 1."""
        out = LinComb()
        for t in terms:
            w, c = t if isinstance(t, tuple) else (t, 1)
            v = (out.get(w, 0) + c) % P
            if v:
                out[w] = v
            else:
                out.pop(w, None)
        return out

    def const(self, k: int) -> LinComb:
        return self.lc((0, k % P))

    # ---- constraints -------------------------------------------------------

    def constrain(self, a: LinComb, b: LinComb, c: LinComb) -> None:
        """a * b = c."""
        self.constraints.append(Constraint(a, b, c))

    def constrain_eq(self, a: LinComb, b: LinComb) -> None:
        """a = b   (encoded as a * 1 = b, with linear a)."""
        self.constrain(a - b, self.const(1), LinComb())

    def constrain_zero(self, a: LinComb) -> None:
        self.constrain_eq(a, LinComb())

    # ---- witness hints -----------------------------------------------------

    def hint(self, fn, out_wires: list[int], in_wires: list[int]) -> None:
        """Register fn(*in_values) -> sequence of out values (ints mod p)."""
        self._hints.append((fn, list(out_wires), list(in_wires)))

    def set_input_hint(self, wires: list[int], name: str) -> None:
        """Wires filled directly from compute_witness(**{name: values})."""
        self._hints.append((name, list(wires), None))

    # ---- evaluation ---------------------------------------------------------

    def compute_witness(self, **inputs) -> list[int]:
        """Run the witness program; returns the full wire vector (ints)."""
        w = [0] * self.n_wires
        w[0] = 1
        for fn, outs, ins in self._hints:
            if ins is None:  # input binding
                vals = inputs[fn]
                if isinstance(vals, int):
                    vals = [vals]
                if len(vals) != len(outs):
                    raise ValueError(f"input '{fn}': expected {len(outs)} values, got {len(vals)}")
                for o, v in zip(outs, vals):
                    w[o] = v % P
            else:
                vals = fn(*(w[i] for i in ins))
                if isinstance(vals, int):
                    vals = [vals]
                for o, v in zip(outs, vals):
                    w[o] = v % P
        return w

    def eval_lc(self, lc: LinComb, w: list[int]) -> int:
        return sum(c * w[i] for i, c in lc.items()) % P

    def check_witness(self, w: list[int]) -> int | None:
        """Index of the first violated constraint, or None if satisfied."""
        for q, cn in enumerate(self.constraints):
            if self.eval_lc(cn.a, w) * self.eval_lc(cn.b, w) % P != self.eval_lc(cn.c, w):
                return q
        return None

    # ---- export -------------------------------------------------------------

    def matrices(self) -> tuple[list[dict], list[dict], list[dict]]:
        """(A, B, C) as per-constraint sparse rows {wire: coef}."""
        return (
            [cn.a for cn in self.constraints],
            [cn.b for cn in self.constraints],
            [cn.c for cn in self.constraints],
        )

    # ---- common gadget primitives -------------------------------------------

    def mul(self, a: LinComb, b: LinComb) -> int:
        """New wire z with constraint a*b = z and hint z = eval(a)*eval(b)."""
        z = self.new_wire()
        self.constrain(a, b, self.lc(z))
        aw, bw = list(a.items()), list(b.items())
        wires = [w for w, _ in aw] + [w for w, _ in bw]

        def compute(*vals):
            va = sum(c * v for (_, c), v in zip(aw, vals[: len(aw)])) % P
            vb = sum(c * v for (_, c), v in zip(bw, vals[len(aw) :])) % P
            return [(va * vb) % P]

        self.hint(compute, [z], wires)
        return z

    def assert_bit(self, w: int) -> None:
        """w * (w - 1) = 0."""
        self.constrain(self.lc(w), self.lc(w) - self.const(1), LinComb())

    def to_bits(self, x: LinComb, n: int) -> list[int]:
        """n new bit wires (LSB first) with sum(2^i b_i) = x and bit checks."""
        bits = self.new_wires(n)
        xw = list(x.items())

        def compute(*vals):
            v = sum(c * val for (_, c), val in zip(xw, vals)) % P
            return [(v >> i) & 1 for i in range(n)]

        self.hint(compute, bits, [w for w, _ in xw])
        for b in bits:
            self.assert_bit(b)
        acc = LinComb()
        for i, b in enumerate(bits):
            acc = acc + self.lc((b, 1 << i))
        self.constrain_eq(acc, x)
        return bits

    def witness_np(self, w: list[int]) -> np.ndarray:
        """Wire vector -> (n, 16) uint32 limb rows for the device prover."""
        from ..fields.limbs import ints_to_limbs

        return ints_to_limbs(w)
