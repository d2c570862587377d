"""Native Groth16 setup: R1CS -> proving key + verification key.

Replaces the external `snarkjs groth16 setup` step of the reference's
procurement pipeline (scripts/python/setups/testing_setup.py:62-69) with a
direct in-process setup.  Like the reference's testing setup it is a
1-party untrusted ceremony: toxic waste (tau, alpha, beta, gamma, delta)
is sampled locally and discarded.

Outputs plug straight into our prover:

- a :class:`~keyless_zk_tpu.groth16.zkey.ProvingKey` with the exact zkey
  semantics the prover consumes (coefficient table = sparse A/B matrix
  rows + snarkjs's public-input binding rows; Montgomery-stored values);
- a snarkjs-shape verification-key dict (cf. toy_vk.json) accepted by
  :func:`keyless_zk_tpu.groth16.pairing.verify_groth16`.

The heavy part of setup is ~5*nVars + domain fixed-base scalar
multiplications; they run as one batched double-and-add TPU kernel per
group (254 vector steps), not nVars sequential host muls.

Representation bookkeeping (verified bit-exact against toy_1.zkey):
zkey coefficient records store c*R^2 — snarkjs holds matrix entries in
Montgomery form (c*R) internally and Montgomery-encodes them again on
write.  Feeding that through our prover's pipeline makes the a/b vectors
Montgomery (true*R) and the final from_mont lands MSM_H's scalars on the
*true* coset evaluations of a*b - c, so the H basis is factor-free:

    H_k = [ L_k(tau/eta) * (tau^n - 1) / (delta * (eta^n - 1)) ] G1

with Z(eta*w^k) = eta^n - 1 = -2 the constant coset vanishing value.
This makes MSM_H = [ h(tau) * Z(tau) / delta ] G1 exactly — the same
contract snarkjs's hExps satisfy for rapidsnark (groth16.cpp:264-286).
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass

import numpy as np

from ..curves import ref_curve
from ..fields import bn254
from ..fields.limbs import ints_to_limbs
from ..groth16.zkey import G1Table, G2Table, ProvingKey

P = bn254.R_SCALAR
R256 = 1 << 256


def _batch_inv(xs: list[int]) -> list[int]:
    """Montgomery batch inversion: one modular inverse for the whole list."""
    n = len(xs)
    prefix = [1] * (n + 1)
    for i, x in enumerate(xs):
        prefix[i + 1] = prefix[i] * x % P
    inv = pow(prefix[n], -1, P)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv % P
        inv = inv * xs[i] % P
    return out


def _fixed_base_points(
    scalars: list[int], group: str, device_threshold: int = 512, chunk: int = 1 << 15
):
    """[k_i * G] for the G1/G2 generator; batched on device beyond a threshold.

    Work is cut into fixed-size chunks (padded to `chunk`) so one compiled
    kernel shape serves any table size and per-launch device memory stays
    bounded.
    """
    gen = ref_curve.G1_GEN if group == "g1" else ref_curve.G2_GEN
    ops = ref_curve.G1 if group == "g1" else ref_curve.G2
    if len(scalars) <= device_threshold:
        return [ops.mul(gen, k) for k in scalars]

    import functools

    import jax
    import jax.numpy as jnp

    from ..curves.jacobian import G1_CURVE, G2_CURVE
    from ..fields.limbs import LIMB_BITS
    from ..ops.msm import _accelerated

    # on TPU the batched dbl/madd chain routes through the fused Pallas
    # group-law kernels (ops/pallas_curve.py) — the table build is ~500
    # batched group ops over millions of points at full scale
    curve = _accelerated(G1_CURVE if group == "g1" else G2_CURVE)
    bx0, by0, _ = curve.encode_affine([gen])

    @functools.partial(jax.jit, static_argnames="curve")
    def kernel(limbs, bx1, by1, *, curve):
        n = limbs.shape[0]
        bx = jnp.broadcast_to(bx1[0], (n, *bx1.shape[1:]))
        by = jnp.broadcast_to(by1[0], (n, *by1.shape[1:]))
        binf = jnp.zeros((n,), bool)
        nbits = 254
        bit_idx = jnp.arange(nbits - 1, -1, -1)
        limb, off = bit_idx // LIMB_BITS, bit_idx % LIMB_BITS
        bits = (limbs[:, limb] >> off) & 1  # (n, 254) MSB-first

        def body(i, acc):
            acc = curve.dbl(acc)
            added = curve.add_mixed(acc, bx, by, binf)
            return curve.select(bits[:, i] == 1, added, acc)

        acc = jax.lax.fori_loop(0, nbits, body, curve.infinity((n,)))
        return curve.to_affine(acc)

    out = []
    total = len(scalars)
    for start in range(0, total, chunk):
        part = scalars[start : start + chunk]
        pad = chunk - len(part) if total > chunk else 0
        limbs = jnp.asarray(ints_to_limbs([k % P for k in part] + [0] * pad))
        x, y, inf = kernel(limbs, bx0, by0, curve=curve)
        xs = curve.ops.decode(x)
        ys = curve.ops.decode(y)
        infs = list(jax.device_get(inf))
        out.extend(
            None if i else (xx, yy)
            for xx, yy, i in list(zip(xs, ys, infs))[: len(part)]
        )
    return out


@dataclass
class SetupResult:
    pk: ProvingKey
    vk: dict
    toxic: dict  # tau/alpha/beta/gamma/delta — exposed for tests only


def _g1_json(p):
    return ["0", "1", "0"] if p is None else [str(p[0]), str(p[1]), "1"]


def _g2_json(p):
    if p is None:
        return [["0", "0"], ["1", "0"], ["0", "0"]]
    return [[str(p[0][0]), str(p[0][1])], [str(p[1][0]), str(p[1][1])], ["1", "0"]]


def groth16_setup(
    r1cs,
    *,
    rng=None,
    toxic: dict | None = None,
    device_threshold: int = 512,
) -> SetupResult:
    """Run a 1-party Groth16 setup over an R1CS instance.

    `r1cs` is a :class:`~keyless_zk_tpu.circuits.r1cs_file.R1CS` (use
    `r1cs_from_cs` for native ConstraintSystems).  `toxic` pins the secret
    scalars for reproducible tests.
    """
    if r1cs.prime != P:
        raise ValueError("setup requires the BN254 scalar field")
    npub = r1cs.n_public
    m0 = r1cs.n_constraints
    n_vars = r1cs.n_wires

    sample = (lambda: secrets.randbelow(P - 1) + 1) if rng is None else (lambda: rng.randrange(1, P))
    tox = toxic or {}
    tau = tox.get("tau") or sample()
    alpha = tox.get("alpha") or sample()
    beta = tox.get("beta") or sample()
    gamma = tox.get("gamma") or sample()
    delta = tox.get("delta") or sample()

    # domain covers the constraints plus the nPublic+1 binding rows snarkjs
    # appends so public wires occur in A (malleability guard)
    domain_pow = max(1, (m0 + npub + 1 - 1).bit_length())
    n = 1 << domain_pow
    omega = bn254.fr_root_of_unity(domain_pow)
    eta = bn254.fr_root_of_unity(domain_pow + 1)  # eta^2 == omega, eta^n == -1

    # ---- Lagrange values L_q(tau) over the omega domain -------------------
    w_pows = [1] * n
    for q in range(1, n):
        w_pows[q] = w_pows[q - 1] * omega % P
    z_tau = (pow(tau, n, P) - 1) % P
    if z_tau == 0:
        raise ValueError("tau landed in the evaluation domain; resample")
    denom_inv = _batch_inv([n * (tau - wq) % P for wq in w_pows])
    lag = [z_tau * wq % P * dq % P for wq, dq in zip(w_pows, denom_inv)]

    # ---- u_i(tau), v_i(tau), w_i(tau) --------------------------------------
    u = [0] * n_vars
    v = [0] * n_vars
    w = [0] * n_vars
    for q, row in enumerate(r1cs.A):
        for i, coef in row.items():
            u[i] = (u[i] + coef * lag[q]) % P
    for q, row in enumerate(r1cs.B):
        for i, coef in row.items():
            v[i] = (v[i] + coef * lag[q]) % P
    for q, row in enumerate(r1cs.C):
        for i, coef in row.items():
            w[i] = (w[i] + coef * lag[q]) % P
    for s in range(npub + 1):  # binding rows: A[m0+s][s] = 1
        u[s] = (u[s] + lag[m0 + s]) % P

    gamma_inv = pow(gamma, -1, P)
    delta_inv = pow(delta, -1, P)

    ic_scalars = [
        (beta * u[i] + alpha * v[i] + w[i]) % P * gamma_inv % P for i in range(npub + 1)
    ]
    c_scalars = [
        (beta * u[i] + alpha * v[i] + w[i]) % P * delta_inv % P
        for i in range(npub + 1, n_vars)
    ]

    # ---- H basis over the eta-coset ----------------------------------------
    # L_k(tau/eta) reuses the Lagrange machinery at the shifted point.
    t2 = tau * pow(eta, -1, P) % P
    z2 = (pow(t2, n, P) - 1) % P
    if z2 == 0:
        raise ValueError("tau/eta landed in the evaluation domain; resample")
    d2_inv = _batch_inv([n * (t2 - wq) % P for wq in w_pows])
    coset_vanish = (pow(eta, n, P) - 1) % P  # == -2
    h_common = z_tau * delta_inv % P * pow(coset_vanish, -1, P) % P
    h_scalars = [z2 * wq % P * dq % P * h_common % P for wq, dq in zip(w_pows, d2_inv)]

    # ---- point tables (batched fixed-base kernels) --------------------------
    pts_a = _fixed_base_points(u, "g1", device_threshold)
    pts_b1 = _fixed_base_points(v, "g1", device_threshold)
    pts_b2 = _fixed_base_points(v, "g2", device_threshold)
    pts_c = _fixed_base_points(c_scalars, "g1", device_threshold)
    pts_h = _fixed_base_points(h_scalars, "g1", device_threshold)
    pts_ic = _fixed_base_points(ic_scalars, "g1", device_threshold)

    g1, g2 = ref_curve.G1, ref_curve.G2
    vk_alpha1 = g1.mul(ref_curve.G1_GEN, alpha)
    vk_beta1 = g1.mul(ref_curve.G1_GEN, beta)
    vk_beta2 = g2.mul(ref_curve.G2_GEN, beta)
    vk_gamma2 = g2.mul(ref_curve.G2_GEN, gamma)
    vk_delta1 = g1.mul(ref_curve.G1_GEN, delta)
    vk_delta2 = g2.mul(ref_curve.G2_GEN, delta)

    # ---- coefficient table (zkey section 4 semantics) -----------------------
    ms, cs_, ss, vals = [], [], [], []
    for q, row in enumerate(r1cs.A):
        for i, coef in row.items():
            ms.append(0), cs_.append(q), ss.append(i), vals.append(coef)
    for s in range(npub + 1):
        ms.append(0), cs_.append(m0 + s), ss.append(s), vals.append(1)
    for q, row in enumerate(r1cs.B):
        for i, coef in row.items():
            ms.append(1), cs_.append(q), ss.append(i), vals.append(coef)

    pk = ProvingKey(
        n8q=32,
        n8r=32,
        q=bn254.Q,
        r=P,
        n_vars=n_vars,
        n_public=npub,
        domain_size=n,
        n_coefs=len(ms),
        vk_alpha1=vk_alpha1,
        vk_beta1=vk_beta1,
        vk_beta2=vk_beta2,
        vk_gamma2=vk_gamma2,
        vk_delta1=vk_delta1,
        vk_delta2=vk_delta2,
        coef_m=np.asarray(ms, dtype=np.uint32),
        coef_c=np.asarray(cs_, dtype=np.uint32),
        coef_s=np.asarray(ss, dtype=np.uint32),
        coef_val=ints_to_limbs([c * R256 % P * R256 % P for c in vals]),
        points_a=_g1_table(pts_a),
        points_b1=_g1_table(pts_b1),
        points_b2=_g2_table(pts_b2),
        points_c=_g1_table(pts_c),
        points_h=_g1_table(pts_h),
    )

    vk = {
        "protocol": "groth16",
        "curve": "bn128",
        "nPublic": npub,
        "vk_alpha_1": _g1_json(vk_alpha1),
        "vk_beta_2": _g2_json(vk_beta2),
        "vk_gamma_2": _g2_json(vk_gamma2),
        "vk_delta_2": _g2_json(vk_delta2),
        "IC": [_g1_json(p) for p in pts_ic],
    }
    return SetupResult(
        pk=pk,
        vk=vk,
        toxic={"tau": tau, "alpha": alpha, "beta": beta, "gamma": gamma, "delta": delta},
    )


def _mont_q(x: int) -> int:
    return x * R256 % bn254.Q


def _g1_table(pts) -> G1Table:
    n = len(pts)
    xs = [0 if p is None else _mont_q(p[0]) for p in pts]
    ys = [0 if p is None else _mont_q(p[1]) for p in pts]
    return G1Table(
        x=ints_to_limbs(xs),
        y=ints_to_limbs(ys),
        inf=np.asarray([p is None for p in pts], dtype=bool),
    )


def _g2_table(pts) -> G2Table:
    xs, ys = [], []
    for p in pts:
        if p is None:
            xs.append([0, 0]), ys.append([0, 0])
        else:
            xs.append([_mont_q(p[0][0]), _mont_q(p[0][1])])
            ys.append([_mont_q(p[1][0]), _mont_q(p[1][1])])
    flat_x = ints_to_limbs([c for pair in xs for c in pair]).reshape(len(pts), 2, 16)
    flat_y = ints_to_limbs([c for pair in ys for c in pair]).reshape(len(pts), 2, 16)
    return G2Table(
        x=flat_x, y=flat_y, inf=np.asarray([p is None for p in pts], dtype=bool)
    )
