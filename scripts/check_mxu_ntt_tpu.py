"""Validate + time the MXU (matmul) NTT at the production domain on chip.

Same checks as check_ntt_tpu.py but for ops/mxu_ntt.py — the radix-128
byte-plane matmul formulation that moves the transform's inner loop onto
the MXU. Writes MXU_NTT_CHECK artifact (env MXU_NTT_CHECK_OUT).

Env: DOMAIN_POW (default 21), SAMPLES (default 32).
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from keyless_zk_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import jax

from keyless_zk_tpu.fields import bn254
from keyless_zk_tpu.fields import jax_field as jf
from keyless_zk_tpu.fields.jax_field import FR
from keyless_zk_tpu.fields.limbs import limbs_to_ints
from keyless_zk_tpu.ops.mxu_ntt import get_mxu_plan
from keyless_zk_tpu.ops.ntt import geometric_powers

DP = int(os.environ.get("DOMAIN_POW", "21"))
SAMPLES = int(os.environ.get("SAMPLES", "32"))
n = 1 << DP
p = FR.p
results = {"domain_pow": DP, "checks": {}, "timings_ms": {}}


def record(k, v):
    results["checks" if isinstance(v, bool) else "timings_ms"][k] = v
    print(f"{k}: {v}", flush=True)


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))
    return out


def timeit(fn, *a, iters=3):
    out = _sync(fn(*a))
    ts = []
    for _ in range(iters):
        t0 = time.monotonic()
        out = _sync(fn(*a))
        ts.append(time.monotonic() - t0)
    return out, min(ts) * 1e3


t0 = time.monotonic()
plan = get_mxu_plan(DP)
record("plan_build_s", round(time.monotonic() - t0, 1))

rng = np.random.default_rng(5)
g = 7
gbase = jf.encode_ints([g], FR, mont=True)[0]
x = geometric_powers(gbase, n)
_sync(x)

y, t_ntt = timeit(plan.ntt, x)
back, t_intt = timeit(plan.intt, y)
import jax.numpy as jnp

rt_ok = bool(jnp.array_equal(back, x))
record(f"mxu_ntt_2^{DP}_ms", round(t_ntt, 2))
record(f"mxu_intt_2^{DP}_ms", round(t_intt, 2))
record("roundtrip_ok", rt_ok)

w = bn254.fr_root_of_unity(DP)
ks = sorted(set([0, 1, n - 1] + [int(k) for k in rng.integers(0, n, SAMPLES)]))
got = np.asarray(jnp.take(y, jnp.asarray(ks), axis=0))
got_ints = limbs_to_ints(got)
cf_ok = True
rinv = pow(FR.r_mod_p, -1, p)
for k, gi in zip(ks, got_ints):
    q = g * pow(w, k, p) % p
    want = n % p if q == 1 else (pow(q, n, p) - 1) * pow(q - 1, -1, p) % p
    if gi * rinv % p != want:
        cf_ok = False
        print(f"  closed-form MISMATCH at k={k}", flush=True)
record("closed_form_ok", cf_ok)

# batched x3 (the prover transforms three polynomials per proof)
xb = jnp.stack([x, x, x])
_, t3 = timeit(plan.ntt, xb)
record(f"mxu_ntt_2^{DP}_x3_ms", round(t3, 2))

results["ok"] = rt_ok and cf_ok
results["devices"] = [str(d) for d in jax.devices()]
out_path = os.environ.get(
    "MXU_NTT_CHECK_OUT", os.path.join(_REPO, "MXU_NTT_CHECK_r03.json")
)
with open(out_path, "w") as f:
    json.dump(results, f, indent=1)
print(f"wrote {out_path}", flush=True)
sys.exit(0 if results["ok"] else 1)
