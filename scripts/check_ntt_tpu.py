"""Validate + time the NTT at the production domain (2^21) on the chip.

The reference runs its FFT at 2^21 on every proof (rust-rapidsnark/
rapidsnark/src/fft.cpp:191-246; domain size per scripts/python/setups/
testing_setup.py:15-17). This script is the first-ever at-scale check of
our DIF NTT:

1. builds the 2^21 plan (disk-cached npz afterwards),
2. checks ``intt(ntt(x)) == x`` on a random vector,
3. checks ``ntt(geometric(g))[k]`` against the closed form
   ``((g*w^k)^n - 1) / (g*w^k - 1)`` on a sample of ks (host bigints),
4. times ntt / intt / the full coset pipeline (intt -> coset mul -> ntt,
   groth16.cpp:169-262's per-polynomial work),
5. writes a tracked NTT_CHECK artifact (env NTT_CHECK_OUT).

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
import jax.numpy as jnp

from keyless_zk_tpu.fields import bn254
from keyless_zk_tpu.fields import jax_field as jf
from keyless_zk_tpu.fields.jax_field import FR
from keyless_zk_tpu.fields.limbs import ints_to_limbs, limbs_to_ints
from keyless_zk_tpu.ops.ntt import get_plan

DP = int(os.environ.get("DOMAIN_POW", "21"))
SAMPLES = int(os.environ.get("SAMPLES", "32"))
n = 1 << DP
p = FR.p
results = {"domain_pow": DP, "checks": {}, "timings_ms": {}}


def record(k, v):
    results["checks" if isinstance(v, bool) else "timings_ms"][k] = v
    print(f"{k}: {v}", flush=True)


t0 = time.monotonic()
plan = get_plan(DP)
record("plan_build_s", round(time.monotonic() - t0, 1))

# Input: geometric series x[j] = g^j — built on device in O(log n) and
# amenable to a closed-form host check of the transform output.
rng = np.random.default_rng(5)
g = 7
from keyless_zk_tpu.ops.ntt import geometric_powers

gbase = jf.encode_ints([g], FR, mont=True)[0]
t0 = time.monotonic()
x = geometric_powers(gbase, n)  # (n, 16) mont
x.block_until_ready()
record("geom_build_s", round(time.monotonic() - t0, 1))

ntt_j = jax.jit(plan.ntt)
intt_j = jax.jit(plan.intt)


def _sync(out):
    """block_until_ready is a NO-OP over the axon tunnel; force a tiny
    host readback instead."""
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


# --- round trip --------------------------------------------------------------
y, t_ntt = timeit(ntt_j, x)
back, t_intt = timeit(intt_j, y)
rt_ok = bool(jnp.array_equal(back, x))
record(f"ntt_2^{DP}_ms", round(t_ntt, 2))
record(f"intt_2^{DP}_ms", round(t_intt, 2))
record("roundtrip_ok", rt_ok)

# --- closed-form spot checks -------------------------------------------------
w = bn254.fr_root_of_unity(DP)
ks = sorted(set([0, 1, n - 1] + [int(k) for k in rng.integers(0, n, SAMPLES)]))
got = np.asarray(jnp.take(y, jnp.asarray(ks), axis=0))
got_ints = limbs_to_ints(got)
cf_ok = True
rinv = pow(FR.r_mod_p, -1, p)
for k, gi in zip(ks, got_ints):
    q = g * pow(w, k, p) % p
    if q == 1:
        want = n % p
    else:
        want = (pow(q, n, p) - 1) * pow(q - 1, -1, p) % p
    have = gi * rinv % p  # decode Montgomery
    if have != want:
        cf_ok = False
        print(f"  closed-form MISMATCH at k={k}", flush=True)
record("closed_form_ok", cf_ok)

# --- coset pipeline ----------------------------------------------------------
coset = plan.coset_powers()


@jax.jit
def coset_pipeline(a):
    return ntt_j(jf.mont_mul(intt_j(a), coset, FR))


_, t_coset = timeit(coset_pipeline, y)
record(f"coset_pipeline_2^{DP}_ms", round(t_coset, 2))

results["ok"] = rt_ok and cf_ok
out_path = os.environ.get("NTT_CHECK_OUT", os.path.join(_REPO, "NTT_CHECK_r03.json"))
results["devices"] = [str(d) for d in jax.devices()]
with open(out_path, "w") as f:
    json.dump(results, f, indent=1)
print(f"wrote {out_path}", flush=True)
sys.exit(0 if results["ok"] else 1)
