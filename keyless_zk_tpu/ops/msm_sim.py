"""Portable XLA simulators of the fused Pallas MSM kernel contracts.

Each function here implements exactly the input/output contract of its
namesake in ops/pallas_msm.py (layouts included), using the batched XLA
Jacobian curve instead of Mosaic kernels. Purpose:

1. CPU test coverage of the *entire* fused-MSM orchestration in ops/msm.py
   (sort, step-major flattening, interior-run gather indexing, boundary
   bookkeeping) — tests monkeypatch these over pallas_msm.* and compare the
   full `_msm_pippenger_fused` against the host reference curve
   (tests/test_msm_fused_sim.py). The Mosaic kernels themselves are
   validated on-hardware against the same contracts (tests/test_pallas_msm.py).
2. A worked, debuggable statement of what each kernel computes — the scan
   below is the semantic spec of pallas_msm._scan_kernel_body.

The reference has no analog of this split: its TBB MSM (rust-rapidsnark
multiexp.cpp:182-245) is its own spec. On a SIMD machine the kernel
contracts are intricate enough to deserve an executable one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..curves.jacobian import G1_CURVE, G2_CURVE, JacPoint
from ..fields.limbs import NUM_LIMBS


def _curve_for(tag: str):
    return G1_CURVE if tag == "fq" else G2_CURVE


def _rows_to_coord(a, tag):
    """(..., R) rows -> curve coordinate layout ((..., 16) or (..., 2, 16))."""
    if tag == "fq":
        return a
    return a.reshape(*a.shape[:-1], 2, NUM_LIMBS)


def _coord_to_rows(a, tag):
    if tag == "fq":
        return a
    return a.reshape(*a.shape[:-2], 2 * NUM_LIMBS)


def window_scan(tag, keys, flags, px, py, *, V, assume_distinct=True):
    """Simulates pallas_msm.window_scan: sequential slab scan with V lanes.

    keys/flags (L, 8, V//8) i32; px/py (R, L, 8, V//8) u32 limb-major.
    Returns (emit x/y/z (R, L, 8, V//8) — slab t holds the pre-add acc state;
    head_key/tail_key (1, 8, V//8) i32; head/tail points (R, 1, 8, V//8) x3).
    """
    curve = _curve_for(tag)
    L = keys.shape[0]
    R = px.shape[0]
    k_all = keys.reshape(L, V)
    f_all = flags.reshape(L, V)
    # (R, L, V) -> (L, V, R) -> coord layout
    gx = _rows_to_coord(jnp.moveaxis(px.reshape(R, L, V), 0, -1), tag)
    gy = _rows_to_coord(jnp.moveaxis(py.reshape(R, L, V), 0, -1), tag)

    inf0 = curve.infinity((V,))

    def step(state, slab):
        cur_key, acc, is_head, head_key, head_pt, t = state
        k, fl, x2, y2 = slab
        q_inf = (fl & 1) != 0
        q_neg = (fl & 2) != 0
        y2 = curve.ops.select(q_neg, curve.ops.neg(y2), y2)
        first = t == 0

        emit = acc  # pre-add accumulator state (garbage at t == 0)

        same = (k == cur_key) & ~first
        run_end = ~same & ~first
        to_head = run_end & is_head
        head_key = jnp.where(first, -2, jnp.where(to_head, cur_key, head_key))
        head_pt = curve.select(to_head & ~first, acc, head_pt)
        head_pt = curve.select(first, inf0, head_pt)
        is_head = first | (is_head & same)

        grown = curve.add_mixed(acc, x2, y2, q_inf)
        fresh = curve.from_affine(x2, y2, q_inf)
        acc = curve.select(same, grown, fresh)
        return (k, acc, is_head, head_key, head_pt, t + 1), emit

    state0 = (
        jnp.zeros((V,), jnp.int32),
        inf0,
        jnp.zeros((V,), bool),
        jnp.full((V,), -2, jnp.int32),
        inf0,
        jnp.int32(0),
    )
    (k_last, acc, is_head, head_key, head_pt, _), emits = jax.lax.scan(
        step, state0, (k_all, f_all, gx, gy)
    )

    tail_key = jnp.where(is_head, -1, k_last)
    tail_pt = curve.select(~is_head, acc, curve.infinity((V,)))
    head_key = jnp.where(is_head, k_last, head_key)
    head_pt = curve.select(is_head, acc, head_pt)

    def pt_out(p, shape):  # (V, coords) / (L, V, coords) -> (R, ...) rows
        c = jnp.moveaxis(_coord_to_rows(p, tag), -1, 0)
        return c.reshape(R, *shape)

    Wd = V // 8
    return (
        pt_out(emits.x, (L, 8, Wd)),
        pt_out(emits.y, (L, 8, Wd)),
        pt_out(emits.z, (L, 8, Wd)),
        head_key.reshape(1, 8, Wd),
        pt_out(head_pt.x, (1, 8, Wd)),
        pt_out(head_pt.y, (1, 8, Wd)),
        pt_out(head_pt.z, (1, 8, Wd)),
        tail_key.reshape(1, 8, Wd),
        pt_out(tail_pt.x, (1, 8, Wd)),
        pt_out(tail_pt.y, (1, 8, Wd)),
        pt_out(tail_pt.z, (1, 8, Wd)),
    )


def boundary_merge(tag, keys, px, py, pz, max_steps=None):
    """Simulates pallas_msm.boundary_merge: per-window segmented suffix
    totals; keys (Wn, M), points (Wn, R, M) -> totals at leader positions.

    `max_steps` (traced scalar) faithfully replicates the kernel's dynamic
    trip count: exactly that many Hillis-Steele passes run, so a too-small
    caller-derived bound fails the fused-sim tests the same way it would
    fail on hardware."""
    curve = _curve_for(tag)
    R = px.shape[1]
    m = keys.shape[1]
    full_steps = max(m - 1, 1).bit_length()
    if max_steps is None:
        bound = full_steps
    else:
        bound = jnp.minimum(max_steps.astype(jnp.int32), full_steps)

    def one(args):
        k, x, y, z = args
        pts = JacPoint(
            _rows_to_coord(x.T, tag), _rows_to_coord(y.T, tag), _rows_to_coord(z.T, tag)
        )
        idx = jnp.arange(m)

        def body(s, acc):
            sh = jnp.left_shift(1, s)
            shifted = jax.tree.map(lambda a: jnp.roll(a, -sh, axis=0), acc)
            same = jnp.roll(k, -sh) == k
            valid = same & (idx < m - sh)
            return curve.select(valid, curve.add(acc, JacPoint(*shifted)), acc)

        tot = jax.lax.fori_loop(0, bound, body, pts)
        return (
            jnp.moveaxis(_coord_to_rows(tot.x, tag), -1, 0),
            jnp.moveaxis(_coord_to_rows(tot.y, tag), -1, 0),
            jnp.moveaxis(_coord_to_rows(tot.z, tag), -1, 0),
        )

    return jax.lax.map(one, (keys, px, py, pz))


def weighted_bucket_total(tag, bx, by, bz):
    """Simulates pallas_msm.weighted_bucket_total: dense tables
    (Wn, R, NB) x3 -> per-window (Wn, R) x3 = sum_b b*B_b."""
    from .msm import _weighted_bucket_total

    curve = _curve_for(tag)
    nb = bx.shape[2]

    def one(args):
        x, y, z = args
        pts = JacPoint(
            _rows_to_coord(x.T, tag), _rows_to_coord(y.T, tag), _rows_to_coord(z.T, tag)
        )
        tot = _weighted_bucket_total(curve, pts, nb)
        return (
            _coord_to_rows(tot.x, tag),
            _coord_to_rows(tot.y, tag),
            _coord_to_rows(tot.z, tag),
        )

    return jax.lax.map(one, (bx, by, bz))


def horner_total(tag, wx, wy, wz, c):
    """Simulates pallas_msm.horner_total: (Wn, R) x3 -> (R,) x3."""
    from .msm import _horner_windows

    curve = _curve_for(tag)
    n_win = wx.shape[0]
    wins = JacPoint(
        _rows_to_coord(wx, tag), _rows_to_coord(wy, tag), _rows_to_coord(wz, tag)
    )
    tot = _horner_windows(curve, wins, n_win, c)
    return (
        _coord_to_rows(tot.x, tag),
        _coord_to_rows(tot.y, tag),
        _coord_to_rows(tot.z, tag),
    )
