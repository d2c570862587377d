"""Multi-scalar multiplication (Pippenger) for TPU.

Replaces the reference's TBB bucket MSM (rust-rapidsnark/rapidsnark/src/
multiexp.cpp:182-245: per-thread bucket privatization + tree merge) with a
design built for a SIMD machine with no atomics:

1. **digits**: scalars (standard form, 16x16-bit limbs) are split into
   ceil(254/c) unsigned c-bit windows, all extracted at once by limb shifts;
2. **sort**: per window, point indices are sorted by digit so each bucket's
   points are contiguous (replaces the reference's racy scatter: sorted
   segments are race-free by construction, cf. SURVEY §2.4 P3/P4);
3. **chunk scan**: the sorted stream is cut into V lanes x L steps; each of
   the L sequential steps performs one V-wide *batched* mixed EC add of the
   next element of every lane into its running accumulator, emitting a
   finished bucket sum (a run that ends inside the chunk) via a V-wide
   scatter. Work: exactly n mixed adds per window — the Pippenger optimum —
   at full vector width.
4. **boundary merge**: runs that span chunk boundaries produce <=2V partials
   whose keys are sorted; a log-step segmented suffix scan merges them and
   scatters the totals into the bucket table (leader lanes only).
5. **weighted bucket reduction**: sum_b b*B_b is computed as
   sum_{b>=1} SuffixSum_b with a log-step (Hillis-Steele) suffix scan —
   the vectorized equivalent of the reference's sequential running-sum
   (multiexp.cpp:132-180).
6. **horner over windows**: acc = 2^c * acc + W_w with c batched doublings.

Digit-0 entries are mapped to the point at infinity, so padding and zero
scalars need no special casing anywhere.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..curves.jacobian import JacobianCurve, JacPoint
from .pallas_curve import _sel
from ..fields.limbs import LIMB_BITS, NUM_LIMBS

SCALAR_BITS = 254

_PALLAS_G1 = None


def _accelerated(curve):
    """On real TPUs, route G1 through the fused Pallas group-law kernels."""
    global _PALLAS_G1
    from ..curves.jacobian import G1_CURVE

    if (
        curve is G1_CURVE
        and jax.default_backend() == "tpu"
        and os.environ.get("KEYLESS_NO_PALLAS") != "1"
    ):
        if _PALLAS_G1 is None:
            from .pallas_curve import PallasG1Curve

            _PALLAS_G1 = PallasG1Curve(G1_CURVE)
        return _PALLAS_G1
    return curve


def extract_digits(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """(n, 16) u32 standard-form scalars -> (n_windows, n) int32 c-bit digits."""
    n_windows = -(-SCALAR_BITS // c)
    outs = []
    mask = jnp.uint32((1 << c) - 1)
    for w in range(n_windows):
        lo = w * c
        li, off = lo // LIMB_BITS, lo % LIMB_BITS
        d = scalars[:, li] >> off
        if off + c > LIMB_BITS and li + 1 < NUM_LIMBS:
            d = d | (scalars[:, li + 1] << (LIMB_BITS - off))
        if off + c > 2 * LIMB_BITS and li + 2 < NUM_LIMBS:  # c > 16 never hits this
            d = d | (scalars[:, li + 2] << (2 * LIMB_BITS - off))
        outs.append((d & mask).astype(jnp.int32))
    return jnp.stack(outs)


def _segmented_suffix_totals(keys: jnp.ndarray, pts: JacPoint, curve: JacobianCurve):
    """Inclusive segmented suffix sums over a key-sorted point sequence.

    After the scan, the first (leader) position of every equal-key segment
    holds the segment total. Returns (totals, leader_mask).

    The log-step scan runs under lax.fori_loop with a dynamic shift so the
    compiled graph contains the group law once, not unrolled log(m) times
    (unrolled EC scans OOM the TPU compiler at production sizes).
    """
    m = keys.shape[0]
    steps = max(m - 1, 1).bit_length()
    idx = jnp.arange(m)

    def body(s, acc):
        sh = jnp.left_shift(1, s)
        shifted = jax.tree.map(lambda a: jnp.roll(a, -sh, axis=0), acc)
        same = jnp.roll(keys, -sh) == keys
        # positions within `sh` of the end have no valid partner
        valid = same & (idx < m - sh)
        return curve.select(valid, curve.add(acc, JacPoint(*shifted)), acc)

    acc = jax.lax.fori_loop(0, steps, body, pts)
    leader = jnp.concatenate([jnp.ones((1,), bool), keys[1:] != keys[:-1]])
    return acc, leader


def suffix_sum_points(curve: JacobianCurve, pts: JacPoint) -> JacPoint:
    """Inclusive suffix sums: out[i] = sum_{j >= i} pts[j] (Hillis-Steele
    under fori_loop — one group-law instance in the graph)."""
    m = pts.x.shape[0]
    steps = max(m - 1, 1).bit_length()
    idx = jnp.arange(m)

    def body(s, acc):
        sh = jnp.left_shift(1, s)
        shifted = jax.tree.map(lambda a: jnp.roll(a, -sh, axis=0), acc)
        valid = idx < m - sh
        return curve.select(valid, curve.add(acc, JacPoint(*shifted)), acc)

    return jax.lax.fori_loop(0, steps, body, pts)


@functools.partial(jax.jit, static_argnames="curve")
def _msm_small(points_x, points_y, points_inf, scalars, *, curve) -> JacPoint:
    """Direct MSM for small n: batched double-and-add over all points at
    once (254 steps), then a log-depth tree sum. One small traced graph —
    Pippenger's window machinery only pays off at scale."""
    n = scalars.shape[0]
    bit_idx = jnp.arange(SCALAR_BITS - 1, -1, -1)
    limb = bit_idx // LIMB_BITS
    off = bit_idx % LIMB_BITS
    bits = (scalars[:, limb] >> off) & 1  # (n, 254) MSB-first

    base = curve.from_affine(points_x, points_y, points_inf)

    def body(i, acc):
        acc = curve.dbl(acc)
        added = curve.add(acc, base)
        return curve.select(bits[:, i] == 1, added, acc)

    acc = jax.lax.fori_loop(0, SCALAR_BITS, body, curve.infinity((n,)))
    return tree_reduce_points(curve, acc, n)


def tree_reduce_points(curve: JacobianCurve, acc: JacPoint, m: int) -> JacPoint:
    """Sum of a leading-axis batch of Jacobian points.

    Implemented as an inclusive suffix scan (fixed shapes, one group-law
    instance in the graph) and taking element 0 — log-depth like a tree
    but without per-level shape changes that bloat the compiled graph."""
    if m == 1:
        return JacPoint(*jax.tree.map(lambda a: a[0], acc))
    total = suffix_sum_points(curve, JacPoint(*jax.tree.map(lambda a: a[:m], acc)))
    return JacPoint(*jax.tree.map(lambda a: a[0], total))


def msm_window_bits(n: int) -> int:
    """Window size minimizing total EC adds for this design.

    Unlike the reference's per-point cost model (multiexp.cpp:206-213),
    the bucket reduction here is a log-step suffix scan costing c * 2^c
    adds per window, so the balance point sits lower: minimize
    ceil(254/c) * (n + c * 2^c) over c."""

    def cost(c: int) -> int:
        return -(-SCALAR_BITS // c) * (n + c * (1 << c))

    return min(range(4, 17), key=cost)


def msm(
    points_x: jnp.ndarray,
    points_y: jnp.ndarray,
    points_inf: jnp.ndarray,
    scalars: jnp.ndarray,
    *,
    curve: JacobianCurve,
    c: int | None = None,
    lanes: int = 1 << 12,
    small_threshold: int = 128,
) -> JacPoint:
    """sum_i scalars[i] * P_i.  Points affine (Montgomery), scalars standard.

    Returns a single Jacobian point (batch shape ()).
    """
    n = scalars.shape[0]
    if n <= small_threshold:
        return _msm_small(points_x, points_y, points_inf, scalars, curve=curve)
    if c is None:
        c = msm_window_bits(n)
    acc_curve = _accelerated(curve)
    if acc_curve is not curve:  # TPU G1: fused Pallas chunk-scan path
        return _msm_pippenger_fused(
            points_x, points_y, points_inf, scalars,
            curve=acc_curve, c=c, lanes=lanes,
        )
    return _msm_pippenger(
        points_x, points_y, points_inf, scalars,
        curve=curve, c=c, lanes=lanes,
    )


def _weighted_bucket_total(curve: JacobianCurve, buckets: JacPoint, n_buckets: int) -> JacPoint:
    """sum_{b>=1} b * B_b via the suffix-scan identity (multiexp.cpp:132-180)."""
    bk = JacPoint(*jax.tree.map(lambda a: a[:n_buckets], buckets))
    suf = suffix_sum_points(curve, bk)
    seg = JacPoint(*jax.tree.map(lambda a: a[1:], suf))
    return tree_reduce_points(curve, seg, n_buckets - 1)


def _horner_windows(curve: JacobianCurve, wins: JacPoint, n_windows: int, c: int) -> JacPoint:
    """acc = 2^c * acc + W_w from the highest window down, loop-rolled."""

    def win(w):
        return JacPoint(
            *jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, w, axis=0, keepdims=False),
                wins,
            )
        )

    def horner(t, acc):
        acc = jax.lax.fori_loop(0, c, lambda _, a: curve.dbl(a), acc)
        return curve.add(acc, win(n_windows - 2 - t))

    return jax.lax.fori_loop(0, n_windows - 1, horner, win(n_windows - 1))


@functools.partial(jax.jit, static_argnames=("curve", "c", "lanes"))
def _msm_pippenger_fused(
    points_x: jnp.ndarray,
    points_y: jnp.ndarray,
    points_inf: jnp.ndarray,
    scalars: jnp.ndarray,
    *,
    curve: JacobianCurve,
    c: int,
    lanes: int,
) -> JacPoint:
    """Pippenger with the chunk scan fused into one Pallas kernel (G1/TPU).

    Differs from `_msm_pippenger` in stage fusion: the L-step fori_loop of
    (slice + mixed add + scatter) becomes a single `pallas_msm.window_scan`
    call over limb-major data, the bucket scatter runs once per window over
    the dense emit buffer, and the boundary merge + weighted bucket
    reduction run as two more fused kernels — everything stays limb-major
    end to end, with no per-step relayouts.
    """
    from . import pallas_msm
    from .pallas_curve import TILE

    n = scalars.shape[0]
    # one kernel tile of lanes: the scan kernel runs the whole stream as
    # grid steps either way, and narrow V keeps the boundary sequences (2V
    # per window) and their VMEM-stacked kernel tensors small
    V = min(lanes, TILE)
    L = -(-n // V)
    pad = V * L - n

    digits_all = extract_digits(scalars, c)  # (W, n)
    n_windows = digits_all.shape[0]
    # pad the bucket table to the reduction kernel's 128-lane granularity;
    # extra buckets stay at infinity and contribute nothing
    n_buckets = max(1 << c, 128)
    DUMP = n_buckets

    # master limb-major tables with a sentinel infinity column at index n
    pxm = jnp.concatenate([points_x, jnp.zeros((1, NUM_LIMBS), points_x.dtype)]).T
    pym = jnp.concatenate([points_y, jnp.zeros((1, NUM_LIMBS), points_y.dtype)]).T
    pinf_ext = jnp.concatenate([points_inf, jnp.ones((1,), bool)])

    # pad before sorting: -1 keys sort to the front, their index hits the
    # sentinel infinity column n of the master tables
    pad_keys = jnp.full((pad,), -1, jnp.int32)
    pad_idx = jnp.full((pad,), n, jnp.int32)
    iota = jax.lax.iota(jnp.int32, n)

    def window_scan_phase(digits):
        # lax primitives instead of jnp.argsort/take/where: their jitted
        # wrappers emit closed_call jaxprs that trip a jax-0.9 lowering-
        # cache KeyError when a second MSM shape is traced in one process
        keys_p = jnp.concatenate([pad_keys, digits]) if pad else digits
        idx_p = jnp.concatenate([pad_idx, iota]) if pad else iota
        keys_sorted, order = jax.lax.sort((keys_p, idx_p), num_keys=1, is_stable=True)
        # step-major flattening: column t*TILE + v = sorted element v*L + t
        flat = order.reshape(V, L).T.reshape(1, V * L)
        keys_sm = keys_sorted.reshape(V, L).T.reshape(1, V * L)
        gx = pxm[:, flat[0]]  # (16, L*V), already in kernel layout
        gy = pym[:, flat[0]]
        ginf = pinf_ext[flat] | (keys_sm == 0)

        return pallas_msm.window_scan(keys_sm, gx, gy, ginf)

    # phase 1, per window: sort + gather + fused chunk scan
    (ekey, ex, ey, ez, hkey, hx, hy, hz, tkey, tx, ty, tz) = jax.lax.map(
        window_scan_phase, digits_all
    )
    Wn = n_windows

    # phase 2, batched across windows.
    # global bucket tables (16, Wn*(nb+1)): window w owns slots
    # [w*(nb+1), (w+1)*(nb+1)); each window's last slot is its dump.
    # interior runs hit each bucket at most once, so plain .set is
    # race-free; z == 0 encodes infinity, so all-zero tables start empty.
    stride = n_buckets + 1
    win_id = jnp.arange(Wn, dtype=jnp.int32)
    bx = jnp.zeros((NUM_LIMBS, Wn * stride), jnp.uint32)
    by = jnp.zeros_like(bx)
    bz = jnp.zeros_like(bx)
    base = (win_id * stride)[:, None, None]
    eidx = (base + _sel(ekey >= 0, ekey, DUMP)).reshape(-1)

    def flat_e(a):  # (Wn, 16, L*V) -> (16, Wn*L*V) matching eidx order
        return a.transpose(1, 0, 2).reshape(NUM_LIMBS, Wn * L * V)

    bx = bx.at[:, eidx].set(flat_e(ex))
    by = by.at[:, eidx].set(flat_e(ey))
    bz = bz.at[:, eidx].set(flat_e(ez))

    # boundary sequences, one per window: head_0, tail_0, head_1, ...
    bkeys = jnp.stack([hkey.reshape(Wn, V), tkey.reshape(Wn, V)], axis=2).reshape(Wn, 2 * V)

    def interleave(h, t):  # (Wn, 16, 1, V) x2 -> (Wn, 16, 2V)
        return jnp.stack(
            [h.reshape(Wn, NUM_LIMBS, V), t.reshape(Wn, NUM_LIMBS, V)], axis=3
        ).reshape(Wn, NUM_LIMBS, 2 * V)

    bkeys = jax.lax.cummax(bkeys, axis=1)  # fill -1/-2 sentinels; points are inf
    mx, my, mz = pallas_msm.boundary_merge(
        bkeys, interleave(hx, tx), interleave(hy, ty), interleave(hz, tz)
    )
    leader = jnp.concatenate(
        [jnp.ones((Wn, 1), bool), bkeys[:, 1:] != bkeys[:, :-1]], axis=1
    )
    bidx = (base[:, 0] + _sel(leader & (bkeys > 0), bkeys, DUMP)).reshape(-1)
    bx = bx.at[:, bidx].set(mx.transpose(1, 0, 2).reshape(NUM_LIMBS, Wn * 2 * V))
    by = by.at[:, bidx].set(my.transpose(1, 0, 2).reshape(NUM_LIMBS, Wn * 2 * V))
    bz = bz.at[:, bidx].set(mz.transpose(1, 0, 2).reshape(NUM_LIMBS, Wn * 2 * V))

    def per_window(a):  # (16, Wn*(nb+1)) -> (Wn, 16, nb) without dump slots
        return a.reshape(NUM_LIMBS, Wn, stride).transpose(1, 0, 2)[:, :, :n_buckets]

    wx, wy, wz = pallas_msm.weighted_bucket_total(
        per_window(bx), per_window(by), per_window(bz)
    )

    # phase 3: one fused horner kernel sums 2^(c*w)-scaled window totals
    tx_, ty_, tz_ = pallas_msm.horner_total(wx, wy, wz, c)
    return JacPoint(tx_, ty_, tz_)


@functools.partial(jax.jit, static_argnames=("curve", "c", "lanes"))
def _msm_pippenger(
    points_x: jnp.ndarray,
    points_y: jnp.ndarray,
    points_inf: jnp.ndarray,
    scalars: jnp.ndarray,
    *,
    curve: JacobianCurve,
    c: int,
    lanes: int,
) -> JacPoint:
    f = curve.ops
    n = scalars.shape[0]
    V = min(lanes, max(1, n))
    L = -(-n // V)
    pad = V * L - n

    digits_all = extract_digits(scalars, c)  # (W, n)
    n_windows = digits_all.shape[0]
    n_buckets = 1 << c

    def window_sum(digits):
        order = jnp.argsort(digits)
        keys = jnp.take(digits, order)
        px = jnp.take(points_x, order, axis=0)
        py = jnp.take(points_y, order, axis=0)
        pinf = jnp.take(points_inf, order, axis=0) | (keys == 0)
        if pad:
            keys = jnp.concatenate([jnp.full((pad,), -1, keys.dtype), keys])
            # pad with (inf) points at front, keyed -1 so they sort-stable ahead;
            # we padded *after* sorting, so prepend instead (keys stay sorted)
            px = jnp.concatenate([jnp.zeros((pad, *px.shape[1:]), px.dtype), px])
            py = jnp.concatenate([jnp.zeros((pad, *py.shape[1:]), py.dtype), py])
            pinf = jnp.concatenate([jnp.ones((pad,), bool), pinf])
        keys = keys.reshape(V, L)
        px = px.reshape(V, L, *px.shape[1:])
        py = py.reshape(V, L, *py.shape[1:])
        pinf = pinf.reshape(V, L)

        # bucket table with a dump slot at index n_buckets
        buckets = curve.infinity((n_buckets + 1,))
        DUMP = n_buckets

        def seed(_):
            acc0 = curve.from_affine(px[:, 0], py[:, 0], pinf[:, 0])
            return (
                keys[:, 0],  # cur_key
                acc0,  # acc
                jnp.ones((V,), bool),  # is_head
                jnp.full((V,), -2, keys.dtype),  # head_key (-2: none yet)
                curve.infinity((V,)),  # head_point
                buckets,
            )

        def step(t, state):
            cur_key, acc, is_head, head_key, head_pt, bk = state
            k = jax.lax.dynamic_index_in_dim(keys, t, axis=1, keepdims=False)
            x = jax.lax.dynamic_index_in_dim(px, t, axis=1, keepdims=False)
            y = jax.lax.dynamic_index_in_dim(py, t, axis=1, keepdims=False)
            pi = jax.lax.dynamic_index_in_dim(pinf, t, axis=1, keepdims=False)
            same = k == cur_key
            emit = ~same
            # route finished run: head runs park in head_*, interior runs scatter
            to_head = emit & is_head
            head_key = _sel(to_head, cur_key, head_key)
            head_pt = curve.select(to_head, acc, head_pt)
            to_bucket = emit & ~is_head
            idx = _sel(to_bucket, cur_key, DUMP)
            bk = JacPoint(
                bk.x.at[idx].set(acc.x),
                bk.y.at[idx].set(acc.y),
                bk.z.at[idx].set(acc.z),
            )
            is_head = is_head & same
            fresh = curve.from_affine(x, y, pi)
            grown = curve.add_mixed(acc, x, y, pi)
            acc = curve.select(same, grown, fresh)
            cur_key = k
            return cur_key, acc, is_head, head_key, head_pt, bk

        cur_key, acc, is_head, head_key, head_pt, buckets = jax.lax.fori_loop(
            1, L, step, seed(None)
        )

        # final run of each lane: if the chunk was a single run it is a head,
        # otherwise a tail.
        tail_key = _sel(is_head, -1, cur_key)
        tail_pt = curve.select(is_head, curve.infinity((V,)), acc)
        head_key = _sel(is_head, cur_key, head_key)
        head_pt = curve.select(is_head, acc, head_pt)

        # boundary sequence in global sorted order: head_0, tail_0, head_1, ...
        bkeys = jnp.stack([head_key, tail_key], axis=1).reshape(2 * V)
        bpts = jax.tree.map(
            lambda h, t: jnp.stack([h, t], axis=1).reshape(2 * V, *h.shape[1:]),
            head_pt,
            tail_pt,
        )
        bpts = JacPoint(*bpts)
        # fill sentinel keys (-1/-2) with the previous real key so equal-key
        # runs are contiguous; their points are infinity, so they add nothing.
        bkeys = jax.lax.cummax(bkeys)
        totals, leader = _segmented_suffix_totals(bkeys, bpts, curve)
        idx = _sel(leader & (bkeys > 0), bkeys, DUMP)
        buckets = JacPoint(
            buckets.x.at[idx].set(totals.x),
            buckets.y.at[idx].set(totals.y),
            buckets.z.at[idx].set(totals.z),
        )

        # weighted reduction: sum_b b*B_b = sum_{b>=1} SuffixSum_b
        return _weighted_bucket_total(curve, buckets, n_buckets)

    # one traced window_sum instance, mapped over all windows sequentially
    wins = jax.lax.map(window_sum, digits_all)
    return _horner_windows(curve, wins, n_windows, c)
