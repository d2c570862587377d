"""Multi-scalar multiplication (Pippenger) for TPU.

Replaces the reference's TBB bucket MSM (rust-rapidsnark/rapidsnark/src/
multiexp.cpp:182-245: per-thread bucket privatization + tree merge) with a
design built for a SIMD machine with no atomics. Round-2 pipeline (the
fused TPU path; `_msm_pippenger` is the portable XLA formulation used for
CPU tests):

1. **signed digits**: scalars are split into ceil(254/c) c-bit windows and
   rebalanced to digits in [-(2^(c-1)-1), 2^(c-1)] with carry propagation —
   half the buckets of the reference's unsigned windows (multiexp.hpp:4-6),
   paid for by a mask-negated y at gather time (negation is an Fq subtract).
2. **one batched sort**: all windows' (digit, index|neg) pairs sort in a
   single `lax.sort` call over a (W, n) batch.
3. **fused chunk scan** (pallas_msm.window_scan): V lanes consume the
   sorted stream in L slabs; each slab performs one V-wide complete mixed
   add. Work: exactly n mixed adds per window — the Pippenger optimum.
4. **scatter-free dense bucket tables**: the scan streams its pre-add
   accumulator states to an emit buffer; each bucket's interior-run total
   sits at a position computable from the *sorted keys alone* (the slab
   after its run ends), so the dense table is built with binary-searched
   gathers — the round-1 million-entry 3-coordinate scatter is gone.
   Runs crossing lane boundaries resolve in a per-window 2V-entry
   segmented-scan merge (pallas_msm.boundary_merge) and are gathered the
   same way.
5. **weighted bucket reduction** (pallas_msm.bucket accum+combine):
   sum_b b·B_b with O(NB) sequential EC adds per window — the vector form
   of the reference's running-sum reduction (multiexp.cpp:132-180).
6. **horner over windows**: one kernel computes sum_w 2^(c·w)·W_w.

Digit-0 entries map to the point at infinity, so padding and zero scalars
need no special casing anywhere. G2 runs the same pipeline with Fq2
coordinate rows (alt_bn128.hpp:9-69's second Curve instantiation).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..curves.jacobian import JacobianCurve, JacPoint
from .pallas_ec import sel as _sel
from ..fields.limbs import LIMB_BITS, NUM_LIMBS

SCALAR_BITS = 254

# bump when fused-kernel semantics change (invalidates AOT export cache)
AOT_VERSION = 4

_PALLAS_CURVES = {}


def _fused_tag(curve):
    """Field tag for the fused Pallas path, or None to use the XLA path."""
    from ..curves.jacobian import G1_CURVE, G2_CURVE
    from ..utils.flags import NO_PALLAS

    if jax.default_backend() != "tpu" or NO_PALLAS:
        return None
    if curve is G1_CURVE:
        return "fq"
    if curve is G2_CURVE:
        return "fq2"
    return None


def _accelerated(curve):
    """On real TPUs, route batched group ops through fused Pallas kernels
    (G1 and G2); used by setup table building and probe tooling."""
    tag = _fused_tag(curve)
    if tag is None:
        return curve
    if tag not in _PALLAS_CURVES:
        from .pallas_curve import PallasG1Curve, PallasG2Curve

        _PALLAS_CURVES[tag] = (
            PallasG1Curve(curve) if tag == "fq" else PallasG2Curve(curve)
        )
    return _PALLAS_CURVES[tag]


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


def extract_digits_signed(scalars: jnp.ndarray, c: int):
    """Balanced signed digits: returns (keys, negs), both (n_windows, n) i32.

    scalar = sum_w (-1)^negs[w] * keys[w] * 2^(c*w), keys in [0, 2^(c-1)].
    Carry propagation never overflows the top window for canonical Fr
    scalars (< 2^254, and 254 mod c <= c-1). Verified against host ints in
    tests/test_msm.py.
    """
    d = extract_digits(scalars, c)
    half = 1 << (c - 1)
    full = 1 << c
    keys, negs = [], []
    carry = jnp.zeros_like(d[0])
    for w in range(d.shape[0]):
        dw = d[w] + carry
        neg = dw > half
        carry = neg.astype(jnp.int32)
        keys.append(_sel(neg, full - dw, dw))
        negs.append(neg.astype(jnp.int32))
    return jnp.stack(keys), jnp.stack(negs)


def _searchsorted(keys: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    """Left-bisect positions of `vals` in the 1-D sorted `keys` (lax-only:
    jnp.searchsorted's jitted wrapper trips the jax-0.9 closed_call
    lowering-cache bug when multiple MSM shapes trace in one process)."""
    m = keys.shape[0]

    def body(_, lohi):
        lo, hi = lohi
        done = lo >= hi
        mid = jnp.minimum((lo + hi) >> 1, m - 1)
        kv = keys[mid]
        go = kv < vals
        lo2 = _sel(go, mid + 1, lo)
        hi2 = _sel(go, hi, mid)
        return (_sel(done, lo, lo2), _sel(done, hi, hi2))

    lo = jnp.zeros_like(vals)
    hi = jnp.full_like(vals, m)
    lo, _ = jax.lax.fori_loop(0, (m + 1).bit_length(), body, (lo, hi))
    return lo


def _segmented_suffix_totals(keys: jnp.ndarray, pts: JacPoint, curve: JacobianCurve):
    """Inclusive segmented suffix sums over a key-sorted point sequence.

    After the scan, the first (leader) position of every equal-key segment
    holds the segment total. Returns (totals, leader_mask).
    """
    m = keys.shape[0]
    steps = max(m - 1, 1).bit_length()
    idx = jnp.arange(m)

    def body(s, acc):
        sh = jnp.left_shift(1, s)
        shifted = jax.tree.map(lambda a: jnp.roll(a, -sh, axis=0), acc)
        same = jnp.roll(keys, -sh) == keys
        valid = same & (idx < m - sh)
        return curve.select(valid, curve.add(acc, JacPoint(*shifted)), acc)

    acc = jax.lax.fori_loop(0, steps, body, pts)
    leader = jnp.concatenate([jnp.ones((1,), bool), keys[1:] != keys[:-1]])
    return acc, leader


def suffix_sum_points(curve: JacobianCurve, pts: JacPoint) -> JacPoint:
    """Inclusive suffix sums: out[i] = sum_{j >= i} pts[j]."""
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
    once (254 steps), then a log-depth tree sum."""
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
    """Sum of a leading-axis batch of Jacobian points via a suffix scan."""
    if m == 1:
        return JacPoint(*jax.tree.map(lambda a: a[0], acc))
    total = suffix_sum_points(curve, JacPoint(*jax.tree.map(lambda a: a[:m], acc)))
    return JacPoint(*jax.tree.map(lambda a: a[0], total))


def msm_window_bits(n: int) -> int:
    """Window size for the XLA path (log-scan reduction costs c·2^c adds)."""

    def cost(c: int) -> int:
        return -(-SCALAR_BITS // c) * (n + c * (1 << c))

    return min(range(4, 17), key=cost)


def fused_window_bits(n: int) -> int:
    """Window size for the fused path: scan costs n mixed adds per window,
    the sequential reduction ~2.6·2^(c-1) add-equivalents, plus a ~3000-add
    fixed per-window overhead (sort/gather/merge/dispatch)."""

    def cost(c: int) -> float:
        return -(-SCALAR_BITS // c) * (n + 2.6 * (1 << (c - 1)) + 3000.0)

    return min(range(8, 17), key=cost)


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
    scan_v: int = 1024,
    assume_distinct: bool = True,
) -> JacPoint:
    """sum_i scalars[i] * P_i.  Points affine (Montgomery), scalars standard.

    Returns a single Jacobian point (batch shape ()). `assume_distinct`
    skips the P==Q doubling fallback in the fused scan (see
    pallas_ec.madd_core for the safety argument); pass False for tables
    that may contain duplicate points.
    """
    n = scalars.shape[0]
    if n <= small_threshold:
        return _msm_small(points_x, points_y, points_inf, scalars, curve=curve)
    tag = _fused_tag(curve)
    if tag is not None:
        import functools as _ft

        from .pallas_ec import field_for
        from ..utils.aot_cache import aot_call

        cw = c or fused_window_bits(n)
        Wn = -(-SCALAR_BITS // cw)
        g = _fused_group_size(scan_v * (-(-n // scan_v)), Wn, field_for(tag).rows, scan_v)
        fn = jax.jit(
            _ft.partial(
                _msm_pippenger_fused.__wrapped__,
                tag=tag, c=cw, v=scan_v, g=g, assume_distinct=assume_distinct,
            )
        )
        return aot_call(
            f"msm_fused_{tag}_c{cw}_v{scan_v}_g{g}_d{int(assume_distinct)}",
            AOT_VERSION,
            fn,
            points_x, points_y, points_inf, scalars,
        )
    return _msm_pippenger(
        points_x, points_y, points_inf, scalars,
        curve=curve, c=c or msm_window_bits(n), lanes=lanes,
    )


def _fused_group_size(n_p: int, Wn: int, R: int, v: int) -> int:
    """Windows processed per scan-kernel launch (lane-axis folding).

    Folding all windows into one window_scan invocation turns Wn serialized
    per-window dispatch rounds (sorted-stream gathers, scan, merge, bucket
    gathers) into ONE kernel chain — the round-3 per-window lax.map paid
    ~2.3 ms of fixed overhead per window at 2^16 (probe_fused_stages). Two
    caps: HBM (each folded window holds a gathered point stream (2 coords)
    plus a 3-coordinate emit buffer, R*n_p*4*5 bytes) and VMEM (the scan
    kernel keeps ~14 point-sized windows resident — 2 gathered inputs,
    3 emit + 6 head/tail outputs, 3 accumulator scratch rows — at
    R*(8*Vg/8)*4 bytes each; a G2 fold at Vg = 104k lanes OOM'd the
    100 MB scoped-vmem budget through register-allocator spills).
    """
    cap = int(os.environ.get("KEYLESS_MSM_GROUP_BYTES", str(6 << 30)))
    per_win = n_p * R * 4 * 5
    g_hbm = cap // max(per_win, 1)
    vmem_cap = 60 << 20  # leave headroom under the 100 MB scoped budget
    g_vmem = vmem_cap // (14 * R * 4 * v)
    g_max = max(1, min(Wn, g_hbm, g_vmem))
    # round so groups divide Wn as evenly as possible: a padded window costs
    # a full n_p-add scan lap (e.g. Wn=16, g_max=13 would scan 26 windows)
    n_groups = -(-Wn // g_max)
    return -(-Wn // n_groups)


@functools.partial(
    jax.jit, static_argnames=("tag", "c", "v", "g", "assume_distinct")
)
def _msm_pippenger_fused(
    points_x: jnp.ndarray,
    points_y: jnp.ndarray,
    points_inf: jnp.ndarray,
    scalars: jnp.ndarray,
    *,
    tag: str,
    c: int,
    v: int,
    assume_distinct: bool,
    g: int | None = None,
) -> JacPoint:
    """Pippenger with every per-element stage fused into Pallas kernels.

    Round-4 structure: windows fold into the scan kernel's LANE axis in
    groups of g (all 20 at 2^16 G1), so the whole MSM is one sort + a few
    wide kernel launches instead of Wn narrow ones. Scan lanes never
    interact, so a group scan over V' = g*V lanes is exactly g independent
    window scans; the boundary merge and bucket gathers batch per window
    inside the group. Cf. multiexp.cpp:182-245 (the TBB per-thread bucket
    design this replaces).
    """
    from . import pallas_msm
    from .pallas_ec import field_for

    R = field_for(tag).rows
    n = scalars.shape[0]
    V = v
    L = -(-n // V)
    n_p = V * L
    pad = n_p - n

    keys, negs = extract_digits_signed(scalars, c)  # (W, n) i32 each
    Wn = keys.shape[0]
    half = 1 << (c - 1)
    NB = half + 1
    NB_pad = -(-NB // pallas_msm.RV) * pallas_msm.RV

    if g is None:
        g = _fused_group_size(n_p, Wn, R, v)
    g = min(g, Wn)
    n_groups = -(-Wn // g)
    Wn_pad = n_groups * g
    Vg = g * V  # lanes per scan launch
    Wd = Vg // 8
    Mg = L * Vg  # flat emit length per group

    # pad windows (all-sentinel streams scan to empty bucket tables)
    if Wn_pad > Wn:
        keys = jnp.concatenate(
            [keys, jnp.full((Wn_pad - Wn, n), -1, jnp.int32)]
        )
        negs = jnp.concatenate(
            [negs, jnp.zeros((Wn_pad - Wn, n), jnp.int32)]
        )

    # master point table with a sentinel infinity row at index n;
    # row-major (point-major) so stream gathers read 64-byte rows
    zrow = jnp.zeros((1, R), jnp.uint32)
    pxr = jnp.concatenate([points_x.reshape(n, R), zrow])  # (n+1, R)
    pyr = jnp.concatenate([points_y.reshape(n, R), zrow])
    pinf_ext = jnp.concatenate([points_inf, jnp.ones((1,), bool)])

    # ONE sort for all windows; payload packs point index + sign bit. Pad
    # entries sort to the front (key -1) and index the sentinel row. When
    # key+neg+index fit in 31 bits, sort a single packed i32 operand
    # (measurably cheaper than the two-operand variadic sort).
    idx_bits = (n + 1).bit_length()
    key_bits = (half + 2).bit_length()
    iota = jax.lax.iota(jnp.int32, n)
    if key_bits + 1 + idx_bits <= 31:
        packed = (
            ((keys + 1) << (idx_bits + 1))
            | (negs << idx_bits)
            | jnp.broadcast_to(iota, (Wn_pad, n))
        )
        if pad:
            packed = jnp.concatenate(
                [jnp.full((Wn_pad, pad), n, jnp.int32), packed], axis=1
            )
        packed = jax.lax.sort(packed, dimension=1)
        keys_s = (packed >> (idx_bits + 1)) - 1
        pay_s = (packed & ((1 << idx_bits) - 1)) | (
            ((packed >> idx_bits) & 1) << 30
        )
    else:
        payload = jnp.broadcast_to(iota, (Wn_pad, n)) | (negs << 30)
        if pad:
            keys = jnp.concatenate(
                [jnp.full((Wn_pad, pad), -1, jnp.int32), keys], axis=1
            )
            payload = jnp.concatenate(
                [jnp.full((Wn_pad, pad), n, jnp.int32), payload], axis=1
            )
        keys_s, pay_s = jax.lax.sort(
            (keys, payload), num_keys=1, is_stable=False, dimension=1
        )

    warr = jax.lax.iota(jnp.int32, g)  # window slot within the group

    def group_tables(args):
        kw, pw = args  # (g, n_p) sorted per window
        idx = pw & ((1 << 30) - 1)
        neg = (pw >> 30) & 1

        def smaj(x):  # (g, n_p) -> (L, g*V) slab-major, window-blocked lanes
            return x.reshape(g, V, L).transpose(2, 0, 1).reshape(L, Vg)

        ord_sm = smaj(idx)
        keys_sm = smaj(kw)
        neg_sm = smaj(neg)
        flat_ord = ord_sm.reshape(Mg)
        gx = jnp.take(pxr, flat_ord, axis=0).T.reshape(R, L, 8, Wd)
        gy = jnp.take(pyr, flat_ord, axis=0).T.reshape(R, L, 8, Wd)
        inf_sm = pinf_ext[ord_sm] | (keys_sm == 0)
        flags = inf_sm.astype(jnp.int32) | (neg_sm << 1)

        (ex, ey, ez, hk, hx, hy, hz, tk, tx, ty, tz) = pallas_msm.window_scan(
            tag,
            keys_sm.reshape(L, 8, Wd),
            flags.reshape(L, 8, Wd),
            gx,
            gy,
            V=Vg,
            assume_distinct=assume_distinct,
        )

        # boundary sequence per window: head_0, tail_0, head_1, ... in
        # sorted order (lane blocks are window-contiguous: lane w*V + v)
        hkr = hk.reshape(g, V)
        tkr = tk.reshape(g, V)
        bkeys = jnp.stack([hkr, tkr], axis=2).reshape(g, 2 * V)
        bkeys = jax.lax.cummax(bkeys, axis=1)  # fill -1/-2 sentinels

        def inter(h, t):  # (R, 1, 8, Wd) x2 -> (g, R, 2V) interleaved
            hh = h.reshape(R, g, V)
            tt = t.reshape(R, g, V)
            return jnp.stack([hh, tt], axis=3).transpose(1, 0, 2, 3).reshape(
                g, R, 2 * V
            )

        mx, my, mz = pallas_msm.boundary_merge(
            tag, bkeys, inter(hx, tx), inter(hy, ty), inter(hz, tz)
        )  # (g, R, 2V) x3

        # dense bucket tables: per-bucket start/end positions come from ONE
        # sorted segment_min/max over the window-offset keys (the round-4
        # searchsorted bisection cost 17 serialized take_along_axis rounds
        # at ~1-3 ms each on TPU — ~60 ms of pure dispatch at 2^16), and the
        # emit/merge reads collapse into ONE flat gather. Sentinel keys
        # (pads -1/-2, digit 0) clip to bucket 0, whose weight in
        # sum_b b*B_b is exactly zero (on-curve junk there cancels in the
        # weighted reduction's linear combination).
        off = warr[:, None] * NB_pad  # (g, 1)
        pos = jnp.broadcast_to(
            jax.lax.iota(jnp.int32, n_p), (g, n_p)
        ).reshape(-1)
        flatbin = (jnp.clip(kw, 0, NB_pad - 1) + off).reshape(-1)
        ends = jax.ops.segment_max(
            pos, flatbin, g * NB_pad, indices_are_sorted=True
        ).reshape(g, NB_pad)
        starts = jax.ops.segment_min(
            pos, flatbin, g * NB_pad, indices_are_sorted=True
        ).reshape(g, NB_pad)
        interior = (
            (ends >= starts)
            & (starts // L == ends // L)
            & (starts % L != 0)
            & (ends % L != L - 1)
        )
        # merged-boundary leader position per bucket (first occurrence in
        # the cummax-filled boundary key sequence)
        pos2 = jnp.broadcast_to(
            jax.lax.iota(jnp.int32, 2 * V), (g, 2 * V)
        ).reshape(-1)
        flatbin2 = (jnp.clip(bkeys, 0, NB_pad - 1) + off).reshape(-1)
        lpos = jax.ops.segment_min(
            pos2, flatbin2, g * NB_pad, indices_are_sorted=True
        ).reshape(g, NB_pad)
        has = (lpos < 2 * V) & ~interior

        # one gather from [emit | merged | one infinity column]
        # emit flat index: slab (ends%L)+1, lane w*V + ends//L
        ecol = (ends % L + 1) * Vg + warr[:, None] * V + ends // L
        mcol = Mg + warr[:, None] * 2 * V + jnp.clip(lpos, 0, 2 * V - 1)
        idx = _sel(interior, ecol, _sel(has, mcol, Mg + g * 2 * V)).reshape(-1)
        outs = []
        for e, m in zip((ex, ey, ez), (mx, my, mz)):
            src = jnp.concatenate(
                [
                    e.reshape(R, Mg),
                    jnp.moveaxis(m, 1, 0).reshape(R, g * 2 * V),
                    jnp.zeros((R, 1), jnp.uint32),
                ],
                axis=1,
            )
            outs.append(
                src[:, idx].reshape(R, g, NB_pad).transpose(1, 0, 2)
            )
        return tuple(outs)  # (g, R, NB_pad) x3

    kg = keys_s.reshape(n_groups, g, n_p)
    pg = pay_s.reshape(n_groups, g, n_p)
    if n_groups == 1:
        dxs, dys, dzs = group_tables((kg[0], pg[0]))
    else:
        dxs, dys, dzs = jax.lax.map(group_tables, (kg, pg))
        dxs = dxs.reshape(Wn_pad, R, NB_pad)
        dys = dys.reshape(Wn_pad, R, NB_pad)
        dzs = dzs.reshape(Wn_pad, R, NB_pad)
    dxs, dys, dzs = dxs[:Wn], dys[:Wn], dzs[:Wn]

    wx, wy, wz = pallas_msm.weighted_bucket_total(tag, dxs, dys, dzs)
    tx_, ty_, tz_ = pallas_msm.horner_total(tag, wx, wy, wz, c)
    if tag == "fq2":
        return JacPoint(tx_.reshape(2, NUM_LIMBS), ty_.reshape(2, NUM_LIMBS), tz_.reshape(2, NUM_LIMBS))
    return JacPoint(tx_, ty_, tz_)


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
    """Portable XLA Pippenger (unsigned windows, in-graph bucket scatter).

    The CPU-testable mirror of the fused path; every fused stage has a
    stage-for-stage equivalent here (see _msm_pippenger_fused)."""
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

        tail_key = _sel(is_head, -1, cur_key)
        tail_pt = curve.select(is_head, curve.infinity((V,)), acc)
        head_key = _sel(is_head, cur_key, head_key)
        head_pt = curve.select(is_head, acc, head_pt)

        bkeys = jnp.stack([head_key, tail_key], axis=1).reshape(2 * V)
        bpts = jax.tree.map(
            lambda h, t: jnp.stack([h, t], axis=1).reshape(2 * V, *h.shape[1:]),
            head_pt,
            tail_pt,
        )
        bpts = JacPoint(*bpts)
        bkeys = jax.lax.cummax(bkeys)
        totals, leader = _segmented_suffix_totals(bkeys, bpts, curve)
        idx = _sel(leader & (bkeys > 0), bkeys, DUMP)
        buckets = JacPoint(
            buckets.x.at[idx].set(totals.x),
            buckets.y.at[idx].set(totals.y),
            buckets.z.at[idx].set(totals.z),
        )

        return _weighted_bucket_total(curve, buckets, n_buckets)

    wins = jax.lax.map(window_sum, digits_all)
    return _horner_windows(curve, wins, n_windows, c)
