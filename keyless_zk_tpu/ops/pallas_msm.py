"""Fused Pallas kernels for the Pippenger MSM (G1 and G2).

Round-2 design. Five kernels, each parameterized by the coordinate field
("fq" for G1, "fq2" for G2 — the reference instantiates its C++ Curve
template the same two ways, alt_bn128.hpp:9-69):

1. ``window_scan`` — the bucket-accumulation scan. Grid step t consumes one
   V-element slab of the window's digit-sorted point stream and performs a
   complete mixed add per lane with accumulator state in VMEM scratch. Each
   slab's *pre-add accumulator state* streams to the emit buffer; interior
   run totals are later *gathered* from it at positions computed from the
   sorted keys alone (ops/msm.py) — the round-1 design's 3-coordinate
   million-entry bucket scatter is gone entirely.
2. ``boundary_merge`` — log-step segmented suffix scan over the per-window
   2V-entry head/tail boundary sequence (runs that cross slab-lane
   boundaries).
3. ``bucket_accum`` — the weighted bucket reduction, stage 1: sequential
   grid walk over the dense bucket table from the top, maintaining per-lane
   running suffix R_l and once-integrated W_l. This is the vector form of
   the reference's sequential running-sum reduction (multiexp.cpp:132-180):
   O(NB) EC adds per window instead of the O(NB log NB) of a pure
   Hillis-Steele scan, which is what makes 15-16-bit windows affordable.
4. ``bucket_combine`` — stage 2: per window,
   sum_b b·B_b = V·Σ_l(W_l − R_l) + Σ_l l·R_l, with the lane sums done as
   log-step (segment-free) suffix scans over one (8, 128) tile.
5. ``horner_total`` — sum_w 2^(c·w)·W_w over ≤128 windows in lanes.

Data layout: a V-element lane block is (8, V//8) — dense (8, 128) VPU
register tiles (the round-1 kernels sliced (TILE,) 1-D rows, which Mosaic
lays out one sublane wide). Field elements are limb lists over such tiles
(ops/pallas_ec.py). Point blocks stack coordinate rows: (16, ...) for Fq,
(32, ...) for Fq2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_ec import (
    KFQ,
    KFQ2,
    add_core,
    dbl_core,
    field_for,
    madd_core,
    sel,
)

_INTERPRET = False

_W = 128  # lane width of reduction-kernel (r, 128) row-major blocks
RV = 1024  # element count per reduction tile: one (8, 128) register tile


def _vmem():
    return pltpu.VMEM


# ---- generic point-as-coordinate-rows helpers ------------------------------

def _ridx(i, pre=(), post=()):
    """Ref index tuple for coordinate row i with fixed pre/post block dims."""
    return (*pre, i, *post) if (pre or post) else i


def _load_pt(F, xr, yr, zr, pre=(), post=()):
    return (
        F.load(lambda i: xr[_ridx(i, pre, post)]),
        F.load(lambda i: yr[_ridx(i, pre, post)]),
        F.load(lambda i: zr[_ridx(i, pre, post)]),
    )


def _store_pt(F, xr, yr, zr, pt, pre=(), post=()):
    x, y, z = pt
    F.store(lambda i, v: xr.__setitem__(_ridx(i, pre, post), v), x)
    F.store(lambda i, v: yr.__setitem__(_ridx(i, pre, post), v), y)
    F.store(lambda i, v: zr.__setitem__(_ridx(i, pre, post), v), z)


def _map_pt(F, fn, pt):
    return tuple(F.map_el(fn, c) for c in pt)


def _pt_to_list(F, pt):
    """Point -> flat list of 3*F.rows limb arrays (for fori_loop carry)."""
    out = [None] * (3 * F.rows)
    for ci, coord in enumerate(pt):
        F.store(lambda i, v, ci=ci: out.__setitem__(ci * F.rows + i, v), coord)
    return out


def _pt_from_list(F, flat):
    k = F.rows
    return (
        F.load(lambda i: flat[i]),
        F.load(lambda i: flat[k + i]),
        F.load(lambda i: flat[2 * k + i]),
    )


# ---- 1. window scan ---------------------------------------------------------

def _scan_kernel_body(F, assume_distinct):
    def kernel(
        keys_ref, flags_ref, px_ref, py_ref,
        ex_ref, ey_ref, ez_ref,
        hk_ref, hx_ref, hy_ref, hz_ref,
        tk_ref, tx_ref, ty_ref, tz_ref,
        cur_key, accx, accy, accz, is_head, head_key,
    ):
        t = pl.program_id(0)
        L = pl.num_programs(0)
        first = t == 0
        last = t == L - 1

        k = keys_ref[0]  # (8, Wd) i32
        flags = flags_ref[0]
        q_inf = (flags & 1) != 0
        q_neg = (flags & 2) != 0
        x2 = F.load(lambda i: px_ref[i, 0])
        y2 = F.load(lambda i: py_ref[i, 0])
        y2 = F.select(q_neg, F.neg_raw(y2), y2)

        prev_key = cur_key[:]
        x1 = F.load(lambda i: accx[i])
        y1 = F.load(lambda i: accy[i])
        z1 = F.load(lambda i: accz[i])
        was_head = is_head[:] != 0
        prev_hkey = head_key[:]

        # scratch holds garbage at t==0; `first` masks every read of it.
        # emit slab t = the pre-add accumulator state (interior run totals
        # are gathered from slab end+1 by ops/msm.py).
        F.store(lambda i, v: ex_ref.__setitem__((i, 0), v), x1)
        F.store(lambda i, v: ey_ref.__setitem__((i, 0), v), y1)
        F.store(lambda i, v: ez_ref.__setitem__((i, 0), v), z1)

        same = (k == prev_key) & ~first
        emit = ~same & ~first

        # a lane's first run parks in the head outputs
        to_head = emit & was_head
        head_key[:] = sel(first, -2, sel(to_head, prev_key, prev_hkey))

        def upd(ref):
            def put(i, v):
                ref[i, 0] = v
            return put

        hx = F.load(lambda i: hx_ref[i, 0])
        hy = F.load(lambda i: hy_ref[i, 0])
        hz = F.load(lambda i: hz_ref[i, 0])
        zpt = (F.zero_like(x1), F.zero_like(x1), F.zero_like(x1))
        hx2 = F.select(first, zpt[0], F.select(to_head, x1, hx))
        hy2 = F.select(first, zpt[1], F.select(to_head, y1, hy))
        hz2 = F.select(first, zpt[2], F.select(to_head, z1, hz))
        F.store(upd(hx_ref), hx2)
        F.store(upd(hy_ref), hy2)
        F.store(upd(hz_ref), hz2)

        # int32 select: Mosaic cannot legalize selects between i1 vectors
        now_head_i = sel(first, 1, (was_head & same).astype(jnp.int32))
        is_head[:] = now_head_i
        now_head = now_head_i != 0

        # accumulate: grow the run or start fresh from the affine point
        gx, gy, gz = madd_core(F, x1, y1, z1, x2, y2, q_inf,
                               assume_distinct=assume_distinct)
        one = F.one_like(x2)
        qz = F.select(q_inf, F.zero_like(x2), one)
        F.store(lambda i, v: accx.__setitem__(i, v), F.select(same, gx, x2))
        F.store(lambda i, v: accy.__setitem__(i, v), F.select(same, gy, y2))
        F.store(lambda i, v: accz.__setitem__(i, v), F.select(same, gz, qz))
        cur_key[:] = k

        # finalize: the lane's last run is a head if it spans the whole
        # chunk, otherwise a tail
        @pl.when(last)
        def _():
            ax = F.load(lambda i: accx[i])
            ay = F.load(lambda i: accy[i])
            az = F.load(lambda i: accz[i])
            final_head = now_head
            tk_ref[0] = sel(final_head, -1, k)
            hk_ref[0] = sel(final_head, k, head_key[:])
            F.store(upd(tx_ref), F.select(final_head, zpt[0], ax))
            F.store(upd(ty_ref), F.select(final_head, zpt[1], ay))
            F.store(upd(tz_ref), F.select(final_head, zpt[2], az))
            hx3 = F.load(lambda i: hx_ref[i, 0])
            hy3 = F.load(lambda i: hy_ref[i, 0])
            hz3 = F.load(lambda i: hz_ref[i, 0])
            F.store(upd(hx_ref), F.select(final_head, ax, hx3))
            F.store(upd(hy_ref), F.select(final_head, ay, hy3))
            F.store(upd(hz_ref), F.select(final_head, az, hz3))

    return kernel


@functools.lru_cache(maxsize=16)
def _build_scan(tag: str, V: int, L: int, assume_distinct: bool):
    F = field_for(tag)
    R = F.rows
    Wd = V // 8
    key_in = pl.BlockSpec((1, 8, Wd), lambda t: (t, 0, 0), memory_space=_vmem())
    pt_in = pl.BlockSpec((R, 1, 8, Wd), lambda t: (0, t, 0, 0), memory_space=_vmem())
    key_out1 = pl.BlockSpec((1, 8, Wd), lambda t: (0, 0, 0), memory_space=_vmem())
    pt_out1 = pl.BlockSpec((R, 1, 8, Wd), lambda t: (0, 0, 0, 0), memory_space=_vmem())

    emit_shape = jax.ShapeDtypeStruct((R, L, 8, Wd), jnp.uint32)
    k1_shape = jax.ShapeDtypeStruct((1, 8, Wd), jnp.int32)
    p1_shape = jax.ShapeDtypeStruct((R, 1, 8, Wd), jnp.uint32)

    # wide folded-lane launches (V = g*1024 after window folding) need more
    # than the 16M default scoped-vmem budget; v5e has 128M per core
    params = {}
    if not _INTERPRET:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20
        )
    return pl.pallas_call(
        _scan_kernel_body(F, assume_distinct),
        grid=(L,),
        in_specs=[key_in, key_in, pt_in, pt_in],
        out_specs=(
            pt_in, pt_in, pt_in,
            key_out1, pt_out1, pt_out1, pt_out1,
            key_out1, pt_out1, pt_out1, pt_out1,
        ),
        out_shape=(
            emit_shape, emit_shape, emit_shape,
            k1_shape, p1_shape, p1_shape, p1_shape,
            k1_shape, p1_shape, p1_shape, p1_shape,
        ),
        scratch_shapes=[
            pltpu.VMEM((8, Wd), jnp.int32),       # cur_key
            pltpu.VMEM((R, 8, Wd), jnp.uint32),   # acc x
            pltpu.VMEM((R, 8, Wd), jnp.uint32),   # acc y
            pltpu.VMEM((R, 8, Wd), jnp.uint32),   # acc z
            pltpu.VMEM((8, Wd), jnp.int32),       # is_head
            pltpu.VMEM((8, Wd), jnp.int32),       # head_key
        ],
        interpret=_INTERPRET,
        **params,
    )


def window_scan(tag: str, keys, flags, px, py, *, V: int, assume_distinct=True):
    """Scan one window's sorted stream.

    keys/flags: (L, 8, V//8) i32 — sorted digits / bit0=inf|bit1=negate,
    slab-major (slab t, lane row-major). px/py: (R, L, 8, V//8) u32 gathered
    affine coordinates in the same order.

    Returns (emit x/y/z (R, L, 8, V//8) — slab t holds the pre-add
    accumulator state; head_key/tail_key (1, 8, V//8); head/tail points
    (R, 1, 8, V//8) x3 each).
    """
    L = keys.shape[0]
    return _build_scan(tag, V, L, assume_distinct)(keys, flags, px, py)


# ---- shared log-step suffix machinery (row-major (r, 128) blocks) ----------

def _lane_flat_roll(x, s):
    """Left-shift by a traced s in [1, 127] in row-major order of a (r, 128)
    block: lanes rotate dynamically, entries crossing a row boundary come
    from the next row."""
    if _INTERPRET:
        hit = jnp.roll(x, -s, axis=1)
        wrap = jnp.roll(jnp.roll(x, -1, axis=0), -s, axis=1)
    else:
        hit = pltpu.roll(x, _W - s, axis=1)
        nxt = pltpu.roll(x, x.shape[0] - 1, axis=0) if x.shape[0] > 1 else x
        wrap = pltpu.roll(nxt, _W - s, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return sel(col + s < _W, hit, wrap)


def _row_roll(x, q: int):
    """Left-shift by the static row count q (s = q*128)."""
    if _INTERPRET:
        return jnp.roll(x, -q, axis=0)
    rows = x.shape[0]
    return pltpu.roll(x, (rows - q % rows) % rows, axis=0) if q % rows else x


def _row_roll_dyn(x, q):
    """Left-shift rows by a traced q in [0, rows): bit-decomposed into
    static sublane rotations (Mosaic's dynamic rotate is lane-axis only)."""
    rows = x.shape[0]
    for b in range((rows - 1).bit_length()):
        x = sel(((q >> b) & 1) == 1, _row_roll(x, 1 << b), x)
    return x


def _flat_roll_dyn(x, s):
    """Left-shift by a traced flat amount s in [0, m) in row-major order of
    a (r, 128) block: row part then lane part (the lane roll of the already
    row-rolled block wraps into the correct next row)."""
    q = s // _W
    r2 = s % _W
    xq = _row_roll_dyn(x, q) if x.shape[0] > 1 else x
    lane = _lane_flat_roll(xq, jnp.maximum(r2, 1))
    return sel(r2 == 0, xq, lane)


def _flat_iota(shape):
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return row * shape[1] + col


def _masked_step(F, pt, valid, roll):
    """One Hillis-Steele pass: acc += roll(acc) where valid else +infinity
    (z = 0 partners are absorbed by the complete add)."""
    x, y, z = pt
    rx = F.map_el(roll, x)
    ry = F.map_el(roll, y)
    rz = F.map_el(lambda v: sel(valid, roll(v), 0), z)
    return add_core(F, x, y, z, rx, ry, rz)


def _suffix_passes(F, pt, keys, n_repeats: int, dyn_steps=None):
    """`n_repeats` full inclusive suffix-sum scans over the row-major (r, 128)
    blocks of pt, segmented by `keys` (None = unsegmented).

    ALL passes (every repeat, lane- and row-level shifts) run under a single
    fori_loop with a dynamic flat rotate, so the kernel graph holds exactly
    ONE group-law instance — tracing the 16-limb EC add dominates kernel
    build time (~4 s per instance; a round-4 experiment that unrolled the
    passes with static rotates cost ~340 s of extra compile per shape and
    measured ZERO runtime gain at 2^16, so the rolled form stays).

    `dyn_steps` (traced scalar, requires n_repeats == 1): stop after that
    many log-steps — correct whenever every key segment is shorter than
    2^dyn_steps (the caller derives the bound from the sorted bucket
    geometry; full log(m) passes at a 2-lane typical segment length were
    ~20% of the whole 2^16 MSM).
    """
    shape = (pt[0][0] if F is KFQ else pt[0][0][0]).shape
    m = shape[0] * shape[1]
    idx = _flat_iota(shape)
    steps = max(m - 1, 1).bit_length()

    def ok(rolled_keys, s):
        valid = idx < m - s
        if keys is not None:
            valid &= rolled_keys == keys
        return valid

    def body(t, flat):
        s = jnp.left_shift(jnp.int32(1), jnp.mod(t, steps).astype(jnp.int32))
        cur = _pt_from_list(F, flat)
        rk = _flat_roll_dyn(keys, s) if keys is not None else None
        nxt = _masked_step(F, cur, ok(rk, s), lambda v: _flat_roll_dyn(v, s))
        return _pt_to_list(F, nxt)

    if dyn_steps is not None:
        assert n_repeats == 1
        bound = jnp.minimum(dyn_steps.astype(jnp.int32), steps)
        flat = jax.lax.fori_loop(0, bound, body, _pt_to_list(F, pt))
    else:
        flat = jax.lax.fori_loop(0, n_repeats * steps, body, _pt_to_list(F, pt))
    return _pt_from_list(F, flat)


# ---- 2. boundary merge ------------------------------------------------------

def _merge_kernel_body(F):
    def kernel(steps_ref, keys_ref, px_ref, py_ref, pz_ref, ox_ref, oy_ref, oz_ref):
        keys = keys_ref[0]
        pt = _load_pt(F, px_ref, py_ref, pz_ref, pre=(0,))
        pt = _suffix_passes(F, pt, keys, 1, dyn_steps=steps_ref[0, 0])
        _store_pt(F, ox_ref, oy_ref, oz_ref, pt, pre=(0,))

    return kernel


@functools.lru_cache(maxsize=16)
def _build_merge(tag: str, n_win: int, m: int):
    F = field_for(tag)
    R = F.rows
    r = m // _W
    steps_spec = pl.BlockSpec((1, 1), lambda w: (0, 0), memory_space=pltpu.SMEM)
    key_spec = pl.BlockSpec((1, r, _W), lambda w: (w, 0, 0), memory_space=_vmem())
    pt_spec = pl.BlockSpec((1, R, r, _W), lambda w: (w, 0, 0, 0), memory_space=_vmem())
    pt_shape = jax.ShapeDtypeStruct((n_win, R, r, _W), jnp.uint32)
    # Fq2 at large V busts the 16M default scoped-vmem budget (6 point
    # blocks of R*m u32 plus scan temporaries live at once); v5e has 128M
    # VMEM per core, so let the kernel use most of it.
    params = {}
    if not _INTERPRET:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20
        )
    return pl.pallas_call(
        _merge_kernel_body(F),
        grid=(n_win,),
        in_specs=[steps_spec, key_spec, pt_spec, pt_spec, pt_spec],
        out_specs=(pt_spec, pt_spec, pt_spec),
        out_shape=(pt_shape, pt_shape, pt_shape),
        interpret=_INTERPRET,
        **params,
    )


def boundary_merge(tag: str, keys, px, py, pz, max_steps=None):
    """keys (Wn, M) i32 (cummax-filled, sorted per window), points
    (Wn, R, M). Returns suffix-merged totals (Wn, R, M) x3; the first
    (leader) position of each equal-key segment holds the segment total.

    `max_steps` (traced i32 scalar, optional): log-step count sufficient
    for the longest key segment that must merge correctly (2^max_steps >=
    its length); defaults to the full log(M) sweep.
    """
    n_win, m = keys.shape
    R = field_for(tag).rows
    r = m // _W
    if max_steps is None:
        max_steps = jnp.int32(max(m - 1, 1).bit_length())
    steps_arr = jnp.reshape(max_steps.astype(jnp.int32), (1, 1))
    per_win = R * m * 4 * 3
    chunk = max(1, min(n_win, (8 << 20) // max(per_win, 1)))
    parts = []
    for s in range(0, n_win, chunk):
        e = min(s + chunk, n_win)
        outs = _build_merge(tag, e - s, m)(
            steps_arr,
            keys[s:e].reshape(e - s, r, _W),
            px[s:e].reshape(e - s, R, r, _W),
            py[s:e].reshape(e - s, R, r, _W),
            pz[s:e].reshape(e - s, R, r, _W),
        )
        parts.append(tuple(o.reshape(e - s, R, m) for o in outs))
    if len(parts) == 1:
        return parts[0]
    return tuple(jnp.concatenate([p[i] for p in parts]) for i in range(3))


# ---- 3. sequential weighted bucket accumulation ----------------------------

def _accum_kernel_body(F):
    def kernel(
        bx_ref, by_ref, bz_ref,
        rx_ref, ry_ref, rz_ref, wx_ref, wy_ref, wz_ref,
        sx, sy, sz, vx, vy, vz,
    ):
        s = pl.program_id(1)
        S = pl.num_programs(1)
        first = s == 0
        last = s == S - 1

        b = _load_pt(F, bx_ref, by_ref, bz_ref, pre=(0,), post=(0,))
        zpt = (F.zero_like(b[0]), F.zero_like(b[0]), F.zero_like(b[0]))

        def masked(pt):
            return tuple(F.select(first, z, c) for z, c in zip(zpt, pt))

        r_prev = masked(_load_pt(F, sx, sy, sz))
        w_prev = masked(_load_pt(F, vx, vy, vz))

        r_new = add_core(F, *r_prev, *b)
        w_new = add_core(F, *w_prev, *r_new)
        _store_pt(F, sx, sy, sz, r_new)
        _store_pt(F, vx, vy, vz, w_new)

        @pl.when(last)
        def _():
            _store_pt(F, rx_ref, ry_ref, rz_ref, r_new, pre=(0,))
            _store_pt(F, wx_ref, wy_ref, wz_ref, w_new, pre=(0,))

    return kernel


@functools.lru_cache(maxsize=16)
def _build_accum(tag: str, n_win: int, S: int):
    F = field_for(tag)
    R = F.rows
    rr = RV // _W  # 8
    in_spec = pl.BlockSpec(
        (1, R, 1, rr, _W), lambda w, s: (w, 0, S - 1 - s, 0, 0), memory_space=_vmem()
    )
    out_spec = pl.BlockSpec(
        (1, R, rr, _W), lambda w, s: (w, 0, 0, 0), memory_space=_vmem()
    )
    out_shape = jax.ShapeDtypeStruct((n_win, R, rr, _W), jnp.uint32)
    return pl.pallas_call(
        _accum_kernel_body(F),
        grid=(n_win, S),
        in_specs=[in_spec] * 3,
        out_specs=(out_spec,) * 6,
        out_shape=(out_shape,) * 6,
        scratch_shapes=[pltpu.VMEM((R, rr, _W), jnp.uint32)] * 6,
        interpret=_INTERPRET,
    )


def _combine_kernel_body(F):
    def kernel(rx_ref, ry_ref, rz_ref, wx_ref, wy_ref, wz_ref, ox_ref, oy_ref, oz_ref):
        rpt = _load_pt(F, rx_ref, ry_ref, rz_ref, pre=(0,))
        wpt = _load_pt(F, wx_ref, wy_ref, wz_ref, pre=(0,))
        # W - R = Σ_s s·B[s·V+l] per lane (EC subtract = add of negated y)
        negr = (rpt[0], F.neg_raw(rpt[1]), rpt[2])
        wmr = add_core(F, *wpt, *negr)
        # P = Σ_l (W-R)_l : one unsegmented suffix scan, total at flat 0
        p = _suffix_passes(F, wmr, None, 1)
        # Q = Σ_l l·R_l : double suffix scan, value at flat index 1
        q = _suffix_passes(F, rpt, None, 2)
        # total = RV·P + Q (log2(RV) doublings, one loop-rolled instance)
        p = _pt_from_list(F, jax.lax.fori_loop(
            0,
            RV.bit_length() - 1,
            lambda _, fl: _pt_to_list(F, dbl_core(F, *_pt_from_list(F, fl))),
            _pt_to_list(F, p),
        ))
        qa = _map_pt(F, lambda v: _lane_flat_roll(v, 1), q)  # flat 1 -> flat 0
        tot = add_core(F, *p, *qa)
        out = _map_pt(F, lambda v: v[0:1, 0:1], tot)
        _store_pt(F, ox_ref, oy_ref, oz_ref, out, pre=(0,))

    return kernel


@functools.lru_cache(maxsize=16)
def _build_combine(tag: str, n_win: int):
    F = field_for(tag)
    R = F.rows
    rr = RV // _W
    in_spec = pl.BlockSpec((1, R, rr, _W), lambda w: (w, 0, 0, 0), memory_space=_vmem())
    out_spec = pl.BlockSpec((1, R, 1, 1), lambda w: (w, 0, 0, 0), memory_space=_vmem())
    out_shape = jax.ShapeDtypeStruct((n_win, R, 1, 1), jnp.uint32)
    return pl.pallas_call(
        _combine_kernel_body(F),
        grid=(n_win,),
        in_specs=[in_spec] * 6,
        out_specs=(out_spec,) * 3,
        out_shape=(out_shape,) * 3,
        interpret=_INTERPRET,
    )


def weighted_bucket_total(tag: str, bx, by, bz):
    """Dense bucket tables (Wn, R, NB) x3 (NB % 1024 == 0, bucket index
    row-major over (NB/1024, 8, 128); padded buckets must be infinity) ->
    per-window totals (Wn, R) x3 = sum_b b·B_b.

    Stage 1 walks the table top-down accumulating per-lane running suffix
    R_l and integral W_l (2 EC adds per 1024 buckets — the sequential
    optimum); stage 2 combines lanes:
    sum_b b·B_b = 1024·Σ_l(W_l−R_l) + Σ_l l·R_l.
    """
    n_win, R, nb = bx.shape
    S = nb // RV
    rr = RV // _W
    shp = (n_win, R, S, rr, _W)
    outs = _build_accum(tag, n_win, S)(bx.reshape(shp), by.reshape(shp), bz.reshape(shp))
    tx, ty, tz = _build_combine(tag, n_win)(*outs)
    return (
        tx.reshape(n_win, R),
        ty.reshape(n_win, R),
        tz.reshape(n_win, R),
    )


# ---- 5. horner over windows -------------------------------------------------

def _horner_kernel_body(F, c: int, n_win: int):
    steps = c * (n_win - 1)

    def kernel(px_ref, py_ref, pz_ref, ox_ref, oy_ref, oz_ref):
        """sum_w 2^(c·w) · W_w: window w in lane w of (1, 128) rows; every
        lane doubled c·w times (done lanes masked), then one suffix scan."""
        wv = jax.lax.broadcasted_iota(jnp.int32, (1, _W), 1)
        pt = _load_pt(F, px_ref, py_ref, pz_ref)

        def body(t, flat):
            x, y, z = _pt_from_list(F, flat)
            dx, dy, dz = dbl_core(F, x, y, z)
            need = t < c * wv
            return _pt_to_list(F, (
                F.select(need, dx, x),
                F.select(need, dy, y),
                F.select(need, dz, z),
            ))

        flat = jax.lax.fori_loop(0, steps, body, _pt_to_list(F, pt))
        pt = _pt_from_list(F, flat)
        pt = _suffix_passes(F, pt, None, 1)
        out = _map_pt(F, lambda v: v[0:1, 0:1], pt)
        _store_pt(F, ox_ref, oy_ref, oz_ref, out)

    return kernel


@functools.lru_cache(maxsize=16)
def _build_horner(tag: str, c: int, n_win: int):
    F = field_for(tag)
    R = F.rows
    out_shape = jax.ShapeDtypeStruct((R, 1, 1), jnp.uint32)
    return pl.pallas_call(
        _horner_kernel_body(F, c, n_win),
        in_specs=[pl.BlockSpec(memory_space=_vmem())] * 3,
        out_specs=(pl.BlockSpec(memory_space=_vmem()),) * 3,
        out_shape=(out_shape,) * 3,
        interpret=_INTERPRET,
    )


def horner_total(tag: str, wx, wy, wz, c: int):
    """Window totals (Wn, R) x3 -> total point (R,) x3: sum_w 2^(c·w)·W_w.
    Requires Wn <= 128."""
    n_win, R = wx.shape
    assert n_win <= _W

    def lanes(a):  # (Wn, R) -> (R, 1, 128): window w in lane w, rest inf
        a = a.T.reshape(R, 1, n_win)
        return jnp.pad(a, [(0, 0), (0, 0), (0, _W - n_win)])

    outs = _build_horner(tag, c, n_win)(lanes(wx), lanes(wy), lanes(wz))
    return tuple(o.reshape(R) for o in outs)
