"""Fused Pallas kernel for the MSM window chunk-scan.

The Pippenger inner loop in ops/msm.py (the `step` body under fori_loop)
performs, per step: dynamic slices, one mixed EC add, run-boundary
bookkeeping, and a 3-coordinate bucket scatter — each as separate XLA ops
with limb-minor<->limb-major relayouts around every Pallas group-law call.

This kernel fuses the whole scan: the per-lane accumulator and head-run
state live in VMEM scratch across grid steps, each grid step consumes one
(16, TILE) limb-major block of sorted points and performs the complete
madd + run bookkeeping in-register, and finished interior runs stream out
to a dense (L, V) emit buffer. The bucket scatter then happens ONCE per
window over the emit buffer instead of once per step.

Grid: (V / TILE, L) — lane tiles outer, steps inner; TPU grids execute
sequentially so scratch carries state along the step axis, reset at t==0.

Data layout: limb-major (16, ...) everywhere, so the kernel consumes the
MSM's master point table gathers directly with no per-window transposes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limbs import NUM_LIMBS
from .pallas_curve import TILE, _MONT_ONE, _add_core, _dbl, _madd_core, _sel

_INTERPRET = False


_W = 128  # lane width of the reduction kernels' (R, 128) row-major blocks


def _lane_flat_roll(x, s):
    """Left-shift by a traced s < 128 in row-major order of a (R, 128)
    block: lanes rotate dynamically (legal: tpu.dynamic_rotate on the lane
    dim), entries that cross a row boundary come from the next row (static
    sublane roll by 1)."""
    if _INTERPRET:
        hit = jnp.roll(x, -s, axis=1)
        wrap = jnp.roll(jnp.roll(x, -1, axis=0), -s, axis=1)
    else:
        # s is always in [1, 127], so left-shift s == right-rotate _W - s;
        # no traced `%` (jnp's remainder wrapper trips the same jax-0.9
        # closed_call lowering bug as jnp.where — see _sel)
        hit = pltpu.roll(x, _W - s, axis=1)
        nxt = pltpu.roll(x, x.shape[0] - 1, axis=0) if x.shape[0] > 1 else x
        wrap = pltpu.roll(nxt, _W - s, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return _sel(col + s < _W, hit, wrap)


def _row_roll(x, q: int):
    """Left-shift by the static row count q in row-major order (s = q*128)."""
    if _INTERPRET:
        return jnp.roll(x, -q, axis=0)
    rows = x.shape[0]
    return pltpu.roll(x, (rows - q % rows) % rows, axis=0) if q % rows else x


def _masked_step(pt, valid, roll):
    """One Hillis-Steele pass: acc += roll(acc) where valid, else +infinity
    (z = 0 partners are absorbed by the complete add)."""
    x, y, z = pt
    rx = [roll(v) for v in x]
    ry = [roll(v) for v in y]
    rz = [_sel(valid, roll(v), 0) for v in z]
    return _add_core(x, y, z, rx, ry, rz)


def _suffix_passes(pt, keys, n_repeats: int):
    """`n_repeats` full inclusive suffix-sum scans over the row-major
    (R, 128) blocks of pt, segmented by `keys` (pass keys=None for an
    unsegmented scan).

    Lane-level passes (shift 1..64) run under one fori_loop with a dynamic
    lane rotate — the kernel graph holds ONE group-law instance for all of
    them (fully unrolled scans take Mosaic/XLA tens of minutes to compile
    on 1-core build hosts). Row-level passes (shift = 128*2^j) need a
    sublane rotate whose amount Mosaic requires static, so those few
    unroll.
    """
    shape = pt[0][0].shape
    m = shape[0] * shape[1]
    idx = _flat_iota(shape)
    lane_steps = min(max(m - 1, 1).bit_length(), 7)
    row_steps = max(m - 1, 1).bit_length() - lane_steps

    def ok(rolled_keys, s):
        valid = idx < m - s
        if keys is not None:
            valid &= rolled_keys == keys
        return valid

    for _rep in range(n_repeats):
        flat = [c for coord in pt for c in coord]

        def lane_body(p, flat):
            s = jnp.left_shift(1, p)
            pt = (flat[:NUM_LIMBS], flat[NUM_LIMBS : 2 * NUM_LIMBS], flat[2 * NUM_LIMBS :])
            rk = _lane_flat_roll(keys, s) if keys is not None else None
            nx, ny, nz = _masked_step(pt, ok(rk, s), lambda v: _lane_flat_roll(v, s))
            return nx + ny + nz

        flat = jax.lax.fori_loop(0, lane_steps, lane_body, flat)
        pt = (flat[:NUM_LIMBS], flat[NUM_LIMBS : 2 * NUM_LIMBS], flat[2 * NUM_LIMBS :])
        for j in range(row_steps):
            q = 1 << j
            rk = _row_roll(keys, q) if keys is not None else None
            pt = _masked_step(pt, ok(rk, q * _W), lambda v: _row_roll(v, q))
    return pt


def _flat_iota(shape):
    """Row-major linear index of each element of a 2D block."""
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return row * shape[1] + col


def _scan_kernel(
    keys_ref, px_ref, py_ref, pinf_ref,
    ekey_ref, ex_ref, ey_ref, ez_ref,
    hkey_ref, hx_ref, hy_ref, hz_ref,
    tkey_ref, tx_ref, ty_ref, tz_ref,
    cur_key, accx, accy, accz, is_head, head_key,
):
    t = pl.program_id(0)
    L = pl.num_programs(0)
    first = t == 0
    last = t == L - 1

    k = keys_ref[0, :]  # (TILE,) i32
    x2 = [px_ref[i, :] for i in range(NUM_LIMBS)]
    y2 = [py_ref[i, :] for i in range(NUM_LIMBS)]
    q_inf = pinf_ref[0, :] != 0

    prev_key = cur_key[0, :]
    x1 = [accx[i, :] for i in range(NUM_LIMBS)]
    y1 = [accy[i, :] for i in range(NUM_LIMBS)]
    z1 = [accz[i, :] for i in range(NUM_LIMBS)]
    was_head = is_head[0, :] != 0
    prev_hkey = head_key[0, :]

    # scratch holds garbage at t==0; `first` masks every read of it
    same = (k == prev_key) & ~first
    emit = ~same & ~first

    # route the finished run: a lane's first run parks in head_*, interior
    # runs stream to the emit buffer (scattered to buckets afterwards)
    to_head = emit & was_head
    new_hkey = _sel(first, -2, _sel(to_head, prev_key, prev_hkey))
    head_key[0, :] = new_hkey
    for i in range(NUM_LIMBS):
        hx_ref[i, :] = _sel(first, 0, _sel(to_head, x1[i], hx_ref[i, :]))
        hy_ref[i, :] = _sel(first, 0, _sel(to_head, y1[i], hy_ref[i, :]))
        hz_ref[i, :] = _sel(first, 0, _sel(to_head, z1[i], hz_ref[i, :]))

    to_bucket = emit & ~was_head
    ekey_ref[0, :] = _sel(to_bucket, prev_key, -1)
    for i in range(NUM_LIMBS):
        ex_ref[i, :] = x1[i]
        ey_ref[i, :] = y1[i]
        ez_ref[i, :] = z1[i]

    # int32 select: Mosaic cannot legalize selects between i1 vectors
    now_head_i = _sel(first, 1, (was_head & same).astype(jnp.int32))
    is_head[0, :] = now_head_i
    now_head = now_head_i != 0

    # accumulate: grow the run or start a fresh one from the affine point
    gx, gy, gz = _madd_core(x1, y1, z1, x2, y2, q_inf)
    one = [jnp.full_like(x2[0], c) for c in _MONT_ONE]
    for i in range(NUM_LIMBS):
        accx[i, :] = _sel(same, gx[i], x2[i])
        accy[i, :] = _sel(same, gy[i], y2[i])
        accz[i, :] = _sel(same, gz[i], _sel(q_inf, 0, one[i]))
    cur_key[0, :] = k

    # finalize: the lane's last run is a head if it spans the whole chunk,
    # otherwise a tail (mirrors the post-loop logic in ops/msm.py)
    @pl.when(last)
    def _():
        final_head = now_head
        hkey2 = head_key[0, :]
        tkey_ref[0, :] = _sel(final_head, -1, k)
        hkey_ref[0, :] = _sel(final_head, k, hkey2)
        for i in range(NUM_LIMBS):
            ax, ay, az = accx[i, :], accy[i, :], accz[i, :]
            tx_ref[i, :] = _sel(final_head, 0, ax)
            ty_ref[i, :] = _sel(final_head, 0, ay)
            tz_ref[i, :] = _sel(final_head, 0, az)
            hx_ref[i, :] = _sel(final_head, ax, hx_ref[i, :])
            hy_ref[i, :] = _sel(final_head, ay, hy_ref[i, :])
            hz_ref[i, :] = _sel(final_head, az, hz_ref[i, :])


@functools.lru_cache(maxsize=8)
def _build_scan(L: int):
    """Scan over one window's stream, flattened step-major: all arrays are
    2D (rows, L*TILE) and each grid step t consumes/produces the TILE-wide
    column slab t — no 3D relayouts anywhere (V is fixed at one TILE)."""
    key_block = pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.VMEM)
    pt_block = pl.BlockSpec(
        (NUM_LIMBS, TILE), lambda t: (0, t), memory_space=pltpu.VMEM
    )
    bkey_block = pl.BlockSpec((1, TILE), lambda t: (0, 0), memory_space=pltpu.VMEM)
    bpt_block = pl.BlockSpec(
        (NUM_LIMBS, TILE), lambda t: (0, 0), memory_space=pltpu.VMEM
    )
    key_shape = jax.ShapeDtypeStruct((1, L * TILE), jnp.int32)
    pt_shape = jax.ShapeDtypeStruct((NUM_LIMBS, L * TILE), jnp.uint32)
    bkey_shape = jax.ShapeDtypeStruct((1, TILE), jnp.int32)
    bpt_shape = jax.ShapeDtypeStruct((NUM_LIMBS, TILE), jnp.uint32)

    return pl.pallas_call(
        _scan_kernel,
        grid=(L,),
        in_specs=[key_block, pt_block, pt_block, key_block],
        out_specs=(
            key_block, pt_block, pt_block, pt_block,
            bkey_block, bpt_block, bpt_block, bpt_block,
            bkey_block, bpt_block, bpt_block, bpt_block,
        ),
        out_shape=(
            key_shape, pt_shape, pt_shape, pt_shape,
            bkey_shape, bpt_shape, bpt_shape, bpt_shape,
            bkey_shape, bpt_shape, bpt_shape, bpt_shape,
        ),
        scratch_shapes=[
            pltpu.VMEM((1, TILE), jnp.int32),      # cur_key
            pltpu.VMEM((NUM_LIMBS, TILE), jnp.uint32),  # acc x
            pltpu.VMEM((NUM_LIMBS, TILE), jnp.uint32),  # acc y
            pltpu.VMEM((NUM_LIMBS, TILE), jnp.uint32),  # acc z
            pltpu.VMEM((1, TILE), jnp.int32),      # is_head
            pltpu.VMEM((1, TILE), jnp.int32),      # head_key
        ],
        interpret=_INTERPRET,
    )


def _boundary_merge_kernel(keys_ref, px_ref, py_ref, pz_ref, ox_ref, oy_ref, oz_ref):
    """Segmented inclusive suffix sums over one window's key-sorted
    boundary sequence (grid: one step per window).

    After the scan the first (leader) position of each equal-key segment
    holds the segment total (ops/msm.py _segmented_suffix_totals, fused:
    all log2(M) passes run in VMEM in one kernel invocation). Data is
    row-major (M/128, 128) so every pass runs at full VPU lane occupancy.
    """
    keys = keys_ref[0]
    pt = (
        [px_ref[0, i] for i in range(NUM_LIMBS)],
        [py_ref[0, i] for i in range(NUM_LIMBS)],
        [pz_ref[0, i] for i in range(NUM_LIMBS)],
    )
    pt = _suffix_passes(pt, keys, 1)
    for i in range(NUM_LIMBS):
        ox_ref[0, i] = pt[0][i]
        oy_ref[0, i] = pt[1][i]
        oz_ref[0, i] = pt[2][i]


@functools.lru_cache(maxsize=8)
def _build_boundary_merge(n_win: int, m: int):
    r = m // _W
    key_spec = pl.BlockSpec((1, r, _W), lambda w: (w, 0, 0), memory_space=pltpu.VMEM)
    pt_spec = pl.BlockSpec(
        (1, NUM_LIMBS, r, _W), lambda w: (w, 0, 0, 0), memory_space=pltpu.VMEM
    )
    pt_shape = jax.ShapeDtypeStruct((n_win, NUM_LIMBS, r, _W), jnp.uint32)
    return pl.pallas_call(
        _boundary_merge_kernel,
        grid=(n_win,),
        in_specs=[key_spec, pt_spec, pt_spec, pt_spec],
        out_specs=(pt_spec, pt_spec, pt_spec),
        out_shape=(pt_shape, pt_shape, pt_shape),
        interpret=_INTERPRET,
    )


def _window_chunks(n_win: int, m: int) -> int:
    """Windows per kernel call, keeping call tensors <= ~8MB: XLA stack-
    allocates Mosaic call operands/results in VMEM, so oversized batches
    blow the 128MB budget."""
    per_win = NUM_LIMBS * m * 4 * 3
    return max(1, min(n_win, (8 << 20) // max(per_win, 1)))


def boundary_merge(keys, px, py, pz):
    """Batched over windows: keys (Wn, M) i32 (cummax-filled per window),
    points limb-major (Wn, 16, M), M % 128 == 0.

    Returns suffix-merged totals (Wn, 16, M) x3; leader positions (first
    of each equal-key segment) hold the segment totals.
    """
    n_win, m = keys.shape
    r = m // _W
    chunk = _window_chunks(n_win, m)
    parts = []
    for s in range(0, n_win, chunk):
        e = min(s + chunk, n_win)
        outs = _build_boundary_merge(e - s, m)(
            keys[s:e].reshape(e - s, r, _W),
            px[s:e].reshape(e - s, NUM_LIMBS, r, _W),
            py[s:e].reshape(e - s, NUM_LIMBS, r, _W),
            pz[s:e].reshape(e - s, NUM_LIMBS, r, _W),
        )
        parts.append(tuple(o.reshape(e - s, NUM_LIMBS, m) for o in outs))
    if len(parts) == 1:
        return parts[0]
    return tuple(jnp.concatenate([p[i] for p in parts]) for i in range(3))


def _weighted_total_kernel(px_ref, py_ref, pz_ref, ox_ref, oy_ref, oz_ref):
    """sum_{b>=1} b * B_b over one window's dense bucket table (grid: one
    step per window), via two fused suffix-sum scans (suf[b] =
    sum_{b'>=b} B_b'; total = sum_{b>=1} suf[b] = second-scan suffix sum at
    flat index 1) — the vectorized form of the reference's running-sum
    reduction (multiexp.cpp:132-180)."""
    pt = (
        [px_ref[0, i] for i in range(NUM_LIMBS)],
        [py_ref[0, i] for i in range(NUM_LIMBS)],
        [pz_ref[0, i] for i in range(NUM_LIMBS)],
    )
    pt = _suffix_passes(pt, None, 2)
    for i in range(NUM_LIMBS):
        ox_ref[0, i] = pt[0][i][0:1, 1:2]  # flat index 1 = row 0, lane 1
        oy_ref[0, i] = pt[1][i][0:1, 1:2]
        oz_ref[0, i] = pt[2][i][0:1, 1:2]


@functools.lru_cache(maxsize=8)
def _build_weighted_total(n_win: int, m: int):
    r = m // _W
    in_spec = pl.BlockSpec(
        (1, NUM_LIMBS, r, _W), lambda w: (w, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, NUM_LIMBS, 1, 1), lambda w: (w, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((n_win, NUM_LIMBS, 1, 1), jnp.uint32)
    return pl.pallas_call(
        _weighted_total_kernel,
        grid=(n_win,),
        in_specs=[in_spec] * 3,
        out_specs=(out_spec,) * 3,
        out_shape=(out_shape, out_shape, out_shape),
        interpret=_INTERPRET,
    )


def weighted_bucket_total(px, py, pz):
    """Batched bucket tables limb-major (Wn, 16, NB) x3, NB % 128 == 0 ->
    per-window points (Wn, 16) x3 = sum_{b>=1} b * B_b."""
    n_win, _, nb = px.shape
    r = nb // _W
    chunk = _window_chunks(n_win, nb)
    parts = []
    for s in range(0, n_win, chunk):
        e = min(s + chunk, n_win)
        outs = _build_weighted_total(e - s, nb)(
            px[s:e].reshape(e - s, NUM_LIMBS, r, _W),
            py[s:e].reshape(e - s, NUM_LIMBS, r, _W),
            pz[s:e].reshape(e - s, NUM_LIMBS, r, _W),
        )
        parts.append(tuple(o.reshape(e - s, NUM_LIMBS) for o in outs))
    if len(parts) == 1:
        return parts[0]
    return tuple(jnp.concatenate([p[i] for p in parts]) for i in range(3))


def _horner_kernel_body(c: int, n_win: int):
    steps = c * (n_win - 1)

    def kernel(px_ref, py_ref, pz_ref, ox_ref, oy_ref, oz_ref):
        """Final window combine: sum_w 2^(c*w) * W_w.

        Windows live in lanes of (1, 128) rows. Each lane w is doubled
        c*w times (all lanes batched, lanes that are done are masked), then
        one unsegmented suffix scan sums the lanes — replaces ~26*(c+1)
        tiny per-point XLA group ops with one kernel invocation.
        """
        wv = jax.lax.broadcasted_iota(jnp.int32, (1, _W), 1)
        flat = (
            [px_ref[i : i + 1, 0, :] for i in range(NUM_LIMBS)]
            + [py_ref[i : i + 1, 0, :] for i in range(NUM_LIMBS)]
            + [pz_ref[i : i + 1, 0, :] for i in range(NUM_LIMBS)]
        )

        def body(t, flat):
            x = flat[:NUM_LIMBS]
            y = flat[NUM_LIMBS : 2 * NUM_LIMBS]
            z = flat[2 * NUM_LIMBS :]
            dx, dy, dz = _dbl(x, y, z)
            need = t < c * wv
            x = [_sel(need, a, b) for a, b in zip(dx, x)]
            y = [_sel(need, a, b) for a, b in zip(dy, y)]
            z = [_sel(need, a, b) for a, b in zip(dz, z)]
            return x + y + z

        flat = jax.lax.fori_loop(0, steps, body, flat)
        pt = (flat[:NUM_LIMBS], flat[NUM_LIMBS : 2 * NUM_LIMBS], flat[2 * NUM_LIMBS :])
        pt = _suffix_passes(pt, None, 1)
        for i in range(NUM_LIMBS):
            ox_ref[i] = pt[0][i][0:1, 0:1]
            oy_ref[i] = pt[1][i][0:1, 0:1]
            oz_ref[i] = pt[2][i][0:1, 0:1]

    return kernel


@functools.lru_cache(maxsize=8)
def _build_horner(c: int, n_win: int):
    out_shape = jax.ShapeDtypeStruct((NUM_LIMBS, 1, 1), jnp.uint32)
    return pl.pallas_call(
        _horner_kernel_body(c, n_win),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        out_shape=(out_shape, out_shape, out_shape),
        interpret=_INTERPRET,
    )


def horner_total(wx, wy, wz, c: int):
    """Window sums (Wn, 16) x3 limb-minor -> total point (16,) x3:
    sum_w 2^(c*w) * W_w. Requires Wn <= 128."""
    n_win = wx.shape[0]
    assert n_win <= _W

    def lanes(a):  # (Wn, 16) -> (16, 1, 128): window w in lane w, rest inf
        a = a.T.reshape(NUM_LIMBS, 1, n_win)
        pad = _W - n_win
        return jnp.pad(a, [(0, 0), (0, 0), (0, pad)])

    outs = _build_horner(c, n_win)(lanes(wx), lanes(wy), lanes(wz))
    return tuple(o.reshape(NUM_LIMBS) for o in outs)


def window_scan(keys, px, py, pinf):
    """Run the fused chunk scan over one window's sorted stream.

    All arrays are flattened step-major over L*TILE columns: column
    t*TILE + v holds sorted element v*L + t (lane v, step t), so grid step
    t consumes one contiguous TILE-wide slab and no 3D relayouts are
    needed anywhere.

    keys  (1, L*TILE) i32  sorted digits, step-major (-1 padding first)
    px/py (16, L*TILE) u32 limb-major gathered affine coordinates
    pinf  (1, L*TILE) i32  infinity mask (nonzero = infinity)

    Returns (emit_key (1, L*TILE), emit x/y/z (16, L*TILE),
             head_key (1, TILE), head x/y/z (16, TILE),
             tail_key (1, TILE), tail x/y/z (16, TILE)).
    """
    total = keys.shape[-1]
    assert total % TILE == 0
    L = total // TILE
    return _build_scan(L)(
        keys.reshape(1, total), px, py, pinf.astype(jnp.int32).reshape(1, total)
    )
