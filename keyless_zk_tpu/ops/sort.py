"""Batched bitonic sort for the MSM digit streams.

`jax.lax.sort` on TPU lowers to a generic variadic comparison sort that
both compiles slowly and runs far from speed-of-light: the round-5 stage
probe measured 37 ms (of a 103 ms total) sorting the (20, 65536) packed
digit batch at 2^16 — ~27k lane-ops per element. A bitonic network over
power-of-two rows is pure static reshape/flip/min/max, which XLA fuses
into dense VPU code: ~log^2(n)/2 stages of ~4 lane-ops each (~600
lane-ops per element at 2^16, >10x less work).

Only what the MSM needs is provided: ascending sort of an i32 key batch
along the last axis, optionally carrying one i32 payload (for the streams
whose key+sign+index exceed the 31 bits of a single packed operand).
Rows whose length is not a power of two are padded with INT32_MAX keys
(sorts to the end; callers slice it off).

The network sorts each row independently; stages are expressed as
reshape-to-(pairs, 2, block) + elementwise min/max — the xor-partner
exchange of the classic formulation becomes a half-block swap, which on
TPU is a register permute, not a gather.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

INT32_MAX = np.iinfo(np.int32).max


def _pair(x: jnp.ndarray, j: int):
    *batch, n = x.shape
    y = x.reshape(*batch, n // (2 * j), 2, j)
    return y[..., 0, :], y[..., 1, :]


def _unpair(first, second, shape):
    out = jnp.concatenate(
        [first[..., None, :], second[..., None, :]], axis=-2
    )
    return out.reshape(shape)


def _flip_mask(batch_ndim: int, nb: int, k: int, j: int):
    """Per-pair-block descending-direction mask for merge size k (bit k of
    the element index); constant within a block since j <= k/2."""
    flip = (np.arange(nb) // (k // (2 * j))) % 2 == 1
    return jnp.asarray(flip).reshape((1,) * batch_ndim + (nb, 1))


def _stage(x: jnp.ndarray, pay: jnp.ndarray | None, k: int, j: int):
    """One bitonic compare-exchange pass at merge size k, distance j."""
    *batch, n = x.shape
    a, b = _pair(x, j)
    swap = a > b
    if k < n:
        swap = swap ^ _flip_mask(len(batch), n // (2 * j), k, j)
    lo = jnp.where(swap, b, a)
    hi = jnp.where(swap, a, b)
    x = _unpair(lo, hi, x.shape)
    if pay is None:
        return x, None
    pa, pb = _pair(pay, j)
    pay = _unpair(jnp.where(swap, pb, pa), jnp.where(swap, pa, pb), x.shape)
    return x, pay


def bitonic_sort(x: jnp.ndarray, payload: jnp.ndarray | None = None):
    """Ascending sort of i32 keys along the last axis (batched), carrying
    an optional same-shaped i32 payload. Returns keys or (keys, payload).

    Pads non-power-of-two rows with INT32_MAX keys internally and slices
    the result back, so callers see exactly their input length.
    """
    n = x.shape[-1]
    if n <= 1:
        return x if payload is None else (x, payload)
    m = 1 << (n - 1).bit_length()
    if m != n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, m - n)]
        x = jnp.pad(x, pad, constant_values=INT32_MAX)
        if payload is not None:
            payload = jnp.pad(payload, pad)
    k = 2
    while k <= m:
        j = k // 2
        while j >= 1:
            x, payload = _stage(x, payload, k, j)
            j //= 2
        k *= 2
    if m != n:
        x = x[..., :n]
        payload = payload[..., :n] if payload is not None else None
    return x if payload is None else (x, payload)
