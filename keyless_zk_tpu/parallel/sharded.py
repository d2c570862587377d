"""Sharded proving kernels over a jax.sharding.Mesh.

TPU-native replacements for the reference's TBB parallelism (SURVEY §2.4):

- `sharded_msm`: points and scalars are partitioned across the mesh's
  `data` axis (the analog of multiexp.cpp's per-thread chunks); each chip
  runs the full local Pippenger, then the per-chip Jacobian partials are
  combined with one tiny all_gather + log-depth EC tree add. Communication
  is O(devices), independent of n — MSM scales linearly until the per-chip
  slice stops saturating the VPU.
- `sharded_ntt_batch`: a batch of polynomials laid out one-per-chip (the
  batched-prover configuration; intra-proof NTT sharding comes later via a
  four-step transpose decomposition).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from ..curves.jacobian import JacobianCurve, JacPoint
from ..ops.msm import _msm_small, msm
from ..ops.ntt import get_plan


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def _tree_add_points(curve: JacobianCurve, pts: JacPoint) -> JacPoint:
    """Log-depth reduction of a (k, ...) batch of Jacobian points."""
    from ..ops.msm import tree_reduce_points

    return tree_reduce_points(curve, pts, pts.x.shape[0])


def sharded_msm(
    points_x: jnp.ndarray,
    points_y: jnp.ndarray,
    points_inf: jnp.ndarray,
    scalars: jnp.ndarray,
    *,
    curve: JacobianCurve,
    mesh: Mesh,
    axis: str = "data",
    **msm_kwargs,
) -> JacPoint:
    """MSM with points sharded across `axis`; result replicated.

    n must be divisible by the mesh size (pad with zero scalars upstream).
    """

    coord = P(axis, *([None] * (points_x.ndim - 1)))

    def local(px, py, pinf, s):
        part = msm(px, py, pinf, s, curve=curve, **msm_kwargs)
        # gather the per-chip partial sums and reduce on every chip
        gathered = jax.tree.map(
            lambda a: jax.lax.all_gather(a, axis), part
        )
        return _tree_add_points(curve, JacPoint(*gathered))

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(coord, coord, P(axis), P(axis, None)),
        out_specs=JacPoint(P(), P(), P()),
        check_vma=False,
    )
    return f(points_x, points_y, points_inf, scalars)


def sharded_ntt_batch(
    polys: jnp.ndarray, *, domain_pow: int, mesh: Mesh, axis: str = "data", inverse=False
) -> jnp.ndarray:
    """Batch-of-polynomials NTT, one batch slice per chip: (B, n, 16)."""
    plan = get_plan(domain_pow)

    def local(x):
        return plan.intt(x) if inverse else plan.ntt(x)

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None, None),),
        out_specs=P(axis, None, None),
        check_vma=False,
    )
    return f(polys)
