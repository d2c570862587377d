"""Device-mesh parallelism for the proving kernels.

The reference is single-node shared-memory (oneTBB; SURVEY §2.4) — this
package is its scale-out story: MSM point partitioning with O(1) collective
combines, batched NTT sharding, and batch-of-proofs data parallelism over a
`jax.sharding.Mesh`.
"""

from .sharded import make_mesh, sharded_msm, sharded_ntt_batch

__all__ = ["make_mesh", "sharded_msm", "sharded_ntt_batch"]
