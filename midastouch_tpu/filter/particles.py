"""Fixed-capacity particle state as a pytree.

The reference's `Particles` (particle_filter.py:33-90) physically grows and
shrinks tensors (torch_delete / cat) — shape churn that would retrigger XLA
compilation every annealing step. Here capacity is static and the live
population is the prefix `[0, n_active)`; all reductions mask on that.

Poses are stored as quaternion (wxyz) + translation instead of 4x4
matrices: composition is 16 multiplies instead of 64, normalization keeps
SO(3) exact (the reference needed a zero-quaternion pruning hack,
particle_filter.py:347-357), and the codebook key needs the quaternion log
anyway.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from midastouch_tpu.ops import se3


class ParticleState(NamedTuple):
    q: jax.Array  # (N, 4) wxyz
    t: jax.Array  # (N, 3)
    weights: jax.Array  # (N,)
    labels: jax.Array  # (N,) int32 dense cluster ids
    n_active: jax.Array  # () int32  — live prefix length
    particle_var: jax.Array  # () f32 — annealing memory (inf at start)
    init_count: jax.Array  # () int32 — population cap for annealing growth

    @property
    def capacity(self) -> int:
        return self.q.shape[0]

    @property
    def alive(self) -> jax.Array:
        return jnp.arange(self.capacity) < self.n_active

    @property
    def alive_f(self) -> jax.Array:
        return self.alive.astype(self.weights.dtype)

    def poses_matrix(self) -> jax.Array:
        """(N, 4, 4) homogeneous poses (API/viz boundary only)."""
        return se3.make_tf(se3.quat_to_matrix(self.q), self.t)

    @classmethod
    def create(
        cls,
        q: jax.Array,
        t: jax.Array,
        weights: jax.Array | None = None,
        n_active: int | jax.Array | None = None,
    ) -> "ParticleState":
        n = q.shape[0]
        if weights is None:
            weights = jnp.ones(n, dtype=jnp.float32)
        if n_active is None:
            n_active = n
        return cls(
            q=q.astype(jnp.float32),
            t=t.astype(jnp.float32),
            weights=weights,
            labels=jnp.zeros(n, dtype=jnp.int32),
            n_active=jnp.asarray(n_active, dtype=jnp.int32),
            particle_var=jnp.asarray(jnp.inf, dtype=jnp.float32),
            init_count=jnp.asarray(n, dtype=jnp.int32),
        )

    @classmethod
    def from_matrices(cls, poses: jax.Array, **kw) -> "ParticleState":
        return cls.create(
            se3.matrix_to_quat(poses[:, :3, :3]), poses[:, :3, 3], **kw
        )
