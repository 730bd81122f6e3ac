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

Layout is CHANNEL-MAJOR: q is (4, N) and t is (3, N), with the big
particle axis N on the TPU's 128-lane minor dimension. The row-major
(N, C) layout put C=3/4 on lanes, so every elementwise filter stage ran at
~3% lane utilization (~0.5 ms each at N=50k, PROFILE_50k.json); the
matching (C, N) se3 kernels live in ops/se3 (`*_cm`). Row-major views for
host/viz boundaries are `q_rows` / `t_rows`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from midastouch_tpu.ops import se3


class ParticleState(NamedTuple):
    q: jax.Array  # (4, N) wxyz rows
    t: jax.Array  # (3, N)
    weights: jax.Array  # (N,)
    labels: jax.Array  # (N,) int32 dense cluster ids
    n_active: jax.Array  # () int32  — live prefix length
    particle_var: jax.Array  # () f32 — annealing memory (inf at start)
    init_count: jax.Array  # () int32 — population cap for annealing growth

    @property
    def capacity(self) -> int:
        return self.q.shape[1]

    @property
    def alive(self) -> jax.Array:
        return jnp.arange(self.capacity) < self.n_active

    @property
    def alive_f(self) -> jax.Array:
        return self.alive.astype(self.weights.dtype)

    @property
    def q_rows(self) -> jax.Array:
        """(N, 4) row-major quaternions (host/viz boundary)."""
        return self.q.T

    @property
    def t_rows(self) -> jax.Array:
        """(N, 3) row-major translations (host/viz boundary)."""
        return self.t.T

    def poses_matrix(self) -> jax.Array:
        """(N, 4, 4) homogeneous poses (API/viz boundary only)."""
        return se3.make_tf(se3.quat_to_matrix(self.q.T), self.t.T)

    @classmethod
    def create(
        cls,
        q: jax.Array,
        t: jax.Array,
        weights: jax.Array | None = None,
        n_active: int | jax.Array | None = None,
    ) -> "ParticleState":
        """Create from ROW-major (N, 4) quats + (N, 3) translations (the
        boundary convention of codebook queries and pose loaders)."""
        return cls.create_cm(q.T, t.T, weights=weights, n_active=n_active)

    @classmethod
    def create_cm(
        cls,
        q: jax.Array,
        t: jax.Array,
        weights: jax.Array | None = None,
        n_active: int | jax.Array | None = None,
    ) -> "ParticleState":
        """Create from channel-major (4, N) / (3, N) arrays."""
        n = q.shape[1]
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
