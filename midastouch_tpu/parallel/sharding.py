"""Multi-chip scaling: particles sharded over a device mesh via GSPMD.

The reference is strictly single-GPU (SURVEY.md section 2c: no
torch.distributed anywhere). The TPU-native scaling story shards the
particle population across chips and replicates the codebook:

  * motion / weighting / pruning are embarrassingly parallel per particle
  * the codebook NN streams the replicated key table against local
    particles only — no cross-chip traffic
  * softmax normalization, cluster statistics, annealing ranks, and the
    resampling CDF are global reductions/sorts — XLA inserts the psum /
    all-gather collectives over ICI automatically under jit+shardings

so the whole fused update step stays ONE jit region, now SPMD. No manual
collectives are needed; shardings on the ParticleState pytree are the
entire parallelization surface.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from midastouch_tpu.filter.particles import ParticleState
from midastouch_tpu.filter.step import FilterStep, StepStats


def make_device_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def state_shardings(mesh: Mesh, axis: str = "dp") -> ParticleState:
    """Sharding pytree for ParticleState: particle-dim arrays split over
    the mesh axis, scalars replicated."""
    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return ParticleState(
        q=shard, t=shard, weights=shard, labels=shard,
        n_active=rep, particle_var=rep, init_count=rep,
    )


def shard_state(state: ParticleState, mesh: Mesh, axis: str = "dp") -> ParticleState:
    sh = state_shardings(mesh, axis)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


def make_sharded_update(step: FilterStep, mesh: Mesh, axis: str = "dp"):
    """jit the fused update with explicit shardings: state sharded over
    particles, codebook + scalars replicated. Returns a callable with the
    same signature as FilterStep.update."""
    import jax.numpy as jnp

    sh_state = state_shardings(mesh, axis)
    rep = NamedSharding(mesh, P())
    cb_rep = jax.tree_util.tree_map(lambda _: rep, step.codebook)
    rep_stats = jax.tree_util.tree_map(
        lambda _: rep, StepStats(*([0] * len(StepStats._fields)))
    )

    jitted = jax.jit(
        step._update_impl,
        in_shardings=(cb_rep, sh_state, rep, rep, rep, rep, rep, rep, rep),
        out_shardings=(sh_state, rep_stats),
    )

    def update(state, key, code, odom_q, odom_t, gt_pose,
               do_cluster=False, do_measurement=True):
        return jitted(
            step.codebook, state, key, code, odom_q, odom_t, gt_pose,
            jnp.asarray(do_cluster), jnp.asarray(do_measurement),
        )

    return update
