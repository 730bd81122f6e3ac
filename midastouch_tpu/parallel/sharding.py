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


def make_device_mesh_2d(
    dp: int, cb: int, dp_axis: str = "dp", cb_axis: str = "cb"
) -> Mesh:
    """(dp x cb) mesh: particles sharded over `dp`, codebook rows over
    `cb`. For pod-scale runs where the codebook (50k x 256 embeddings and
    growing with multi-object support) should not be replicated per chip."""
    devs = jax.devices()
    if dp * cb > len(devs):
        raise ValueError(f"need {dp * cb} devices, have {len(devs)}")
    return Mesh(
        np.array(devs[: dp * cb]).reshape(dp, cb), (dp_axis, cb_axis)
    )


def codebook_shardings(mesh: Mesh, cb_axis: str | None = None):
    """Sharding pytree for the Codebook: when `cb_axis` is given, the big
    row tables (keys for the NN sweep, embeddings for the similarity
    matvec) are split over that axis and the small pose arrays stay
    replicated (they are only gathered on the rare all-drifted branch);
    otherwise everything is replicated."""
    rep = NamedSharding(mesh, P())
    if cb_axis is None:
        return None, rep  # caller maps rep over the pytree
    row = NamedSharding(mesh, P(cb_axis))
    from midastouch_tpu.codebook import Codebook

    return (
        Codebook(
            q=rep, t=rep, cam_q=rep, cam_t=rep,
            embeddings=row, keys=row,
        ),
        rep,
    )


def state_shardings(mesh: Mesh, axis: str = "dp") -> ParticleState:
    """Sharding pytree for ParticleState: particle-dim arrays split over
    the mesh axis, scalars replicated. q/t are channel-major (C, N), so
    the particle axis is dim 1; weights/labels are (N,)."""
    shard = NamedSharding(mesh, P(axis))
    shard_cm = NamedSharding(mesh, P(None, axis))
    rep = NamedSharding(mesh, P())
    return ParticleState(
        q=shard_cm, t=shard_cm, weights=shard, labels=shard,
        n_active=rep, particle_var=rep, init_count=rep,
    )


def shard_state(state: ParticleState, mesh: Mesh, axis: str = "dp") -> ParticleState:
    sh = state_shardings(mesh, axis)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


def make_sharded_update(
    step: FilterStep, mesh: Mesh, axis: str = "dp",
    cb_axis: str | None = None,
):
    """jit the fused update with explicit shardings: state sharded over
    particles along `axis`, codebook row tables optionally sharded along
    `cb_axis` (2-D mesh), everything else replicated. Returns a callable
    with the same signature as FilterStep.update.

    With `cb_axis`, GSPMD partitions the NN distance sweep and the
    similarity matvec by codebook rows and inserts the cross-shard argmin /
    gather collectives over ICI — the scan stays one program."""
    import jax.numpy as jnp

    sh_state = state_shardings(mesh, axis)
    rep = NamedSharding(mesh, P())
    cb_sh, _ = codebook_shardings(mesh, cb_axis)
    cb_rep = (
        jax.tree_util.tree_map(lambda _: rep, step.codebook)
        if cb_sh is None
        else cb_sh
    )
    rep_stats = jax.tree_util.tree_map(
        lambda _: rep, StepStats(*([0] * len(StepStats._fields)))
    )

    jitted = jax.jit(
        step._update_impl,
        in_shardings=(
            cb_rep, sh_state, rep, rep, rep, rep, rep, rep, rep, rep,
        ),
        out_shardings=(sh_state, rep_stats),
    )

    def update(state, key, code, odom_q, odom_t, gt_pose,
               do_cluster=False, do_measurement=True):
        return jitted(
            step.codebook, state, key, code, odom_q, odom_t, gt_pose,
            jnp.asarray(do_cluster), jnp.asarray(do_measurement),
            step._drift_thresh_arr,
        )

    return update
