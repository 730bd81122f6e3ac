"""Sharding tests over the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midastouch_tpu.parallel.sharding import (
    make_device_mesh,
    make_sharded_update,
    shard_state,
    state_shardings,
)


# Two shapes: the standard tiny one, and a second capacity whose per-device
# shard is NOT a power of two (1664/8 = 208) with a non-pow2 codebook —
# catches shape-dependent sharding bugs (padding, uneven tiling) that a
# single lucky shape would hide.
_SHAPES = {"512x256": (512, 256), "1664x384": (1664, 384)}


@pytest.fixture(scope="module", params=sorted(_SHAPES))
def tiny(request):
    import __graft_entry__ as g

    capacity, codebook_size = _SHAPES[request.param]
    step, state, (code, odom_q, odom_t, gt_pose), key = g._tiny_setup(
        capacity=capacity, codebook_size=codebook_size
    )
    return step, state, code, odom_q, odom_t, gt_pose, key


def test_mesh_has_8_devices():
    mesh = make_device_mesh()
    assert mesh.devices.size == 8


@pytest.mark.slow
def test_sharded_update_matches_unsharded(tiny):
    step, state, code, odom_q, odom_t, gt_pose, key = tiny
    mesh = make_device_mesh(8)

    sstate = shard_state(state, mesh)
    update = make_sharded_update(step, mesh)
    out_sharded, stats_sharded = update(
        sstate, key, code, odom_q, odom_t, gt_pose,
        do_cluster=True, do_measurement=True,
    )
    out_ref, stats_ref = step.update(
        state, key, code, odom_q, odom_t, gt_pose,
        do_cluster=True, do_measurement=True,
    )
    # same seeds + same math -> identical trajectories modulo fp reorder
    np.testing.assert_allclose(
        np.asarray(out_sharded.t), np.asarray(out_ref.t), atol=1e-5
    )
    np.testing.assert_allclose(
        float(stats_sharded.rmse_t), float(stats_ref.rmse_t), rtol=1e-4
    )
    assert int(stats_sharded.n_active) == int(stats_ref.n_active)
    # output really is sharded over the mesh
    assert len(out_sharded.t.sharding.device_set) == 8


def test_sharded_update_2d_codebook_rows(tiny):
    """2-D (dp x cb) mesh: particles AND codebook rows sharded — the
    pod-scale layout where the codebook no longer fits replicated."""
    from midastouch_tpu.parallel.sharding import make_device_mesh_2d

    step, state, code, odom_q, odom_t, gt_pose, key = tiny
    mesh = make_device_mesh_2d(4, 2)

    sstate = shard_state(state, mesh)
    update = make_sharded_update(step, mesh, cb_axis="cb")
    out_sharded, stats_sharded = update(
        sstate, key, code, odom_q, odom_t, gt_pose,
        do_cluster=True, do_measurement=True,
    )
    out_ref, stats_ref = step.update(
        state, key, code, odom_q, odom_t, gt_pose,
        do_cluster=True, do_measurement=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_sharded.t), np.asarray(out_ref.t), atol=1e-5
    )
    np.testing.assert_allclose(
        float(stats_sharded.rmse_t), float(stats_ref.rmse_t), rtol=1e-4
    )
    assert int(stats_sharded.n_active) == int(stats_ref.n_active)
    assert len(out_sharded.t.sharding.device_set) == 8


def test_state_shardings_pytree(tiny):
    step, state, *_ = tiny
    mesh = make_device_mesh(8)
    sh = state_shardings(mesh)
    sstate = shard_state(state, mesh)
    assert sstate.q.sharding.is_equivalent_to(sh.q, ndim=2)
    assert np.asarray(sstate.t).shape[1] == state.capacity
