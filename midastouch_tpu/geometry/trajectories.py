"""Surface trajectory samplers for data generation.

The reference builds geodesic waypoint chains with potpourri3d's heat
method plus an oscillating yaw (data_gen/utils.py:37-111). That native
dependency is replaced by a tangent-walk-and-reproject sampler: short
tangent steps projected back to the nearest surface point give
geodesic-like sliding paths on any watertight mesh, with the same
oscillating-yaw pose synthesis. Offline/host-side by design (data gen is
not the hot path)."""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

from midastouch_tpu.geometry.mesh import Mesh


def _surface_tables(mesh: Mesh, samples_per_area: float = 2e6, rng=None):
    """Dense point/normal tables + KD-tree for nearest-surface projection."""
    rng = rng or np.random.default_rng(0)
    n = max(int(mesh.surface_area * samples_per_area), 4096)
    n = min(n, 200_000)
    pts, nrm = mesh.sample_surface(n, rng)
    return pts, nrm, cKDTree(pts)


def random_surface_walk(
    mesh: Mesh,
    num_steps: int,
    rng: np.random.Generator,
    step_size: float | None = None,
    turn_sigma_deg: float = 6.0,
    yaw_amplitude_deg: float = 30.0,
    yaw_period: int = 40,
) -> np.ndarray:
    """Smooth sliding trajectory of gel poses (N, 4, 4).

    Walks a point over the surface with slowly turning tangent heading and
    synthesizes poses with z along the outward normal and an oscillating
    yaw about it (reference data_gen/utils.py:100-106).
    """
    import jax
    import jax.numpy as jnp

    from midastouch_tpu.ops import se3

    if step_size is None:
        step_size = mesh.scale / 400.0

    pts, nrm, tree = _surface_tables(mesh, rng=rng)
    start = rng.integers(len(pts))
    p, n = pts[start].copy(), nrm[start].copy()

    # initial tangent heading
    d = rng.normal(size=3)
    d -= n * np.dot(d, n)
    d /= max(np.linalg.norm(d), 1e-9)

    walk_pts = np.zeros((num_steps, 3), dtype=np.float32)
    walk_nrm = np.zeros((num_steps, 3), dtype=np.float32)
    for i in range(num_steps):
        walk_pts[i], walk_nrm[i] = p, n
        # tangent step + random turn about the normal
        ang = np.radians(rng.normal(0.0, turn_sigma_deg))
        c, s = np.cos(ang), np.sin(ang)
        d = c * d + s * np.cross(n, d)
        p_new = p + step_size * d
        _, j = tree.query(p_new)
        p_proj, n_new = pts[j], nrm[j]
        # keep heading continuous across the projection
        d_new = (p_proj - p) if np.linalg.norm(p_proj - p) > 1e-9 else d
        d_new -= n_new * np.dot(d_new, n_new)
        norm = np.linalg.norm(d_new)
        d = d_new / norm if norm > 1e-9 else d
        p, n = p_proj, n_new

    # oscillating yaw about the normal (utils.py:100-106)
    yaw = np.radians(yaw_amplitude_deg) * np.sin(
        2.0 * np.pi * np.arange(num_steps) / yaw_period
    )
    # host-side prep: shape-varying tiny math — keep off the accelerator
    from midastouch_tpu.utils.runtime import host_cpu

    with jax.default_device(host_cpu()):
        T = se3.pose_from_vertex_normal(
            jnp.asarray(walk_pts),
            jnp.asarray(walk_nrm),
            0.0,
            jnp.asarray(yaw.astype(np.float32)),
            jax.random.PRNGKey(int(rng.integers(0, 2**31 - 1))),
        )
        return np.asarray(T)


def random_geodesic_poses(
    mesh: Mesh,
    num_steps: int,
    rng: np.random.Generator,
    num_waypoints: int = 5,
    yaw_amplitude_deg: float = 30.0,
    yaw_period: int = 40,
) -> np.ndarray:
    """Geodesic waypoint-chain trajectory (reference random_geodesic_poses,
    data_gen/utils.py:37-111): random surface waypoints connected by
    shortest paths over the mesh edge graph (native Dijkstra engine),
    positions resampled to `num_steps`, poses with oscillating yaw."""
    import jax
    import jax.numpy as jnp

    from midastouch_tpu import native
    from midastouch_tpu.ops import se3

    nv = len(mesh.vertices)
    waypoints = rng.choice(nv, size=num_waypoints, replace=False)
    chain: list[int] = []
    for a, b in zip(waypoints[:-1], waypoints[1:]):
        seg = native.geodesic_path(mesh.vertices, mesh.faces, int(a), int(b))
        chain.extend(seg[:-1].tolist())
    chain.append(int(waypoints[-1]))
    pts = mesh.vertices[chain]

    # arclength-uniform resample to num_steps
    seglen = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seglen)])
    total = max(s[-1], 1e-9)
    targets = np.linspace(0.0, total, num_steps)
    walk_pts = np.stack(
        [np.interp(targets, s, pts[:, k]) for k in range(3)], axis=1
    ).astype(np.float32)

    # normals from the nearest chain vertex
    from scipy.spatial import cKDTree

    tree = cKDTree(pts)
    _, j = tree.query(walk_pts)
    walk_nrm = mesh.vertex_normals[np.asarray(chain)[j]]

    yaw = np.radians(yaw_amplitude_deg) * np.sin(
        2.0 * np.pi * np.arange(num_steps) / yaw_period
    )
    # host-side prep: shape-varying tiny math — keep off the accelerator
    from midastouch_tpu.utils.runtime import host_cpu

    with jax.default_device(host_cpu()):
        T = se3.pose_from_vertex_normal(
            jnp.asarray(walk_pts),
            jnp.asarray(walk_nrm),
            0.0,
            jnp.asarray(yaw.astype(np.float32)),
            jax.random.PRNGKey(int(rng.integers(0, 2**31 - 1))),
        )
        return np.asarray(T)


def manual_waypoint_path(
    mesh: Mesh,
    waypoints: np.ndarray,
    total_steps: int,
    rng: np.random.Generator,
) -> np.ndarray:
    """Poses along straight chords between user waypoints, projected onto
    the surface (reference random_manual_poses, data_gen/utils.py:114-172,
    minus the open3d click GUI — waypoints come in as an (M,3) array)."""
    import jax
    import jax.numpy as jnp

    from midastouch_tpu.ops import se3

    pts, nrm, tree = _surface_tables(mesh, rng=rng)
    waypoints = np.asarray(waypoints, dtype=np.float32)
    segs = len(waypoints) - 1
    per = max(total_steps // max(segs, 1), 1)
    walk = []
    for a, b in zip(waypoints[:-1], waypoints[1:]):
        ts = np.linspace(0, 1, per, endpoint=False)[:, None]
        walk.append(a[None] * (1 - ts) + b[None] * ts)
    chord = np.concatenate(walk)[:total_steps]
    _, j = tree.query(chord)
    walk_pts, walk_nrm = pts[j], nrm[j]
    yaw = np.radians(30.0) * np.sin(2 * np.pi * np.arange(len(j)) / 40)
    # host-side prep: shape-varying tiny math — keep off the accelerator
    from midastouch_tpu.utils.runtime import host_cpu

    with jax.default_device(host_cpu()):
        T = se3.pose_from_vertex_normal(
            jnp.asarray(walk_pts),
            jnp.asarray(walk_nrm),
            0.0,
            jnp.asarray(yaw.astype(np.float32)),
            jax.random.PRNGKey(int(rng.integers(0, 2**31 - 1))),
        )
        return np.asarray(T)
