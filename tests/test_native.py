"""Tests for the native C++ mesh-graph engine (+ scipy fallback parity)."""

import numpy as np
import pytest

from midastouch_tpu import native
from midastouch_tpu.geometry import procedural


def test_native_builds():
    lib = native.get_lib()
    assert lib is not None, "C++ engine failed to build"


def test_geodesic_path_native_vs_scipy():
    m = procedural.icosphere(radius=0.04, subdivisions=2)
    src, dst = 0, 100
    p_native = native.geodesic_path(m.vertices, m.faces, src, dst)
    p_scipy = native._geodesic_path_scipy(
        m.vertices.astype(np.float32), m.faces.astype(np.int32), src, dst
    )
    assert p_native[0] == src and p_native[-1] == dst

    def plen(p):
        return np.linalg.norm(np.diff(m.vertices[p], axis=0), axis=1).sum()

    # both are shortest paths -> equal length (ties may differ in route)
    np.testing.assert_allclose(plen(p_native), plen(p_scipy), rtol=1e-5)
    # never much longer than the great-circle arc
    v0, v1 = m.vertices[src], m.vertices[dst]
    arc = 0.04 * np.arccos(
        np.clip(np.dot(v0, v1) / (np.linalg.norm(v0) * np.linalg.norm(v1)), -1, 1)
    )
    assert plen(p_native) < 1.3 * arc + 1e-4


def test_feature_edges_native_matches_numpy_box():
    m = procedural.box(extents=(0.1, 0.1, 0.1), divisions=3)
    out = native.feature_edges(m.vertices, m.faces, 10.0)
    if out is None:
        pytest.skip("native lib unavailable")
    # a box has 12 sharp edges, each subdivided into `divisions` segments
    assert len(out) == 12 * 3
    # all edge endpoints sit on the box frame (two coords at +-0.05)
    pts = m.vertices[out.reshape(-1)]
    on_frame = (np.abs(np.abs(pts) - 0.05) < 1e-6).sum(axis=1) >= 2
    assert on_frame.all()


def test_sphere_has_no_feature_edges():
    m = procedural.icosphere(radius=0.04, subdivisions=3)
    out = native.feature_edges(m.vertices, m.faces, 30.0)
    if out is None:
        pytest.skip("native lib unavailable")
    assert len(out) == 0


def test_random_geodesic_poses():
    from midastouch_tpu.geometry.trajectories import random_geodesic_poses

    m = procedural.icosphere(radius=0.04, subdivisions=3)
    rng = np.random.default_rng(0)
    T = random_geodesic_poses(m, 100, rng)
    assert T.shape == (100, 4, 4)
    p = T[:, :3, 3]
    # on-surface and smooth
    np.testing.assert_allclose(np.linalg.norm(p, axis=1), 0.04, atol=2e-3)
    step = np.linalg.norm(np.diff(p, axis=0), axis=1)
    assert step.max() < 0.01
