"""Tests for mesh loading, procedural shapes, and surface sampling."""

import numpy as np

from midastouch_tpu.geometry import procedural
from midastouch_tpu.geometry.mesh import load_mesh, sample_poses_on_mesh, save_mesh


def test_icosphere_geometry():
    m = procedural.icosphere(radius=0.04, subdivisions=2)
    r = np.linalg.norm(m.vertices, axis=1)
    np.testing.assert_allclose(r, 0.04, atol=1e-6)
    # outward normals
    c = m.triangles.mean(axis=1)
    dots = np.sum(m.face_normals * c, axis=1)
    assert np.all(dots > 0)
    # surface area close to sphere
    assert abs(m.surface_area - 4 * np.pi * 0.04**2) / (4 * np.pi * 0.04**2) < 0.05
    assert abs(m.scale - 0.08 * np.sqrt(3)) < 0.01


def test_box_geometry():
    m = procedural.box(extents=(0.1, 0.2, 0.3), divisions=4)
    lo, hi = m.bounds
    np.testing.assert_allclose(hi - lo, [0.1, 0.2, 0.3], atol=1e-6)
    np.testing.assert_allclose(m.surface_area, 2 * (0.02 + 0.03 + 0.06), atol=1e-5)
    # box has feature edges (12 sharp edges)
    e = m.feature_edges(10.0)
    assert len(e) >= 12


def test_cylinder_watertight_area():
    m = procedural.cylinder(radius=0.03, height=0.1, segments=96)
    ref = 2 * np.pi * 0.03 * 0.1 + 2 * np.pi * 0.03**2
    assert abs(m.surface_area - ref) / ref < 0.01


def test_surface_sampling(rng):
    m = procedural.icosphere(radius=0.05, subdivisions=2)
    pts, nrm = m.sample_surface(2000, rng)
    r = np.linalg.norm(pts, axis=1)
    assert np.all(np.abs(r - 0.05) < 0.002)  # on the surface (flat facets)
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-5)
    # roughly uniform: octant counts balanced
    octant = (pts[:, 0] > 0).astype(int) * 4 + (pts[:, 1] > 0) * 2 + (pts[:, 2] > 0)
    counts = np.bincount(octant, minlength=8)
    assert counts.min() > 150


def test_sample_poses_on_mesh(rng):
    m = procedural.box(divisions=4)
    T = sample_poses_on_mesh(m, 256, rng, edges=True, shear_mag_deg=5.0)
    assert T.shape == (256, 4, 4)
    np.testing.assert_allclose(T[:, 3], np.tile([0, 0, 0, 1], (256, 1)), atol=0)
    # positions on the box surface
    lo, hi = m.bounds
    p = T[:, :3, 3]
    assert np.all(p >= lo - 1e-5) and np.all(p <= hi + 1e-5)


def test_stl_roundtrip(tmp_path, rng):
    m = procedural.icosphere(radius=0.02, subdivisions=1)
    # write binary STL by hand
    import struct

    path = tmp_path / "m.stl"
    tri = m.triangles
    with open(path, "wb") as fh:
        fh.write(b"\0" * 80)
        fh.write(struct.pack("<I", len(tri)))
        for t, n in zip(tri, m.face_normals):
            fh.write(struct.pack("<3f", *n))
            for v in t:
                fh.write(struct.pack("<3f", *v))
            fh.write(b"\0\0")
    m2 = load_mesh(str(path))
    assert len(m2.vertices) == len(m.vertices)
    assert abs(m2.surface_area - m.surface_area) < 1e-9


def test_obj_and_npz_roundtrip(tmp_path):
    m = procedural.box(divisions=2)
    obj = tmp_path / "m.obj"
    with open(obj, "w") as fh:
        for v in m.vertices:
            fh.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for f in m.faces:
            fh.write(f"f {f[0]+1} {f[1]+1} {f[2]+1}\n")
    m2 = load_mesh(str(obj))
    assert abs(m2.surface_area - m.surface_area) < 1e-9

    npz = tmp_path / "m.npz"
    save_mesh(str(npz), m)
    m3 = load_mesh(str(npz))
    assert len(m3.vertices) == len(m.vertices)


def test_vertex_normals_sphere():
    m = procedural.icosphere(radius=1.0, subdivisions=2)
    vn = m.vertex_normals
    # on a sphere, vertex normal ~ vertex direction
    vdir = m.vertices / np.linalg.norm(m.vertices, axis=1, keepdims=True)
    dots = np.sum(vn * vdir, axis=1)
    assert dots.min() > 0.99
