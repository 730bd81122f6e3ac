"""Procedural test meshes (sphere / box / cylinder / capsule).

The reference relies on downloaded YCB assets; these analytic shapes give
the framework a self-contained asset story for tests, benchmarks and CI —
each at a physical scale comparable to YCB objects (~5-20 cm).
"""

from __future__ import annotations

import numpy as np

from midastouch_tpu.geometry.mesh import Mesh


def icosphere(radius: float = 0.04, subdivisions: int = 3) -> Mesh:
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=np.float64,
    )
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    for _ in range(subdivisions):
        edge_mid: dict[tuple[int, int], int] = {}
        new_faces = []
        verts_list = list(verts)

        def midpoint(a: int, b: int) -> int:
            k = (a, b) if a < b else (b, a)
            if k not in edge_mid:
                m = verts_list[a] + verts_list[b]
                m /= np.linalg.norm(m)
                edge_mid[k] = len(verts_list)
                verts_list.append(m)
            return edge_mid[k]

        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(verts_list)
        faces = np.asarray(new_faces, dtype=np.int64)
    return Mesh((verts * radius).astype(np.float32), faces.astype(np.int32))


def box(extents=(0.09, 0.05, 0.17), divisions: int = 8) -> Mesh:
    """Axis-aligned box centered at origin, each face a divisions^2 grid
    (default extents echo a sugar-box-like object)."""
    ex, ey, ez = [e / 2.0 for e in extents]
    verts: list[np.ndarray] = []
    faces: list[list[int]] = []

    def add_face(origin, du, dv):
        base = len(verts)
        n = divisions
        for i in range(n + 1):
            for j in range(n + 1):
                verts.append(origin + du * (i / n) + dv * (j / n))
        for i in range(n):
            for j in range(n):
                a = base + i * (n + 1) + j
                b, c, d = a + 1, a + n + 1, a + n + 2
                faces.append([a, b, d])
                faces.append([a, d, c])

    o = np.array
    add_face(o([-ex, -ey, ez]), o([2 * ex, 0, 0]), o([0, 2 * ey, 0]))  # +z
    add_face(o([-ex, ey, -ez]), o([2 * ex, 0, 0]), o([0, -2 * ey, 0]))  # -z
    add_face(o([ex, -ey, -ez]), o([0, 2 * ey, 0]), o([0, 0, 2 * ez]))  # +x
    add_face(o([-ex, ey, -ez]), o([0, -2 * ey, 0]), o([0, 0, 2 * ez]))  # -x
    add_face(o([ex, ey, -ez]), o([-2 * ex, 0, 0]), o([0, 0, 2 * ez]))  # +y
    add_face(o([-ex, -ey, -ez]), o([2 * ex, 0, 0]), o([0, 0, 2 * ez]))  # -y
    v = np.asarray(verts, dtype=np.float32)
    f = np.asarray(faces, dtype=np.int32)
    # weld shared cube edges
    uniq, inv = np.unique(v.round(decimals=7), axis=0, return_inverse=True)
    return Mesh(uniq.astype(np.float32), inv[f].astype(np.int32))


def cylinder(radius: float = 0.033, height: float = 0.1, segments: int = 48) -> Mesh:
    ang = np.linspace(0, 2 * np.pi, segments, endpoint=False)
    ring = np.stack([np.cos(ang) * radius, np.sin(ang) * radius], axis=1)
    top = np.concatenate([ring, np.full((segments, 1), height / 2)], axis=1)
    bot = np.concatenate([ring, np.full((segments, 1), -height / 2)], axis=1)
    verts = [top, bot, [[0, 0, height / 2]], [[0, 0, -height / 2]]]
    v = np.concatenate([np.asarray(x) for x in verts]).astype(np.float32)
    ct, cb = 2 * segments, 2 * segments + 1
    faces = []
    for i in range(segments):
        j = (i + 1) % segments
        faces += [[i, j, segments + j], [i, segments + j, segments + i]]  # side
        faces += [[ct, i, j]]  # top cap (+z out)
        faces += [[cb, segments + j, segments + i]]  # bottom cap
    return Mesh(v, np.asarray(faces, dtype=np.int32))


def potato(
    radius: float = 0.04,
    subdivisions: int = 4,
    num_bumps: int = 24,
    bump_height: float = 0.25,
    bump_width: float = 0.55,
    seed: int = 7,
) -> Mesh:
    """Irregular blob: icosphere with deterministic gaussian radial bumps.

    A plain sphere is locally identical everywhere, so tactile codes carry
    no global information on it (single-touch retrieval is provably at
    chance). This object has unique local curvature everywhere — the
    procedural stand-in for YCB-like objects in learned-pipeline tests.
    """
    base = icosphere(radius=1.0, subdivisions=subdivisions)
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(num_bumps, 3))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    amps = rng.uniform(-bump_height, bump_height, size=num_bumps)
    widths = rng.uniform(0.5, 1.0, size=num_bumps) * bump_width

    dirs = base.vertices / np.linalg.norm(base.vertices, axis=1, keepdims=True)
    ang = np.arccos(np.clip(dirs @ centers.T, -1.0, 1.0))  # (V, B)
    r = 1.0 + (amps[None, :] * np.exp(-((ang / widths[None, :]) ** 2))).sum(1)
    return Mesh((dirs * (r[:, None] * radius)).astype(np.float32), base.faces)


def bumpy_blob(
    radius: float = 0.04,
    subdivisions: int = 5,
    populations=((10, 0.18, 0.35, 0.6), (70, 0.03, 0.08, 0.16)),
    seed: int = 17,
) -> Mesh:
    """Multi-scale irregular blob: icosphere displaced by several gaussian
    bump populations, each (count, height_frac, width_lo_rad, width_hi_rad).

    Why multi-scale: single-touch retrieval needs the tactile patch to be
    BOTH distinctive (features at/below the ~7x9 mm gel window) and smoothly
    position-correlated (wavelengths above the window, so overlapping
    touches look alike). One-population blobs fail one way or the other —
    `potato`'s bumps are wider than the window (normal alignment removes
    them: retrieval ~0.9), `pebble`'s noise decorrelates within one window
    (retrieval ~1.0). YCB meshes the reference evaluates on are naturally
    multi-scale (faces + edges + corners); this is their procedural analogue.
    """
    base = icosphere(radius=1.0, subdivisions=subdivisions)
    rng = np.random.default_rng(seed)
    dirs = base.vertices / np.linalg.norm(base.vertices, axis=1, keepdims=True)
    r = np.ones(len(dirs))
    for num, height, w_lo, w_hi in populations:
        centers = rng.normal(size=(num, 3))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        amps = rng.uniform(-height, height, size=num)
        widths = rng.uniform(w_lo, w_hi, size=num)
        ang = np.arccos(np.clip(dirs @ centers.T, -1.0, 1.0))  # (V, B)
        r = r + (amps[None, :] * np.exp(-((ang / widths[None, :]) ** 2))).sum(1)
    return Mesh((dirs * (r[:, None] * radius)).astype(np.float32), base.faces)


TEST_OBJECTS = {
    "sphere": lambda: icosphere(subdivisions=4),
    "box": lambda: box(divisions=12),
    "cylinder": lambda: cylinder(),
    "potato": lambda: potato(),
    # sharper, denser features than `potato` — for embedding-quality work
    "rock": lambda: potato(
        subdivisions=5, num_bumps=60, bump_height=0.35, bump_width=0.25,
        seed=11,
    ),
    # contact-patch-scale terrain: bump widths 3-6 mm / heights ~1-3 mm sit
    # INSIDE one sensor patch, so every touch sees several distinctive
    # features — the procedural analogue of the feature-rich YCB objects
    # the reference evaluates on (potato/rock features are wider than the
    # patch and normal-alignment removes their leading-order signal)
    "pebble": lambda: potato(
        subdivisions=5, num_bumps=500, bump_height=0.05, bump_width=0.1,
        seed=13,
    ),
    # multi-scale blob (see bumpy_blob): the learned-pipeline flagship
    "boulder": lambda: bumpy_blob(),
    # multi-scale siblings for the multi-object round (reference trains one
    # TCN across 40 YCB objects, config/tcn/default.yaml:52-53)
    "crag": lambda: bumpy_blob(
        populations=((8, 0.22, 0.3, 0.55), (50, 0.05, 0.1, 0.2)), seed=23,
    ),
    "mound": lambda: bumpy_blob(
        populations=((14, 0.12, 0.4, 0.8), (90, 0.025, 0.12, 0.3)), seed=29,
    ),
    # boulder's exact displacement field at icosphere subdivision 7 —
    # 327,680 faces, the high-poly robustness stand-in for YCB
    # nontextured.stl scans (reference filter.py:70-81): same surface,
    # so boulder renders are the oracle for cull/pipeline validation
    "megalith": lambda: bumpy_blob(subdivisions=7),
}


def get_test_mesh(name: str) -> Mesh:
    if name not in TEST_OBJECTS:
        raise KeyError(f"unknown test object {name}; have {list(TEST_OBJECTS)}")
    return TEST_OBJECTS[name]()
