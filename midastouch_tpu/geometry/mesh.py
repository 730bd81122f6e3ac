"""Host-side triangle-mesh layer (replaces trimesh/pyvista in the reference).

Loading, derived quantities, surface/edge sampling and pose synthesis
mirroring `midastouch/modules/mesh.py`. Meshes are plain numpy on the host;
anything hot (sampling for codebooks, NN pruning tables) hands fixed-shape
arrays to the device.
"""

from __future__ import annotations

import dataclasses
import struct

import jax
import jax.numpy as jnp
import numpy as np

from midastouch_tpu.ops import se3


@dataclasses.dataclass
class Mesh:
    """Triangle mesh with cached derived data."""

    vertices: np.ndarray  # (V, 3) float32
    faces: np.ndarray  # (F, 3) int32

    def __post_init__(self):
        self.vertices = np.ascontiguousarray(self.vertices, dtype=np.float32)
        self.faces = np.ascontiguousarray(self.faces, dtype=np.int32)
        self._face_normals = None
        self._vertex_normals = None
        self._face_areas = None

    # -- derived ------------------------------------------------------------

    @property
    def triangles(self) -> np.ndarray:
        return self.vertices[self.faces]  # (F, 3, 3)

    @property
    def face_normals(self) -> np.ndarray:
        if self._face_normals is None:
            tri = self.triangles
            n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
            self._face_areas = 0.5 * np.linalg.norm(n, axis=1)
            norm = np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-18)
            self._face_normals = (n / norm).astype(np.float32)
        return self._face_normals

    @property
    def face_areas(self) -> np.ndarray:
        if self._face_areas is None:
            _ = self.face_normals
        return self._face_areas

    @property
    def vertex_normals(self) -> np.ndarray:
        if self._vertex_normals is None:
            vn = np.zeros_like(self.vertices, dtype=np.float64)
            fn = self.face_normals * self.face_areas[:, None]
            for k in range(3):
                np.add.at(vn, self.faces[:, k], fn)
            norm = np.maximum(np.linalg.norm(vn, axis=1, keepdims=True), 1e-18)
            self._vertex_normals = (vn / norm).astype(np.float32)
        return self._vertex_normals

    @property
    def bounds(self) -> np.ndarray:
        return np.stack([self.vertices.min(0), self.vertices.max(0)])

    @property
    def scale(self) -> float:
        """Bounding-box diagonal (trimesh `.scale`, used for init noise,
        reference particle_filter.py:147-151)."""
        lo, hi = self.bounds
        return float(np.linalg.norm(hi - lo))

    @property
    def centroid(self) -> np.ndarray:
        return self.vertices.mean(0)

    @property
    def surface_area(self) -> float:
        return float(self.face_areas.sum())

    def downsampled_vertices(self, stride: int = 10) -> np.ndarray:
        """Vertex table for drift pruning (reference particle_filter.py:109)."""
        return self.vertices[::stride]

    # -- sampling -----------------------------------------------------------

    def sample_surface(
        self, n: int, rng: np.random.Generator
    ) -> tuple[np.ndarray, np.ndarray]:
        """Area-weighted uniform surface samples -> (points, face normals)
        (reference modules/mesh.py:18-43; the 'even' rejection loop there is
        approximated by exact area-uniform sampling)."""
        areas = self.face_areas
        probs = areas / areas.sum()
        fidx = rng.choice(len(probs), size=n, p=probs)
        tri = self.triangles[fidx]
        u, v = rng.random((2, n))
        swap = u + v > 1
        u[swap], v[swap] = 1 - u[swap], 1 - v[swap]
        pts = tri[:, 0] + u[:, None] * (tri[:, 1] - tri[:, 0]) + v[:, None] * (
            tri[:, 2] - tri[:, 0]
        )
        return pts.astype(np.float32), self.face_normals[fidx]

    def feature_edges(self, angle_deg: float = 10.0) -> np.ndarray:
        """Indices (E, 2) of vertex pairs on sharp edges — dihedral angle
        above `angle_deg` or boundary edges (pyvista extract_feature_edges
        equivalent, reference modules/mesh.py:46-69). Uses the native C++
        engine when built; numpy otherwise."""
        from midastouch_tpu import native

        out = native.feature_edges(self.vertices, self.faces, angle_deg)
        if out is not None:
            return out
        f = self.faces
        edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
        eface = np.repeat(np.arange(len(f)), 3)
        key = np.sort(edges, axis=1)
        order = np.lexsort((key[:, 1], key[:, 0]))
        key, edges, eface = key[order], edges[order], eface[order]
        same = np.all(key[1:] == key[:-1], axis=1)
        out = []
        fn = self.face_normals
        i = 0
        ne = len(key)
        while i < ne:
            if i + 1 < ne and same[i]:
                cosang = np.dot(fn[eface[i]], fn[eface[i + 1]])
                if cosang < np.cos(np.radians(angle_deg)):
                    out.append(key[i])
                i += 2
            else:
                out.append(key[i])  # boundary edge
                i += 1
        if not out:
            return np.zeros((0, 2), dtype=np.int32)
        return np.asarray(out, dtype=np.int32)

    def sample_edges(
        self, n: int, rng: np.random.Generator, angle_deg: float = 10.0
    ) -> tuple[np.ndarray, np.ndarray, int]:
        """Sample points on feature edges with vertex normals (reference
        modules/mesh.py:46-69). Returns (points, normals, count) — count may
        be smaller than n when the mesh has few feature edges."""
        e = self.feature_edges(angle_deg)
        if len(e) == 0:
            return (
                np.zeros((0, 3), np.float32),
                np.zeros((0, 3), np.float32),
                0,
            )
        k = min(n, len(e))
        pick = rng.choice(len(e), size=k, replace=len(e) < k)
        t = rng.random((k, 1)).astype(np.float32)
        va, vb = self.vertices[e[pick, 0]], self.vertices[e[pick, 1]]
        pts = va * (1 - t) + vb * t
        vn = self.vertex_normals
        nrm = vn[e[pick, 0]] * (1 - t) + vn[e[pick, 1]] * t
        nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
        return pts.astype(np.float32), nrm.astype(np.float32), k


def decimate(mesh: Mesh, target_faces: int, iters: int = 8) -> Mesh:
    """Vertex-clustering decimation to ~target_faces (replaces the
    reference's pyvista quadric decimation used for viz meshes,
    eval/decimate_meshes.py:1-26). Binary-searches the grid resolution."""
    if len(mesh.faces) <= target_faces:
        return mesh
    lo, hi = 4, 512
    best = mesh
    for _ in range(iters):
        g = (lo + hi) // 2
        m = _cluster_decimate(mesh, g)
        if len(m.faces) > target_faces:
            hi = g
        else:
            lo = g
            best = m
        if hi - lo <= 1:
            break
    # prefer the finest mesh not exceeding ~1.3x target
    m = _cluster_decimate(mesh, hi)
    return m if len(m.faces) <= 1.3 * target_faces else best


def _cluster_decimate(mesh: Mesh, grid: int) -> Mesh:
    lo, hi = mesh.bounds
    span = np.maximum(hi - lo, 1e-12)
    cell = (mesh.vertices - lo) / span * (grid - 1e-4)
    key = np.floor(cell).astype(np.int64)
    flat = (key[:, 0] * grid + key[:, 1]) * grid + key[:, 2]
    uniq, inverse = np.unique(flat, return_inverse=True)
    # representative vertex = mean of cluster
    verts = np.zeros((len(uniq), 3), np.float64)
    counts = np.zeros(len(uniq), np.int64)
    np.add.at(verts, inverse, mesh.vertices)
    np.add.at(counts, inverse, 1)
    verts /= counts[:, None]
    faces = inverse[mesh.faces]
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return Mesh(verts.astype(np.float32), faces[ok].astype(np.int32))


def sample_poses_on_mesh(
    mesh: Mesh,
    num_samples: int,
    rng: np.random.Generator,
    edges: bool = True,
    shear_mag_deg: float = 5.0,
    edge_frac: float = 0.3,
) -> np.ndarray:
    """Candidate sensor poses over the surface (reference mesh.py:84-135):
    optionally 30% from feature edges, rest area-uniform, each turned into
    an SE(3) pose by the shear-cone construction."""
    if edges:
        n_edge = int(edge_frac * num_samples)
        ep, en, n_edge = mesh.sample_edges(n_edge, rng)
        sp, sn = mesh.sample_surface(num_samples - n_edge, rng)
        pts = np.concatenate([sp, ep], axis=0)
        nrm = np.concatenate([sn, en], axis=0)
    else:
        pts, nrm = mesh.sample_surface(num_samples, rng)
    delta = rng.uniform(0.0, 2 * np.pi, size=num_samples).astype(np.float32)
    # host-side prep: shape-varying tiny math — keep off the accelerator
    # (each new num_samples would cost a full tunnel compile)
    from midastouch_tpu.utils.runtime import host_cpu

    with jax.default_device(host_cpu()):
        key = jax.random.PRNGKey(int(rng.integers(0, 2**31 - 1)))
        T = se3.pose_from_vertex_normal(
            jnp.asarray(pts),
            jnp.asarray(nrm),
            float(np.radians(shear_mag_deg)),
            jnp.asarray(delta),
            key,
        )
        return np.asarray(T)


# ---------------------------------------------------------------------------
# loading
# ---------------------------------------------------------------------------


def load_mesh(path: str) -> Mesh:
    """Load a triangle mesh from .stl (binary or ascii), .obj, or .npz
    ({vertices, faces})."""
    lower = path.lower()
    if lower.endswith(".npz"):
        d = np.load(path)
        return Mesh(d["vertices"], d["faces"])
    if lower.endswith(".obj"):
        return _load_obj(path)
    if lower.endswith(".stl"):
        return _load_stl(path)
    raise ValueError(f"unsupported mesh format: {path}")


def save_mesh(path: str, mesh: Mesh) -> None:
    np.savez_compressed(path, vertices=mesh.vertices, faces=mesh.faces)


def _load_obj(path: str) -> Mesh:
    verts, faces = [], []
    with open(path) as fh:
        for line in fh:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:]]
                for k in range(1, len(idx) - 1):  # fan-triangulate
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return _dedup(np.asarray(verts, np.float32), np.asarray(faces, np.int32))


def _load_stl(path: str) -> Mesh:
    with open(path, "rb") as fh:
        head = fh.read(5)
        fh.seek(0)
        if head == b"solid":
            data = fh.read()
            try:
                return _load_stl_ascii(data.decode("ascii", errors="ignore"))
            except ValueError:
                fh.seek(0)  # mislabeled binary
        return _load_stl_binary(fh.read())


def _load_stl_ascii(text: str) -> Mesh:
    pts = []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("vertex"):
            pts.append([float(x) for x in line.split()[1:4]])
    if not pts or len(pts) % 3:
        raise ValueError("malformed ascii STL")
    v = np.asarray(pts, np.float32)
    f = np.arange(len(v), dtype=np.int32).reshape(-1, 3)
    return _dedup(v, f)


def _load_stl_binary(data: bytes) -> Mesh:
    (n,) = struct.unpack_from("<I", data, 80)
    rec = np.frombuffer(data, dtype=np.uint8, count=n * 50, offset=84)
    rec = rec.reshape(n, 50)
    tri = rec[:, 12:48].copy().view("<f4").reshape(n, 3, 3)
    v = tri.reshape(-1, 3).astype(np.float32)
    f = np.arange(len(v), dtype=np.int32).reshape(-1, 3)
    return _dedup(v, f)


def _dedup(vertices: np.ndarray, faces: np.ndarray) -> Mesh:
    """Merge exactly-duplicate vertices (soup -> indexed mesh)."""
    uniq, inverse = np.unique(
        vertices.round(decimals=8), axis=0, return_inverse=True
    )
    return Mesh(uniq.astype(np.float32), inverse[faces].astype(np.int32))
