"""Tactile codebook: pose -> embedding table resident in HBM.

Rebuilds `midastouch/tactile_tree/tactile_tree.py` without the nanoflann
KD-tree: the 6-D SE(3) keys ([0.99*xyz, 0.01*so3_log], tactile_tree.py:73-77)
live as a dense (M, 6) array and queries are exact brute-force 1-NN through
`ops.knn` (one MXU matmul + streaming argmin), so the entire measurement
update stays on device — the reference round-trips 50k poses through numpy,
theseus and a 16-thread CPU kNN per filter step (tactile_tree.py:43-58).

Storage is a plain .npz of arrays (poses as quaternion+translation), not a
pickled object.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from midastouch_tpu.ops import knn, se3


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Codebook:
    q: jax.Array  # (M, 4) gel-pose quaternions (wxyz)
    t: jax.Array  # (M, 3) gel-pose translations
    cam_q: jax.Array  # (M, 4) camera-pose quaternions
    cam_t: jax.Array  # (M, 3) camera-pose translations
    embeddings: jax.Array  # (M, E) float32, L2-normalized
    keys: jax.Array  # (M, 6) SE(3) query keys
    # (M,) canonical yaw angle of each entry's patch (rad), or None for
    # codebooks built before yaw scoring existed — the in-image angle the
    # canonical descriptor rotated away (ops/image.canonical_angle); the
    # filter uses it to re-score the yaw DOF (FilterStep yaw scoring)
    canon_angle: jax.Array | None = None

    # -- pytree plumbing -----------------------------------------------------

    def tree_flatten(self):
        return (
            (self.q, self.t, self.cam_q, self.cam_t, self.embeddings,
             self.keys, self.canon_angle),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __len__(self) -> int:
        return self.q.shape[0]

    # -- construction ---------------------------------------------------------

    @classmethod
    def from_poses(
        cls,
        gel_poses: np.ndarray,
        cam_poses: np.ndarray,
        embeddings: np.ndarray,
        key_weight: float = 0.01,
        canon_angle: np.ndarray | None = None,
    ) -> "Codebook":
        """Build from (M,4,4) pose matrices + (M,E) embeddings
        (reference tactile_tree.__init__, tactile_tree.py:14-41)."""
        gel = jnp.asarray(gel_poses, dtype=jnp.float32)
        cam = jnp.asarray(cam_poses, dtype=jnp.float32)
        emb = jnp.asarray(embeddings, dtype=jnp.float32)
        emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        q = se3.matrix_to_quat(gel[:, :3, :3])
        t = gel[:, :3, 3]
        return cls(
            q=q,
            t=t,
            cam_q=se3.matrix_to_quat(cam[:, :3, :3]),
            cam_t=cam[:, :3, 3],
            embeddings=emb,
            keys=se3.se3_key(q, t, w=key_weight),
            canon_angle=(
                None if canon_angle is None
                else jnp.asarray(canon_angle, dtype=jnp.float32)
            ),
        )

    # -- persistence ----------------------------------------------------------

    def save(self, path: str) -> None:
        arrays = dict(
            q=np.asarray(self.q),
            t=np.asarray(self.t),
            cam_q=np.asarray(self.cam_q),
            cam_t=np.asarray(self.cam_t),
            embeddings=np.asarray(self.embeddings),
            keys=np.asarray(self.keys),
        )
        if self.canon_angle is not None:
            arrays["canon_angle"] = np.asarray(self.canon_angle)
        np.savez_compressed(path, **arrays)

    @classmethod
    def load(cls, path: str) -> "Codebook":
        d = np.load(path)
        arrays = {k: jnp.asarray(d[k]) for k in d.files}
        # re-establish the L2-normalized invariant `similarity` relies on
        # (from_poses guarantees it; external/legacy npz files may not);
        # rows already unit-norm are passed through bit-exact
        emb = arrays["embeddings"]
        norms = jnp.linalg.norm(emb, axis=1, keepdims=True)
        arrays["embeddings"] = jnp.where(
            jnp.abs(norms - 1.0) > 1e-4, emb / jnp.maximum(norms, 1e-12), emb
        )
        return cls(**arrays)

    # -- queries ---------------------------------------------------------------

    def build_ann_index(
        self, kind: str = "bucketed", num_cells: int | None = None,
        seed: int = 0, **kwargs,
    ):
        """Approximate-NN index over the keys (ops/ann.py) — built once per
        codebook load. kind="blocked" (whole-slab gathers — the fastest
        on TPU), "windowed" (sorted contiguous bands) or "bucketed"
        (gathered cells)."""
        from midastouch_tpu.ops.ann import (
            build_blocked_index,
            build_bucket_index,
            build_sorted_index,
        )

        if kind == "blocked":
            return build_blocked_index(
                np.asarray(self.keys),
                num_cells=num_cells or max(64, len(self) // 96),
                block=kwargs.get("block", 2048),
                probes=kwargs.get("probes", 4),
                seed=seed,
            )
        if kind == "windowed":
            return build_sorted_index(
                np.asarray(self.keys),
                num_cells=num_cells or max(64, len(self) // 96),
                seed=seed,
            )
        if kind != "bucketed":
            raise ValueError(
                f"unknown ANN kind {kind!r}: expected 'blocked', "
                "'windowed' or 'bucketed' (tpu.codebook_ann=false for "
                "exact search)"
            )
        if num_cells is None:
            num_cells = max(32, len(self) // 128)
        return build_bucket_index(
            np.asarray(self.keys), num_cells=num_cells, seed=seed
        )

    def se3_nn_idx(
        self,
        q: jax.Array,
        t: jax.Array,
        backend: str = "auto",
        ann_index=None,
        top_cells: int = 8,
        ann_window: int = 4096,
        ann_probes: int = 3,
    ) -> jax.Array:
        """Nearest codebook entry per query pose (reference SE3_NN,
        tactile_tree.py:43-58, nn=1). Exact by default; pass an
        `ann_index` (SortedIndex or BucketIndex) for approximate search."""
        return self.nn_from_keys(
            se3.se3_key(q, t), ann_index=ann_index, backend=backend,
            top_cells=top_cells, ann_window=ann_window, ann_probes=ann_probes,
        )

    def se3_nn_idx_cm(
        self,
        q: jax.Array,
        t: jax.Array,
        backend: str = "auto",
        ann_index=None,
        top_cells: int = 8,
        ann_window: int = 4096,
        ann_probes: int = 3,
    ) -> jax.Array:
        """se3_nn_idx over CHANNEL-MAJOR queries: q (4, N), t (3, N). The
        key arithmetic runs fully lane-parallel on (C, N) rows; only the
        final (6, N) -> (N, 6) relayout feeds the matmul search."""
        keys = se3.se3_key_cm(q, t).T
        return self.nn_from_keys(
            keys, ann_index=ann_index, backend=backend,
            top_cells=top_cells, ann_window=ann_window, ann_probes=ann_probes,
        )

    def nn_from_keys(
        self,
        keys: jax.Array,
        backend: str = "auto",
        ann_index=None,
        top_cells: int = 8,
        ann_window: int = 4096,
        ann_probes: int = 3,
    ) -> jax.Array:
        if ann_index is not None:
            from midastouch_tpu.ops.ann import (
                BlockedIndex,
                SortedIndex,
                nn_search_blocked,
                nn_search_bucketed,
                nn_search_windowed,
            )

            if isinstance(ann_index, BlockedIndex):
                return nn_search_blocked(keys, ann_index, probes=ann_probes)
            if isinstance(ann_index, SortedIndex):
                return nn_search_windowed(
                    keys, ann_index, window=ann_window, probes=ann_probes
                )
            return jnp.minimum(
                nn_search_bucketed(keys, ann_index, top_cells=top_cells),
                len(self) - 1,
            )
        _, idx = knn.nn_search(keys, self.keys, backend=backend)
        return idx

    def se3_nn(
        self, q: jax.Array, t: jax.Array, backend: str = "auto", ann_index=None
    ):
        """Returns (gel_q, gel_t, cam_q, cam_t, embeddings) of the nearest
        neighbours — the reference returns (poses, cam_poses, embeddings)."""
        idx = self.se3_nn_idx(q, t, backend=backend, ann_index=ann_index)
        return (
            self.q[idx],
            self.t[idx],
            self.cam_q[idx],
            self.cam_t[idx],
            self.embeddings[idx],
            idx,
        )

    def similarity(self, code: jax.Array) -> jax.Array:
        """Cosine similarity of one live tactile code against EVERY codebook
        entry, (M,). One streaming matvec over the embedding table.

        This inverts the reference's measurement dataflow
        (particle_filter.py:449-469 gathers each particle's 256-d codebook
        embedding, then dots): similarity per codebook entry does not depend
        on the particle, so computing it once per step and gathering the
        scalar per particle replaces an (N, 256) row gather — random-access
        HBM traffic TPUs hate — with an (N,) one."""
        # invariant: self.embeddings rows are L2-normalized (enforced by
        # from_poses and load), so the matvec IS the cosine — recomputing
        # row norms here would double the per-step streaming over (M, E)
        qn = code / jnp.maximum(jnp.linalg.norm(code), 1e-12)
        e = self.embeddings
        # the matvec is HBM-bandwidth-bound on the (M, E) stream; a bf16
        # table (see `astype_embeddings`) halves it. Accumulate in f32.
        return jax.lax.dot_general(
            e,
            qn.astype(e.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def astype_embeddings(self, dtype) -> "Codebook":
        """Copy with the embedding table cast (bf16 halves the per-step
        similarity-matvec HBM stream; cosine quantization error ~0.4% is
        below the filter's weighting noise floor — gated by the e2e
        localization tests). Keys/poses stay f32."""
        return dataclasses.replace(
            self, embeddings=self.embeddings.astype(dtype)
        )

    def get_poses(self):
        return self.q, self.t, self.cam_q, self.cam_t

    def get_embeddings(self) -> jax.Array:
        return self.embeddings
