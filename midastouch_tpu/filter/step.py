"""Fused filter step: the whole sense-update loop as two jit regions.

The reference's per-frame loop (filter.py:131-233) crosses the GPU/CPU
boundary at least five times (nanoflann kNN, sklearn KDTree, DBSCAN,
Python resampler, numpy stats). Here:

  * `sense(image)`            — TDN -> mask -> TCN, one jit
  * `update(state, code, ...)`— motion + codebook NN + weighting + pruning
                                + clustering + annealing + resampling + RMSE,
                                one jit, no host transfers

`initialize` reproduces filter.py:158-160 (spawn around the start pose,
then snap onto the codebook manifold).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from midastouch_tpu.codebook import Codebook
from midastouch_tpu.filter.particles import ParticleState
from midastouch_tpu.filter.pf import ParticleFilter


class StepStats(NamedTuple):
    rmse_t: jax.Array  # () m
    rmse_r: jax.Array  # () deg
    mean_std: jax.Array  # () cluster sigma (m)
    n_active: jax.Array  # () int32
    n_clusters: jax.Array  # () int32
    cluster_poses: jax.Array  # (K, 4, 4)
    cluster_stds: jax.Array  # (K, 3)
    cluster_valid: jax.Array  # (K,)
    drifted: jax.Array  # () bool


class FilterStep:
    """Owns the jitted closures binding (pf, codebook, nets)."""

    def __init__(
        self,
        pf: ParticleFilter,
        codebook: Codebook,
        tdn=None,
        tcn=None,
        floor: int = 1000,
        small_parts: bool = False,
        softmax: bool = True,
        ann_index=None,
        ann_top_cells: int = 8,
        ann_window: int = 4096,
        ann_probes: int = 3,
        drift_from_codebook: bool = True,
        yaw_kappa: float = 0.0,
        yaw_sign: float = 1.0,
    ):
        self.pf = pf
        self.codebook = codebook
        self.tdn = tdn
        self.tcn = tcn
        self.floor = floor
        self.small_parts = small_parts
        # canonical-yaw measurement scoring: the yaw-canonical descriptor
        # quotients out the gel's in-plane rotation, so similarity alone
        # cannot observe it (round-4 rotation RMSE 74 deg). The codebook
        # stores each entry's canonicalization angle; the live patch's
        # angle plus each particle's NN-relative yaw predicts it, and the
        # von-Mises log-bonus kappa*cos(err) re-weights particles on the
        # one DOF the embedding discarded. 0 = off (reference parity).
        self.yaw_kappa = float(yaw_kappa)
        self.yaw_sign = float(yaw_sign)
        self.yaw_on = (
            self.yaw_kappa > 0.0
            and getattr(codebook, "canon_angle", None) is not None
            and (tcn is None or getattr(tcn, "canonicalize", False))
        )
        # optional ANN index for the codebook NN (ops/ann.py) + its search
        # knobs (tpu.ann_top_cells / ann_window / ann_probes in the config)
        self.ann_index = ann_index
        self.ann_top_cells = ann_top_cells
        self.ann_window = ann_window
        self.ann_probes = ann_probes
        # drift gate from the xyz distance to each particle's codebook NN
        # (already computed for weighting) instead of a second N x V kernel
        # over the strided vertex table: the codebook samples the surface
        # ~10x denser than the vertex table, and the gather of (N, 3) NN
        # positions is shared with the all-drifted recovery branch
        self.drift_from_codebook = drift_from_codebook
        if drift_from_codebook:
            # Monte-Carlo-calibrate the gate at init: query codebook poses
            # perturbed by press-scale noise through the SAME NN path the
            # live gate uses (incl. the ANN index and its recall misses),
            # and set the threshold at the 99.9th percentile of the
            # measured distances. A particle within press-depth noise of
            # the surface then survives by construction (~0.1% false-kill),
            # independent of codebook density, ANN knobs, and the 6-D key
            # weighting — the previous spacing-derived threshold pruned 7%
            # of on-surface particles on the round-3 learned codebook
            # (tests/test_filter.py::test_fast_path_parity_on_learned_codebook).
            m = min(len(codebook), 4096)
            stride = max(len(codebook) // m, 1)
            q_s = codebook.q[::stride][:m]
            t_s = codebook.t[::stride][:m]
            k = jax.random.PRNGKey(0)
            t_n = t_s + float(pf.params.pen_max) * jax.random.normal(
                k, t_s.shape, dtype=t_s.dtype
            )
            idx = codebook.se3_nn_idx(
                q_s, t_n, backend=pf.params.backend,
                ann_index=ann_index, top_cells=ann_top_cells,
                ann_window=ann_window, ann_probes=ann_probes,
            )
            d = jnp.linalg.norm(t_n - codebook.t[idx], axis=-1)
            self._drift_thresh = max(
                1.1 * float(jnp.quantile(d, 0.999)),
                float(pf.params.pen_max),
            )
        # traced form (see _update_impl): 0.0 when the codebook gate is off
        self._drift_thresh_arr = jnp.asarray(
            getattr(self, "_drift_thresh", 0.0), jnp.float32
        )
        # sim path softmaxes similarity weights (filter.py:172); the real
        # path uses raw cosine scores (filter_real.py:209)
        self.softmax = softmax
        self._update = jax.jit(self._update_impl)
        self._sense = jax.jit(self._sense_impl) if (tdn and tcn) else None
        self._replay = None  # built lazily (jit with static scan knobs)
        self._fused = None  # fused sense+odom+update, built lazily

    # -- sensing (filter.py:142-148) ------------------------------------------

    def _sense_impl(self, tdn_vars, tcn_vars, image, key):
        from midastouch_tpu.ops import image as image_ops

        img = image_ops.normalize_image(
            jnp.asarray(image, jnp.float32), self.tdn.input_norm
        )
        hm = self.tdn.model.apply(tdn_vars, img[None], train=False)[0]
        mask = image_ops.heightmap_to_mask(
            hm, self.tdn.bg, self.tdn.b, self.tdn.r, self.tdn.clip,
            self.small_parts,
        )
        inputs = self.tcn.model_inputs(key, hm[None], mask[None])
        code = self.tcn._embed_impl(tcn_vars, inputs)[0]
        if self.yaw_on:
            angle = self.tcn._canonical_angles_impl(hm[None], mask[None])[0]
        else:
            angle = jnp.float32(0.0)
        return code, angle, hm, mask

    def sense(self, image, key):
        """Tactile image -> (code, canon_angle, heightmap, mask)."""
        return self._sense(
            self.tdn.variables, self.tcn.variables, image, key
        )

    def sense_batch(
        self, images, key, batch: int | None = None,
        return_angles: bool = False,
    ):
        """All-frames batched sensing for offline replay: TDN forward, mask
        thresholding and TCN embedding each run at codebook-build batch
        size instead of batch-1 inside the scan. Same math as `sense`
        frame-by-frame (sim path: blend_sz=0, so no temporal blending to
        preserve); ~an order of magnitude fewer FLOP-starved dispatches."""
        b = batch or self.tcn.batch_size
        codes = []
        angles = []
        for i in range(0, len(images), b):
            chunk = jnp.asarray(images[i : i + b], jnp.float32)
            hms = self.tdn.images2heightmaps(chunk)
            masks = self.tdn.heightmaps2masks(hms, self.small_parts)
            inputs = self.tcn.model_inputs(
                jax.random.fold_in(key, i), hms, masks
            )
            codes.append(self.tcn.clouds_to_codes(inputs))
            if return_angles:
                angles.append(self.tcn.canonical_angles(hms, masks))
        if return_angles:
            return jnp.concatenate(codes, axis=0), jnp.concatenate(angles)
        return jnp.concatenate(codes, axis=0)

    def sense_update(
        self, state, key, image, meas, prev_idx, idx, gt_pose,
        do_cluster: bool = False, do_measurement: bool = True,
    ):
        """Fused per-frame sense + odometry + update as ONE dispatch — the
        realtime loop's latency is dominated by host->device round trips
        (this environment tunnels the TPU), so the three dispatches
        (sense, relative odom, update) collapse into one."""
        if self._fused is None:
            self._fused = jax.jit(self._sense_update_impl)
        return self._fused(
            self.codebook, self.tdn.variables, self.tcn.variables,
            state, key, image, meas,
            jnp.asarray(prev_idx, jnp.int32), jnp.asarray(idx, jnp.int32),
            gt_pose, jnp.asarray(do_cluster), jnp.asarray(do_measurement),
            self._drift_thresh_arr,
        )

    def _sense_update_impl(
        self, codebook, tdn_vars, tcn_vars, state, key, image, meas,
        prev_idx, idx, gt_pose, do_cluster, do_measurement, drift_thresh,
    ):
        from midastouch_tpu.ops import se3

        k_sense, k_update = jax.random.split(key)
        code, angle, hm, mask = self._sense_impl(
            tdn_vars, tcn_vars, image, k_sense
        )
        rel = se3.tf_inverse(meas[prev_idx]) @ meas[idx]
        odom_q = se3.matrix_to_quat(rel[:3, :3])
        odom_t = rel[:3, 3]
        state, stats = self._update_impl(
            codebook, state, k_update, code, odom_q, odom_t, gt_pose,
            do_cluster, do_measurement, drift_thresh, angle,
        )
        return state, stats, code, hm, mask

    # -- init (filter.py:158-160) ------------------------------------------------

    def initialize(
        self, key: jax.Array, gt_pose: jax.Array, num_particles: int
    ) -> ParticleState:
        state = self.pf.init_filter(key, gt_pose, num_particles)
        q, t, _, _, _, _ = self.codebook.se3_nn(
            state.q_rows, state.t_rows, backend=self.pf.params.backend
        )
        return state._replace(q=q.T, t=t.T)

    # -- fused measurement+motion update (filter.py:150-199) ----------------------

    def _update_impl(
        self,
        codebook: Codebook,
        state: ParticleState,
        key: jax.Array,
        code: jax.Array,
        odom_q: jax.Array,
        odom_t: jax.Array,
        gt_pose: jax.Array,
        do_cluster: jax.Array,
        do_measurement: jax.Array,
        drift_thresh: jax.Array | None = None,
        live_angle: jax.Array | None = None,
    ):
        pf = self.pf
        k_motion, k_resample = jax.random.split(key)

        # motion
        state = pf.motion_model(k_motion, state, odom_q, odom_t)

        # RMSE before the measurement update (reference order, :164-166)
        rmse_t, rmse_r = pf.rmse(state, gt_pose)

        # measurement: codebook NN + cosine weighting. The per-entry
        # similarity is one matvec over the whole codebook; each particle
        # then gathers ONE scalar instead of its NN's 256-d embedding row
        # (reference dataflow, particle_filter.py:449-469).
        idx = codebook.se3_nn_idx_cm(
            state.q, state.t, backend=pf.params.backend,
            ann_index=self.ann_index,
            top_cells=self.ann_top_cells,
            ann_window=self.ann_window,
            ann_probes=self.ann_probes,
        )
        sims = codebook.similarity(code)
        # ONE packed row gather serves the weighting (col 0), the drift
        # gate (cols 1:4) and, when yaw scoring is on, the entry's
        # canonical angle + quaternion (cols 4:9): TPU row gathers pay per
        # row, not per byte, so packing halves/quarters the gather traffic
        # vs separate gathers.
        cols = [sims[:, None], codebook.t]
        if self.yaw_on:
            cols += [codebook.canon_angle[:, None], codebook.q]
        packed = jnp.concatenate(cols, axis=1)
        g = packed[idx]  # (N, 4) or (N, 9)
        sim_p = g[:, 0]
        if self.yaw_on and live_angle is not None:
            from midastouch_tpu.ops import se3

            # relative yaw of each particle vs its codebook NN: for poses
            # on the contact manifold the gel z-axes align, so the
            # relative rotation r = q_nn^-1 * q_p is ~a pure yaw and
            # yaw = 2*atan2(r_z, r_w). The entry's patch, rotated by that
            # yaw, should present the live canonical angle:
            #   err = wrap(live - entry_angle - yaw_sign * yaw)
            q_e = g[:, 5:9].T  # (4, N)
            q_e_conj = jnp.concatenate([q_e[:1], -q_e[1:]], axis=0)
            r = se3.quat_mul_cm(q_e_conj, state.q)
            yaw = 2.0 * jnp.arctan2(r[3], r[0])
            err = live_angle - g[:, 4] - self.yaw_sign * yaw
            # von-Mises log-bonus, tempered like the similarity so the
            # softmax sees kappa directly as a concentration
            bonus = self.yaw_kappa * (jnp.cos(err) - 1.0)
            sim_p = sim_p + self.pf.params.softmax_temp * bonus
        w = pf.weights_from_similarity(
            sim_p, state.alive, softmax=self.softmax
        )
        w = jnp.where(do_measurement, w, state.alive_f)
        state = state._replace(weights=w)

        # drift pruning + all-drifted re-projection (:176-179). The NN pose
        # gathers only happen on the (rare) all-drifted branch.
        if self.drift_from_codebook:
            d = state.t - g[:, 1:4].T  # (3, N), one relayout of the gather
            dist = jnp.sqrt(jnp.sum(d * d, axis=0))
            # thresh arrives as a TRACED scalar so recalibrating it (every
            # FilterStep init measures it from the codebook) never changes
            # the compiled program — as a baked constant it invalidated the
            # compile cache of the whole fused update/replay on every run
            thresh = (
                drift_thresh if drift_thresh is not None
                else self._drift_thresh_arr
            )
            valid = dist <= thresh
            state = state._replace(
                weights=state.weights * valid.astype(state.weights.dtype)
            )
            drifted = ~jnp.any(valid & state.alive)
        else:
            state, drifted = pf.remove_invalid_particles(state)
        q, t = jax.lax.cond(
            drifted,
            lambda: (codebook.q[idx].T, codebook.t[idx].T),
            lambda: (state.q, state.t),
        )
        state = state._replace(q=q, t=t)

        # clustering every N steps (:182-183)
        state = jax.lax.cond(
            do_cluster, pf.cluster_particles, lambda s: s, state
        )
        cluster_poses, cluster_stds, cluster_valid = pf.get_cluster_centers(state)
        mean_std = pf.mean_cluster_std(cluster_stds, cluster_valid)

        # anneal + resample (:189-190)
        state = pf.annealing(state, mean_std, floor=self.floor)
        state = pf.resampler(k_resample, state)

        stats = StepStats(
            rmse_t=rmse_t,
            rmse_r=rmse_r,
            mean_std=mean_std,
            n_active=state.n_active,
            n_clusters=jnp.sum(cluster_valid.astype(jnp.int32)),
            cluster_poses=cluster_poses,
            cluster_stds=cluster_stds,
            cluster_valid=cluster_valid,
            drifted=drifted,
        )
        return state, stats

    def update(
        self,
        state: ParticleState,
        key: jax.Array,
        code: jax.Array,
        odom_q: jax.Array,
        odom_t: jax.Array,
        gt_pose: jax.Array,
        do_cluster: bool = False,
        do_measurement: bool = True,
        live_angle=None,
    ):
        # None disables yaw scoring for this call (a separate trace: None
        # is an empty pytree, so jit specializes on its presence)
        angle = (
            None if live_angle is None
            else jnp.asarray(live_angle, jnp.float32)
        )
        return self._update(
            self.codebook, state, key, code, odom_q, odom_t, gt_pose,
            jnp.asarray(do_cluster), jnp.asarray(do_measurement),
            self._drift_thresh_arr, angle,
        )

    # -- whole-log replay as one device program ---------------------------------

    def replay(
        self,
        state: ParticleState,
        key: jax.Array,
        odom_q_all: jax.Array,  # (T, 4)
        odom_t_all: jax.Array,  # (T, 3)
        gt_all: jax.Array,  # (T, 4, 4)
        images: jax.Array | None = None,  # (T, H, W, 3) uint8 -> sense inside
        codes: jax.Array | None = None,  # (T, E) precomputed tactile codes
        angles: jax.Array | None = None,  # (T,) canonical angles (with codes)
        cluster_every: int = 50,
        measure_every: int = 1,
    ):
        """Run the full sense-update loop over a whole log in ONE jit via
        lax.scan — no per-frame host dispatches at all. The reference
        cannot express this (its loop crosses the CPU five times per
        frame); this is the offline-replay / benchmark fast path. Returns
        (final state, per-frame (rmse_t, rmse_r, n_active))."""
        if (images is None) == (codes is None):
            raise ValueError("pass exactly one of images/codes")
        if self._replay is None:
            self._replay = jax.jit(
                self._replay_impl,
                static_argnames=("do_sense", "cluster_every", "measure_every"),
            )
        sense_inputs = images if images is not None else codes
        return self._replay(
            self.codebook,
            self.tdn.variables if images is not None else None,
            self.tcn.variables if images is not None else None,
            state, key, odom_q_all, odom_t_all, gt_all, sense_inputs,
            None if images is not None else angles,
            self._drift_thresh_arr,
            do_sense=images is not None,
            cluster_every=cluster_every, measure_every=measure_every,
        )

    def _replay_impl(
        self, codebook, tdn_vars, tcn_vars, state, key,
        odom_q_all, odom_t_all, gt_all, sense_inputs, angles_all,
        drift_thresh, do_sense, cluster_every, measure_every,
    ):
        def body(carry, xs):
            state, key, i = carry
            inp, oq, ot, gt, ang = xs
            key, ks, ku = jax.random.split(key, 3)
            if do_sense:
                code, ang, _, _ = self._sense_impl(tdn_vars, tcn_vars, inp, ks)
            else:
                code = inp
            state, stats = self._update_impl(
                codebook, state, ku, code, oq, ot, gt,
                i % cluster_every == 0,
                i % measure_every == 0,
                drift_thresh,
                ang,
            )
            return (state, key, i + 1), (
                stats.rmse_t, stats.rmse_r, stats.n_active
            )

        T = odom_q_all.shape[0]
        if angles_all is None and not do_sense:
            # no angles supplied with precomputed codes: yaw scoring off
            # for this replay (None propagates into _update_impl)
            def body_no_angle(carry, xs):
                return body(carry, xs[:-1] + (None,))

            (state, _, _), seq = jax.lax.scan(
                body_no_angle,
                (state, key, jnp.int32(0)),
                (sense_inputs, odom_q_all, odom_t_all, gt_all,
                 jnp.zeros((T,), jnp.float32)),
            )
            return state, seq
        ang_in = (
            jnp.zeros((T,), jnp.float32) if angles_all is None else angles_all
        )
        (state, _, _), seq = jax.lax.scan(
            body,
            (state, key, jnp.int32(0)),
            (sense_inputs, odom_q_all, odom_t_all, gt_all, ang_in),
        )
        return state, seq

    # -- heatmap weights for viz (filter.py:213-215) ------------------------------

    def heatmap_weights(self, code: jax.Array) -> jax.Array:
        from midastouch_tpu.ops import knn

        return knn.cosine_similarity(code, self.codebook.embeddings)
