"""SE(3) / SO(3) Lie-group math, pure jax.numpy, vmap/jit-friendly.

Rebuilds the capabilities of the reference's `midastouch/modules/pose.py`
(which delegates to theseus / scipy / pytorch3d) as closed-form batched JAX:

  * quaternion algebra (wxyz convention, like theseus)            pose.py:26-98
  * SO(3)/SE(3) exp & log maps (Rodrigues, V-matrix)              pose.py:19-23,101-109
  * Markley weighted quaternion averaging                          pose.py:112-147
  * Euler-angle kernels (pytorch3d-convention intrinsic compose)   pose.py:215-269
  * pose-from-vertex-normal with random shear cone                 pose.py:375-455
  * angle wrapping / rotation-angle metrics                        pose.py:178-208
  * particle RMSE metric                                   particle_filter.py:472-496

All functions operate on float32 arrays with leading batch dims and contain
no data-dependent Python control flow, so they trace once under jit and
vmap/shard cleanly.

Conventions:
  * quaternions are [w, x, y, z] ("wxyz"); helpers convert to/from xyzw
  * 7-vec poses are [x, y, z, qw, qx, qy, qz] (matching the reference's
    theseus-facing layout, pose.py:285-289)
  * SE(3) tangents are [v (3), w (3)] (translation first, like theseus)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8

# Small fixed-size (3x3 / 4x4) matrix products must not be demoted to bf16 on
# the MXU — pin them to full f32 precision. Negligible cost at these shapes.
_HI = jax.lax.Precision.HIGHEST


def _mm(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.matmul(a, b, precision=_HI)


# ---------------------------------------------------------------------------
# quaternion algebra (wxyz)
# ---------------------------------------------------------------------------


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product, wxyz, broadcasting over leading dims."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (...,3) by quaternions q (...,4), wxyz."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """(...,4) wxyz -> (...,3,3)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """(...,3,3) -> (...,4) wxyz. Branchless Shepperd: build the candidate
    quaternion from each of the four diagonal pivots and select the one with
    the largest pivot — numerically safe for any rotation, vmap-friendly."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # candidate squared magnitudes (all >= 0 up to fp error)
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    # four constructions of (w,x,y,z), each stable when its pivot dominates
    def _safe(x):
        return jnp.maximum(x, _EPS)

    sw = jnp.sqrt(_safe(qw2))
    cand_w = jnp.stack([sw * sw, m21 - m12, m02 - m20, m10 - m01], axis=-1) / (
        2.0 * sw[..., None]
    )
    sx = jnp.sqrt(_safe(qx2))
    cand_x = jnp.stack([m21 - m12, sx * sx, m01 + m10, m02 + m20], axis=-1) / (
        2.0 * sx[..., None]
    )
    sy = jnp.sqrt(_safe(qy2))
    cand_y = jnp.stack([m02 - m20, m01 + m10, sy * sy, m12 + m21], axis=-1) / (
        2.0 * sy[..., None]
    )
    sz = jnp.sqrt(_safe(qz2))
    cand_z = jnp.stack([m10 - m01, m02 + m20, m12 + m21, sz * sz], axis=-1) / (
        2.0 * sz[..., None]
    )

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    # canonical sign: w >= 0
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def quat_log(q: jax.Array) -> jax.Array:
    """SO(3) log from unit quaternion (wxyz) -> rotation vector (...,3)."""
    q = jnp.where(q[..., :1] < 0, -q, q)  # shortest arc
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vn, w)
    scale = jnp.where(vn > _EPS, angle / jnp.maximum(vn, _EPS), 2.0 / jnp.maximum(w, _EPS))
    return v * scale


def quat_exp(w: jax.Array) -> jax.Array:
    """Rotation vector (...,3) -> unit quaternion (...,4) wxyz."""
    angle = jnp.linalg.norm(w, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sinc-safe
    k = jnp.where(angle > _EPS, jnp.sin(half) / jnp.maximum(angle, _EPS), 0.5)
    return jnp.concatenate([jnp.cos(half), w * k], axis=-1)


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Unit axis (...,3) and angle (...,) -> quaternion wxyz."""
    half = 0.5 * angle[..., None]
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


# ---------------------------------------------------------------------------
# SO(3) / SE(3) exp & log (matrix forms)
# ---------------------------------------------------------------------------


def skew(v: jax.Array) -> jax.Array:
    """(...,3) -> (...,3,3) skew-symmetric (reference: pose.py:357-372)."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def so3_exp(w: jax.Array) -> jax.Array:
    """Rotation vector -> rotation matrix via Rodrigues (sinc-safe)."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]  # (...,1,1)
    K = skew(w)
    KK = _mm(K, K)
    s = jnp.where(theta > _EPS, jnp.sin(theta) / jnp.maximum(theta, _EPS), 1.0)
    c = jnp.where(
        theta > _EPS, (1.0 - jnp.cos(theta)) / jnp.maximum(theta * theta, _EPS), 0.5
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + s * K + c * KK


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix -> rotation vector (via quaternion; robust near pi)."""
    return quat_log(matrix_to_quat(R))


def _so3_left_jacobian(w: jax.Array) -> jax.Array:
    """V(w) such that se3_exp translation = V @ v."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]
    K = skew(w)
    KK = _mm(K, K)
    t2 = theta * theta
    a = jnp.where(theta > _EPS, (1.0 - jnp.cos(theta)) / jnp.maximum(t2, _EPS), 0.5)
    b = jnp.where(
        theta > _EPS,
        (theta - jnp.sin(theta)) / jnp.maximum(t2 * theta, _EPS),
        1.0 / 6.0,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a * K + b * KK


def _so3_left_jacobian_inv(w: jax.Array) -> jax.Array:
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]
    K = skew(w)
    KK = _mm(K, K)
    half = 0.5 * theta
    # cot expansion safe at 0
    cot_term = jnp.where(
        theta > 1e-4,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS))
        / jnp.maximum(theta * theta, _EPS),
        1.0 / 12.0,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye - 0.5 * K + cot_term * KK


def se3_exp(xi: jax.Array) -> jax.Array:
    """Tangent [v,w] (...,6) -> (...,4,4) homogeneous transform."""
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t = (_mm(_so3_left_jacobian(w), v[..., None]))[..., 0]
    return make_tf(R, t)


def se3_log(T: jax.Array) -> jax.Array:
    """(...,4,4) -> tangent [v,w] (...,6)."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    w = so3_log(R)
    v = (_mm(_so3_left_jacobian_inv(w), t[..., None]))[..., 0]
    return jnp.concatenate([v, w], axis=-1)


# ---------------------------------------------------------------------------
# homogeneous-transform helpers
# ---------------------------------------------------------------------------


def make_tf(R: jax.Array, t: jax.Array) -> jax.Array:
    """(...,3,3), (...,3) -> (...,4,4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def tf_inverse(T: jax.Array) -> jax.Array:
    """Closed-form rigid-transform inverse (no linear solve)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_tf(Rt, -(_mm(Rt, t[..., None]))[..., 0])


def tf_to_xyzquat(T: jax.Array) -> jax.Array:
    """(...,4,4) -> (...,7) [x y z qw qx qy qz] (reference pose.py:26-34)."""
    q = matrix_to_quat(T[..., :3, :3])
    return jnp.concatenate([T[..., :3, 3], q], axis=-1)


def xyzquat_to_tf(p: jax.Array) -> jax.Array:
    """(...,7) [x y z qw qx qy qz] -> (...,4,4) (reference pose.py:51-62)."""
    q = quat_normalize(p[..., 3:])
    return make_tf(quat_to_matrix(q), p[..., :3])


def xyzw_to_wxyz(p: jax.Array) -> jax.Array:
    """Quat layout switch, accepts (...,7) pose or (...,4) quat (pose.py:81-88)."""
    if p.shape[-1] == 7:
        return p[..., jnp.array([0, 1, 2, 6, 3, 4, 5])]
    return p[..., jnp.array([3, 0, 1, 2])]


def wxyz_to_xyzw(p: jax.Array) -> jax.Array:
    """Inverse layout switch (pose.py:91-98)."""
    if p.shape[-1] == 7:
        return p[..., jnp.array([0, 1, 2, 4, 5, 6, 3])]
    return p[..., jnp.array([1, 2, 3, 0])]


# ---------------------------------------------------------------------------
# Euler angles (pytorch3d-style intrinsic composition, pose.py:215-269)
# ---------------------------------------------------------------------------

_AXES = {"X": 0, "Y": 1, "Z": 2}


def _axis_rotation(axis: str, angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, c, -s, zero, s, c)
    elif axis == "Y":
        flat = (c, zero, s, zero, one, zero, -s, zero, c)
    elif axis == "Z":
        flat = (c, -s, zero, s, c, zero, zero, zero, one)
    else:
        raise ValueError(f"invalid axis {axis}")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_to_matrix(angles: jax.Array, convention: str = "ZYX") -> jax.Array:
    """Euler angles in radians (...,3) -> rotation matrices (...,3,3).

    R = R_c0(a0) @ R_c1(a1) @ R_c2(a2), matching the pytorch3d semantics the
    reference vendors for its motion-noise model (pose.py:215-240).
    """
    if len(convention) != 3 or any(c not in _AXES for c in convention):
        raise ValueError(f"invalid convention {convention}")
    m0 = _axis_rotation(convention[0], angles[..., 0])
    m1 = _axis_rotation(convention[1], angles[..., 1])
    m2 = _axis_rotation(convention[2], angles[..., 2])
    return _mm(_mm(m0, m1), m2)


def euler_to_quat(angles: jax.Array, convention: str = "ZYX") -> jax.Array:
    """Euler angles (radians, (...,3)) -> quaternion (wxyz), same intrinsic
    composition as euler_to_matrix but as three axis-quaternion products —
    pure elementwise math, no 3x3 matrices (the hot path for motion noise)."""
    if len(convention) != 3 or any(c not in _AXES for c in convention):
        raise ValueError(f"invalid convention {convention}")
    q = None
    for i, c in enumerate(convention):
        half = 0.5 * angles[..., i : i + 1]
        cos, sin = jnp.cos(half), jnp.sin(half)
        zero = jnp.zeros_like(cos)
        parts = {"X": (sin, zero, zero), "Y": (zero, sin, zero), "Z": (zero, zero, sin)}[c]
        qi = jnp.concatenate([cos, *parts], axis=-1)
        q = qi if q is None else quat_mul(q, qi)
    return q


def wrap_angles_deg(a: jax.Array) -> jax.Array:
    """Wrap degrees to (-180, 180] (reference pose.py:178-189)."""
    out = jnp.mod(a + 180.0, 360.0) - 180.0
    return jnp.where(out == -180.0, 180.0, out)


def rotation_angle_deg(R: jax.Array) -> jax.Array:
    """Geodesic rotation angle in degrees from trace (reference pose.py:201-208)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.degrees(jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)))


# ---------------------------------------------------------------------------
# weighted pose averaging
# ---------------------------------------------------------------------------


def quat_weighted_average(q: jax.Array, w: jax.Array) -> jax.Array:
    """Markley et al. weighted quaternion mean via the 4x4 outer-product
    eigenproblem (reference pose.py:112-147). q: (N,4) wxyz, w: (N,)."""
    q = jnp.where(q[..., :1] < 0, -q, q)  # hemisphere align
    A = jnp.einsum("n,ni,nj->ij", w, q, q, precision=_HI) / jnp.maximum(jnp.sum(w), _EPS)
    _, vecs = jnp.linalg.eigh(A)  # ascending eigenvalues
    avg = vecs[:, -1]
    avg = jnp.where(avg[0] < 0, -avg, avg)
    return avg


def pose_average_quat(T: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted SE(3) mean: Markley quat mean + weighted translation mean
    (reference xyz_quat_averaged, pose.py:112-147). T: (N,4,4), w: (N,)."""
    wsum = jnp.maximum(jnp.sum(w), _EPS)
    t = jnp.sum(T[:, :3, 3] * w[:, None], axis=0) / wsum
    q = quat_weighted_average(matrix_to_quat(T[:, :3, :3]), w)
    return make_tf(quat_to_matrix(q), t)


def pose_average_logmap(T: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted SE(3) mean in the Lie algebra (reference log_map_averaged,
    pose.py:101-109)."""
    xi = se3_log(T)
    avg = jnp.sum(xi * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), _EPS)
    return se3_exp(avg)


# ---------------------------------------------------------------------------
# pose synthesis from surface samples
# ---------------------------------------------------------------------------


def pose_from_vertex_normal(
    vertices: jax.Array,
    normals: jax.Array,
    shear_mag: float | jax.Array,
    delta: jax.Array,
    key: jax.Array,
) -> jax.Array:
    """Sensor pose from surface point + outward normal with a random shear
    cone (reference pose.py:375-455). Fully batched, jit-safe.

    The sensor z-axis is drawn uniformly from a cone of half-angle
    `shear_mag` (radians) around +z, rotated so the cone axis matches the
    normal, then spun about the normal by `delta` (N,) radians.
    """
    n = vertices.shape[0]
    k1, k2 = jax.random.split(key)
    cos_shear = jax.random.uniform(
        k1, (n,), minval=jnp.cos(shear_mag), maxval=1.0, dtype=vertices.dtype
    )
    phi = jax.random.uniform(
        k2, (n,), minval=0.0, maxval=2.0 * jnp.pi, dtype=vertices.dtype
    )
    sin_shear = jnp.sqrt(jnp.maximum(1.0 - cos_shear**2, 0.0))
    shear_vec = jnp.stack(
        [sin_shear * jnp.cos(phi), sin_shear * jnp.sin(phi), cos_shear], axis=-1
    )

    axis = jnp.cross(shear_vec, normals)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    theta = jnp.arccos(
        jnp.clip(jnp.sum(shear_vec * normals, axis=-1), -1.0, 1.0)
    )
    rot = so3_exp(axis * theta[:, None])

    # degenerate normals near +/- z: drop the shear and use the closed form
    # (reference pose.py:414-441)
    up = normals[:, 2] > 0.9
    down = normals[:, 2] < -0.9
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rot.dtype), rot.shape)
    flip = jnp.broadcast_to(
        jnp.diag(jnp.array([1.0, -1.0, -1.0], dtype=rot.dtype)), rot.shape
    )
    rot = jnp.where(up[:, None, None], eye, rot)
    rot = jnp.where(down[:, None, None], flip, rot)

    rot_delta = so3_exp(normals * delta[:, None])
    return make_tf(_mm(rot_delta, rot), vertices)


def transform_points(T: jax.Array, points: jax.Array) -> jax.Array:
    """Rigid-transform points (reference transform_pc, pose.py:150-175).
    T: (4,4) or (...,4,4); points: (...,N,3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return points @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def particle_rmse_quat(
    q: jax.Array,
    t: jax.Array,
    gt_q: jax.Array,
    gt_t: jax.Array,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """`particle_rmse` on quaternion poses without materializing (N,3,3)
    rotation matrices: the geodesic angle between unit quaternions is
    2*acos(|<q1,q2>|) — one (N,4) dot instead of a batched 3x3 matmul
    chain (the fused filter step calls this every frame at N=50k+)."""
    if mask is None:
        mask = jnp.ones(t.shape[0], dtype=t.dtype)
    msum = jnp.maximum(jnp.sum(mask), 1.0)
    e_t = jnp.linalg.norm(gt_t - t, axis=-1)
    dot = jnp.clip(jnp.abs(jnp.sum(q * gt_q[None, :], axis=-1)), 0.0, 1.0)
    ang = jnp.degrees(2.0 * jnp.arccos(dot))  # [0, 180], pre-wrapped
    rmse_t = jnp.sqrt(jnp.sum(mask * e_t**2) / msum)
    rmse_r = jnp.sqrt(jnp.sum(mask * ang**2) / msum)
    return rmse_t, rmse_r


def particle_rmse(
    poses_R: jax.Array,
    poses_t: jax.Array,
    gt_pose: jax.Array,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Masked RMSE of [translation (m), rotation (deg)] of particles vs a GT
    pose (reference particle_filter.py:472-496). poses_R: (N,3,3),
    poses_t: (N,3), gt_pose: (4,4), mask: optional (N,) validity weights."""
    if mask is None:
        mask = jnp.ones(poses_t.shape[0], dtype=poses_t.dtype)
    msum = jnp.maximum(jnp.sum(mask), 1.0)
    e_t = jnp.linalg.norm(gt_pose[:3, 3] - poses_t, axis=-1)
    R_diff = _mm(gt_pose[:3, :3], jnp.swapaxes(poses_R, -1, -2))
    ang = wrap_angles_deg(jnp.nan_to_num(rotation_angle_deg(R_diff)))
    rmse_t = jnp.sqrt(jnp.sum(mask * e_t**2) / msum)
    rmse_r = jnp.sqrt(jnp.sum(mask * ang**2) / msum)
    return rmse_t, rmse_r


# ---------------------------------------------------------------------------
# codebook query keys
# ---------------------------------------------------------------------------


def se3_key(q: jax.Array, t: jax.Array, w: float = 0.01) -> jax.Array:
    """6-D codebook key: [(1-w)*xyz, w*so3_log(R)] (reference R3_SE3,
    tactile_tree.py:73-77). q: (...,4) wxyz, t: (...,3)."""
    return jnp.concatenate([(1.0 - w) * t, w * quat_log(q)], axis=-1)


# ---------------------------------------------------------------------------
# channel-major kernels: arrays are (C, N) with the big particle axis N on
# the TPU's 128-lane minor dimension. The row-major (N, C) layout put the
# tiny C=3/4 channel dim on lanes, so every elementwise stage of the filter
# ran at ~3% lane utilization (~0.5 ms each at N=50k, PROFILE_50k.json);
# these kernels are the same closed-form math over (N,)-wide component rows.
# ---------------------------------------------------------------------------


def quat_normalize_cm(q: jax.Array) -> jax.Array:
    """(4, N) -> (4, N), unit-norm columns."""
    n = jnp.sqrt(jnp.sum(q * q, axis=0, keepdims=True))
    return q / jnp.maximum(n, _EPS)


def quat_mul_cm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product on (4, N) (or (4, 1) broadcast), wxyz rows."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=0,
    )


def quat_rotate_cm(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (3, N) by quaternions q (4, N) (wxyz rows)."""
    w, ux, uy, uz = q
    vx, vy, vz = v
    uvx = uy * vz - uz * vy
    uvy = uz * vx - ux * vz
    uvz = ux * vy - uy * vx
    uuvx = uy * uvz - uz * uvy
    uuvy = uz * uvx - ux * uvz
    uuvz = ux * uvy - uy * uvx
    return jnp.stack(
        [
            vx + 2.0 * (w * uvx + uuvx),
            vy + 2.0 * (w * uvy + uuvy),
            vz + 2.0 * (w * uvz + uuvz),
        ],
        axis=0,
    )


def quat_log_cm(q: jax.Array) -> jax.Array:
    """(4, N) unit quaternions -> (3, N) rotation vectors."""
    q = jnp.where(q[0:1] < 0, -q, q)  # shortest arc
    w = jnp.clip(q[0], -1.0, 1.0)
    v = q[1:]
    vn = jnp.sqrt(jnp.sum(v * v, axis=0))
    angle = 2.0 * jnp.arctan2(vn, w)
    scale = jnp.where(
        vn > _EPS, angle / jnp.maximum(vn, _EPS), 2.0 / jnp.maximum(w, _EPS)
    )
    return v * scale[None, :]


def euler_to_quat_cm(angles: jax.Array, convention: str = "ZYX") -> jax.Array:
    """Euler angles (radians, (3, N)) -> quaternions (4, N) wxyz; same
    intrinsic composition as euler_to_quat."""
    if len(convention) != 3 or any(c not in _AXES for c in convention):
        raise ValueError(f"invalid convention {convention}")
    q = None
    for i, c in enumerate(convention):
        half = 0.5 * angles[i]
        cos, sin = jnp.cos(half), jnp.sin(half)
        zero = jnp.zeros_like(cos)
        parts = {
            "X": (sin, zero, zero),
            "Y": (zero, sin, zero),
            "Z": (zero, zero, sin),
        }[c]
        qi = jnp.stack([cos, *parts], axis=0)
        q = qi if q is None else quat_mul_cm(q, qi)
    return q


def se3_key_cm(q: jax.Array, t: jax.Array, w: float = 0.01) -> jax.Array:
    """Channel-major codebook key: (4, N), (3, N) -> (6, N)."""
    return jnp.concatenate([(1.0 - w) * t, w * quat_log_cm(q)], axis=0)


def particle_rmse_quat_cm(
    q: jax.Array,
    t: jax.Array,
    gt_q: jax.Array,
    gt_t: jax.Array,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """particle_rmse_quat over channel-major state: q (4, N), t (3, N),
    gt_q (4,), gt_t (3,), mask (N,)."""
    if mask is None:
        mask = jnp.ones(t.shape[1], dtype=t.dtype)
    msum = jnp.maximum(jnp.sum(mask), 1.0)
    d = t - gt_t[:, None]
    e2 = jnp.sum(d * d, axis=0)
    dot = jnp.clip(jnp.abs(jnp.sum(q * gt_q[:, None], axis=0)), 0.0, 1.0)
    ang = jnp.degrees(2.0 * jnp.arccos(dot))  # [0, 180], pre-wrapped
    rmse_t = jnp.sqrt(jnp.sum(mask * e2) / msum)
    rmse_r = jnp.sqrt(jnp.sum(mask * ang**2) / msum)
    return rmse_t, rmse_r


def se3_key_from_tf(T: jax.Array, w: float = 0.01) -> jax.Array:
    return jnp.concatenate(
        [(1.0 - w) * T[..., :3, 3], w * so3_log(T[..., :3, :3])], axis=-1
    )
