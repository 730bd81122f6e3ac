"""Golden tests for midastouch_tpu.ops.se3 against scipy.spatial.transform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from midastouch_tpu.ops import se3

ATOL = 1e-5


def _rand_rotmats(rng, n):
    return R.random(n, random_state=np.random.RandomState(0)).as_matrix().astype(
        np.float32
    )


def test_quat_matrix_roundtrip(rng):
    Rm = _rand_rotmats(rng, 256)
    q = se3.matrix_to_quat(jnp.asarray(Rm))
    Rm2 = se3.quat_to_matrix(q)
    np.testing.assert_allclose(np.asarray(Rm2), Rm, atol=1e-5)


def test_matrix_to_quat_vs_scipy(rng):
    Rm = _rand_rotmats(rng, 256)
    q_ours = np.asarray(se3.matrix_to_quat(jnp.asarray(Rm)))  # wxyz
    q_scipy = R.from_matrix(Rm).as_quat()  # xyzw
    q_scipy = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=1)
    q_scipy[q_scipy[:, 0] < 0] *= -1
    np.testing.assert_allclose(np.abs(q_ours), np.abs(q_scipy), atol=1e-5)
    # sign-canonical equality
    np.testing.assert_allclose(q_ours, q_scipy, atol=1e-5)


def test_matrix_to_quat_edge_cases():
    # identity, and 180-degree rotations about each axis (trace = -1 pivots)
    mats = [np.eye(3)]
    for axis in np.eye(3):
        mats.append(R.from_rotvec(np.pi * axis).as_matrix())
    mats = np.stack(mats).astype(np.float32)
    q = np.asarray(se3.matrix_to_quat(jnp.asarray(mats)))
    Rm2 = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(Rm2, mats, atol=1e-5)


def test_quat_mul_rotate(rng):
    a = R.random(64, random_state=1)
    b = R.random(64, random_state=2)
    qa = np.roll(a.as_quat(), 1, axis=1).astype(np.float32)  # -> wxyz
    qb = np.roll(b.as_quat(), 1, axis=1).astype(np.float32)
    q_ours = np.asarray(se3.quat_mul(jnp.asarray(qa), jnp.asarray(qb)))
    q_ref = np.roll((a * b).as_quat(), 1, axis=1)
    # compare up to sign
    sign = np.sign(np.sum(q_ours * q_ref, axis=1, keepdims=True))
    np.testing.assert_allclose(q_ours, sign * q_ref, atol=1e-5)

    v = rng.normal(size=(64, 3)).astype(np.float32)
    v_ours = np.asarray(se3.quat_rotate(jnp.asarray(qa), jnp.asarray(v)))
    np.testing.assert_allclose(v_ours, a.apply(v), atol=1e-4)


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(size=(128, 3)).astype(np.float32)
    Rm = se3.so3_exp(jnp.asarray(w))
    np.testing.assert_allclose(
        np.asarray(Rm), R.from_rotvec(w).as_matrix(), atol=1e-5
    )
    w2 = np.asarray(se3.so3_log(Rm))
    # rotvec is unique for |w| < pi
    small = np.linalg.norm(w, axis=1) < np.pi - 0.1
    np.testing.assert_allclose(w2[small], w[small], atol=1e-4)


def test_so3_exp_small_angle():
    w = jnp.array([[0.0, 0.0, 0.0], [1e-9, 0.0, 0.0]])
    Rm = np.asarray(se3.so3_exp(w))
    np.testing.assert_allclose(Rm, np.stack([np.eye(3)] * 2), atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(64, 6)).astype(np.float32) * 0.5
    T = se3.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(se3.se3_log(T))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)
    # bottom row
    np.testing.assert_allclose(
        np.asarray(T)[:, 3], np.tile([0, 0, 0, 1], (64, 1)), atol=0
    )


def test_tf_inverse(rng):
    Rm = _rand_rotmats(rng, 32)
    t = rng.normal(size=(32, 3)).astype(np.float32)
    T = se3.make_tf(jnp.asarray(Rm), jnp.asarray(t))
    TinvT = np.asarray(se3.tf_inverse(T) @ T)
    np.testing.assert_allclose(TinvT, np.tile(np.eye(4), (32, 1, 1)), atol=1e-5)


def test_xyzquat_roundtrip(rng):
    Rm = _rand_rotmats(rng, 32)
    t = rng.normal(size=(32, 3)).astype(np.float32)
    T = se3.make_tf(jnp.asarray(Rm), jnp.asarray(t))
    p = se3.tf_to_xyzquat(T)
    T2 = se3.xyzquat_to_tf(p)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-5)


def test_layout_switches():
    p = jnp.arange(7.0)[None]
    np.testing.assert_array_equal(
        np.asarray(se3.wxyz_to_xyzw(se3.xyzw_to_wxyz(p))), np.asarray(p)
    )
    q = jnp.arange(4.0)[None]
    np.testing.assert_array_equal(
        np.asarray(se3.xyzw_to_wxyz(se3.wxyz_to_xyzw(q))), np.asarray(q)
    )


def test_euler_to_matrix_vs_scipy(rng):
    ang = rng.uniform(-np.pi, np.pi, size=(64, 3)).astype(np.float32)
    ours = np.asarray(se3.euler_to_matrix(jnp.asarray(ang), "ZYX"))
    # pytorch3d intrinsic "ZYX" == scipy intrinsic (capital) "ZYX"
    ref = R.from_euler("ZYX", ang).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    ours_xyz = np.asarray(se3.euler_to_matrix(jnp.asarray(ang), "XYZ"))
    ref_xyz = R.from_euler("XYZ", ang).as_matrix()
    np.testing.assert_allclose(ours_xyz, ref_xyz, atol=1e-5)


def test_wrap_angles():
    a = jnp.array([0.0, 179.0, 181.0, -181.0, 360.0, 540.0])
    out = np.asarray(se3.wrap_angles_deg(a))
    np.testing.assert_allclose(out, [0, 179, -179, 179, 0, 180], atol=1e-4)


def test_rotation_angle(rng):
    w = rng.normal(size=(32, 3))
    w = w / np.linalg.norm(w, axis=1, keepdims=True)
    angles = rng.uniform(0.01, np.pi - 0.01, size=(32, 1))
    Rm = R.from_rotvec(w * angles).as_matrix().astype(np.float32)
    out = np.asarray(se3.rotation_angle_deg(jnp.asarray(Rm)))
    np.testing.assert_allclose(out, np.degrees(angles[:, 0]), atol=1e-2)


def test_quat_weighted_average_matches_single_mode(rng):
    # all particles identical -> average is that quat
    q0 = R.random(1, random_state=3).as_quat()[0]
    q0 = np.roll(q0, 1).astype(np.float32)
    q = np.tile(q0, (100, 1))
    w = rng.uniform(0.1, 1.0, size=100).astype(np.float32)
    avg = np.asarray(se3.quat_weighted_average(jnp.asarray(q), jnp.asarray(w)))
    sign = np.sign(np.dot(avg, q0))
    np.testing.assert_allclose(avg, sign * q0, atol=1e-5)


def test_quat_weighted_average_antipodal(rng):
    # q and -q represent the same rotation: average must be stable
    q0 = np.roll(R.random(1, random_state=4).as_quat()[0], 1).astype(np.float32)
    q = np.stack([q0, -q0] * 50)
    w = np.ones(100, dtype=np.float32)
    avg = np.asarray(se3.quat_weighted_average(jnp.asarray(q), jnp.asarray(w)))
    assert abs(abs(np.dot(avg, q0)) - 1.0) < 1e-5


def test_pose_average_quat_translation(rng):
    Rm = np.tile(np.eye(3, dtype=np.float32), (10, 1, 1))
    t = rng.normal(size=(10, 3)).astype(np.float32)
    w = rng.uniform(0.1, 1, size=10).astype(np.float32)
    T = se3.make_tf(jnp.asarray(Rm), jnp.asarray(t))
    avg = np.asarray(se3.pose_average_quat(T, jnp.asarray(w)))
    np.testing.assert_allclose(
        avg[:3, 3], np.sum(t * w[:, None], axis=0) / w.sum(), atol=1e-5
    )
    np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=1e-5)


def test_pose_from_vertex_normal_geometry():
    key = jax.random.PRNGKey(0)
    n = 512
    normals = np.random.default_rng(5).normal(size=(n, 3))
    normals = (normals / np.linalg.norm(normals, axis=1, keepdims=True)).astype(
        np.float32
    )
    verts = np.random.default_rng(6).normal(size=(n, 3)).astype(np.float32) * 0.05
    delta = jnp.asarray(
        np.random.default_rng(7).uniform(0, 2 * np.pi, size=n).astype(np.float32)
    )
    shear = np.radians(5.0)
    T = np.asarray(
        se3.pose_from_vertex_normal(
            jnp.asarray(verts), jnp.asarray(normals), shear, delta, key
        )
    )
    # translation = vertex
    np.testing.assert_allclose(T[:, :3, 3], verts, atol=1e-6)
    # rotation orthonormal
    RtR = np.einsum("nij,nik->njk", T[:, :3, :3], T[:, :3, :3])
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (n, 1, 1)), atol=1e-4)
    # sensor z-axis within shear cone of the normal (non-degenerate normals)
    z_axis = T[:, :3, :3] @ np.array([0.0, 0.0, 1.0], dtype=np.float32)
    cosang = np.sum(z_axis * normals, axis=1)
    ok = np.abs(normals[:, 2]) <= 0.9
    assert np.all(cosang[ok] > np.cos(shear) - 1e-3)


def test_particle_rmse():
    gt = np.eye(4, dtype=np.float32)
    n = 100
    Rm = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    t = np.zeros((n, 3), dtype=np.float32)
    t[:, 0] = 0.01  # 1 cm off
    rmse_t, rmse_r = se3.particle_rmse(
        jnp.asarray(Rm), jnp.asarray(t), jnp.asarray(gt)
    )
    np.testing.assert_allclose(float(rmse_t), 0.01, atol=1e-6)
    np.testing.assert_allclose(float(rmse_r), 0.0, atol=1e-3)


def test_se3_key():
    q = jnp.array([[1.0, 0, 0, 0]])
    t = jnp.array([[1.0, 2.0, 3.0]])
    key = np.asarray(se3.se3_key(q, t))
    np.testing.assert_allclose(key, [[0.99, 1.98, 2.97, 0, 0, 0]], atol=1e-6)


def test_jit_and_vmap_compat():
    f = jax.jit(lambda T: se3.se3_log(T))
    T = se3.se3_exp(jnp.ones((4, 6)) * 0.1)
    out = f(T)
    assert out.shape == (4, 6)


def test_euler_to_quat_matches_matrix_path(rng):
    ang = rng.uniform(-np.pi, np.pi, size=(64, 3)).astype(np.float32)
    for conv in ("ZYX", "XYZ"):
        q = se3.euler_to_quat(jnp.asarray(ang), conv)
        q_ref = se3.matrix_to_quat(se3.euler_to_matrix(jnp.asarray(ang), conv))
        sign = np.sign(np.sum(np.asarray(q) * np.asarray(q_ref), axis=1, keepdims=True))
        np.testing.assert_allclose(np.asarray(q) * sign, np.asarray(q_ref), atol=1e-5)
