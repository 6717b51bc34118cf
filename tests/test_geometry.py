import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslamm_tpu.ops import geometry as geo


RNG = np.random.default_rng(0)


def rand_rot(batch=()):
    phi = RNG.normal(size=batch + (3,)) * 1.5
    return geo.so3_exp(jnp.asarray(phi, jnp.float32))


def test_so3_exp_log_roundtrip():
    phi = jnp.asarray(RNG.normal(size=(64, 3)) * 1.2, jnp.float32)
    # keep |phi| < pi so log is the exact inverse (beyond pi it wraps)
    norm = jnp.linalg.norm(phi, axis=-1, keepdims=True)
    phi = jnp.where(norm > 3.0, phi * (3.0 / norm), phi)
    R = geo.so3_exp(phi)
    phi2 = geo.so3_log(R)
    np.testing.assert_allclose(np.asarray(phi2), np.asarray(phi), atol=2e-4)


def test_so3_log_wraps_to_same_rotation():
    phi = jnp.asarray(RNG.normal(size=(64, 3)) * 2.0, jnp.float32)
    R = geo.so3_exp(phi)
    R2 = geo.so3_exp(geo.so3_log(R))
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-3)


def test_so3_exp_small_angle():
    phi = jnp.asarray([[1e-9, 0, 0], [0, 0, 0]], jnp.float32)
    R = geo.so3_exp(phi)
    np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-6)


def test_so3_orthonormal():
    R = rand_rot((32,))
    eye = np.broadcast_to(np.eye(3), (32, 3, 3))
    np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)), eye, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), np.ones(32), atol=1e-5)


def test_se3_exp_log_roundtrip():
    xi = jnp.asarray(RNG.normal(size=(32, 6)), jnp.float32)
    norm = jnp.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
    xi = xi.at[:, 3:].set(jnp.where(norm > 3.0, xi[:, 3:] * (3.0 / norm), xi[:, 3:]))
    T = geo.se3_exp(xi)
    xi2 = geo.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=3e-4)


def test_se3_inverse():
    xi = jnp.asarray(RNG.normal(size=(8, 6)), jnp.float32)
    T = geo.se3_exp(xi)
    eye = np.broadcast_to(np.eye(4), (8, 4, 4))
    np.testing.assert_allclose(np.asarray(T @ geo.T_inv(T)), eye, atol=1e-5)


def test_quat_roundtrip():
    R = rand_rot((128,))
    q = geo.rot_to_quat(R)
    R2 = geo.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_quat_near_pi():
    phi = jnp.asarray([[np.pi - 1e-4, 0, 0]], jnp.float32)
    R = geo.so3_exp(phi)
    q = geo.rot_to_quat(R)
    R2 = geo.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


def test_sim3_group_ops():
    s = jnp.asarray(RNG.uniform(0.5, 2.0, size=(16,)), jnp.float32)
    R = rand_rot((16,))
    t = jnp.asarray(RNG.normal(size=(16, 3)), jnp.float32)
    S = geo.sim3_make(s, R, t)
    Sinv = geo.sim3_inv(S)
    I = geo.sim3_compose(S, Sinv)
    si, Ri, ti = geo.sim3_parts(I)
    np.testing.assert_allclose(np.asarray(si), np.ones(16), atol=1e-4)
    np.testing.assert_allclose(np.asarray(Ri), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ti), np.zeros((16, 3)), atol=1e-4)


def test_sim3_apply_matches_parts():
    s = jnp.float32(1.7)
    R = rand_rot(())
    t = jnp.asarray([1.0, -2.0, 0.5], jnp.float32)
    S = geo.sim3_make(s, R, t)
    pts = jnp.asarray(RNG.normal(size=(10, 3)), jnp.float32)
    out = geo.sim3_apply(S, pts)
    expect = s * pts @ np.asarray(R).T + np.asarray(t)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-4)


def test_sim3_exp_log_roundtrip():
    xi = jnp.asarray(RNG.normal(size=(32, 7)) * 0.8, jnp.float32)
    S = geo.sim3_exp(xi)
    xi2 = geo.sim3_log(S)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=3e-3)


def test_projection_roundtrip():
    K = jnp.asarray([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], jnp.float32)
    pts = jnp.asarray(RNG.normal(size=(50, 3)), jnp.float32)
    pts = pts.at[:, 2].set(jnp.abs(pts[:, 2]) + 1.0)
    uv = geo.project(K, pts)
    back = geo.backproject(K, uv, pts[:, 2])
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-3)


def test_triangulate_dlt():
    K = jnp.asarray([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], jnp.float32)
    pts_w = jnp.asarray(RNG.uniform(-2, 2, size=(40, 3)), jnp.float32)
    pts_w = pts_w.at[:, 2].set(pts_w[:, 2] + 6.0)
    T1 = jnp.eye(4, dtype=jnp.float32)
    T2 = geo.se3_exp(jnp.asarray([0.5, 0.02, 0.01, 0.01, -0.05, 0.02], jnp.float32))
    P1 = K @ T1[:3, :]
    P2 = K @ T2[:3, :]
    uv1 = geo.project(K, geo.transform_points(T1, pts_w))
    uv2 = geo.project(K, geo.transform_points(T2, pts_w))
    X = geo.triangulate_dlt(P1, P2, uv1, uv2)
    np.testing.assert_allclose(np.asarray(X), np.asarray(pts_w), atol=5e-2)


def test_umeyama_sim3():
    s_true = 1.6
    R_true = np.asarray(rand_rot(()))
    t_true = np.array([0.3, -1.0, 2.0])
    src = RNG.normal(size=(100, 3)).astype(np.float32)
    dst = (s_true * src @ R_true.T + t_true).astype(np.float32)
    s, R, t = geo.umeyama_alignment(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(float(s), s_true, atol=1e-3)
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-2)


def test_umeyama_masked():
    R_true = np.asarray(rand_rot(()))
    t_true = np.array([1.0, 2.0, 3.0])
    src = RNG.normal(size=(60, 3)).astype(np.float32)
    dst = (src @ R_true.T + t_true).astype(np.float32)
    # corrupt masked-out entries
    dst[40:] = 1e3
    mask = np.zeros(60, dtype=bool)
    mask[:40] = True
    s, R, t = geo.umeyama_alignment(
        jnp.asarray(src), jnp.asarray(dst), mask=jnp.asarray(mask), with_scale=False
    )
    np.testing.assert_allclose(float(s), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-2)
