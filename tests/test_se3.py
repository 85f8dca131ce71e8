import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from stereo_visual_odometry_tpu.ops import se3


RNG = np.random.default_rng(0)


def rand_rotvecs(n, scale=np.pi * 0.9):
    v = RNG.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return v * RNG.uniform(0.01, scale, size=(n, 1))


def test_so3_exp_matches_cv2_rodrigues():
    ws = rand_rotvecs(64)
    R_jax = np.asarray(se3.so3_exp(jnp.asarray(ws, jnp.float32)))
    for w, R in zip(ws, R_jax):
        R_cv, _ = cv2.Rodrigues(w)
        np.testing.assert_allclose(R, R_cv, atol=2e-5)


def test_so3_log_roundtrip():
    ws = rand_rotvecs(128)
    R = se3.so3_exp(jnp.asarray(ws, jnp.float32))
    w_back = np.asarray(se3.so3_log(R))
    np.testing.assert_allclose(w_back, ws, atol=5e-4)


def test_so3_log_near_pi():
    ws = rand_rotvecs(32, scale=np.pi)  # includes angles up to pi
    ws = ws / np.linalg.norm(ws, axis=-1, keepdims=True) * (np.pi - 1e-4)
    R = se3.so3_exp(jnp.asarray(ws, jnp.float32))
    w_back = np.asarray(se3.so3_log(R))
    # Near pi, +axis and -axis are the same rotation: compare rotations.
    R_back = np.asarray(se3.so3_exp(jnp.asarray(w_back)))
    np.testing.assert_allclose(R_back, np.asarray(R), atol=1e-3)


def test_se3_exp_log_roundtrip():
    xi = RNG.normal(size=(64, 6)).astype(np.float32) * 0.5
    T = se3.se3_exp(jnp.asarray(xi))
    xi_back = np.asarray(se3.se3_log(T))
    np.testing.assert_allclose(xi_back, xi, atol=1e-4)


def test_se3_inv_compose_identity():
    xi = jnp.asarray(RNG.normal(size=(16, 6)).astype(np.float32))
    T = se3.se3_exp(xi)
    I = np.asarray(T @ se3.se3_inv(T))
    np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), I.shape), atol=1e-5)


def test_transform_points():
    xi = jnp.asarray(RNG.normal(size=(6,)).astype(np.float32))
    T = se3.se3_exp(xi)
    pts = RNG.normal(size=(100, 3)).astype(np.float32)
    out = np.asarray(se3.transform_points(T, jnp.asarray(pts)))
    Tn = np.asarray(T)
    expected = pts @ Tn[:3, :3].T + Tn[:3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_orthonormalize():
    R = se3.so3_exp(jnp.asarray(rand_rotvecs(8), jnp.float32))
    noisy = R + 0.01 * jnp.asarray(RNG.normal(size=(8, 3, 3)), jnp.float32)
    R2 = np.asarray(se3.orthonormalize(noisy))
    for r in R2:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) > 0.99


def test_euler_zyx_small_angles():
    # Small rotations: euler ~ rotvec components.
    w = np.array([[0.02, -0.03, 0.05]], dtype=np.float32)
    R = se3.so3_exp(jnp.asarray(w))
    e = np.asarray(se3.euler_zyx(R))[0]
    np.testing.assert_allclose(e, w[0], atol=1e-3)
