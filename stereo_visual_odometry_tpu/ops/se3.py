"""SE(3)/SO(3) Lie-group operations, batched and jit-friendly.

TPU-native replacement for the reference's Sophus usage
(``/root/reference/include/lzb_vio/common_include.h:104-109``) and its
``cv::Rodrigues`` calls (``/root/reference/src/tracking.cpp:488``).

All functions are pure jnp, preserve dtype, and broadcast over arbitrary
leading batch dimensions; rotations are 3x3 matrices, rigid transforms are
4x4 homogeneous matrices. Twists are ordered ``[v, w]`` (translation first),
matching Sophus' ``SE3::log`` convention.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8

# Geometry matrices are tiny (3x3 / 4x4): MXU speed is irrelevant but its
# reduced-precision f32 accumulation is not. Force exact f32 everywhere here.
_HI = jax.lax.Precision.HIGHEST


def _mm(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.matmul(a, b, precision=_HI)


def hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of a 3-vector. (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of hat. (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues' formula: axis-angle (..., 3) -> rotation (..., 3, 3).

    Replaces ``cv::Rodrigues(rvec, R)`` in the reference PnP
    (``/root/reference/src/tracking.cpp:488``). Uses Taylor expansions near
    zero so the function is smooth and safe under jit/grad.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # sin(t)/t and (1-cos(t))/t^2 with small-angle series.
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(w)
    WW = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * WW


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    w_vee = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    sin_t = jnp.sin(theta)
    # Generic case: w = theta / (2 sin theta) * vee(R - R^T)
    scale = jnp.where(theta < 1e-5, 1.0 + theta * theta / 6.0, theta / jnp.maximum(sin_t, _EPS))
    w_generic = w_vee * scale[..., None]
    # Near theta = pi, sin(theta) ~ 0 and the generic formula is unstable:
    # recover axis from the diagonal of R = I*cos + (1-cos) aa^T + sin [a]x.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.clip((diag - cos_t[..., None]) / jnp.maximum(1.0 - cos_t[..., None], _EPS), 0.0, 1.0)
    axis_abs = jnp.sqrt(axis2)
    # Sign disambiguation from off-diagonal sums: (1-cos) a_i a_j = (R_ij + R_ji)/2.
    sxy = R[..., 0, 1] + R[..., 1, 0]
    sxz = R[..., 0, 2] + R[..., 2, 0]
    syz = R[..., 1, 2] + R[..., 2, 1]
    ax = axis_abs[..., 0]
    ay = axis_abs[..., 1] * jnp.where(sxy < 0, -1.0, 1.0)
    az = axis_abs[..., 2] * jnp.where(sxz < 0, -1.0, 1.0)
    # If x-component is tiny, anchor signs on y instead.
    ay2 = axis_abs[..., 1]
    az2 = axis_abs[..., 2] * jnp.where(syz < 0, -1.0, 1.0)
    use_y = ax < 1e-3
    axis = jnp.where(
        use_y[..., None],
        jnp.stack([ax, ay2, az2], axis=-1),
        jnp.stack([ax, ay, az], axis=-1),
    )
    w_pi = axis * theta[..., None]
    near_pi = theta > jnp.pi - 1e-3
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def _so3_left_jacobian(w: jax.Array) -> jax.Array:
    """V such that se3_exp translation part = V @ v."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    W = hat(w)
    WW = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B[..., None, None] * W + C[..., None, None] * WW


def _so3_left_jacobian_inv(w: jax.Array) -> jax.Array:
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    half = theta * 0.5
    cot = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                    (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)) / jnp.maximum(theta2, _EPS))
    W = hat(w)
    WW = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot[..., None, None] * WW


def se3_exp(xi: jax.Array) -> jax.Array:
    """Twist (..., 6) ``[v, w]`` -> homogeneous transform (..., 4, 4)."""
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t = jnp.einsum("...ij,...j->...i", _so3_left_jacobian(w), v,
                   precision=_HI)
    return from_Rt(R, t)


def se3_log(T: jax.Array) -> jax.Array:
    """Homogeneous transform (..., 4, 4) -> twist (..., 6) ``[v, w]``."""
    R, t = to_Rt(T)
    w = so3_log(R)
    v = jnp.einsum("...ij,...j->...i", _so3_left_jacobian_inv(w), t,
                   precision=_HI)
    return jnp.concatenate([v, w], axis=-1)


def from_Rt(R: jax.Array, t: jax.Array) -> jax.Array:
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def to_Rt(T: jax.Array) -> tuple[jax.Array, jax.Array]:
    return T[..., :3, :3], T[..., :3, 3]


def se3_inv(T: jax.Array) -> jax.Array:
    """Closed-form rigid-transform inverse (no linear solve)."""
    R, t = to_Rt(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return from_Rt(Rt, -jnp.einsum("...ij,...j->...i", Rt, t,
                                   precision=_HI))


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) to points (..., N, 3) -> (..., N, 3)."""
    R, t = to_Rt(T)
    return jnp.einsum("...ij,...nj->...ni", R, pts,
                      precision=_HI) + t[..., None, :]


def orthonormalize(R: jax.Array) -> jax.Array:
    """Project a near-rotation onto SO(3) via SVD (det +1)."""
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(_mm(U, Vt))
    D = jnp.ones(R.shape[:-2] + (3,), dtype=R.dtype).at[..., 2].set(det)
    return _mm(U * D[..., None, :], Vt)


def orthonormalize_newton(R: jax.Array, iters: int = 4) -> jax.Array:
    """Project a near-rotation onto SO(3) via Newton-Schulz polar iteration.

    ``X <- 1.5 X - 0.5 X X^T X`` converges quadratically to the orthogonal
    polar factor when the singular values lie in (0, sqrt(3)); callers
    pre-normalize scale (e.g. by |det|^(1/3)) so that holds. Batched 3x3
    SVD lowers to a slow iterative kernel on TPU — this is pure matmuls.
    Preserves the determinant's sign (use only after a cheirality sign fix).
    """
    # Frobenius pre-normalization puts the singular values strictly inside
    # (0, sqrt(3)) for any full-rank input, guaranteeing convergence.
    fro = jnp.sqrt(jnp.sum(R * R, axis=(-1, -2), keepdims=True) / 3.0)
    X = R / jnp.maximum(fro, 1e-12)
    for _ in range(iters):
        X = 1.5 * X - 0.5 * _mm(_mm(X, jnp.swapaxes(X, -1, -2)), X)
    return X


def euler_zyx(R: jax.Array) -> jax.Array:
    """R -> (roll, pitch, yaw) for the Z-Y-X convention.

    Matches the ``toEulerAngle``-style gate the reference applies to the
    inter-frame rotation (``/root/reference/src/tracking.cpp:212-215,305-311``).
    """
    sy = jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2)
    singular = sy < 1e-6
    roll = jnp.where(singular,
                     jnp.arctan2(-R[..., 1, 2], R[..., 1, 1]),
                     jnp.arctan2(R[..., 2, 1], R[..., 2, 2]))
    pitch = jnp.arctan2(-R[..., 2, 0], sy)
    yaw = jnp.where(singular, jnp.zeros_like(sy), jnp.arctan2(R[..., 1, 0], R[..., 0, 0]))
    return jnp.stack([roll, pitch, yaw], axis=-1)
