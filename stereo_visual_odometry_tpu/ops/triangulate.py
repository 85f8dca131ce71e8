"""Batched two-view triangulation.

TPU-native replacement for the reference's ``cv::triangulatePoints`` +
``cv::convertPointsFromHomogeneous`` live path
(``/root/reference/src/tracking.cpp:292-294``) and the dead SVD-DLT in
``include/lzb_vio/algorithm.h:18-40``. The whole batch of N correspondences is
triangulated in one shot: the per-point 4x4 DLT systems are formed with pure
elementwise ops and solved with a batched eigendecomposition of ``A^T A``
(small fixed-size linalg that XLA maps well).

Also provides the closed-form rectified-stereo depth (``z = f b / d``), the
fast path when ``R_rl = I`` (the dead ``algorithm.h:50-103`` variants did
this with a hardcoded baseline; here the rig provides it).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .camera import StereoRig


def triangulate_dlt(P1: jax.Array, P2: jax.Array, pts1: jax.Array, pts2: jax.Array,
                    ) -> tuple[jax.Array, jax.Array]:
    """Linear (DLT) triangulation of N correspondences.

    Args:
      P1, P2: (3, 4) projection matrices.
      pts1, pts2: (N, 2) pixel coordinates in each view.

    Returns:
      (points (N, 3) in the P1 frame, valid (N,) bool — positive depth and
      well-conditioned homogeneous scale).
    """
    dtype = pts1.dtype

    def rows(P, pts):
        u = pts[..., 0:1]
        v = pts[..., 1:2]
        r0 = u * P[2] - P[0]  # (N, 4)
        r1 = v * P[2] - P[1]
        return r0, r1

    a0, a1 = rows(P1.astype(dtype), pts1)
    a2, a3 = rows(P2.astype(dtype), pts2)
    A = jnp.stack([a0, a1, a2, a3], axis=-2)  # (N, 4, 4)
    # Row-normalize for conditioning, then take the eigenvector of A^T A with
    # the smallest eigenvalue (equivalent to the smallest right singular vector).
    A = A / (jnp.linalg.norm(A, axis=-1, keepdims=True) + 1e-12)
    AtA = jnp.matmul(jnp.swapaxes(A, -1, -2), A,
                     precision=jax.lax.Precision.HIGHEST)
    _, eigvecs = jnp.linalg.eigh(AtA)  # ascending eigenvalues
    X_h = eigvecs[..., :, 0]  # (N, 4)
    w = X_h[..., 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-10, 1e-10, w)
    X = X_h[..., :3] / safe_w[..., None]
    valid = (jnp.abs(w) > 1e-8) & (X[..., 2] > 0)
    return X, valid


def triangulate_stereo(rig: StereoRig, pts_l: jax.Array, pts_r: jax.Array,
                       ) -> tuple[jax.Array, jax.Array]:
    """Triangulate stereo correspondences.

    Matches the reference pipelines, which call ``cv::triangulatePoints``
    with ``projMatr1_/projMatr2_`` (``tracking.cpp:190-192, 292-294``).
    For a rectified rig (R_rl = I, purely lateral baseline — KITTI) the
    closed-form disparity depth is exact and avoids N batched 4x4
    eigendecompositions, which are milliseconds on TPU; general rigs take
    the DLT path. The branch is resolved at trace time (rig is concrete).
    """
    if is_rectified(rig):
        return stereo_depth_closed_form(rig, pts_l, pts_r)
    return triangulate_dlt(rig.P_left, rig.P_right, pts_l, pts_r)


def is_rectified(rig: StereoRig) -> bool:
    """True for a purely-lateral-baseline rig. Must be called on a concrete
    (untraced) rig — i.e. at program build time, not inside jit."""
    import numpy as np

    try:
        R = np.asarray(rig.T_rl[:3, :3])
        t = np.asarray(rig.T_rl[:3, 3])
    except Exception:
        return False  # traced rig: caller should decide at build time
    return bool(np.allclose(R, np.eye(3), atol=1e-6)
                and abs(t[1]) < 1e-9 and abs(t[2]) < 1e-9)


def stereo_depth_closed_form(rig: StereoRig, pts_l: jax.Array, pts_r: jax.Array,
                             min_disparity: float = 0.25) -> tuple[jax.Array, jax.Array]:
    """Closed-form depth for a rectified rig: ``z = fx * b / (u_l - u_r)``.

    Cheaper than DLT; valid only when ``R_rl ~ I`` (KITTI). Behavior-equivalent
    to the reference's dead parallel-stereo path (``algorithm.h:50-103``) but
    with the rig baseline instead of a hardcoded constant
    (``tracking.cpp:140-142`` hardcodes -0.12; a bug we do not reproduce).
    """
    disp = pts_l[..., 0] - pts_r[..., 0]
    valid = disp > min_disparity
    safe_disp = jnp.maximum(disp, min_disparity)
    z = rig.left.fx * rig.baseline / safe_disp
    pts = rig.left.unproject(pts_l, z)
    return pts, valid


def reprojection_error(cam, T_cw: jax.Array, pts_w: jax.Array, px: jax.Array) -> jax.Array:
    """Per-point pixel reprojection error norm (N,). Shared by PnP/BA."""
    from . import se3  # local import to avoid cycle

    pc = se3.transform_points(T_cw, pts_w)
    return jnp.linalg.norm(cam.project(pc) - px, axis=-1)
