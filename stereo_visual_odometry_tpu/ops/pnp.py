"""Batched RANSAC-PnP: fixed-budget parallel hypotheses + Gauss-Newton polish.

TPU-native replacement for ``cv::solvePnPRansac(SOLVEPNP_ITERATIVE)`` in
``OpenCV_EstimatePose_PnP`` (``/root/reference/src/tracking.cpp:464-501``:
500 iterations, 0.5 px reprojection gate, inlier-ratio check).

Design (SURVEY.md §7 "hard parts"): OpenCV RANSAC is sequential with early
exit; XLA wants a fixed budget. Here all H hypotheses run *in parallel* via
vmap: each draws 6 correspondences (precomputed random index matrix), solves
a linear 6-point DLT for [R|t] (eigendecomposition of the 12x12 normal
matrix), re-orthonormalizes R, scores inliers by reprojection error, and the
best hypothesis is polished with a masked Gauss-Newton on all inliers —
the moral equivalent of OpenCV's final LM refinement on the consensus set.
Invalid correspondences never win: masked points get infinite residual.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import se3
from .camera import Pinhole
from .linalg_small import (cholesky_unrolled, cholesky_unrolled_flagged,
                           cho_solve_unrolled)

_HI = jax.lax.Precision.HIGHEST
MIN_SAMPLE = 6


def _normalize_pixels(cam: Pinhole, px: jax.Array) -> jax.Array:
    """Pixels -> normalized image-plane coords (K^{-1} applied)."""
    x = (px[..., 0] - cam.cx) / cam.fx
    y = (px[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y], axis=-1)


def _dlt_pose(pts3d: jax.Array, norm2d: jax.Array, wmask: jax.Array) -> jax.Array:
    """Linear 6+ point pose from 3D points and normalized 2D, weighted by mask.

    Builds the 2N x 12 DLT system for P = [R|t] (normalized coords, K = I),
    solves via the null-ish eigenvector of A^T A, fixes scale/sign with the
    cheirality of the sample centroid, and projects R onto SO(3).
    Returns a (4, 4) transform (camera_from_world).
    """
    X = pts3d  # (S, 3)
    u = norm2d[..., 0]
    v = norm2d[..., 1]
    one = jnp.ones_like(u)
    zero = jnp.zeros_like(u)
    Xh = jnp.concatenate([X, one[:, None]], axis=-1)  # (S, 4)
    z4 = jnp.zeros_like(Xh)
    row_u = jnp.concatenate([Xh, z4, -u[:, None] * Xh], axis=-1)  # (S, 12)
    row_v = jnp.concatenate([z4, Xh, -v[:, None] * Xh], axis=-1)
    A = jnp.concatenate([row_u * wmask[:, None], row_v * wmask[:, None]], axis=0)  # (2S, 12)
    AtA = jnp.matmul(A.T, A, precision=_HI)
    # Smallest eigenvector via shifted inverse iteration: for a minimal
    # 6-point sample AtA is (numerically) rank-11, so lambda_min ~ 0 is well
    # separated and 3 Cholesky-solve sweeps converge. Batched 12x12 eigh is
    # an iterative QR kernel on TPU (~10x the cost of a Cholesky).
    jitter = 1e-9 * jnp.trace(AtA) + 1e-12
    L = cholesky_unrolled(AtA + jitter * jnp.eye(12, dtype=AtA.dtype))
    p = jnp.full((12,), 1.0 / jnp.sqrt(12.0), dtype=AtA.dtype)
    for _ in range(3):
        p = cho_solve_unrolled(L, p)
        p = p / jnp.maximum(jnp.linalg.norm(p), 1e-30)
    P = p.reshape(3, 4)
    R_raw = P[:, :3]
    # Scale so that R has unit determinant magnitude; sign from cheirality.
    det3 = (R_raw[0, 0] * (R_raw[1, 1] * R_raw[2, 2] - R_raw[1, 2] * R_raw[2, 1])
            - R_raw[0, 1] * (R_raw[1, 0] * R_raw[2, 2] - R_raw[1, 2] * R_raw[2, 0])
            + R_raw[0, 2] * (R_raw[1, 0] * R_raw[2, 1] - R_raw[1, 1] * R_raw[2, 0]))
    scale = jnp.abs(det3) ** (1.0 / 3.0)
    scale = jnp.where(scale < 1e-12, 1.0, scale)
    P = P / scale
    centroid = jnp.sum(X * wmask[:, None], axis=0) / jnp.maximum(jnp.sum(wmask), 1.0)
    z_c = jnp.matmul(P[2, :3], centroid, precision=_HI) + P[2, 3]
    P = P * jnp.where(z_c < 0, -1.0, 1.0)
    R = se3.orthonormalize_newton(P[:, :3])
    t = P[:, 3]
    return se3.from_Rt(R, t)


def _reproj_err2(cam: Pinhole, T: jax.Array, pts3d: jax.Array, px: jax.Array) -> jax.Array:
    pc = se3.transform_points(T, pts3d)
    behind = pc[..., 2] <= 1e-6
    proj = cam.project(pc)
    e2 = jnp.sum((proj - px) ** 2, axis=-1)
    return jnp.where(behind, jnp.inf, e2)


def gauss_newton_pose(cam: Pinhole, T0: jax.Array, pts3d: jax.Array, px: jax.Array,
                      weights: jax.Array, iters: int = 10,
                      huber_px: float = 2.0) -> jax.Array:
    """Masked / robust Gauss-Newton refinement of a pose on weighted points.

    This is the iterative refinement half of SOLVEPNP_ITERATIVE
    (``tracking.cpp:479-487`` uses ``useExtrinsicGuess=true`` + LM): fixed
    iteration count, Huber-weighted normal equations, left-multiplied SE(3)
    updates. Also reused as the single-pose case of the BA backend.
    """

    def body(_, T):
        pc = se3.transform_points(T, pts3d)  # (N, 3)
        x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
        safe_z = jnp.maximum(z, 1e-6)
        inv_z = 1.0 / safe_z
        u = cam.fx * x * inv_z + cam.cx
        v = cam.fy * y * inv_z + cam.cy
        r = jnp.stack([u, v], axis=-1) - px  # (N, 2)
        # Huber + validity weights.
        rn = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
        wh = jnp.where(rn <= huber_px, 1.0, huber_px / rn) * weights
        wh = wh * (z > 1e-6)
        # Jacobian of pixel wrt left-mult twist [v, w] (standard projection J).
        fx, fy = cam.fx, cam.fy
        inv_z2 = inv_z * inv_z
        J = jnp.stack([
            jnp.stack([fx * inv_z, jnp.zeros_like(z), -fx * x * inv_z2,
                       -fx * x * y * inv_z2, fx * (1 + x * x * inv_z2), -fx * y * inv_z], -1),
            jnp.stack([jnp.zeros_like(z), fy * inv_z, -fy * y * inv_z2,
                       -fy * (1 + y * y * inv_z2), fy * x * y * inv_z2, fy * x * inv_z], -1),
        ], axis=-2)  # (N, 2, 6)
        Jw = J * wh[:, None, None]
        H = jnp.einsum("nij,nik->jk", Jw, J, precision=_HI)
        g = jnp.einsum("nij,ni->j", Jw, r, precision=_HI)
        H = H + 1e-6 * jnp.eye(6, dtype=H.dtype)
        # H is SPD (damped normal equations): fully-unrolled Cholesky —
        # batched cho_factor/cho_solve of 6x6 lower to loop kernels on TPU
        # and were the dominant PnP cost. A non-SPD H (rank-deficient
        # sample, e.g. duplicate points) flags spd_ok False: the floored
        # pivots would otherwise produce a huge FINITE delta that slips
        # past the isfinite guard.
        L, spd_ok = cholesky_unrolled_flagged(H)
        delta = cho_solve_unrolled(L, -g)
        T_new = jnp.matmul(se3.se3_exp(delta), T, precision=_HI)
        good = spd_ok & jnp.all(jnp.isfinite(delta))
        return jnp.where(good, T_new, T)

    return jax.lax.fori_loop(0, iters, body, T0)


@partial(jax.jit, static_argnames=("num_hypotheses", "refine_iters"))
def ransac_pnp(cam: Pinhole, pts3d: jax.Array, px: jax.Array, valid: jax.Array,
               key: jax.Array, num_hypotheses: int = 512,
               inlier_px: float = 2.0, refine_iters: int = 10,
               T_init: jax.Array | None = None,
               weights: jax.Array | None = None):
    """Fixed-budget parallel RANSAC-PnP.

    Args:
      pts3d: (N, 3) world/prev-camera points (the triangulated t-1 cloud,
        ``tracking.cpp:292-294``).
      px: (N, 2) observed pixels in the current left image.
      valid: (N,) bool mask of live correspondences.
      key: PRNG key for hypothesis sampling.
      num_hypotheses: parallel hypothesis count (reference: 500 sequential
        iterations, ``default.yaml:80``).
      inlier_px: reprojection inlier radius in pixels.
      T_init: optional initial pose included as an extra hypothesis
        (the ``useExtrinsicGuess`` analogue).
      weights: optional (N,) per-point confidence (e.g. inverse octave
        variance for ORB features, the ORB-SLAM invSigma2 convention);
        scales the refinement and MSAC contributions.

    Returns:
      dict(T (4,4) camera_from_world, inliers (N,) bool, num_inliers,
      inlier_ratio, ok).
    """
    n = pts3d.shape[0]
    if weights is None:
        weights = jnp.ones(n, dtype=pts3d.dtype)
    norm2d = _normalize_pixels(cam, px)

    # Sample hypothesis index sets, biased to valid entries via masked gumbel
    # top-k: per hypothesis draw uniform scores, invalid entries -inf.
    # Compact-then-draw sampling: pack valid indices first (one (N,) stable
    # argsort), then draw (H, 6) uniform positions over the valid prefix.
    # Per-hypothesis masked-score selection over the full (H, N) matrix
    # (rounds of argmax, or lax.top_k's sort) measured as the single biggest
    # PnP stage. Draws are with replacement — a duplicate inside a sample
    # makes that hypothesis rank-deficient, which the scoring discards.
    perm = jnp.argsort(jnp.logical_not(valid), stable=True).astype(jnp.int32)
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    u = jax.random.uniform(key, (num_hypotheses, MIN_SAMPLE))
    pos = jnp.minimum((u * n_valid).astype(jnp.int32), n_valid - 1)
    samp_idx = perm[pos]  # (H, 6)
    # Duplicate indices inside a sample make that hypothesis rank-deficient;
    # mark it degenerate up front (sorted-adjacent equality) instead of
    # relying on the eps-floored Cholesky + scoring to discard the garbage.
    pos_sorted = jnp.sort(pos, axis=-1)
    samp_dup = jnp.any(pos_sorted[:, 1:] == pos_sorted[:, :-1], axis=-1)

    # Hypothesis solvers. Most hypotheses are cheap: a short Gauss-Newton on
    # the 6-point subset seeded from the motion prior — no eigendecomposition
    # (batched 12x12 eigh is the PnP hot spot on TPU). A small pool keeps the
    # linear DLT solver for robustness when the prior is far off.
    n_dlt = min(64, num_hypotheses)
    T_seed = jnp.eye(4, dtype=pts3d.dtype) if T_init is None else T_init

    def dlt_hypothesis(idx):
        X = pts3d[idx]
        m = valid[idx].astype(pts3d.dtype)
        return _dlt_pose(X, norm2d[idx], m)

    def gn_hypothesis(idx):
        X = pts3d[idx]
        p = px[idx]
        m = valid[idx].astype(pts3d.dtype)
        return gauss_newton_pose(cam, T_seed, X, p, m, iters=4,
                                 huber_px=1e6)  # pure LS on the minimal set

    T_dlt = jax.vmap(dlt_hypothesis)(samp_idx[:n_dlt])
    T_gn = jax.vmap(gn_hypothesis)(samp_idx[n_dlt:])
    T_hyp = jnp.concatenate([T_dlt, T_gn], axis=0)
    if T_init is not None:
        T_hyp = jnp.concatenate([T_hyp, T_init[None]], axis=0)

    e2 = jax.vmap(lambda T: _reproj_err2(cam, T, pts3d, px))(T_hyp)  # (H, N)
    thr2 = inlier_px * inlier_px
    inl = (e2 <= thr2) & valid[None, :]
    # MSAC scoring: truncated squared error (lower = better) — strictly more
    # discriminative than inlier counting at equal budget.
    msac = jnp.sum(jnp.where(valid[None, :], jnp.minimum(e2, thr2), 0.0) *
                   weights[None, :], axis=-1)
    # Degenerate samples can yield NaN poses (rank-deficient DLT, diverged
    # GN) or finite-garbage ones (duplicate indices in the sample); make
    # sure neither can win the argmin. T_init (if present) is never
    # degenerate, hence the False pad.
    hyp_dup = jnp.concatenate(
        [samp_dup, jnp.zeros(T_hyp.shape[0] - num_hypotheses, bool)])
    msac = jnp.where(jnp.isnan(msac) | hyp_dup, jnp.inf, msac)
    best = jnp.argmin(msac)
    T_best = T_hyp[best]
    inliers = inl[best]

    # Two rounds of (Gauss-Newton polish -> inlier recount): the batched
    # equivalent of OpenCV's final LM refinement on the consensus set, with
    # one re-expansion of the consensus.
    T_out, inl_out = T_best, inliers
    for _ in range(2):
        T_ref = gauss_newton_pose(cam, T_out, pts3d, px,
                                  inl_out.astype(pts3d.dtype) * weights,
                                  iters=refine_iters, huber_px=inlier_px)
        e2_ref = _reproj_err2(cam, T_ref, pts3d, px)
        inliers_ref = (e2_ref <= thr2) & valid
        use_ref = jnp.sum(inliers_ref) >= jnp.sum(inl_out)
        T_out = jnp.where(use_ref, T_ref, T_out)
        inl_out = jnp.where(use_ref, inliers_ref, inl_out)

    num_valid = jnp.maximum(jnp.sum(valid), 1)
    num_inl = jnp.sum(inl_out)
    return {
        "T": T_out,
        "inliers": inl_out,
        "num_inliers": num_inl,
        "inlier_ratio": num_inl / num_valid,
        "ok": num_inl >= MIN_SAMPLE,
    }
