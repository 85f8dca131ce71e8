"""Batched pyramidal Lucas-Kanade optical flow.

TPU-native replacement for the four chained ``cv::calcOpticalFlowPyrLK``
calls of the reference's circular matcher
(``/root/reference/src/tracking.cpp:583-622``: 21x21 window, pyramid levels,
30 iterations / 0.01 eps) and its ``deleteBadmatchFeatures`` filter
(``tracking.cpp:623-660``).

Design: all N keypoints advance together — patches, gradients, and the 2x2
normal equations are batched tensors; the per-point iteration is a
``lax.fori_loop`` with masked convergence (no data-dependent trip counts).
The inner patch sampling is one fused (N, P, P) bilinear gather per
iteration. The 2x2 solve is closed-form (no linalg call).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import interp


def _level_track(img_prev: jax.Array, img_next: jax.Array, pts: jax.Array,
                 guess: jax.Array, win: int, iters: int, eps: float,
                 min_eig: float) -> tuple[jax.Array, jax.Array]:
    """One pyramid level of LK for all points.

    Args:
      pts: (N, 2) keypoint positions in *this level's* pixel coords.
      guess: (N, 2) current flow estimate in this level's coords.
    Returns: (flow (N, 2), ok (N,) bool).
    """
    grid = interp.patch_grid(win, dtype=pts.dtype)  # (P, P, 2)
    base = pts[:, None, None, :] + grid[None]       # (N, P, P, 2)

    # Template patch and its spatial gradients (central differences via
    # shifted bilinear samples — matches PyrLK's use of template gradients).
    T = interp.bilinear(img_prev, base)
    dx = jnp.array([1.0, 0.0], dtype=pts.dtype)
    dy = jnp.array([0.0, 1.0], dtype=pts.dtype)
    Ix = (interp.bilinear(img_prev, base + dx) - interp.bilinear(img_prev, base - dx)) * 0.5
    Iy = (interp.bilinear(img_prev, base + dy) - interp.bilinear(img_prev, base - dy)) * 0.5

    g00 = jnp.sum(Ix * Ix, axis=(1, 2))
    g01 = jnp.sum(Ix * Iy, axis=(1, 2))
    g11 = jnp.sum(Iy * Iy, axis=(1, 2))
    det = g00 * g11 - g01 * g01
    # OpenCV's minEigThreshold is on the min eigenvalue of G normalized by
    # window area; same normalization here.
    tr = g00 + g11
    min_eig_val = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) * 0.5 / (win * win)
    ok = min_eig_val > min_eig
    safe_det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    inv00 = g11 / safe_det
    inv01 = -g01 / safe_det
    inv11 = g00 / safe_det

    def body(_, carry):
        v, active = carry
        warped = interp.bilinear(img_next, base + v[:, None, None, :])
        r = T - warped
        b0 = jnp.sum(r * Ix, axis=(1, 2))
        b1 = jnp.sum(r * Iy, axis=(1, 2))
        d0 = inv00 * b0 + inv01 * b1
        d1 = inv01 * b0 + inv11 * b1
        step = jnp.stack([d0, d1], axis=-1)
        v = v + step * active[:, None]
        active = active * (jnp.sum(step * step, axis=-1) > eps * eps)
        return v, active

    v0 = guess
    active0 = ok.astype(pts.dtype)
    v, _ = jax.lax.fori_loop(0, iters, body, (v0, active0))
    return v, ok


@partial(jax.jit, static_argnames=("win", "levels", "iters"))
def track(pyr_prev: tuple, pyr_next: tuple, pts: jax.Array,
          win: int = 21, levels: int = 3, iters: int = 30, eps: float = 0.01,
          min_eig: float = 1e-4) -> tuple[jax.Array, jax.Array]:
    """Track N points from prev to next through a factor-2 pyramid.

    Args:
      pyr_prev / pyr_next: tuples of (H/2^l, W/2^l) float32 images,
        level 0 first (from ``pyramid.build_pyramid``).
      pts: (N, 2) [x, y] positions in level-0 coords.

    Returns:
      (next_pts (N, 2), ok (N,) bool). ``ok`` requires a well-conditioned
      gradient matrix at the finest level and the final point in-frame
      (mirrors PyrLK's status output consumed at ``tracking.cpp:623-649``).
    """
    n_levels = min(levels, len(pyr_prev))
    flow = pts / (2.0 ** n_levels) * 0.0  # (N, 2) zeros, right dtype
    ok_all = jnp.ones(pts.shape[0], dtype=bool)
    for lvl in range(n_levels - 1, -1, -1):
        scale = 2.0 ** lvl
        pts_l = pts / scale
        flow, ok = _level_track(pyr_prev[lvl], pyr_next[lvl], pts_l, flow,
                                win, iters, eps, min_eig)
        ok_all = ok_all & ok
        if lvl > 0:
            flow = flow * 2.0
    next_pts = pts + flow
    h, w = pyr_next[0].shape
    inside = ((next_pts[:, 0] >= 0) & (next_pts[:, 0] <= w - 1) &
              (next_pts[:, 1] >= 0) & (next_pts[:, 1] <= h - 1))
    return next_pts, ok_all & inside


def circular_track(pyrs: tuple, pts_t1l: jax.Array, valid: jax.Array,
                   feature_match_error: float = 2.0,
                   cycle_error: float = 2.0,
                   win: int = 21, levels: int = 3, iters: int = 30):
    """4-way circular LK: t1L -> t1R -> t2R -> t2L -> t1L.

    The reference's loop-consistency matching
    (``LK_Robust_Find_MuliImage_MatchedFeatures``, ``tracking.cpp:583-622``)
    with its filter semantics (``deleteBadmatchFeatures``,
    ``tracking.cpp:623-660``): all four statuses OK, every point in-frame,
    stereo epipolar |Δy| <= feature_match_error in both stereo pairs. We
    additionally bound the closure distance back to the start point
    (``cycle_error``; the reference only checks sign — ``tracking.cpp:637-643``
    — a consciously tightened gate, see SURVEY.md §7).

    Args:
      pyrs: (pyr_t1l, pyr_t1r, pyr_t2r, pyr_t2l) factor-2 pyramids.
    Returns:
      dict with tracked points in each image and the combined valid mask.
    """
    pyr_t1l, pyr_t1r, pyr_t2r, pyr_t2l = pyrs
    kw = dict(win=win, levels=levels, iters=iters)
    p_t1r, ok1 = track(pyr_t1l, pyr_t1r, pts_t1l, **kw)
    p_t2r, ok2 = track(pyr_t1r, pyr_t2r, p_t1r, **kw)
    p_t2l, ok3 = track(pyr_t2r, pyr_t2l, p_t2r, **kw)
    p_t1l_back, ok4 = track(pyr_t2l, pyr_t1l, p_t2l, **kw)

    epi1 = jnp.abs(pts_t1l[:, 1] - p_t1r[:, 1]) <= feature_match_error
    epi2 = jnp.abs(p_t2l[:, 1] - p_t2r[:, 1]) <= feature_match_error
    cyc = jnp.sum((p_t1l_back - pts_t1l) ** 2, axis=-1) <= cycle_error * cycle_error
    ok = valid & ok1 & ok2 & ok3 & ok4 & epi1 & epi2 & cyc
    return {
        "t1l": pts_t1l, "t1r": p_t1r, "t2r": p_t2r, "t2l": p_t2l,
        "valid": ok,
    }
