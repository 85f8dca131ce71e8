"""Fixed-shape keypoint selection from dense score maps.

XLA needs static shapes (SURVEY.md §7 "hard parts"): the reference's
variable-length keypoint vectors and ``erase`` loops become fixed-capacity
arrays + validity masks here.

Two selectors:

* ``top_k_keypoints`` — global top-K by score (replacement for plain
  ``cv::FAST`` + implicit ordering, ``tracking.cpp:94-113``).
* ``grid_top_k`` — spatially-uniform selection: the image is tiled into a
  fixed cell grid and the best ``k_per_cell`` corners of every cell are kept
  before a global top-K. This is the behavior-equivalent, parallel
  reformulation of ORB's sequential quadtree ``DistributeOctTree``
  (``/root/reference/src/ORBextractor.cpp:487-715``): both enforce spatial
  uniformity under a total budget; the greedy list surgery is replaced by a
  dense reshape + per-cell top-k that maps onto the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def top_k_keypoints(score: jax.Array, k: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Global top-K of a dense score map.

    Returns (xy (K, 2) float32 [x, y], scores (K,), valid (K,) bool).
    Invalid slots (score 0) carry xy = (0, 0).
    """
    h, w = score.shape
    flat = score.reshape(-1)
    vals, idx = jax.lax.top_k(flat, k)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    valid = vals > 0
    xy = jnp.stack([xs, ys], axis=-1) * valid[:, None]
    return xy, jnp.where(valid, vals, 0.0), valid


def grid_top_k(score: jax.Array, k_total: int, cell: int = 32, k_per_cell: int = 8,
               ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Spatially-uniform top-K: per-cell top-k then global top-K.

    ``cell`` mirrors the ~30 px FAST cells of ``ComputeKeyPointsOctTree``
    (``ORBextractor.cpp:737-741``); ``k_per_cell`` bounds per-cell density the
    way the quadtree bounds node occupancy. Requires H, W divisible by cell
    (pad images beforehand; padded area scores 0).
    """
    h, w = score.shape
    assert h % cell == 0 and w % cell == 0, (h, w, cell)
    gh, gw = h // cell, w // cell
    # (gh, gw, cell*cell) per-cell flattened scores.
    cells = score.reshape(gh, cell, gw, cell).transpose(0, 2, 1, 3).reshape(gh, gw, cell * cell)
    # Per-cell top-k as k rounds of (max, mask-out): lax.top_k lowers to a
    # full sort of every cell on TPU (measured as the largest single op
    # class in the ORB step); k reduce+select rounds fuse into cheap VPU
    # passes. Tie order (first index wins) matches lax.top_k.
    lane = jax.lax.broadcasted_iota(jnp.int32, cells.shape, 2)
    vals_l, idx_l = [], []
    work = cells
    for _ in range(k_per_cell):
        am = jnp.argmax(work, axis=-1).astype(jnp.int32)    # (gh, gw)
        vals_l.append(jnp.max(work, axis=-1))
        idx_l.append(am)
        work = jnp.where(lane == am[..., None], -jnp.inf, work)
    vals = jnp.stack(vals_l, axis=-1)                       # (gh, gw, k)
    idx = jnp.stack(idx_l, axis=-1)
    cy = idx // cell
    cx = idx % cell
    row0 = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 0) * cell
    col0 = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1) * cell
    ys = (row0 + cy).reshape(-1)
    xs = (col0 + cx).reshape(-1)
    flat_vals = vals.reshape(-1)
    # Global top-K over the per-cell survivors.
    k_total = min(k_total, flat_vals.shape[0])
    best, bidx = jax.lax.top_k(flat_vals, k_total)
    valid = best > 0
    xy = jnp.stack([xs[bidx].astype(jnp.float32), ys[bidx].astype(jnp.float32)], axis=-1)
    xy = xy * valid[:, None]
    return xy, jnp.where(valid, best, 0.0), valid


def subpixel_refine(score: jax.Array, xy: jax.Array, valid: jax.Array,
                    use_pallas: bool | None = None,
                    interpret: bool = False) -> jax.Array:
    """Parabolic subpixel refinement of integer corner locations.

    Fits a 1-D parabola through the score and its two neighbours along each
    axis; offsets clamp to [-0.5, 0.5]. Reduces the pixel-quantization noise
    that dominates stereo-disparity (and hence depth/translation-scale)
    error in descriptor pipelines — the reference inherits whatever
    ``cv::FAST`` returns (integer), so this is a conscious improvement.

    On TPU the five per-point neighbourhood reads go through the Pallas
    window extractor (one (N, 3, 3) extraction) instead of XLA gathers,
    which scalarize; numerics are identical.
    """
    h, w = score.shape
    xi = jnp.clip(xy[:, 0].astype(jnp.int32), 1, w - 2)
    yi = jnp.clip(xy[:, 1].astype(jnp.int32), 1, h - 2)

    def axis_offset(sm, sc, sp):
        denom = sm - 2.0 * sc + sp
        off = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (sm - sp) / denom, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    if use_pallas is None:
        from .lk import use_pallas_default

        use_pallas = use_pallas_default()
    if use_pallas or interpret:
        from . import patch_pallas

        n = xy.shape[0]
        eh = (-h) % 8
        # Lane dim must be a 128-multiple: Mosaic's dynamic rotate rejects
        # narrower vectors ("unsupported unaligned shape" on a 64-wide map).
        ew = (-w) % 128
        sp_map = jnp.pad(score, ((0, eh), (0, ew))) if (eh or ew) else score
        n_pad = (-n) % patch_pallas.BLK
        corners = jnp.stack([yi - 1, xi - 1], axis=-1)
        if n_pad:
            corners = jnp.concatenate(
                [corners, jnp.zeros((n_pad, 2), corners.dtype)], axis=0)
        W = patch_pallas.extract_windows_int(sp_map, corners, 3,
                                             interpret=interpret)[:n]
        sc = W[:, 1, 1]
        dx = axis_offset(W[:, 1, 0], sc, W[:, 1, 2])
        dy = axis_offset(W[:, 0, 1], sc, W[:, 2, 1])
    else:
        sc = score[yi, xi]
        dx = axis_offset(score[yi, xi - 1], sc, score[yi, xi + 1])
        dy = axis_offset(score[yi - 1, xi], sc, score[yi + 1, xi])
    refined = xy + jnp.stack([dx, dy], axis=-1)
    return jnp.where(valid[:, None], refined, xy)


def dedup_by_bin(xy: jax.Array, score: jax.Array, valid: jax.Array,
                 height: int, width: int, radius: float = 3.0) -> jax.Array:
    """Suppress near-duplicate keypoints: keep the best-scoring one per
    ``radius``-px spatial bin (two half-shifted grids so duplicates that
    straddle a bin boundary are still caught).

    The reference's per-level quadtree NMS never compares ACROSS pyramid
    levels, so the same corner is detected at several octaves with
    near-identical descriptors; that aliasing is what collapsed the Hamming
    matcher's mutual/min-dist statistics (VERDICT r2 weak#2: 36 tracked of
    2048). Cross-level NMS is fixed-shape: ranks are unique (global argsort
    of score), a scatter-max per bin finds each bin's champion, and a slot
    survives iff it is its own bin's champion in BOTH grids.
    """
    k = xy.shape[0]
    # Unique per-slot rank: higher = better score (ties broken by slot index).
    order = jnp.argsort(jnp.where(valid, score, -jnp.inf))
    rank = jnp.zeros(k, jnp.int32).at[order].set(jnp.arange(k, dtype=jnp.int32))
    rank = jnp.where(valid, rank, -1)

    keep = valid
    nbx = int(width / radius) + 3
    nby = int(height / radius) + 3
    for shift in (0.0, 0.5):
        bx = jnp.clip((xy[:, 0] / radius + shift), 0, nbx - 1).astype(jnp.int32)
        by = jnp.clip((xy[:, 1] / radius + shift), 0, nby - 1).astype(jnp.int32)
        bid = jnp.where(valid, by * nbx + bx, nbx * nby)
        champ = jnp.full(nbx * nby + 1, -1, jnp.int32).at[bid].max(rank)
        keep = keep & (rank == champ[bid])
    return keep


def mask_min_distance(xy: jax.Array, valid: jax.Array, existing_xy: jax.Array,
                      existing_valid: jax.Array, min_dist: float) -> jax.Array:
    """Invalidate candidates within ``min_dist`` px of any existing keypoint.

    Replacement for the reference's seeding rule that avoids re-detecting
    features already tracked from the previous frame (``tracking.cpp:268-271``
    seeds LK from the previous feature set). O(K*M) pairwise — fine for K,M
    in the low thousands.
    """
    d2 = jnp.sum((xy[:, None, :] - existing_xy[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(existing_valid[None, :], d2, jnp.inf)
    too_close = jnp.any(d2 < min_dist * min_dist, axis=1)
    return valid & ~too_close
