"""Brute-force Hamming descriptor matching with reference filter semantics.

TPU-native replacement for ``cv::DescriptorMatcher "BruteForce-Hamming"``
and ``ORB_Robust_Find_MuliImage_MatchedFeatures``
(``/root/reference/src/tracking.cpp:534-581``).

The N x M Hamming distance matrix is computed in one shot: XOR the packed
uint32 descriptor words and popcount with the SWAR bit trick — pure VPU
integer ops, no data-dependent shapes. Matching (argmin per row), the
``dist <= max(2*min_dist, 30)`` gate, the two-view consistency (a t1L
feature must survive both the stereo and the temporal matching), and the
stereo epipolar |Δy| gate all become masked tensor ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Python int, not jnp.int32: a module-level jnp constant is a device op at
# import time, which forces backend init before the caller can pick one.
_BIG = 1 << 30


def popcount_u32(x: jax.Array) -> jax.Array:
    """SWAR popcount for uint32 arrays."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def hamming_matrix(desc_a: jax.Array, desc_b: jax.Array,
                   valid_a: jax.Array | None = None,
                   valid_b: jax.Array | None = None) -> jax.Array:
    """(N, W) x (M, W) packed-uint32 descriptors -> (N, M) int32 distances.

    Invalid rows/cols get a large sentinel distance so they never match.
    """
    x = desc_a[:, None, :] ^ desc_b[None, :, :]  # (N, M, W)
    d = jnp.sum(popcount_u32(x), axis=-1)
    if valid_a is not None:
        d = jnp.where(valid_a[:, None], d, _BIG)
    if valid_b is not None:
        d = jnp.where(valid_b[None, :], d, _BIG)
    return d


def match_best(dist: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row best match: (N,) target index and (N,) distance."""
    idx = jnp.argmin(dist, axis=1)
    best = jnp.take_along_axis(dist, idx[:, None], axis=1)[:, 0]
    return idx.astype(jnp.int32), best


def mutual_mask(dist: jax.Array, idx_ab: jax.Array) -> jax.Array:
    """Cross-check: row i's best column's best row must be i."""
    idx_ba = jnp.argmin(dist, axis=0).astype(jnp.int32)  # best row per column
    n = dist.shape[0]
    back = idx_ba[idx_ab]
    return back == jnp.arange(n, dtype=jnp.int32)


def reference_distance_gate(best: jax.Array, valid: jax.Array,
                            floor: float = 30.0, ratio: float = 2.0) -> jax.Array:
    """``dist <= max(ratio * min_dist, floor)`` over the valid matches —
    the reference's adaptive threshold (``tracking.cpp:549-577``)."""
    min_dist = jnp.min(jnp.where(valid, best, _BIG))
    thr = jnp.maximum(ratio * min_dist.astype(jnp.float32), floor)
    return valid & (best.astype(jnp.float32) <= thr)


def stereo_match(feat_l: dict, feat_r: dict,
                 feature_match_error: float = 2.0,
                 dist_floor: float = 30.0, dist_ratio: float = 2.0,
                 max_level_diff: int | None = None,
                 stereo_premask: bool = False,
                 max_disparity: float = 128.0):
    """Single left<->right association of one stereo pair.

    The stereo half of ``stereo_temporal_match`` (same gates, same premask
    options) as a standalone op — used by the persistent-track ORB frontend
    to triangulate the CURRENT pair for landmark initialization (the LK
    path gets this from its circular track's t2l/t2r legs).

    Returns dict(idx_r (N,) int32, valid (N,) bool, dist (N,) int32).
    """
    d = hamming_matrix(feat_l["desc"], feat_r["desc"],
                       feat_l["valid"], feat_r["valid"])
    if max_level_diff is not None:
        dl = jnp.abs(feat_l["level"][:, None] - feat_r["level"][None, :])
        d = jnp.where(dl <= max_level_diff, d, _BIG)
    if stereo_premask:
        dy = jnp.abs(feat_l["xy"][:, None, 1] - feat_r["xy"][None, :, 1])
        disp = feat_l["xy"][:, None, 0] - feat_r["xy"][None, :, 0]
        feas = (dy < feature_match_error) & (disp > 0.0) & (disp <= max_disparity)
        d = jnp.where(feas, d, _BIG)
    idx_r, best = match_best(d)
    v = feat_l["valid"] & (best < _BIG)
    v = reference_distance_gate(best, v, dist_floor, dist_ratio)
    y_l = feat_l["xy"][:, 1]
    y_r = feat_r["xy"][idx_r, 1]
    v = v & (jnp.abs(y_l - y_r) < feature_match_error)
    x_l = feat_l["xy"][:, 0]
    x_r = feat_r["xy"][idx_r, 0]
    v = v & (x_l - x_r > 0.0)
    return {"idx_r": idx_r, "valid": v, "dist": best}


def stereo_temporal_match(feat_t1l: dict, feat_t1r: dict, feat_t2l: dict,
                          feature_match_error: float = 2.0,
                          dist_floor: float = 30.0, dist_ratio: float = 2.0,
                          use_mutual: bool = False,
                          max_level_diff: int | None = None,
                          stereo_premask: bool = False,
                          max_disparity: float = 128.0,
                          temporal_radius: float | None = None):
    """The reference's two-matching association for the ORB pipeline.

    match1 = t1L <-> t1R (stereo), match2 = t1L <-> t2L (temporal)
    (``tracking.cpp:543-544``). A t1L feature survives iff it passes the
    adaptive distance gate in BOTH matchings and the stereo pair satisfies
    |Δy| < feature_match_error (``tracking.cpp:564-577``). ``use_mutual``
    optionally adds a cross-check; the reference does NOT have one
    (``BFMatcher::match`` is one-way), and stacking it on the two-matching +
    adaptive gate collapses yield — precision comes from the epipolar gate
    and RANSAC-PnP downstream, as in the reference.

    TPU-first extensions beyond ``cv::BFMatcher`` (all masks fold into the
    dense (N, M) distance matrix at negligible cost, so candidate gating
    happens BEFORE the argmin instead of discarding rows after it — the
    fix for cross-level duplicate aliasing, VERDICT r4 next #1):

    * ``max_level_diff``: match only octave-adjacent detections
      (|Δlevel| <= k). The same physical corner is re-detected at several
      pyramid levels with DIFFERENT descriptor support; letting a level-0
      detection match a level-4 duplicate splits the vote and inflates
      distances. Same-or-adjacent-level candidates are the ones whose
      descriptors are commensurate.
    * ``stereo_premask``: restrict the stereo matching to epipolar-feasible
      candidates (|Δy| < feature_match_error, 0 < disparity <=
      max_disparity) instead of gating after the argmin — the rectified
      geometry is known, so a feature's true partner cannot lose the argmin
      to a lookalike elsewhere in the image.
    * ``temporal_radius``: restrict the temporal matching to candidates
      within R px (frame-to-frame motion bound; None = unrestricted).

    Args:
      feat_*: dicts from ``orb.detect_and_describe`` (xy, desc, valid,
      level).
    Returns:
      dict(idx_r, idx_t2l (N,) int32 target indices; valid (N,) bool) —
      fixed-size, indexed by t1L slots.
    """
    d_st = hamming_matrix(feat_t1l["desc"], feat_t1r["desc"],
                          feat_t1l["valid"], feat_t1r["valid"])
    d_tm = hamming_matrix(feat_t1l["desc"], feat_t2l["desc"],
                          feat_t1l["valid"], feat_t2l["valid"])

    if max_level_diff is not None:
        dl_st = jnp.abs(feat_t1l["level"][:, None] - feat_t1r["level"][None, :])
        dl_tm = jnp.abs(feat_t1l["level"][:, None] - feat_t2l["level"][None, :])
        d_st = jnp.where(dl_st <= max_level_diff, d_st, _BIG)
        d_tm = jnp.where(dl_tm <= max_level_diff, d_tm, _BIG)
    if stereo_premask:
        dy = jnp.abs(feat_t1l["xy"][:, None, 1] - feat_t1r["xy"][None, :, 1])
        disp = feat_t1l["xy"][:, None, 0] - feat_t1r["xy"][None, :, 0]
        feas = (dy < feature_match_error) & (disp > 0.0) & (disp <= max_disparity)
        d_st = jnp.where(feas, d_st, _BIG)
    if temporal_radius is not None:
        d2 = jnp.sum((feat_t1l["xy"][:, None, :] -
                      feat_t2l["xy"][None, :, :]) ** 2, axis=-1)
        d_tm = jnp.where(d2 <= temporal_radius * temporal_radius, d_tm, _BIG)

    idx_r, best_st = match_best(d_st)
    idx_t, best_tm = match_best(d_tm)

    v = feat_t1l["valid"] & (best_st < _BIG) & (best_tm < _BIG)
    if use_mutual:
        v = v & mutual_mask(d_st, idx_r) & mutual_mask(d_tm, idx_t)
    v = reference_distance_gate(best_st, v, dist_floor, dist_ratio) & \
        reference_distance_gate(best_tm, v, dist_floor, dist_ratio)

    # Stereo epipolar gate on the matched right feature.
    y_l = feat_t1l["xy"][:, 1]
    y_r = feat_t1r["xy"][idx_r, 1]
    v = v & (jnp.abs(y_l - y_r) < feature_match_error)
    # Positive disparity (right image feature to the left of the left's).
    x_l = feat_t1l["xy"][:, 0]
    x_r = feat_t1r["xy"][idx_r, 0]
    v = v & (x_l - x_r > 0.0)

    return {"idx_r": idx_r, "idx_t2l": idx_t, "valid": v,
            "dist_stereo": best_st, "dist_temporal": best_tm}
