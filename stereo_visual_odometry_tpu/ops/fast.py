"""FAST-9/16 corner detection, dense and TPU-native.

Replaces the reference's ``cv::FAST(..., threshold=20, nms=true)`` call in
``Detect_OpenCVFASTFeatures`` (``/root/reference/src/tracking.cpp:94-113``)
and the per-cell FAST of the ORB extractor
(``/root/reference/src/ORBextractor.cpp:760-770``).

Design (TPU-first, SURVEY.md §7): instead of OpenCV's sequential per-pixel
candidate tests, the segment test is evaluated *densely* over the whole image
with vectorized shifts — a (H, W, 16) brighter/darker mask, and the
"≥9 contiguous" predicate computed with log-steps of rotate-and-AND on the
VPU. The corner *score* is OpenCV-compatible: the maximum threshold at which
the pixel remains a corner, i.e. max over 16 contiguous 9-arcs of the min
ring difference. Non-max suppression is a 3x3 dense max filter. Everything is
static-shape; keypoint lists come from `select.top_k_keypoints`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# The Bresenham circle of radius 3 used by FAST-16, in OpenCV's ring order
# (offsets are (dy, dx), starting straight up and going clockwise).
RING_OFFSETS = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1),
)

ARC_LEN = 9  # FAST-9: at least 9 contiguous ring pixels all brighter/darker.
BORDER = 3


def _ring_stack(img: jax.Array) -> jax.Array:
    """(H, W) -> (16, H, W): image sampled at each ring offset.

    Uses jnp.roll — border pixels wrap, but detections within BORDER of the
    edge are masked out by callers, so wrapped values never matter.
    """
    return jnp.stack([jnp.roll(img, (-dy, -dx), axis=(0, 1)) for (dy, dx) in RING_OFFSETS])


@functools.lru_cache(maxsize=None)
def _run_plan(n: int) -> tuple[int, ...]:
    """Decompose n into powers of two (binary) for rotate-and-AND runs."""
    out = []
    bit = 1
    while bit <= n:
        if n & bit:
            out.append(bit)
        bit <<= 1
    return tuple(out)


def _min_over_arcs(vals16: jax.Array, n: int) -> jax.Array:
    """m[i] = min of vals[i..i+n-1] circularly along axis 0 (same doubling)."""
    parts = _run_plan(n)
    pow_runs = {1: vals16}
    p = 1
    while p * 2 <= n:
        pow_runs[p * 2] = jnp.minimum(pow_runs[p], jnp.roll(pow_runs[p], -p, axis=0))
        p *= 2
    acc = None
    offset = 0
    for part in parts:
        r = jnp.roll(pow_runs[part], -offset, axis=0)
        acc = r if acc is None else jnp.minimum(acc, r)
        offset += part
    return acc


def fast_score(img: jax.Array, threshold: float) -> jax.Array:
    """Dense FAST-9 corner score map.

    Args:
      img: (H, W) grayscale, any float/int dtype (converted to float32).
      threshold: segment-test threshold (reference hardcodes 20,
        ``tracking.cpp:99``; ORB uses 20 then 7, ``default.yaml:92-93``).

    Returns:
      (H, W) float32 score map; 0 where not a corner. Score is the OpenCV
      definition: (max threshold for which the segment test still passes),
      computed as max over the 16 contiguous arcs of the arc-min difference.
    """
    img = img.astype(jnp.float32)
    ring = _ring_stack(img)  # (16, H, W)
    diff = ring - img[None]  # positive -> ring brighter
    bright_arc_min = _min_over_arcs(diff, ARC_LEN)         # (16, H, W)
    dark_arc_min = _min_over_arcs(-diff, ARC_LEN)
    bright_score = jnp.max(bright_arc_min, axis=0)
    dark_score = jnp.max(dark_arc_min, axis=0)
    score = jnp.maximum(bright_score, dark_score)
    is_corner = score > threshold
    score = jnp.where(is_corner, score, 0.0)
    # Mask the border where the ring wraps.
    h, w = img.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = ((row >= BORDER) & (row < h - BORDER) &
              (col >= BORDER) & (col < w - BORDER))
    return jnp.where(inside, score, 0.0)


def nms3x3(score: jax.Array) -> jax.Array:
    """3x3 non-max suppression: keep strict local maxima (OpenCV-style)."""
    neigh = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max,
        window_dimensions=(3, 3), window_strides=(1, 1), padding="SAME")
    # OpenCV keeps a pixel if its score >= all neighbours and > 0; break flat
    # ties by requiring score == window max (first-come ties both survive,
    # same as cv2's behaviour of comparing > against half the neighbourhood —
    # equality here only differs on exactly-equal adjacent scores, rare).
    return jnp.where((score >= neigh) & (score > 0), score, 0.0)


def detect(img: jax.Array, threshold: float = 20.0, nms: bool = True) -> jax.Array:
    """Dense FAST detection -> score map (0 = not a keypoint)."""
    s = fast_score(img, threshold)
    return nms3x3(s) if nms else s
