"""ORB: oriented FAST keypoints + rotated-BRIEF binary descriptors, batched.

TPU-native replacement for the reference's ``ORBextractor`` (ORB-SLAM2
lineage, ``/root/reference/src/ORBextractor.cpp``): scale pyramid
(``ComputePyramid``, :1061-1085), per-cell FAST with high/low thresholds
(``ComputeKeyPointsOctTree``, :737-782), quadtree NMS (``DistributeOctTree``,
:487-715), intensity-centroid orientation (``IC_Angle``, :21-48), and the
256-pair rotated BRIEF descriptor (``computeOrbDescriptor``, :51-97).

Design differences, chosen for the hardware (SURVEY.md §7):

* Detection is dense (``fast.fast_score`` over the whole level) with the
  two-threshold retry folded in: score at the low threshold, prefer cells
  that pass the high one — equivalent coverage without per-cell loops.
* The quadtree becomes ``select.grid_top_k`` (per-cell top-k + global
  top-K): the same spatial-uniformity-under-budget contract, expressed as
  dense reshapes.
* The BRIEF sampling pattern is the published learned 256-pair table
  (``ops/orb_pattern.py``; the constant the reference embeds at
  ``ORBextractor.cpp:99-357``) — measurably more discriminative than a
  random Gaussian pattern (see ``scripts/probe_pattern_ab.py``). A seeded
  Gaussian fallback remains available for A/B via ``set_pattern``.
* Descriptor sampling reads a 39x39 patch (``DESC_PATCH``): learned points
  reach radius 18.4 under rotation, beyond the 31x31 IC-angle patch; the
  reference avoids clamping by sampling the full image inside its EDGE=19
  border — a larger patch is the batched equivalent.
* Descriptors are packed 256 bits -> 8 x uint32 for the popcount matcher.

Everything is fixed-shape: each level contributes exactly its budgeted
keypoint count (invalid slots masked), mirroring the per-level geometric
budget of ``ORBextractor.cpp:383-394``.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import fast, interp, orb_pattern, pyramid, select

PATCH = 31
HALF_PATCH = 15
DESC_PATCH = 39  # descriptor sampling patch (covers learned-pattern radius
                 # 18.4 under rotation + bilinear support)
EDGE = 19  # keep-out border for description (``ORBextractor.cpp:19``)
N_BITS = 256
N_WORDS = N_BITS // 32


def _make_pattern(seed: int = 1234) -> np.ndarray:
    """Seeded-Gaussian BRIEF pattern: (256, 2, 2) offsets (pairs of (x, y)).

    Gaussian sigma = PATCH/5 (the BRIEF paper's choice), clamped to radius 13
    so rotated samples stay inside the blurred patch. Kept for A/B against
    the learned table (``set_pattern``)."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, PATCH / 5.0, size=(N_BITS, 2, 2))
    r = 13.0
    norm = np.linalg.norm(pts, axis=-1, keepdims=True)
    pts = np.where(norm > r, pts * (r / norm), pts)
    return np.round(pts).astype(np.float32)


# numpy, not jnp: module-level jnp constants are device ops at import time,
# forcing backend init before the caller can pick a platform. As numpy they
# are embedded as compile-time constants when first used under jit.
# Default = the published learned table (ops/orb_pattern.py).
BRIEF_PATTERN = orb_pattern.pattern_pairs()  # (256, 2, 2) [pair, pt, (x, y)]


def set_pattern(kind: str = "learned") -> None:
    """Select the BRIEF pattern ('learned' | 'gaussian') — A/B hook.

    Invalidates the cached bin weights; callers must also clear jit caches
    (``jax.clear_caches()``) since traced programs embed the weights."""
    global BRIEF_PATTERN, _BIN_DIFF_NP
    BRIEF_PATTERN = (orb_pattern.pattern_pairs() if kind == "learned"
                     else _make_pattern())
    _BIN_DIFF_NP = None

# Circular-patch mask and coordinate grids for IC_Angle (radius HALF_PATCH),
# equivalent to the umax row-extent table of ``ORBextractor.cpp:400-417``.
_yy, _xx = np.mgrid[-HALF_PATCH:HALF_PATCH + 1, -HALF_PATCH:HALF_PATCH + 1]
_circle = (_xx ** 2 + _yy ** 2) <= HALF_PATCH ** 2
IC_MASK = _circle.astype(np.float32)
IC_X = (_xx * _circle).astype(np.float32)
IC_Y = (_yy * _circle).astype(np.float32)


def ic_angle_from_patches(patches: jax.Array) -> jax.Array:
    """Intensity-centroid orientation from (N, 31, 31) patches -> (N,) rad.

    ``IC_Angle`` (``ORBextractor.cpp:21-48``): angle = atan2(m01, m10) over
    the circular 31x31 patch. Dense masked sums on the VPU.
    """
    m10 = jnp.sum(patches * IC_X, axis=(1, 2))
    m01 = jnp.sum(patches * IC_Y, axis=(1, 2))
    return jnp.arctan2(m01, m10)


def ic_angle(img: jax.Array, xy: jax.Array) -> jax.Array:
    from . import patch_pallas

    return ic_angle_from_patches(patch_pallas.extract_patches(img, xy, PATCH))


def _ic_crop(patches: jax.Array) -> jax.Array:
    """Central (31, 31) view of (N, DESC_PATCH, DESC_PATCH) patches."""
    off = (DESC_PATCH - PATCH) // 2
    return patches[:, off:off + PATCH, off:off + PATCH]


# --- Binned-rotation BRIEF as one-hot matmuls (MXU-friendly) -------------- #
#
# The reference rotates the sampling pattern continuously per keypoint and
# gathers 512 scattered samples (``computeOrbDescriptor``). Scattered
# per-keypoint gathers scalarize on TPU, so the rotation is quantized to
# N_ANGLE_BINS (11.25 deg bins -> <= 5.6 deg error, well inside BRIEF's
# tolerance) and sampling becomes a dense contraction: for each bin, a
# precomputed (512, 31*31) bilinear-weight matrix maps patch pixels to the
# 512 sample values; all bins are computed (tiny MXU matmuls) and each
# keypoint selects its own bin's result.

N_ANGLE_BINS = 32


def _make_bin_weights() -> np.ndarray:
    """(B, 512, DESC_PATCH*DESC_PATCH) bilinear sampling matrices per bin."""
    pts = np.asarray(BRIEF_PATTERN).reshape(N_BITS * 2, 2)  # (512, [x, y])
    P = DESC_PATCH
    r = (P - 1) // 2
    out = np.zeros((N_ANGLE_BINS, N_BITS * 2, P * P), np.float32)
    for b in range(N_ANGLE_BINS):
        th = 2 * np.pi * b / N_ANGLE_BINS
        c, s = np.cos(th), np.sin(th)
        rx = c * pts[:, 0] - s * pts[:, 1]
        ry = s * pts[:, 0] + c * pts[:, 1]
        # Clamp rotated samples inside the patch and spread bilinearly
        # (DESC_PATCH is sized so nothing actually clamps).
        x = np.clip(rx + r, 0, P - 1 - 1e-4)
        y = np.clip(ry + r, 0, P - 1 - 1e-4)
        x0 = np.floor(x).astype(int)
        y0 = np.floor(y).astype(int)
        fx = x - x0
        fy = y - y0
        for k in range(N_BITS * 2):
            for (dy, dx, w) in ((0, 0, (1 - fy[k]) * (1 - fx[k])),
                                (0, 1, (1 - fy[k]) * fx[k]),
                                (1, 0, fy[k] * (1 - fx[k])),
                                (1, 1, fy[k] * fx[k])):
                out[b, k, (y0[k] + dy) * P + (x0[k] + dx)] += w
    return out


_BIN_DIFF_NP = None


def _bin_diff_weights() -> jax.Array:
    """(B, 256, DESC_PATCH^2) pair-DIFFERENCE sampling matrices, lazily built (the
    array must not tax LK-only runs at import time; the cache holds numpy —
    caching a jnp array here would leak a tracer when first touched inside a
    jit trace).

    Each descriptor bit compares two sample values: bit_k = (s_{2k} <
    s_{2k+1}) = (flat . (W_{2k+1} - W_{2k}) > 0). Contracting against the
    difference matrix directly halves both the MXU work and the (N, B, .)
    intermediate vs. computing all 512 sample values, and does one
    rounding instead of two before the comparison."""
    global _BIN_DIFF_NP
    if _BIN_DIFF_NP is None:
        w = _make_bin_weights()  # (B, 512, P*P)
        _BIN_DIFF_NP = w[:, 1::2, :] - w[:, 0::2, :]  # (B, 256, P*P)
    return jnp.asarray(_BIN_DIFF_NP)


def brief_bits_from_patches(patches_blur: jax.Array, angle: jax.Array) -> jax.Array:
    """(N, DESC_PATCH, DESC_PATCH) blurred patches + (N,) angles -> (N, 256) bits.

    Bit k = (sample at pair point 0 < sample at point 1), matching
    ``computeOrbDescriptor``'s ``t0 < t1`` (``ORBextractor.cpp:91-95``)."""
    n = patches_blur.shape[0]
    flat = patches_blur.reshape(n, DESC_PATCH * DESC_PATCH)
    two_pi = 2.0 * jnp.pi
    bins = jnp.round(jnp.mod(angle, two_pi) / two_pi * N_ANGLE_BINS)
    bins = jnp.mod(bins, N_ANGLE_BINS).astype(jnp.int32)
    # All-bin pair differences via one batched MXU contraction, then
    # per-point bin selection. One big einsum beats 32 per-bin matmuls by
    # ~1.7x measured (the scan serializes; the MXU wants one large shape);
    # contracting pair differences instead of raw samples halves the FLOPs
    # and the (N, B, .) intermediate. f32 HIGHEST, not bf16: the descriptor
    # needs each difference's SIGN, and measured on v5e bf16 rounding flips
    # a median of 3 bits per descriptor (up to ~70 on low-contrast patches
    # — tests_tpu/test_orb_tpu.py); the whole ORB extract stage is
    # 0.15 ms/frame, so buying exactness costs nothing that matters.
    D = _bin_diff_weights()
    diffs_all = jnp.einsum("np,bkp->nbk", flat, D,
                           precision=jax.lax.Precision.HIGHEST)  # (N, B, 256)
    diffs = jnp.take_along_axis(
        diffs_all, bins[:, None, None], axis=1)[:, 0]  # (N, 256)
    return (diffs > 0).astype(jnp.uint32)


def pack_bits(bits: jax.Array) -> jax.Array:
    """(N, 256) 0/1 -> (N, 8) packed uint32 (little-endian per word)."""
    n = bits.shape[0]
    words = bits.astype(jnp.uint32).reshape(n, N_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def brief_from_patches(patches_blur: jax.Array, angle: jax.Array) -> jax.Array:
    """(N, DESC_PATCH, DESC_PATCH) blurred patches + (N,) angles -> (N, 8) uint32."""
    return pack_bits(brief_bits_from_patches(patches_blur, angle))


def brief_descriptors(img_blur: jax.Array, xy: jax.Array, angle: jax.Array) -> jax.Array:
    """Rotated-BRIEF: (N,) keypoints -> (N, 8) uint32 packed descriptors.

    Capability-parity with ``computeOrbDescriptor`` (``ORBextractor.cpp:
    51-97``) — pattern rotated by keypoint angle (quantized to
    ``N_ANGLE_BINS``), blurred image compared at each pair, bits packed
    little-endian per word.
    """
    from . import patch_pallas

    patches = patch_pallas.extract_patches(img_blur, xy, DESC_PATCH)
    return brief_from_patches(patches, angle)


def _level_budgets(n_features: int, levels: int, scale_factor: float) -> list[int]:
    """Geometric per-level feature budget (``ORBextractor.cpp:383-394``)."""
    inv = 1.0 / scale_factor
    first = n_features * (1 - inv) / (1 - inv ** levels)
    out = []
    acc = 0
    for lvl in range(levels - 1):
        k = int(round(first * inv ** lvl))
        out.append(k)
        acc += k
    out.append(max(n_features - acc, 0))
    return out


@partial(jax.jit, static_argnames=("n_features", "levels", "scale_factor",
                                   "cell", "k_per_cell", "dedup_radius",
                                   "upright"))
def detect_and_describe(img: jax.Array, n_features: int = 2000, levels: int = 8,
                        scale_factor: float = 1.2, ini_th: float = 20.0,
                        min_th: float = 7.0, cell: int = 32, k_per_cell: int = 8,
                        dedup_radius: float = 0.0, upright: bool = False):
    """Full ORB extraction on one image.

    Operating point matches the reference defaults: 2000 features, 8 levels,
    scale 1.2, FAST thresholds 20/7 (``config/default.yaml:89-93``).

    Returns dict(xy (K, 2) level-0 coords, desc (K, 8) uint32, angle (K,),
    score (K,), level (K,) int32, valid (K,) bool) with
    K = n_features (static).
    """
    img = img.astype(jnp.float32)
    pyr = pyramid.scale_pyramid(img, levels, scale_factor)
    budgets = _level_budgets(n_features, levels, scale_factor)

    outs = []
    for lvl, (level_img, budget) in enumerate(zip(pyr, budgets)):
        if budget <= 0:
            continue
        h, w = level_img.shape
        # Pad to cell multiples for grid_top_k (scores in the pad are 0).
        ph = (h + cell - 1) // cell * cell
        pw = (w + cell - 1) // cell * cell
        # Two-threshold FAST: low-threshold score map, but boost cells that
        # contain high-threshold corners so they dominate selection — the
        # dense analogue of "try iniTh, retry cell at minTh if empty"
        # (``ORBextractor.cpp:763-770``).
        score_lo = fast.detect(level_img, min_th)
        hi = score_lo > ini_th
        score = jnp.where(hi, score_lo + 1e4, score_lo)
        score = jnp.pad(score, ((0, ph - h), (0, pw - w)))
        # Mask the EDGE border (descriptor keep-out).
        row = jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 1)
        inside = ((row >= EDGE) & (row < h - EDGE) & (col >= EDGE) & (col < w - EDGE))
        score = jnp.where(inside, score, 0.0)

        xy, sc, valid = select.grid_top_k(score, budget, cell=cell, k_per_cell=k_per_cell)
        sc = jnp.where(sc > 1e4, sc - 1e4, sc)  # undo the hi-threshold boost
        # Subpixel localization on the raw (unboosted) score surface.
        raw = jnp.pad(score_lo, ((0, ph - h), (0, pw - w)))
        xy = select.subpixel_refine(raw, xy, valid)

        # One patch extraction per level, from the blurred image: both the
        # IC angle and the descriptor read the same (N, 31, 31) patches.
        # (The reference computes IC_Angle on the unblurred pyramid,
        # ``ORBextractor.cpp:805-806``, and blurs only for description at
        # :1033-1035; a 7x7 sigma-2 blur shifts the centroid angle by well
        # under the descriptor's 11.25-deg rotation bins, and the change is
        # self-consistent across all images matched by this extractor —
        # measured on hardware it halves the patch-kernel cost of ORB.)
        from . import patch_pallas

        blur = pyramid.gaussian_blur(level_img)  # 7x7 sigma 2 (:1033-1035)
        patches = patch_pallas.extract_patches(blur, xy, DESC_PATCH)
        ang = ic_angle_from_patches(_ic_crop(patches))
        # Upright BRIEF: describe with angle 0 (keep the measured angle in
        # the output for diagnostics). Frame-to-frame stereo VO has near-zero
        # in-plane rotation, so rotating the pattern by the NOISY IC angle
        # only flips bits between views of the same corner.
        desc = brief_from_patches(patches,
                                  jnp.zeros_like(ang) if upright else ang)

        lvl_scale = scale_factor ** lvl
        outs.append({
            "xy": xy * lvl_scale,  # back to level-0 coords (:1044-1051)
            "desc": desc,
            "angle": ang,
            "score": sc,
            "level": jnp.full(xy.shape[:1], lvl, dtype=jnp.int32),
            "valid": valid,
        })

    feat = {k: jnp.concatenate([o[k] for o in outs], axis=0) for k in outs[0]}
    if dedup_radius > 0:
        # Cross-level NMS: the per-level selection (like the reference's
        # per-level quadtree) re-detects the same corner at several octaves;
        # near-identical descriptors poison the matcher's statistics.
        feat["valid"] = select.dedup_by_bin(
            feat["xy"], feat["score"], feat["valid"],
            img.shape[0], img.shape[1], dedup_radius)
    return feat


@partial(jax.jit, static_argnames=("n_features", "levels", "scale_factor",
                                   "cell", "k_per_cell", "dedup_radius",
                                   "upright"))
def detect_and_describe_pair(img_l: jax.Array, img_r: jax.Array,
                             n_features: int = 2000, levels: int = 8,
                             scale_factor: float = 1.2, ini_th: float = 20.0,
                             min_th: float = 7.0, cell: int = 32,
                             k_per_cell: int = 8, dedup_radius: float = 0.0,
                             upright: bool = False):
    """ORB extraction on a stereo pair in ONE fused pass.

    Same per-image semantics as ``detect_and_describe``, but the dense
    matmul stages (pyramid, blur) run batched over the pair, detection runs
    per image (vmapped FAST/top-k lowers poorly — see inline note), patches
    are extracted per image, and the angle + BRIEF contraction runs ONCE on
    the concatenated (2*budget, 31, 31) patch set. On TPU the ORB step is
    op-count-bound, so fusing the contraction is a direct throughput win
    over two single-image passes.

    Returns (feat_l, feat_r) dicts with the ``detect_and_describe`` schema.
    """
    imgs = jnp.stack([img_l.astype(jnp.float32), img_r.astype(jnp.float32)])
    pyr = pyramid.scale_pyramid(imgs, levels, scale_factor)  # (2, h, w) levels
    budgets = _level_budgets(n_features, levels, scale_factor)
    from . import patch_pallas

    outs_l, outs_r = [], []
    for lvl, (level_imgs, budget) in enumerate(zip(pyr, budgets)):
        if budget <= 0:
            continue
        h, w = level_imgs.shape[-2:]
        ph = (h + cell - 1) // cell * cell
        pw = (w + cell - 1) // cell * cell

        def level_select(level_img):
            score_lo = fast.detect(level_img, min_th)
            hi = score_lo > ini_th
            score = jnp.where(hi, score_lo + 1e4, score_lo)
            score = jnp.pad(score, ((0, ph - h), (0, pw - w)))
            row = jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 1)
            inside = ((row >= EDGE) & (row < h - EDGE) &
                      (col >= EDGE) & (col < w - EDGE))
            score = jnp.where(inside, score, 0.0)
            xy, sc, valid = select.grid_top_k(score, budget, cell=cell,
                                              k_per_cell=k_per_cell)
            sc = jnp.where(sc > 1e4, sc - 1e4, sc)
            raw = jnp.pad(score_lo, ((0, ph - h), (0, pw - w)))
            xy = select.subpixel_refine(raw, xy, valid)
            return xy, sc, valid

        # Per-image detection (vmapping FAST/top-k/subpixel measured SLOWER
        # on hardware than two plain passes — batched reduce_window/gather
        # lower poorly); the matmul stages above/below do batch well.
        sel = [level_select(level_imgs[0]), level_select(level_imgs[1])]
        xy2 = jnp.stack([sel[0][0], sel[1][0]])
        sc2 = jnp.stack([sel[0][1], sel[1][1]])
        valid2 = jnp.stack([sel[0][2], sel[1][2]])

        blur = pyramid.gaussian_blur(level_imgs)               # (2, h, w)
        # Per-image patch extraction (a stacked tall-image variant measured
        # perf-neutral and the f32 row-offset jitters the fractional patch
        # position by ~1e-5 px, flipping near-zero BRIEF bits); ONE angle +
        # BRIEF contraction for both images' patches.
        patches = jnp.concatenate(
            [patch_pallas.extract_patches(blur[0], xy2[0], DESC_PATCH),
             patch_pallas.extract_patches(blur[1], xy2[1], DESC_PATCH)], axis=0)
        ang = ic_angle_from_patches(_ic_crop(patches))
        desc = brief_from_patches(patches,
                                  jnp.zeros_like(ang) if upright else ang)

        lvl_scale = scale_factor ** lvl
        for side, outs in enumerate((outs_l, outs_r)):
            sl = slice(side * budget, (side + 1) * budget)
            outs.append({
                "xy": xy2[side] * lvl_scale,
                "desc": desc[sl],
                "angle": ang[sl],
                "score": sc2[side],
                "level": jnp.full((budget,), lvl, dtype=jnp.int32),
                "valid": valid2[side],
            })

    cat = lambda outs: {k: jnp.concatenate([o[k] for o in outs], axis=0)
                        for k in outs[0]}
    fl, fr = cat(outs_l), cat(outs_r)
    if dedup_radius > 0:
        h0, w0 = img_l.shape
        for f in (fl, fr):
            f["valid"] = select.dedup_by_bin(
                f["xy"], f["score"], f["valid"], h0, w0, dedup_radius)
    return fl, fr
