"""Image pyramids for LK tracking and ORB extraction.

Replaces ``ORBextractor::ComputePyramid`` (``/root/reference/src/
ORBextractor.cpp:1061-1085``: 8 levels, scale 1.2, INTER_LINEAR resize) and
the internal pyramid of ``cv::calcOpticalFlowPyrLK`` (factor-2 levels).

TPU-first: halving uses a fixed 2x2 average-pool (reduce_window) — a dense,
fusable op; arbitrary-ratio resize (for ORB's 1.2 factor) uses the batched
bilinear gather from ``interp``. All shapes are static per level.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import interp


import functools


@functools.lru_cache(maxsize=32)
def _avg_matrices(h: int, w: int):
    """Banded 0.5-entry downsampling matrices: out = D_row @ img @ D_col."""
    import numpy as np

    d_row = np.zeros((h // 2, h), np.float32)
    d_row[np.arange(h // 2), 2 * np.arange(h // 2)] = 0.5
    d_row[np.arange(h // 2), 2 * np.arange(h // 2) + 1] = 0.5
    d_col = np.zeros((w, w // 2), np.float32)
    d_col[2 * np.arange(w // 2), np.arange(w // 2)] = 0.5
    d_col[2 * np.arange(w // 2) + 1, np.arange(w // 2)] = 0.5
    return d_row, d_col


def downsample2(img: jax.Array) -> jax.Array:
    """(..., H, W) -> (..., H//2, W//2) by 2x2 mean pooling (H, W even).

    Expressed as two matmuls with banded averaging matrices — the MXU path.
    Strided slicing, reduce_window, and single-channel convs all lower to
    ~30 ms per KITTI frame on TPU; the matmuls are microseconds. Batch
    dims broadcast through the matmuls (one MXU op for a stereo pair).
    """
    h, w = img.shape[-2:]
    d_row, d_col = _avg_matrices(h, w)
    out = jnp.matmul(jnp.asarray(d_row), img, precision=jax.lax.Precision.HIGHEST)
    return jnp.matmul(out, jnp.asarray(d_col), precision=jax.lax.Precision.HIGHEST)


def build_pyramid(img: jax.Array, levels: int) -> list[jax.Array]:
    """Factor-2 pyramid [level0=img, level1=half, ...]. Used by LK."""
    out = [img.astype(jnp.float32)]
    for _ in range(levels - 1):
        out.append(downsample2(out[-1]))
    return out


@functools.lru_cache(maxsize=64)
def _resize_matrix(n_out: int, n_in: int):
    """(n_out, n_in) bilinear resampling matrix (align-corners=False)."""
    import numpy as np

    s = n_in / n_out
    pos = (np.arange(n_out, dtype=np.float64) + 0.5) * s - 0.5
    i0 = np.clip(np.floor(pos).astype(int), 0, n_in - 1)
    i1 = np.clip(i0 + 1, 0, n_in - 1)
    f = np.clip(pos - np.floor(pos), 0.0, 1.0)
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), i0] += 1.0 - f
    m[np.arange(n_out), i1] += f
    return m


def resize_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Arbitrary-size bilinear resize (align-corners=False, like cv::resize).

    Separable resampling as two banded matmuls (MXU); batch dims broadcast.
    Per-pixel gathers scalarize on TPU.
    """
    h, w = img.shape[-2:]
    mr = jnp.asarray(_resize_matrix(out_h, h))
    mc = jnp.asarray(_resize_matrix(out_w, w))
    out = jnp.matmul(mr, img.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.matmul(out, mc.T, precision=jax.lax.Precision.HIGHEST)


def scale_pyramid(img: jax.Array, levels: int, scale_factor: float) -> list[jax.Array]:
    """ORB-style pyramid with per-level scale ``1/scale_factor**level``.

    Mirrors the level geometry of ``ComputePyramid`` (``ORBextractor.cpp:
    1061-1085``) without the explicit 19 px border (our samplers clamp at
    edges instead; detection masks handle the edge threshold). Accepts
    (..., H, W); leading dims batch through the matmuls.
    """
    h, w = img.shape[-2:]
    out = [img.astype(jnp.float32)]
    for lvl in range(1, levels):
        s = 1.0 / (scale_factor ** lvl)
        out.append(resize_bilinear(img, max(int(round(h * s)), 8), max(int(round(w * s)), 8)))
    return out


@functools.lru_cache(maxsize=64)
def _blur_matrix(n: int, ksize: int, sigma: float):
    """Banded (n, n) separable-Gaussian matrix (edge-clamped taps)."""
    import numpy as np

    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    m = np.zeros((n, n), np.float32)
    for i in range(n):
        for t, kv in zip(range(i - r, i + r + 1), k):
            m[i, min(max(t, 0), n - 1)] += kv
    return m


def gaussian_blur(img: jax.Array, ksize: int = 7, sigma: float = 2.0) -> jax.Array:
    """Separable Gaussian blur, matching the 7x7 sigma-2 blur applied before
    BRIEF sampling (``ORBextractor.cpp:1033-1035``).

    Expressed as two banded matmuls (B_row @ img @ B_col^T) — single-channel
    convs lower terribly on TPU; these ride the MXU. Batch dims broadcast.
    """
    h, w = img.shape[-2:]
    br = jnp.asarray(_blur_matrix(h, ksize, sigma))
    bc = jnp.asarray(_blur_matrix(w, ksize, sigma))
    img = img.astype(jnp.float32)
    out = jnp.matmul(br, img, precision=jax.lax.Precision.HIGHEST)
    return jnp.matmul(out, bc.T, precision=jax.lax.Precision.HIGHEST)
