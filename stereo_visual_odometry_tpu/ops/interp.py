"""Bilinear image sampling, shared by LK tracking and ORB descriptors.

The reference relies on OpenCV's internal interpolation inside
``calcOpticalFlowPyrLK`` (``/root/reference/src/tracking.cpp:593-618``) and
``cv::resize`` (``ORBextractor.cpp:1070``). Here sampling is an explicit,
batched gather: sample counts are static, XLA lowers the gathers onto the
VPU, and everything vmaps cleanly over keypoints.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear(img: jax.Array, xy: jax.Array) -> jax.Array:
    """Sample ``img`` (H, W) at continuous pixel coords ``xy`` (..., 2) [x, y].

    Out-of-bounds coordinates clamp to the border (OpenCV BORDER_REPLICATE
    semantics, what PyrLK uses at image edges).
    """
    h, w = img.shape
    x = xy[..., 0]
    y = xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def patch_grid(patch_size: int, dtype=jnp.float32) -> jax.Array:
    """Centered (P, P, 2) offset grid: offsets[-r..r] for odd patch_size."""
    r = (patch_size - 1) / 2.0
    ys = jnp.arange(patch_size, dtype=dtype) - r
    xs = jnp.arange(patch_size, dtype=dtype) - r
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx, gy], axis=-1)


def sample_patch(img: jax.Array, center_xy: jax.Array, patch_size: int) -> jax.Array:
    """Bilinear (patch_size, patch_size) patch around ``center_xy`` (2,)."""
    grid = patch_grid(patch_size, dtype=center_xy.dtype)
    return bilinear(img, grid + center_xy)


def sample_patches(img: jax.Array, centers_xy: jax.Array, patch_size: int) -> jax.Array:
    """Batched: (N, 2) centers -> (N, P, P) patches via one fused gather."""
    grid = patch_grid(patch_size, dtype=centers_xy.dtype)
    coords = centers_xy[:, None, None, :] + grid[None]
    return bilinear(img, coords)
