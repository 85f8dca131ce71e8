"""Dense plane-sweep stereo: integer disparity priors as pure MXU/VPU work.

TPU-first support kernel with no reference counterpart: the reference finds
stereo correspondence by running pyramidal LK sideways
(``/root/reference/src/tracking.cpp:593-618``), which on TPU costs per-point
scalar iteration (the measured VO-step bottleneck — each pixel-cell crossing
is an aligned load + rolls + dot products per point). This module computes a
dense coarse disparity map instead, as a handful of large dense ops the
hardware loves:

  1. shifted stack  X[d] = R shifted right by d  — ONE einsum against a
     (D, W, W) one-hot shift tensor (MXU);
  2. cost volume    C = box_filter(|L - X|)      — two banded-matrix
     matmuls (separable box sum on the MXU);
  3. disparity      argmin_d C                   — one reduction.

The map initializes the LK stereo legs, collapsing their coarse search to a
single finest-level refinement; LK still provides subpixel accuracy and the
photometric/epipolar/cycle gates, so a wrong prior fails a point exactly
like a failed track.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def _box_band(n: int, win: int) -> np.ndarray:
    """(n, n) 0/1 band matrix: (B @ a) = windowed sums of a (win wide)."""
    r = win // 2
    idx = np.arange(n)
    return ((np.abs(idx[:, None] - idx[None, :]) <= r)).astype(np.float32)


def _shift_tensor(w: int, d_max: int) -> np.ndarray:
    """(D, W, W) one-hot tensor: (R @ S[d])[y, x] = R[y, x - d]."""
    S = np.zeros((d_max, w, w), np.float32)
    for d in range(d_max):
        S[d, np.arange(w - d), np.arange(d, w)] = 1.0
    return S


@partial(jax.jit, static_argnames=("d_max", "win"))
def disparity_sweep(left: jax.Array, right: jax.Array, d_max: int = 48,
                    win: int = 9) -> jax.Array:
    """(H, W) left/right level images -> (H, W) integer disparity (float32).

    Brute-force box-SAD over all ``d_max`` disparities at this level. Meant
    for a coarse pyramid level: at level 2 of a factor-2 pyramid, d_max=48
    covers level-0 disparities up to 192 px at ~4 px granularity — inside
    the finest-level LK search radius.
    """
    h, w = left.shape
    L = left.astype(jnp.float32)
    R = right.astype(jnp.float32)
    S = jnp.asarray(_shift_tensor(w, d_max))          # (D, W, W)
    X = jnp.einsum("yx,dxw->dyw", R, S)               # shifted stack (D, H, W)
    C = jnp.abs(L[None] - X)
    By = jnp.asarray(_box_band(h, win))
    Bx = jnp.asarray(_box_band(w, win))
    C = jnp.einsum("yz,dzx->dyx", By, C)              # vertical box sum
    C = jnp.einsum("dyx,xw->dyw", C, Bx)              # horizontal box sum
    # Columns x < d never see a true correspondence (the shift tensor wrote
    # zeros); |L - 0| box sums are already large for textured content, and
    # masking them explicitly keeps flat dark regions honest.
    col = jax.lax.broadcasted_iota(jnp.int32, (d_max, h, w), 2)
    dd = jax.lax.broadcasted_iota(jnp.int32, (d_max, h, w), 0)
    C = jnp.where(col >= dd, C, jnp.inf)
    return jnp.argmin(C, axis=0).astype(jnp.float32)


def sample_map(dmap: jax.Array, xy: jax.Array, scale: float) -> jax.Array:
    """Sample a level-L map at level-0 positions; returns level-0 disparity.

    ``scale`` = 2^L (the map's downsampling factor).
    """
    h, w = dmap.shape
    ix = jnp.clip((xy[:, 0] / scale).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip((xy[:, 1] / scale).astype(jnp.int32), 0, h - 1)
    return dmap[iy, ix] * scale
