"""Pallas TPU kernel for the pyramidal LK iteration loop.

The XLA formulation of ``lk._level_track`` extracts per-point search windows
with vmapped dynamic slices — XLA lowers those to gathers, which scalarize
on TPU (~0.5 s per track call at 1024 points, 95% of the VO step). Here the
whole level fits in VMEM (a padded KITTI frame is ~2 MB against ~16 MB
VMEM), so the kernel reads both images as full VMEM blocks and every
keypoint's sampling is a cheap VMEM dynamic slice:

* grid over keypoint blocks (BLK points per program);
* per point: one (TS, TS) template slice -> bilinear field -> template patch
  + gradients (the 2x2 normal matrix is computed once);
* the iteration loop samples the warped patch by integer slice + 4-tap
  blend (all patch samples share one fractional offset) and updates the
  flow scalars — pure VPU work, nothing touches HBM.

Numerics match ``lk._level_track`` (same template gradients, same masked
convergence, same search-radius semantics); ``tests/test_lk_pallas.py``
asserts agreement in interpret mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 8  # keypoints per grid program


def _blend4(sub: jax.Array, fy, fx) -> jax.Array:
    """(P+1, P+1) -> (P, P) bilinear field at fractional offset (fy, fx)."""
    a = sub[:-1, :-1]
    b = sub[:-1, 1:]
    c = sub[1:, :-1]
    d = sub[1:, 1:]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx +
            c * fy * (1 - fx) + d * fy * fx)


def _make_kernel(win: int, ws: int, iters: int, eps: float, min_eig: float):
    r = (win - 1) // 2
    ts = win + 4  # template slice: win+3 bilinear field + 1 for floor

    def kernel(pts_ref, trel_ref, wrel_ref, tori_ref, wori_ref,
               prev_ref, next_ref, flow_ref, ok_ref):
        for j in range(BLK):
            # Template region -> bilinear field -> T, Ix, Iy.
            t_r = tori_ref[j, 0]
            t_c = tori_ref[j, 1]
            tw = prev_ref[pl.ds(t_r, ts), pl.ds(t_c, ts)]
            # Patch top-left in template-window coords (float, >= 1 by
            # construction); the field spans offsets -1..win+1.
            ty = trel_ref[j, 0]
            tx = trel_ref[j, 1]
            ty0 = jnp.floor(ty - 1.0)
            tx0 = jnp.floor(tx - 1.0)
            tfy = ty - 1.0 - ty0
            tfx = tx - 1.0 - tx0
            sub = jax.lax.dynamic_slice(
                tw, (ty0.astype(jnp.int32), tx0.astype(jnp.int32)),
                (win + 3, win + 3))
            field = _blend4(sub, tfy, tfx)          # (win+2, win+2)
            T = field[1:-1, 1:-1]                   # (win, win)
            Ix = (field[1:-1, 2:] - field[1:-1, :-2]) * 0.5
            Iy = (field[2:, 1:-1] - field[:-2, 1:-1]) * 0.5

            g00 = jnp.sum(Ix * Ix)
            g01 = jnp.sum(Ix * Iy)
            g11 = jnp.sum(Iy * Iy)
            det = g00 * g11 - g01 * g01
            tr = g00 + g11
            mev = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) * 0.5 / (win * win)
            ok = (mev > min_eig).astype(jnp.float32)
            safe_det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
            inv00 = g11 / safe_det
            inv01 = -g01 / safe_det
            inv11 = g00 / safe_det

            # Search window (ws, ws) from the next image.
            w_r = wori_ref[j, 0]
            w_c = wori_ref[j, 1]
            ww = next_ref[pl.ds(w_r, ws), pl.ds(w_c, ws)]
            # wrel = patch top-left in window coords at v = guess.
            wy0 = wrel_ref[j, 0]
            wx0 = wrel_ref[j, 1]

            def body(_, carry):
                vy, vx, active = carry
                tly = wy0 + vy
                tlx = wx0 + vx
                iy = jnp.clip(jnp.floor(tly).astype(jnp.int32), 0, ws - win - 1)
                ix = jnp.clip(jnp.floor(tlx).astype(jnp.int32), 0, ws - win - 1)
                fy = tly - iy.astype(jnp.float32)
                fx = tlx - ix.astype(jnp.float32)
                sub = jax.lax.dynamic_slice(ww, (iy, ix), (win + 1, win + 1))
                warped = _blend4(sub, fy, fx)
                rdiff = T - warped
                b0 = jnp.sum(rdiff * Ix)
                b1 = jnp.sum(rdiff * Iy)
                dx = inv00 * b0 + inv01 * b1
                dy = inv01 * b0 + inv11 * b1
                vx = vx + dx * active
                vy = vy + dy * active
                active = active * (dx * dx + dy * dy > eps * eps).astype(jnp.float32)
                return vy, vx, active

            vy, vx, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.float32(0.0), jnp.float32(0.0), ok))
            flow_ref[j, 0] = vx
            flow_ref[j, 1] = vy
            ok_ref[j, 0] = ok

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("win", "iters", "eps", "min_eig", "search_radius", "interpret"))
def level_track_pallas(img_prev_pad: jax.Array, img_next_pad: jax.Array,
                       pts: jax.Array, guess: jax.Array, win: int = 21,
                       iters: int = 30, eps: float = 0.01, min_eig: float = 1e-4,
                       search_radius: int = 6, pad: int = 0,
                       interpret: bool = False):
    """One LK level for N points (N divisible by BLK).

    Args:
      img_prev_pad / img_next_pad: (Hp, Wp) float32, edge-padded by ``pad``.
      pts: (N, 2) [x, y] level coords (unpadded frame).
      guess: (N, 2) incoming flow.
    Returns: (flow (N, 2) — relative to pts, i.e. guess+delta; ok (N,)).
    """
    n = pts.shape[0]
    assert n % BLK == 0, n
    hp, wp = img_prev_pad.shape
    r = (win - 1) // 2
    ts = win + 4
    ws = min(win + 1 + 2 * (search_radius + 1), hp, wp)

    # Template origin: floor(pts) - r - 2 in padded coords, clamped.
    tori = jnp.floor(pts[:, ::-1]) - (r + 2) + pad  # (N, 2) [row, col]
    tori = jnp.clip(tori.astype(jnp.int32), 0,
                    jnp.array([hp - ts, wp - ts], jnp.int32))
    # Patch top-left (pts - r) in template-window local float coords.
    trel = (pts[:, ::-1] - r + pad) - tori.astype(pts.dtype)  # (N, 2) [row, col]

    # Search-window origin around pts + guess.
    center = pts + guess
    wori = jnp.floor(center[:, ::-1]) - (r + search_radius + 1) + pad
    wori = jnp.clip(wori.astype(jnp.int32), 0,
                    jnp.array([hp - ws, wp - ws], jnp.int32))
    # Patch top-left in window coords when v = 0 relative to guess... the
    # kernel iterates v from 0 and adds to (pts + guess - r) local coords.
    wrel = (center[:, ::-1] - r + pad) - wori.astype(pts.dtype)

    kernel = _make_kernel(win, ws, iters, eps, min_eig)
    grid = (n // BLK,)
    blk2 = lambda: pl.BlockSpec((BLK, 2), lambda i: (i, 0),
                                memory_space=pltpu.SMEM)
    flow_d, ok_d = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk2(), blk2(), blk2(), blk2(), blk2(),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((BLK, 2), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n, 2), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1), jnp.float32)),
        interpret=interpret,
    )(pts.astype(jnp.float32), trel.astype(jnp.float32),
      wrel.astype(jnp.float32), tori, wori,
      img_prev_pad.astype(jnp.float32), img_next_pad.astype(jnp.float32))

    flow = guess + flow_d  # kernel iterates the delta from the guess
    ok = ok_d[:, 0] > 0
    inside = jnp.all(jnp.abs(flow_d) <= search_radius, axis=-1)
    return flow, ok & inside
