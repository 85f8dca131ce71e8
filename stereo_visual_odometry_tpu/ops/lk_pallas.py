"""Pallas TPU kernel for the pyramidal LK iteration loop.

The XLA formulation of ``lk._level_track`` extracts per-point search windows
with vmapped dynamic slices — XLA lowers those to gathers, which scalarize
on TPU (~0.5 s per track call at 1024 points, 95% of the VO step). Here the
whole level lives in VMEM (a padded KITTI frame is ~2 MB against ~16 MB
VMEM) and every patch access is a direct ``pl.ds`` ref slice:

* grid over keypoint blocks (BLK points per program);
* per point: one (win+3)^2 ref slice -> bilinear field -> template patch +
  gradients (the 2x2 normal matrix is computed once);
* the iteration loop samples the warped patch by integer ref slice + 4-tap
  blend (all patch samples share one fractional offset) and updates the
  flow scalars — pure VPU work against VMEM.

Numerics match ``lk._level_track`` (same template gradients, same masked
convergence, same search-radius gate); ``tests/test_lk_pallas.py`` asserts
agreement in interpret mode.
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


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(win: int, hp: int, wp: int, iters: int, eps: float,
                 min_eig: float, radius: int):
    r = (win - 1) // 2
    # Mosaic requires provably-aligned dynamic vector-load starts: load an
    # aligned block sized for the request and rotate the remainder in.
    # hp must be a multiple of 8 and wp a multiple of 128 (the caller pads).
    assert hp % 8 == 0 and (wp % 128 == 0 or wp < 256), (hp, wp)

    def aligned_slice(ref, row_i, col_i, rows_out, cols_out):
        """ref[row_i : row_i+rows_out, col_i : col_i+cols_out] via aligned
        block load + rotate. Callers guarantee row_i <= hp-rows_out and
        col_i <= wp-cols_out (their own clamps); the aligned block always
        covers the requested window because its start only rounds DOWN
        while it extends past the window end."""
        R8 = min(_ceil_to(rows_out, 8) + 8, hp)
        row8 = pl.multiple_of(jnp.minimum((row_i // 8) * 8, hp - R8), 8)
        rrem = row_i - row8
        if wp < 256:
            block = ref[pl.ds(row8, R8), :]
            crem = col_i
        else:
            assert cols_out + 128 <= 256, cols_out
            col128 = pl.multiple_of(
                jnp.minimum((col_i // 128) * 128, wp - 256), 128)
            crem = col_i - col128
            block = ref[pl.ds(row8, R8), pl.ds(col128, 256)]
        block = pltpu.roll(block, -rrem, axis=0)
        block = pltpu.roll(block, -crem, axis=1)
        return block[:rows_out, :cols_out]

    def kernel(prow_ref, pcol_ref, grow_ref, gcol_ref, act_ref,
               prev_ref, next_ref, flow_ref, ok_ref):
        for j in range(BLK):
            # Inactive points skip all work (cost here is per-point).
            flow_ref[j, 0] = 0.0
            flow_ref[j, 1] = 0.0
            ok_ref[j, 0] = 0.0

            @pl.when(act_ref[j, 0] > 0)
            def _point(j=j):
                _point_body(prow_ref, pcol_ref, grow_ref, gcol_ref,
                            prev_ref, next_ref, flow_ref, ok_ref, j)

    def _point_body(prow_ref, pcol_ref, grow_ref, gcol_ref,
                    prev_ref, next_ref, flow_ref, ok_ref, j):
            # Template: bilinear field around (prow - r - 1, pcol - r - 1).
            py = prow_ref[j, 0]
            px = pcol_ref[j, 0]
            tbr = py - r - 1.0
            tbc = px - r - 1.0
            tr0 = jnp.clip(jnp.floor(tbr).astype(jnp.int32), 0, hp - win - 3)
            tc0 = jnp.clip(jnp.floor(tbc).astype(jnp.int32), 0, wp - win - 3)
            tfy = tbr - tr0.astype(jnp.float32)
            tfx = tbc - tc0.astype(jnp.float32)
            sub = aligned_slice(prev_ref, tr0, tc0, win + 3, win + 3)
            field = _blend4(sub, tfy, tfx)          # (win+2, win+2)
            T = field[1:-1, 1:-1]                   # (win, win)
            Ix = (field[1:-1, 2:] - field[1:-1, :-2]) * 0.5
            Iy = (field[2:, 1:-1] - field[:-2, 1:-1]) * 0.5

            g00 = jnp.sum(Ix * Ix)
            g01 = jnp.sum(Ix * Iy)
            g11 = jnp.sum(Iy * Iy)
            det = g00 * g11 - g01 * g01
            trc = g00 + g11
            mev = (trc - jnp.sqrt(jnp.maximum(trc * trc - 4 * det, 0.0))) * 0.5 / (win * win)
            ok = (mev > min_eig).astype(jnp.float32)
            safe_det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
            inv00 = g11 / safe_det
            inv01 = -g01 / safe_det
            inv11 = g00 / safe_det

            # Iterate the flow delta from the incoming guess, sampling the
            # warped patch straight from the VMEM-resident image.
            gy = grow_ref[j, 0]
            gx = gcol_ref[j, 0]

            def cond(carry):
                vy, vx, active, it = carry
                return (it < iters) & (active > 0)

            def body(carry):
                vy, vx, active, it = carry
                br = py + gy + vy - r
                bc = px + gx + vx - r
                iy = jnp.clip(jnp.floor(br).astype(jnp.int32), 0, hp - win - 1)
                ix = jnp.clip(jnp.floor(bc).astype(jnp.int32), 0, wp - win - 1)
                fy = br - iy.astype(jnp.float32)
                fx = bc - ix.astype(jnp.float32)
                sub = aligned_slice(next_ref, iy, ix, win + 1, win + 1)
                warped = _blend4(sub, fy, fx)
                rdiff = T - warped
                b0 = jnp.sum(rdiff * Ix)
                b1 = jnp.sum(rdiff * Iy)
                dx = inv00 * b0 + inv01 * b1
                dy = inv01 * b0 + inv11 * b1
                vx = vx + dx
                vy = vy + dy
                active = (dx * dx + dy * dy > eps * eps).astype(jnp.float32)
                return vy, vx, active, it + 1

            # Early-exit iteration (the eps criterion of cv::calcOpticalFlowPyrLK):
            # most points converge in <10 iterations, and the while_loop stops
            # paying for them the moment they do.
            vy, vx, _, _ = jax.lax.while_loop(
                cond, body,
                (jnp.float32(0.0), jnp.float32(0.0), ok, jnp.int32(0)))
            flow_ref[j, 0] = vx
            flow_ref[j, 1] = vy
            ok_ref[j, 0] = ok

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("win", "iters", "eps", "min_eig", "search_radius",
                     "interpret"))
def level_track_pallas(img_prev_pad: jax.Array, img_next_pad: jax.Array,
                       pts: jax.Array, guess: jax.Array, win: int = 21,
                       iters: int = 30, eps: float = 0.01, min_eig: float = 1e-4,
                       search_radius: int = 6, pad: int = 0,
                       interpret: bool = False,
                       active: jax.Array | None = None):
    """One LK level for N points (N divisible by BLK).

    Args:
      img_prev_pad / img_next_pad: (Hp, Wp) float32, edge-padded by ``pad``.
      pts: (N, 2) [x, y] level coords (unpadded frame).
      guess: (N, 2) incoming flow.
      active: optional (N,) bool; inactive points are skipped entirely.
    Returns: (flow (N, 2) — guess + found delta; ok (N,) bool).
    """
    n = pts.shape[0]
    assert n % BLK == 0, n
    hp, wp = img_prev_pad.shape

    # Padded-image coordinates, split into column vectors for SMEM blocks.
    prow = (pts[:, 1:2] + pad).astype(jnp.float32)
    pcol = (pts[:, 0:1] + pad).astype(jnp.float32)
    grow = guess[:, 1:2].astype(jnp.float32)
    gcol = guess[:, 0:1].astype(jnp.float32)
    actv = (jnp.ones((n, 1), jnp.float32) if active is None
            else active.reshape(n, 1).astype(jnp.float32))

    kernel = _make_kernel(win, hp, wp, iters, eps, min_eig, search_radius)
    grid = (n // BLK,)
    blk1 = lambda: pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                                memory_space=pltpu.SMEM)
    flow_d, ok_d = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk1(), blk1(), blk1(), blk1(), blk1(),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((BLK, 2), lambda i: (i, 0),
                                memory_space=pltpu.SMEM),
                   pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                                memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((n, 2), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1), jnp.float32)),
        interpret=interpret,
    )(prow, pcol, grow, gcol, actv,
      img_prev_pad.astype(jnp.float32), img_next_pad.astype(jnp.float32))

    flow = guess + flow_d  # kernel iterates the delta from the guess
    ok = ok_d[:, 0] > 0
    inside = jnp.all(jnp.abs(flow_d) <= search_radius, axis=-1)
    return flow, ok & inside
