"""Pallas LK kernel v2: block-vectorized iteration.

v1 (``lk_pallas.py``) iterates each keypoint's LK loop sequentially inside a
program — per-point loop/scalar overhead dominates (measured ~1.6k cycles
per iteration against ~100 cycles of vector math). v2 advances the whole
BLK-point block in ONE while loop:

* template patches + gradients are staged into block scratch (BLK, P8, 128)
  once (gradients zeroed outside the patch so reductions can run over the
  full padded tile);
* each iteration samples all BLK warped patches (per-point slice+rotate into
  scratch), then computes residuals, the two normal-equation dot products,
  and the 2x2 solves as (BLK,)-vector math in one shot;
* the loop exits when every point in the block has converged.

Trade-off: converged points ride along until the whole block finishes
(bounded by the slowest point), in exchange for 8x fewer loop iterations
and vectorized reductions.

Hardware status (measured, one v5e chip): compiles and matches v1 bit-for-bit
after the two-step-reduction fix below, but runs ~300x SLOWER than v1
(32 ms vs 0.11 ms for 1024 points on one 384x1280 level) — the rank-3
(BLK, P8, 128) scratch elementwise/reduction ops get poor Mosaic layouts,
swamping the loop-count savings. Kept as a working reference for
block-vectorized iteration; ``lk_pallas.py`` (v1) is the production kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 8


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(win: int, hp: int, wp: int, iters: int, eps: float,
                 min_eig: float):
    r = (win - 1) // 2
    assert hp % 8 == 0 and (wp % 128 == 0 or wp < 256), (hp, wp)
    P8 = _ceil_to(win + 1, 8)      # padded patch rows in scratch
    PC = 128                       # scratch lane width

    def aligned_slice(ref, row_i, col_i, rows_out, cols_out):
        R8 = min(_ceil_to(rows_out, 8) + 8, hp)
        row8 = pl.multiple_of(jnp.minimum((row_i // 8) * 8, hp - R8), 8)
        rrem = row_i - row8
        if wp < 256:
            block = ref[pl.ds(row8, R8), :]
            crem = col_i
        else:
            col128 = pl.multiple_of(
                jnp.minimum((col_i // 128) * 128, wp - 256), 128)
            crem = col_i - col128
            block = ref[pl.ds(row8, R8), pl.ds(col128, 256)]
        block = pltpu.roll(block, -rrem, axis=0)
        block = pltpu.roll(block, -crem, axis=1)
        return block[:rows_out, :cols_out]

    def kernel(prow_ref, pcol_ref, grow_ref, gcol_ref,
               prev_ref, next_ref, flow_ref, ok_ref,
               t_scr, ix_scr, iy_scr, w_scr):
        # ---- template phase: stage T, Ix, Iy per point ------------------ #
        ok_list = []
        inv00_l, inv01_l, inv11_l = [], [], []
        # Zero the gradient scratch: the padded region then contributes 0 to
        # every reduction, so sums can run over whole tiles. (T / warped pad
        # values are annihilated by the zero gradients.)
        zeros = jnp.zeros(ix_scr.shape, jnp.float32)
        ix_scr[:, :, :] = zeros
        iy_scr[:, :, :] = zeros
        # T and warped scratch must also be zeroed: their pad regions enter
        # rd = T - w before the zero gradients annihilate them, and
        # uninitialized VMEM may hold NaN (NaN * 0 = NaN).
        t_scr[:, :, :] = zeros
        w_scr[:, :, :] = zeros
        for j in range(BLK):
            py = prow_ref[j, 0]
            px = pcol_ref[j, 0]
            tbr = py - r - 1.0
            tbc = px - r - 1.0
            tr0 = jnp.clip(jnp.floor(tbr).astype(jnp.int32), 0, hp - win - 3)
            tc0 = jnp.clip(jnp.floor(tbc).astype(jnp.int32), 0, wp - win - 3)
            tfy = tbr - tr0.astype(jnp.float32)
            tfx = tbc - tc0.astype(jnp.float32)
            sub = aligned_slice(prev_ref, tr0, tc0, win + 3, win + 3)
            a = sub[:-1, :-1]
            b = sub[:-1, 1:]
            c = sub[1:, :-1]
            d = sub[1:, 1:]
            field = (a * (1 - tfy) * (1 - tfx) + b * (1 - tfy) * tfx +
                     c * tfy * (1 - tfx) + d * tfy * tfx)  # (win+2, win+2)
            T = field[1:-1, 1:-1]
            Ix = (field[1:-1, 2:] - field[1:-1, :-2]) * 0.5
            Iy = (field[2:, 1:-1] - field[:-2, 1:-1]) * 0.5
            t_scr[j, :win, :win] = T
            ix_scr[j, :win, :win] = Ix
            iy_scr[j, :win, :win] = Iy

            g00 = jnp.sum(Ix * Ix)
            g01 = jnp.sum(Ix * Iy)
            g11 = jnp.sum(Iy * Iy)
            det = g00 * g11 - g01 * g01
            trc = g00 + g11
            mev = (trc - jnp.sqrt(jnp.maximum(trc * trc - 4 * det, 0.0))) * 0.5 / (win * win)
            ok_list.append((mev > min_eig).astype(jnp.float32))
            safe_det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
            inv00_l.append(g11 / safe_det)
            inv01_l.append(-g01 / safe_det)
            inv11_l.append(g00 / safe_det)

        # Block vectors are kept (BLK, 1); built without rank-1
        # intermediates (Mosaic rejects 1-D vectors outright).
        as_col = lambda xs: jnp.concatenate(
            [x.reshape(1, 1) for x in xs], axis=0)
        ok_v = as_col(ok_list)
        inv00 = as_col(inv00_l)
        inv01 = as_col(inv01_l)
        inv11 = as_col(inv11_l)
        Tb = t_scr[:, :, :]
        Ixb = ix_scr[:, :, :]
        Iyb = iy_scr[:, :, :]

        # ---- joint iteration over the whole block ----------------------- #
        def cond(carry):
            vy, vx, active, it = carry
            return (it < iters) & (jnp.max(active) > 0)

        def body(carry):
            vy, vx, active, it = carry
            for j in range(BLK):
                py = prow_ref[j, 0]
                px = pcol_ref[j, 0]
                br = py + grow_ref[j, 0] + vy[j, 0] - r
                bc = px + gcol_ref[j, 0] + vx[j, 0] - r
                iyj = jnp.clip(jnp.floor(br).astype(jnp.int32), 0, hp - win - 1)
                ixj = jnp.clip(jnp.floor(bc).astype(jnp.int32), 0, wp - win - 1)
                fy = br - iyj.astype(jnp.float32)
                fx = bc - ixj.astype(jnp.float32)
                sub = aligned_slice(next_ref, iyj, ixj, win + 1, win + 1)
                a = sub[:-1, :-1]
                b = sub[:-1, 1:]
                c = sub[1:, :-1]
                d = sub[1:, 1:]
                w_scr[j, :win, :win] = (a * (1 - fy) * (1 - fx) +
                                        b * (1 - fy) * fx +
                                        c * fy * (1 - fx) + d * fy * fx)
            rd = Tb - w_scr[:, :, :]                     # (BLK, P8, PC)
            # Two-step reduction: a single multi-axis keepdims reduce followed
            # by a squeeze trips Mosaic layout inference on hardware
            # (layout.h:320 arr.size() >= layout_rank); axis=2 then axis=1
            # keepdims stays rank>=2 throughout and compiles clean.
            b0 = jnp.sum(jnp.sum(rd * Ixb, axis=2), axis=1, keepdims=True)  # (BLK, 1)
            b1 = jnp.sum(jnp.sum(rd * Iyb, axis=2), axis=1, keepdims=True)
            dx = inv00 * b0 + inv01 * b1
            dy = inv01 * b0 + inv11 * b1
            vx = vx + dx * active
            vy = vy + dy * active
            active = active * (dx * dx + dy * dy > eps * eps).astype(jnp.float32)
            return vy, vx, active, it + 1

        z = jnp.zeros((BLK, 1), jnp.float32)
        vy, vx, _, _ = jax.lax.while_loop(cond, body, (z, z, ok_v, jnp.int32(0)))
        for j in range(BLK):
            flow_ref[j, 0] = vx[j, 0]
            flow_ref[j, 1] = vy[j, 0]
            ok_ref[j, 0] = ok_v[j, 0]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("win", "iters", "eps", "min_eig", "search_radius",
                     "interpret"))
def level_track_pallas_v2(img_prev_pad: jax.Array, img_next_pad: jax.Array,
                          pts: jax.Array, guess: jax.Array, win: int = 21,
                          iters: int = 30, eps: float = 0.01,
                          min_eig: float = 1e-4, search_radius: int = 6,
                          pad: int = 0, interpret: bool = False):
    """Drop-in replacement for ``lk_pallas.level_track_pallas`` (same API)."""
    n = pts.shape[0]
    assert n % BLK == 0, n
    hp, wp = img_prev_pad.shape
    prow = (pts[:, 1:2] + pad).astype(jnp.float32)
    pcol = (pts[:, 0:1] + pad).astype(jnp.float32)
    grow = guess[:, 1:2].astype(jnp.float32)
    gcol = guess[:, 0:1].astype(jnp.float32)

    kernel = _make_kernel(win, hp, wp, iters, eps, min_eig)
    P8 = _ceil_to(win + 1, 8)
    blk1 = lambda: pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                                memory_space=pltpu.SMEM)
    scr = lambda: pltpu.VMEM((BLK, P8, 128), jnp.float32)
    flow_d, ok_d = pl.pallas_call(
        kernel,
        grid=(n // BLK,),
        in_specs=[blk1(), blk1(), blk1(), blk1(),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((BLK, 2), lambda i: (i, 0),
                                memory_space=pltpu.SMEM),
                   pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                                memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((n, 2), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1), jnp.float32)),
        scratch_shapes=[scr(), scr(), scr(), scr()],
        interpret=interpret,
    )(prow, pcol, grow, gcol,
      img_prev_pad.astype(jnp.float32), img_next_pad.astype(jnp.float32))

    flow = guess + flow_d
    ok = ok_d[:, 0] > 0
    inside = jnp.all(jnp.abs(flow_d) <= search_radius, axis=-1)
    return flow, ok & inside
