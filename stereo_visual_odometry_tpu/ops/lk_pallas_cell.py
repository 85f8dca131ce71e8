"""Cell-blend Pallas LK kernel: vector work only on pixel-cell crossings.

The v1 kernel (``lk_pallas.py``) pays a (32, 256) block load + two
``pltpu.roll``s + a 4-tap blend + two patch reductions on EVERY iteration,
even though late iterations move the point by well under a pixel. This
kernel exploits an exact identity: with the integer patch corner fixed, the
warped patch is bilinear in the fractional offset (fy, fx), so the
normal-equation RHS is too:

    b0(fy, fx) = sum((T - w) * Ix)
               = tIx - [(1-fy)(1-fx)*sIxa + (1-fy)fx*sIxb
                        + fy(1-fx)*sIxc + fy*fx*sIxd]

where sIxa..d = sum(a..d * Ix) over the four integer-corner sub-patches of
the (win+1, win+1) window and tIx = sum(T * Ix). The kernel therefore:

* OUTER loop (per pixel-cell): one aligned block load + rotate, then EIGHT
  patch dot products (a, b, c, d against Ix, Iy) — the only vector work;
* INNER loop (per LK iteration): evaluates the two bilinear forms, solves
  the 2x2 system, updates the flow — ~20 SCALAR ops, no memory traffic —
  and exits when the point crosses into a different pixel cell (reload),
  converges (|delta| < eps), or hits the iteration budget.

The iteration sequence is mathematically identical to v1 (same corner ->
same update, modulo float summation order), so convergence, eps semantics,
and the min-eig gate all carry over. Most points converge within 1-3 cells,
so the per-point cost drops from O(iters) block loads to O(cells).

Replaces the per-iteration resampling of ``cv::calcOpticalFlowPyrLK``
(``/root/reference/src/tracking.cpp:593-618``) like v1; same call API.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 8  # keypoints per grid program (matches lk_pallas.BLK)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(win: int, hp: int, wp: int, iters: int, eps: float,
                 min_eig: float):
    r = (win - 1) // 2
    assert hp % 8 == 0 and (wp % 128 == 0 or wp < 256), (hp, wp)

    def aligned_slice(ref, row_i, col_i, rows_out, cols_out):
        """ref[row_i:row_i+rows_out, col_i:col_i+cols_out] via aligned block
        load + rotate (Mosaic wants provably 8/128-aligned dynamic starts)."""
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

    def _blend4(sub, fy, fx):
        a = sub[:-1, :-1]
        b = sub[:-1, 1:]
        c = sub[1:, :-1]
        d = sub[1:, 1:]
        return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx +
                c * fy * (1 - fx) + d * fy * fx)

    def kernel(prow_ref, pcol_ref, grow_ref, gcol_ref, act_ref,
               prev_ref, next_ref, flow_ref, ok_ref):
        for j in range(BLK):
            # Inactive points (invalid slots, failed earlier legs) skip ALL
            # work — on TPU the kernel cost is per-point iteration, so a
            # ~25% dead-slot rate is a direct ~25% saving.
            flow_ref[j, 0] = 0.0
            flow_ref[j, 1] = 0.0
            ok_ref[j, 0] = 0.0

            @pl.when(act_ref[j, 0] > 0)
            def _point(j=j):
                self_body(prow_ref, pcol_ref, grow_ref, gcol_ref,
                          prev_ref, next_ref, flow_ref, ok_ref, j)

    def self_body(prow_ref, pcol_ref, grow_ref, gcol_ref,
                  prev_ref, next_ref, flow_ref, ok_ref, j):
            # ---- template phase (identical to v1) ----------------------- #
            py = prow_ref[j, 0]
            px = pcol_ref[j, 0]
            tbr = py - r - 1.0
            tbc = px - r - 1.0
            tr0 = jnp.clip(jnp.floor(tbr).astype(jnp.int32), 0, hp - win - 3)
            tc0 = jnp.clip(jnp.floor(tbc).astype(jnp.int32), 0, wp - win - 3)
            tfy = tbr - tr0.astype(jnp.float32)
            tfx = tbc - tc0.astype(jnp.float32)
            sub_t = aligned_slice(prev_ref, tr0, tc0, win + 3, win + 3)
            field = _blend4(sub_t, tfy, tfx)        # (win+2, win+2)
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
            # Template-side dots for the bilinear RHS identity.
            tIx = jnp.sum(T * Ix)
            tIy = jnp.sum(T * Iy)

            gy = grow_ref[j, 0]
            gx = gcol_ref[j, 0]

            # ---- outer loop: one block load + 8 dots per pixel cell ----- #
            def outer_cond(carry):
                vy, vx, active, it = carry
                return (it < iters) & (active > 0)

            def outer_body(carry):
                vy, vx, active, it = carry
                br = py + gy + vy - r
                bc = px + gx + vx - r
                iy = jnp.clip(jnp.floor(br).astype(jnp.int32), 0, hp - win - 1)
                ix = jnp.clip(jnp.floor(bc).astype(jnp.int32), 0, wp - win - 1)
                sub = aligned_slice(next_ref, iy, ix, win + 1, win + 1)
                a = sub[:win, :win]
                b = sub[:win, 1:]
                c = sub[1:, :win]
                d = sub[1:, 1:]
                sIxa = jnp.sum(a * Ix)
                sIxb = jnp.sum(b * Ix)
                sIxc = jnp.sum(c * Ix)
                sIxd = jnp.sum(d * Ix)
                sIya = jnp.sum(a * Iy)
                sIyb = jnp.sum(b * Iy)
                sIyc = jnp.sum(c * Iy)
                sIyd = jnp.sum(d * Iy)

                # Inner loop: pure scalar iteration inside this pixel cell.
                def inner_cond(s):
                    vy_, vx_, active_, it_, stay = s
                    return (it_ < iters) & (active_ > 0) & (stay > 0)

                def inner_body(s):
                    vy_, vx_, active_, it_, _ = s
                    fy = (py + gy + vy_ - r) - iy.astype(jnp.float32)
                    fx = (px + gx + vx_ - r) - ix.astype(jnp.float32)
                    wy0 = 1.0 - fy
                    wx0 = 1.0 - fx
                    wIx = (wy0 * wx0 * sIxa + wy0 * fx * sIxb +
                           fy * wx0 * sIxc + fy * fx * sIxd)
                    wIy = (wy0 * wx0 * sIya + wy0 * fx * sIyb +
                           fy * wx0 * sIyc + fy * fx * sIyd)
                    b0 = tIx - wIx
                    b1 = tIy - wIy
                    dx = inv00 * b0 + inv01 * b1
                    dy = inv01 * b0 + inv11 * b1
                    vx_ = vx_ + dx
                    vy_ = vy_ + dy
                    active_ = (dx * dx + dy * dy > eps * eps).astype(jnp.float32)
                    # Still inside this pixel cell? (Clip like the outer
                    # corner computation so border behavior matches.)
                    br2 = py + gy + vy_ - r
                    bc2 = px + gx + vx_ - r
                    iy2 = jnp.clip(jnp.floor(br2).astype(jnp.int32), 0, hp - win - 1)
                    ix2 = jnp.clip(jnp.floor(bc2).astype(jnp.int32), 0, wp - win - 1)
                    stay = ((iy2 == iy) & (ix2 == ix)).astype(jnp.float32)
                    return vy_, vx_, active_, it_ + 1, stay

                vy, vx, active, it, _ = jax.lax.while_loop(
                    inner_cond, inner_body,
                    (vy, vx, active, it, jnp.float32(1.0)))
                return vy, vx, active, it

            vy, vx, _, _ = jax.lax.while_loop(
                outer_cond, outer_body,
                (jnp.float32(0.0), jnp.float32(0.0), ok, jnp.int32(0)))
            flow_ref[j, 0] = vx
            flow_ref[j, 1] = vy
            ok_ref[j, 0] = ok

    return kernel


@functools.lru_cache(maxsize=None)
def _make_call(win: int, iters: int, eps: float, min_eig: float,
               interpret: bool):
    """custom_vmap-wrapped pallas call, cached per static config.

    The custom batch rule lowers a vmapped call (S sequences) to ONE kernel
    invocation over vertically-stacked images with per-sequence row offsets
    on the points — Mosaic's generic batched lowering of this kernel
    measured ~5x slower per sequence in round 1. Stacking works because the
    per-image padded height stays a multiple of 8 (each image's rows remain
    8-aligned inside the stack) and every in-frame point's window stays
    inside its own image's edge padding. The f32 row offset perturbs the
    fractional position by <= 2^-12 px at S*Hp ~ 4k — far below LK's eps.
    """

    @jax.custom_batching.custom_vmap
    def call(ip, inx, prow, pcol, grow, gcol, actv):
        n = prow.shape[0]
        hp, wp = ip.shape
        kernel = _make_kernel(win, hp, wp, iters, eps, min_eig)
        blk1 = lambda: pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                                    memory_space=pltpu.SMEM)
        return pl.pallas_call(
            kernel,
            grid=(n // BLK,),
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
        )(prow, pcol, grow, gcol, actv, ip, inx)

    @call.def_vmap
    def _batch_rule(axis_size, in_batched, ip, inx, prow, pcol, grow, gcol,
                    actv):
        S = axis_size
        bcast = lambda x, b: x if b else jnp.broadcast_to(x, (S,) + x.shape)
        prow, pcol, grow, gcol, actv = (
            bcast(a, b) for a, b in zip((prow, pcol, grow, gcol, actv),
                                        in_batched[2:]))
        n = prow.shape[1]
        imgs_b = in_batched[0] or in_batched[1]
        if imgs_b:
            ip = bcast(ip, in_batched[0])
            inx = bcast(inx, in_batched[1])
            hp, wp = ip.shape[1:]
            # Guard band between stacked images: the kernel clamps iterating
            # windows at STACK bounds, so without it a window near an image's
            # top/bottom edge could read the neighboring sequence's pixels.
            # 32 edge-replicated rows (multiple of 8, >= coarsest search
            # radius 20 + half-window 10 + 2) keep every in-image window
            # inside its own image's replicated padding.
            guard = 32
            gpad = ((0, 0), (guard, guard), (0, 0))
            ip = jnp.pad(ip, gpad, mode="edge")
            inx = jnp.pad(inx, gpad, mode="edge")
            hpg = hp + 2 * guard
            off = (jnp.arange(S, dtype=jnp.float32) * hpg + guard)[:, None, None]
            prow = prow + off
            ip = ip.reshape(S * hpg, wp)
            inx = inx.reshape(S * hpg, wp)
        flat = lambda a: a.reshape(S * n, a.shape[-1])
        flow, ok = call(ip, inx, flat(prow), flat(pcol), flat(grow),
                        flat(gcol), flat(actv))
        return (flow.reshape(S, n, 2), ok.reshape(S, n, 1)), (True, True)

    return call


@functools.partial(
    jax.jit,
    static_argnames=("win", "iters", "eps", "min_eig", "search_radius",
                     "interpret"))
def level_track_pallas_cell(img_prev_pad: jax.Array, img_next_pad: jax.Array,
                            pts: jax.Array, guess: jax.Array, win: int = 21,
                            iters: int = 30, eps: float = 0.01,
                            min_eig: float = 1e-4, search_radius: int = 6,
                            pad: int = 0, interpret: bool = False,
                            active: jax.Array | None = None):
    """Drop-in replacement for ``lk_pallas.level_track_pallas`` (same API).

    ``active``: optional (N,) bool — inactive points are skipped entirely
    (flow = guess, ok = False). vmap over a leading (sequence) axis lowers
    to one stacked-image kernel call (see ``_make_call``).
    """
    n = pts.shape[0]
    assert n % BLK == 0, n

    prow = (pts[:, 1:2] + pad).astype(jnp.float32)
    pcol = (pts[:, 0:1] + pad).astype(jnp.float32)
    grow = guess[:, 1:2].astype(jnp.float32)
    gcol = guess[:, 0:1].astype(jnp.float32)
    actv = (jnp.ones((n, 1), jnp.float32) if active is None
            else active.reshape(n, 1).astype(jnp.float32))

    call = _make_call(win, iters, eps, min_eig, interpret)
    flow_d, ok_d = call(img_prev_pad.astype(jnp.float32),
                        img_next_pad.astype(jnp.float32),
                        prow, pcol, grow, gcol, actv)

    flow = guess + flow_d
    ok = ok_d[:, 0] > 0
    inside = jnp.all(jnp.abs(flow_d) <= search_radius, axis=-1)
    return flow, ok & inside
