"""Block-vectorized cell-blend Pallas LK kernel (v3).

Same mathematical structure as ``lk_pallas_cell`` (the bilinear-RHS cell
identity: with the integer patch corner fixed, the LK normal-equation RHS is
bilinear in the fractional offset, so each iteration inside a pixel cell
needs no memory traffic) — but the per-iteration work runs for all BLK
keypoints of a grid program AT ONCE as (BLK, 1) vector ops instead of one
scalar loop per point. Round-1 profiling showed the cell kernel's cost was
~90% per-point scalar bookkeeping (PERF.md): 30 scalar ops x 8 points per
iteration become ~30 single-vreg VPU ops total.

Lessons from the failed v2 attempt are baked in (PERF.md "construct probes"):

* rank-2 ONLY — no (BLK, P, 128) scratch or rank-3 reductions (pathological
  Mosaic layouts); template canvases are (P, 128) tiles stored per point at
  static row offsets in a (BLK*P, 128) VMEM scratch;
* 128-lane canvases everywhere — shifted patch views are ``pltpu.roll``s of
  full-lane tiles, never odd-width slices; the valid (win, win) region is
  selected by an iota mask baked into the stored gradients;
* SMEM takes only scalar stores — per-cell dot products and cell corners are
  written as scalars to a (BLK, 16) SMEM scratch and rebuilt into (BLK, 1)
  vectors via reshape(1,1)+concat (a probe-validated construct);
* (BLK, 1) vector carries in ``lax.while_loop`` (probe-validated), with
  ``jnp.where``-masked updates so frozen points never accumulate garbage.

Loop structure per grid program:

  template phase (per point): one aligned (P, 128) load + 5 rolls + masked
      gradient dots -> scalars (gains, t-dots) + gradient tiles to VMEM;
  OUTER while (per pixel-cell round): for each still-active point, a
      ``pl.when``-predicated aligned load + 3 rolls + 8 masked dot products
      (the only vector work that scales with cells);
  INNER while (vectorized): the ~20-op bilinear-RHS iteration for all BLK
      points as (BLK, 1) vreg math; a point exits by convergence (eps),
      cell crossing (stay=0 -> reload next round), or iteration budget.

Iterations are mathematically identical to the cell kernel / v1 (same corner
-> same update modulo float reassociation), so eps semantics and the min-eig
gate carry over. Replaces the per-iteration resampling of
``cv::calcOpticalFlowPyrLK`` (``/root/reference/src/tracking.cpp:593-618``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 8  # keypoints per grid program


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(win: int, hp: int, wp: int, iters: int, eps: float,
                 min_eig: float, P: int):
    r = (win - 1) // 2
    assert hp % 8 == 0 and wp % 128 == 0, (hp, wp)
    # The wp==128 case relies on the roll-wrap landing beyond the used lanes:
    # the col clamps keep crem <= wp - win - 1, so the wrapped lanes start at
    # 128 - crem >= win + 1 — past every lane the masked dots read.
    assert wp >= 128, wp

    def aligned_canvas(ref, row_i, col_i):
        """(P, 128) canvas whose [0, rows) x [0, cols) corner is
        ref[row_i:, col_i:], via aligned block load + roll (Mosaic wants
        provably 8/128-aligned dynamic starts). Rows/lanes beyond the valid
        request may contain wrapped (finite) image data — callers mask."""
        R8 = min(P + 8, hp)
        row8 = pl.multiple_of(jnp.minimum((row_i // 8) * 8, hp - R8), 8)
        rrem = row_i - row8
        if wp == 128:
            block = ref[pl.ds(row8, R8), :]
            crem = col_i
        else:
            col128 = pl.multiple_of(
                jnp.minimum((col_i // 128) * 128, wp - 256), 128)
            crem = col_i - col128
            block = ref[pl.ds(row8, R8), pl.ds(col128, 256)]
        block = pltpu.roll(block, -rrem, axis=0)
        block = pltpu.roll(block, -crem, axis=1)
        return block[:P, :128]

    row_lt = lambda k: jax.lax.broadcasted_iota(jnp.int32, (P, 128), 0) < k
    col_lt = lambda k: jax.lax.broadcasted_iota(jnp.int32, (P, 128), 1) < k
    # Static up/left content shifts (roll(x, -k) with k>0 is rejected at
    # trace time; the modular equivalent is size-k).
    lroll1 = lambda x: pltpu.roll(x, 127, axis=1)
    lroll2 = lambda x: pltpu.roll(x, 126, axis=1)

    def kernel(prow_ref, pcol_ref, grow_ref, gcol_ref,
               prev_ref, next_ref, flow_ref, ok_ref, ixs_ref, iys_ref,
               sdots_ref):
        mask = row_lt(win) & col_lt(win)
        fmask = mask.astype(jnp.float32)

        # ---- template phase (per point; one load + rolls + masked dots) --
        cy_l, cx_l = [], []           # patch top-left = p + guess - r
        inv00_l, inv01_l, inv11_l = [], [], []
        tIx_l, tIy_l, ok_l = [], [], []
        for j in range(BLK):
            py = prow_ref[j, 0]
            px = pcol_ref[j, 0]
            tbr = py - r - 1.0
            tbc = px - r - 1.0
            tr0 = jnp.clip(jnp.floor(tbr).astype(jnp.int32), 0, hp - win - 3)
            tc0 = jnp.clip(jnp.floor(tbc).astype(jnp.int32), 0, wp - win - 3)
            tfy = tbr - tr0.astype(jnp.float32)
            tfx = tbc - tc0.astype(jnp.float32)
            X = aligned_canvas(prev_ref, tr0, tc0)
            # Bilinear field at (tr0+y+tfy, tc0+x+tfx) via full-lane rolls.
            Xr = lroll1(X)
            Xd = pltpu.roll(X, P - 1, axis=0)
            Xdr = lroll1(Xd)
            field = ((1 - tfy) * (1 - tfx) * X + (1 - tfy) * tfx * Xr +
                     tfy * (1 - tfx) * Xd + tfy * tfx * Xdr)
            Fr1 = pltpu.roll(field, P - 1, axis=0)
            Fr2 = pltpu.roll(field, P - 2, axis=0)
            T = lroll1(Fr1)                                       # f[y+1,x+1]
            Ix = (lroll2(Fr1) - Fr1) * 0.5
            Iy = (lroll1(Fr2) - lroll1(field)) * 0.5
            Ixm = Ix * fmask
            Iym = Iy * fmask

            g00 = jnp.sum(Ixm * Ixm)
            g01 = jnp.sum(Ixm * Iym)
            g11 = jnp.sum(Iym * Iym)
            det = g00 * g11 - g01 * g01
            trc = g00 + g11
            mev = (trc - jnp.sqrt(jnp.maximum(trc * trc - 4 * det, 0.0))) * 0.5 / (win * win)
            ok = (mev > min_eig).astype(jnp.float32)
            safe_det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
            inv00_l.append(g11 / safe_det)
            inv01_l.append(-g01 / safe_det)
            inv11_l.append(g00 / safe_det)
            tIx_l.append(jnp.sum(T * Ixm))
            tIy_l.append(jnp.sum(T * Iym))
            ok_l.append(ok)
            cy_l.append(py + grow_ref[j, 0] - r)
            cx_l.append(px + gcol_ref[j, 0] - r)
            ixs_ref[j * P:(j + 1) * P, :] = Ixm
            iys_ref[j * P:(j + 1) * P, :] = Iym

        vec = lambda xs: jnp.concatenate(
            [x.reshape(1, 1) for x in xs], axis=0)      # (BLK, 1)
        cyv, cxv = vec(cy_l), vec(cx_l)
        inv00v, inv01v, inv11v = vec(inv00_l), vec(inv01_l), vec(inv11_l)
        tIxv, tIyv, okv = vec(tIx_l), vec(tIy_l), vec(ok_l)
        itersf = jnp.float32(iters)

        # ---- outer loop: predicated per-point reload + vectorized inner --
        def outer_cond(carry):
            vy, vx, act, it = carry
            live = jnp.where((act > 0) & (it < itersf), 1.0, 0.0)
            return jnp.sum(live) > 0

        def outer_body(carry):
            vy, vx, act, it = carry
            for j in range(BLK):
                need = (act[j, 0] > 0) & (it[j, 0] < itersf)

                @pl.when(need)
                def _reload(j=j):
                    br = cy_l[j] + vy[j, 0]
                    bc = cx_l[j] + vx[j, 0]
                    iyf = jnp.clip(jnp.floor(br), 0.0, float(hp - win - 1))
                    ixf = jnp.clip(jnp.floor(bc), 0.0, float(wp - win - 1))
                    A = aligned_canvas(next_ref, iyf.astype(jnp.int32),
                                       ixf.astype(jnp.int32))
                    B = lroll1(A)
                    C = pltpu.roll(A, P - 1, axis=0)
                    D = lroll1(C)
                    Ixm = ixs_ref[j * P:(j + 1) * P, :]
                    Iym = iys_ref[j * P:(j + 1) * P, :]
                    sdots_ref[j, 0] = jnp.sum(A * Ixm)
                    sdots_ref[j, 1] = jnp.sum(B * Ixm)
                    sdots_ref[j, 2] = jnp.sum(C * Ixm)
                    sdots_ref[j, 3] = jnp.sum(D * Ixm)
                    sdots_ref[j, 4] = jnp.sum(A * Iym)
                    sdots_ref[j, 5] = jnp.sum(B * Iym)
                    sdots_ref[j, 6] = jnp.sum(C * Iym)
                    sdots_ref[j, 7] = jnp.sum(D * Iym)
                    sdots_ref[j, 8] = iyf
                    sdots_ref[j, 9] = ixf

            svec = lambda k: jnp.concatenate(
                [sdots_ref[j, k].reshape(1, 1) for j in range(BLK)], axis=0)
            sIxa, sIxb, sIxc, sIxd = svec(0), svec(1), svec(2), svec(3)
            sIya, sIyb, sIyc, sIyd = svec(4), svec(5), svec(6), svec(7)
            iyv, ixv = svec(8), svec(9)

            def inner_cond(s):
                vy_, vx_, act_, it_, stay = s
                live = jnp.where((act_ > 0) & (stay > 0) & (it_ < itersf),
                                 1.0, 0.0)
                return jnp.sum(live) > 0

            def inner_body(s):
                vy_, vx_, act_, it_, stay = s
                upd = (act_ > 0) & (stay > 0) & (it_ < itersf)
                fy = cyv + vy_ - iyv
                fx = cxv + vx_ - ixv
                wy0 = 1.0 - fy
                wx0 = 1.0 - fx
                wIx = (wy0 * wx0 * sIxa + wy0 * fx * sIxb +
                       fy * wx0 * sIxc + fy * fx * sIxd)
                wIy = (wy0 * wx0 * sIya + wy0 * fx * sIyb +
                       fy * wx0 * sIyc + fy * fx * sIyd)
                b0 = tIxv - wIx
                b1 = tIyv - wIy
                dx = inv00v * b0 + inv01v * b1
                dy = inv01v * b0 + inv11v * b1
                vy_ = jnp.where(upd, vy_ + dy, vy_)
                vx_ = jnp.where(upd, vx_ + dx, vx_)
                act_ = jnp.where(
                    upd, jnp.where(dx * dx + dy * dy > eps * eps, 1.0, 0.0),
                    act_)
                iy2 = jnp.clip(jnp.floor(cyv + vy_), 0.0, float(hp - win - 1))
                ix2 = jnp.clip(jnp.floor(cxv + vx_), 0.0, float(wp - win - 1))
                stay = jnp.where(
                    upd, jnp.where((iy2 == iyv) & (ix2 == ixv), 1.0, 0.0),
                    stay)
                it_ = jnp.where(upd, it_ + 1.0, it_)
                return vy_, vx_, act_, it_, stay

            vy, vx, act, it, _ = jax.lax.while_loop(
                inner_cond, inner_body,
                (vy, vx, act, it, jnp.ones((BLK, 1), jnp.float32)))
            return vy, vx, act, it

        zeros = jnp.zeros((BLK, 1), jnp.float32)
        vy, vx, _, _ = jax.lax.while_loop(
            outer_cond, outer_body, (zeros, zeros, okv, zeros))
        for j in range(BLK):
            flow_ref[j, 0] = vx[j, 0]
            flow_ref[j, 1] = vy[j, 0]
            ok_ref[j, 0] = okv[j, 0]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("win", "iters", "eps", "min_eig", "search_radius",
                     "interpret"))
def level_track_pallas_block(img_prev_pad: jax.Array, img_next_pad: jax.Array,
                             pts: jax.Array, guess: jax.Array, win: int = 21,
                             iters: int = 30, eps: float = 0.01,
                             min_eig: float = 1e-4, search_radius: int = 6,
                             pad: int = 0, interpret: bool = False,
                             active: jax.Array | None = None):
    """Drop-in replacement for ``lk_pallas.level_track_pallas`` (same API)."""
    n = pts.shape[0]
    assert n % BLK == 0, n
    hp, wp = img_prev_pad.shape
    P = _ceil_to(win + 3, 8)

    prow = (pts[:, 1:2] + pad).astype(jnp.float32)
    pcol = (pts[:, 0:1] + pad).astype(jnp.float32)
    grow = guess[:, 1:2].astype(jnp.float32)
    gcol = guess[:, 0:1].astype(jnp.float32)

    kernel = _make_kernel(win, hp, wp, iters, eps, min_eig, P)
    blk1 = lambda: pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                                memory_space=pltpu.SMEM)
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
        scratch_shapes=[pltpu.VMEM((BLK * P, 128), jnp.float32),
                        pltpu.VMEM((BLK * P, 128), jnp.float32),
                        pltpu.SMEM((BLK, 16), jnp.float32)],
        interpret=interpret,
    )(prow, pcol, grow, gcol,
      img_prev_pad.astype(jnp.float32), img_next_pad.astype(jnp.float32))

    flow = guess + flow_d
    ok = ok_d[:, 0] > 0
    if active is not None:
        # Post-hoc mask (this kernel runs all points; the production cell
        # kernel skips inactive points inside the kernel instead).
        ok = ok & active
        flow = jnp.where(active[:, None], flow, guess)
    inside = jnp.all(jnp.abs(flow_d) <= search_radius, axis=-1)
    return flow, ok & inside
