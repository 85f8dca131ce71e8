"""Pallas TPU kernel: batched subpixel patch extraction.

The recurring slow primitive on TPU is "gather a small patch around each of
N keypoints" — XLA lowers it to scalarizing gathers. This kernel extracts
(N, P, P) bilinear patches with aligned VMEM block loads + dynamic rotates
(same access pattern as the LK kernel). Downstream per-patch math (IC-angle
moments, BRIEF sampling as one-hot matmuls, SSD scoring...) then runs as
dense XLA on the extracted tensor.

CPU path: a vmapped dynamic-slice + 4-tap blend with identical numerics
(``extract_patches`` dispatches on platform).
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


def _row_block(rows_out: int, hp: int) -> int:
    """Sublane extent for the aligned row block.

    Mosaic's sublane dynamic rotate (``tpu.dynamic_rotate`` axis=0) is only
    CORRECT for extents of 16 or multiples of 32 — 24/40/48/56 compile but
    silently corrupt (measured on v5e, ``scripts/probe_roll.py``; this broke
    the 39x39 ORB descriptor patches for every keypoint with row%8 != 0).
    Need rows_out + 8 rows (roll remainder < 8, more when the row base
    clamps at the image bottom — the extent bound still holds because
    corners are clipped to rows_out inside the image).
    """
    need = rows_out + 8
    R8 = 16 if need <= 16 else _ceil_to(need, 32)
    assert hp >= R8, (hp, R8, rows_out)
    return R8


def _make_kernel(P: int, hp: int, wp: int):
    assert hp % 8 == 0 and (wp % 128 == 0 or wp < 256), (hp, wp)
    r = (P - 1) / 2.0  # patch center offset (float; P may be even)

    def aligned_slice(ref, row_i, col_i, rows_out, cols_out):
        R8 = _row_block(rows_out, hp)
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

    def kernel(prow_ref, pcol_ref, img_ref, out_ref):
        for j in range(BLK):
            cy = prow_ref[j, 0]
            cx = pcol_ref[j, 0]
            tly = cy - r
            tlx = cx - r
            iy = jnp.clip(jnp.floor(tly).astype(jnp.int32), 0, hp - P - 1)
            ix = jnp.clip(jnp.floor(tlx).astype(jnp.int32), 0, wp - P - 1)
            fy = tly - iy.astype(jnp.float32)
            fx = tlx - ix.astype(jnp.float32)
            sub = aligned_slice(img_ref, iy, ix, P + 1, P + 1)
            a = sub[:-1, :-1]
            b = sub[:-1, 1:]
            c = sub[1:, :-1]
            d = sub[1:, 1:]
            out_ref[j] = (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx +
                          c * fy * (1 - fx) + d * fy * fx)

    return kernel


def _make_kernel_int(S: int, hp: int, wp: int):
    """Integer-corner window extraction: aligned load + rotate, NO blend."""
    assert hp % 8 == 0 and (wp % 128 == 0 or wp < 256), (hp, wp)

    def aligned_slice(ref, row_i, col_i, rows_out, cols_out):
        R8 = _row_block(rows_out, hp)
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

    def kernel(row_ref, col_ref, img_ref, out_ref):
        for j in range(BLK):
            iy = row_ref[j, 0]
            ix = col_ref[j, 0]
            out_ref[j] = aligned_slice(img_ref, iy, ix, S, S)

    return kernel


@functools.lru_cache(maxsize=None)
def _make_windows_call(S: int, interpret: bool):
    """custom_vmap-wrapped integer-window extraction, cached per config.

    The batch rule lowers a vmapped call (B sequences) to ONE kernel over
    vertically-stacked images with per-sequence row offsets on the corners
    (Mosaic's generic batched lowering of scattered-read kernels is slow).
    Integer corners make the stacking exact; windows stay inside their own
    image because corners are pre-clipped to [0, Hp-S] per image and the
    aligned loads only over-read rows that are rolled away before the crop.
    """

    @jax.custom_batching.custom_vmap
    def call(img_pad, row, col):
        n = row.shape[0]
        hp, wp = img_pad.shape
        kernel = _make_kernel_int(S, hp, wp)
        blk1 = lambda: pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                                    memory_space=pltpu.SMEM)
        return pl.pallas_call(
            kernel,
            grid=(n // BLK,),
            in_specs=[blk1(), blk1(), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLK, S, S), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, S, S), jnp.float32),
            interpret=interpret,
        )(row, col, img_pad)

    @call.def_vmap
    def _batch_rule(axis_size, in_batched, img_pad, row, col):
        B = axis_size
        bcast = lambda x, b: x if b else jnp.broadcast_to(x, (B,) + x.shape)
        row = bcast(row, in_batched[1])
        col = bcast(col, in_batched[2])
        n = row.shape[1]
        if in_batched[0]:
            hp, wp = img_pad.shape[1:]
            off = (jnp.arange(B, dtype=jnp.int32) * hp)[:, None, None]
            row = row + off
            img_flat = img_pad.reshape(B * hp, wp)
        else:
            img_flat = img_pad
        out = call(img_flat, row.reshape(B * n, 1), col.reshape(B * n, 1))
        return out.reshape(B, n, S, S), True

    return call


@functools.partial(jax.jit, static_argnames=("S", "interpret"))
def extract_windows_int(img_pad: jax.Array, corner_rc: jax.Array, S: int,
                        interpret: bool = False) -> jax.Array:
    """(Hp, Wp) padded image + (N, 2) int32 [row, col] corners -> (N, S, S).

    The support primitive of the dense-XLA LK backend (``ops/lk_dense.py``):
    Pallas does ONLY the scattered window reads (aligned block load + rotate,
    the access pattern Mosaic executes well); every downstream op is dense
    batched XLA. Corners must be pre-clipped to [0, Hp-S] x [0, Wp-S].
    vmap over a leading (sequence) axis lowers to one stacked-image call.
    """
    n = corner_rc.shape[0]
    assert n % BLK == 0, n
    call = _make_windows_call(S, interpret)
    return call(img_pad.astype(jnp.float32),
                corner_rc[:, 0:1].astype(jnp.int32),
                corner_rc[:, 1:2].astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("P", "pad", "interpret"))
def extract_patches_pallas(img_pad: jax.Array, centers_xy: jax.Array, P: int,
                           pad: int = 0, interpret: bool = False) -> jax.Array:
    """(Hp, Wp) padded image + (N, 2) [x, y] unpadded centers -> (N, P, P)."""
    n = centers_xy.shape[0]
    assert n % BLK == 0, n
    hp, wp = img_pad.shape
    prow = (centers_xy[:, 1:2] + pad).astype(jnp.float32)
    pcol = (centers_xy[:, 0:1] + pad).astype(jnp.float32)

    kernel = _make_kernel(P, hp, wp)
    blk1 = lambda: pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                                memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(n // BLK,),
        in_specs=[blk1(), blk1(),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLK, P, P), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, P, P), jnp.float32),
        interpret=interpret,
    )(prow, pcol, img_pad.astype(jnp.float32))


def extract_patches(img: jax.Array, centers_xy: jax.Array, P: int,
                    use_pallas: bool | None = None,
                    interpret: bool = False) -> jax.Array:
    """Batched (N, P, P) subpixel patches around centers (edge-replicated).

    Dispatches to the Pallas kernel on TPU (padding/alignment handled here)
    or a vmapped-slice XLA formulation on CPU. N is padded to BLK internally.
    """
    from . import interp
    from .lk import use_pallas_default

    if use_pallas is None:
        use_pallas = use_pallas_default()
    n = centers_xy.shape[0]
    if not use_pallas and not interpret:
        return interp.sample_patches(img, centers_xy, P)

    pad = P // 2 + 2
    eh = (-(img.shape[0] + 2 * pad)) % 8
    ew = (-(img.shape[1] + 2 * pad)) % 128
    img_pad = jnp.pad(img, ((pad, pad + eh), (pad, pad + ew)), mode="edge")
    n_pad = (-n) % BLK
    c = centers_xy
    if n_pad:
        c = jnp.concatenate([c, jnp.zeros((n_pad, 2), c.dtype)], axis=0)
    out = extract_patches_pallas(img_pad, c, P, pad=pad, interpret=interpret)
    return out[:n]
