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


def _make_kernel(P: int, hp: int, wp: int):
    assert hp % 8 == 0 and (wp % 128 == 0 or wp < 256), (hp, wp)
    r = (P - 1) / 2.0  # patch center offset (float; P may be even)

    def aligned_slice(ref, row_i, col_i, rows_out, cols_out):
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
