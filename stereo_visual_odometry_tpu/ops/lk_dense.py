"""Dense-XLA LK level tracker: Pallas window reads + batched vector math.

The gather-free redesign PERF.md sketched, replacing the per-point scalar
iteration of the cell kernel (``lk_pallas_cell.py``). Measured on hardware,
the cell kernel costs ~1.8 us/point per level-call — almost all of it
template/reload VECTOR work executed point-at-a-time on (21, 21) patches,
which occupy 22 of 128 VPU lanes (~17% utilization). The Pallas patch
extractor, by contrast, moves ~0.1 us/point: scattered reads are the only
thing Mosaic needs to do point-serially.

So this backend splits the level tracker by what each engine is good at:

  * Pallas (``patch_pallas.extract_windows_int``): gather the per-point
    (S, S) integer-corner windows — aligned block loads + rotates;
  * XLA: everything else, batched over ALL N points at once — template
    gradients, the normal matrix, and the per-iteration math via the same
    bilinear-form identity the cell kernel uses (with the integer corner
    fixed, the warped-patch dot products are bilinear in the fractional
    offset, so one round of 8 patch dots turns the whole iteration loop
    into (N,)-shaped scalar updates).

The iteration schedule is R fixed ROUNDS (window reload, 8 dots) x K inner
iterations (pure (N,) math). A point that crosses a pixel cell mid-round
freezes until the next round's reload — with predictive initialization
(disparity sweep / motion model) points cross <= 1-2 cells, so R=4 covers
the trajectory the cell kernel's data-dependent while-loop would take.

Numerics match ``lk._level_track`` / the cell kernel (same template
construction, same min-eig gate and normalization, same clipping), so the
backends are interchangeable per level; parity is asserted in
``tests/test_lk_dense.py`` (CPU) and ``tests_tpu/`` (hardware).

Reference workload: the four chained ``cv::calcOpticalFlowPyrLK`` calls of
``/root/reference/src/tracking.cpp:593-618`` (21x21 window, 30 iters).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import patch_pallas


def _blend4_batch(sub: jax.Array, fy: jax.Array, fx: jax.Array) -> jax.Array:
    """(N, S, S) windows + (N,) fractions -> (N, S-1, S-1) bilinear fields."""
    fy = fy[:, None, None]
    fx = fx[:, None, None]
    a = sub[:, :-1, :-1]
    b = sub[:, :-1, 1:]
    c = sub[:, 1:, :-1]
    d = sub[:, 1:, 1:]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx +
            c * fy * (1 - fx) + d * fy * fx)


def _pad8(x: jax.Array, off_r: int, off_c: int) -> jax.Array:
    """Place (N, win, win) at offset (off_r, off_c) inside (N, win+1, win+1)."""
    return jnp.pad(x, ((0, 0), (off_r, 1 - off_r), (off_c, 1 - off_c)))


@functools.partial(
    jax.jit,
    static_argnames=("win", "iters", "eps", "min_eig", "search_radius",
                     "rounds", "interpret"))
def level_track_dense(img_prev_pad: jax.Array, img_next_pad: jax.Array,
                      pts: jax.Array, guess: jax.Array, win: int = 21,
                      iters: int = 30, eps: float = 0.01,
                      min_eig: float = 1e-4, search_radius: int = 6,
                      pad: int = 0, rounds: int = 4, interpret: bool = False,
                      active: jax.Array | None = None):
    """Drop-in replacement for ``lk_pallas_cell.level_track_pallas_cell``.

    Same contract: padded images (height % 8 == 0, width % 128 == 0 or
    < 256), level-coordinate points + ``pad`` offset, returns
    (flow (N, 2), ok (N,) bool) with flow measured from ``guess``.
    """
    n = pts.shape[0]
    assert n % patch_pallas.BLK == 0, n
    hp, wp = img_prev_pad.shape
    r = (win - 1) // 2
    f32 = jnp.float32
    img_prev_pad = img_prev_pad.astype(f32)
    img_next_pad = img_next_pad.astype(f32)

    py = (pts[:, 1] + pad).astype(f32)
    px = (pts[:, 0] + pad).astype(f32)
    gy = guess[:, 1].astype(f32)
    gx = guess[:, 0].astype(f32)

    # ---- template phase (identical math to the cell kernel) ------------- #
    tbr = py - r - 1.0
    tbc = px - r - 1.0
    tr0 = jnp.clip(jnp.floor(tbr).astype(jnp.int32), 0, hp - win - 3)
    tc0 = jnp.clip(jnp.floor(tbc).astype(jnp.int32), 0, wp - win - 3)
    tfy = tbr - tr0.astype(f32)
    tfx = tbc - tc0.astype(f32)
    sub_t = patch_pallas.extract_windows_int(
        img_prev_pad, jnp.stack([tr0, tc0], -1), win + 3, interpret=interpret)
    field = _blend4_batch(sub_t, tfy, tfx)          # (N, win+2, win+2)
    T = field[:, 1:-1, 1:-1]                        # (N, win, win)
    Ix = (field[:, 1:-1, 2:] - field[:, 1:-1, :-2]) * 0.5
    Iy = (field[:, 2:, 1:-1] - field[:, :-2, 1:-1]) * 0.5

    g00 = jnp.sum(Ix * Ix, axis=(1, 2))
    g01 = jnp.sum(Ix * Iy, axis=(1, 2))
    g11 = jnp.sum(Iy * Iy, axis=(1, 2))
    det = g00 * g11 - g01 * g01
    trc = g00 + g11
    mev = (trc - jnp.sqrt(jnp.maximum(trc * trc - 4 * det, 0.0))) * 0.5 / (win * win)
    ok = mev > min_eig
    if active is not None:
        ok = ok & active
    safe_det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    inv00 = g11 / safe_det
    inv01 = -g01 / safe_det
    inv11 = g00 / safe_det
    tIx = jnp.sum(T * Ix, axis=(1, 2))
    tIy = jnp.sum(T * Iy, axis=(1, 2))

    # Gradient stacks for the 8 bilinear-form dots, flattened to (N, 8, F)
    # with F = (win+1)^2 in the VPU lane dimension (one pass over the
    # window per round computes all 8 sums).
    F = (win + 1) * (win + 1)
    grad8 = jnp.stack([
        _pad8(Ix, 0, 0), _pad8(Ix, 0, 1), _pad8(Ix, 1, 0), _pad8(Ix, 1, 1),
        _pad8(Iy, 0, 0), _pad8(Iy, 0, 1), _pad8(Iy, 1, 0), _pad8(Iy, 1, 1),
    ], axis=1).reshape(n, 8, F)                     # (N, 8, F)

    act0 = ok.astype(f32)
    vy0 = jnp.zeros_like(py)
    vx0 = jnp.zeros_like(px)
    # Inner iterations are (N,)-shaped scalar math — essentially free next
    # to the per-round window extraction — so give every round enough of
    # them to converge within its cell (LK averages ~7 iterations/cell).
    k_inner = max(8, -(-iters // rounds))

    def round_body(carry, _):
        vy, vx, act = carry
        br = py + gy + vy - r
        bc = px + gx + vx - r
        iy = jnp.clip(jnp.floor(br).astype(jnp.int32), 0, hp - win - 1)
        ix = jnp.clip(jnp.floor(bc).astype(jnp.int32), 0, wp - win - 1)
        W = patch_pallas.extract_windows_int(
            img_next_pad, jnp.stack([iy, ix], -1), win + 1,
            interpret=interpret)                     # (N, S, S)
        dots = jnp.einsum("nf,nkf->nk", W.reshape(n, F), grad8)  # (N, 8)
        sIxa, sIxb, sIxc, sIxd = (dots[:, k] for k in range(4))
        sIya, sIyb, sIyc, sIyd = (dots[:, k] for k in range(4, 8))
        iyf = iy.astype(f32)
        ixf = ix.astype(f32)

        def inner(_, s):
            vy_, vx_, act_, stay = s
            fy = (py + gy + vy_ - r) - iyf
            fx = (px + gx + vx_ - r) - ixf
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
            m = act_ * stay
            vx_ = vx_ + dx * m
            vy_ = vy_ + dy * m
            act_ = act_ * jnp.where(
                m > 0, (dx * dx + dy * dy > eps * eps).astype(f32), 1.0)
            iy2 = jnp.clip(jnp.floor(py + gy + vy_ - r).astype(jnp.int32),
                           0, hp - win - 1)
            ix2 = jnp.clip(jnp.floor(px + gx + vx_ - r).astype(jnp.int32),
                           0, wp - win - 1)
            stay = stay * ((iy2 == iy) & (ix2 == ix)).astype(f32)
            return vy_, vx_, act_, stay

        vy, vx, act, _ = jax.lax.fori_loop(
            0, k_inner, inner, (vy, vx, act, jnp.ones_like(act)))
        return (vy, vx, act), None

    (vy, vx, act_f), _ = jax.lax.scan(round_body, (vy0, vx0, act0), None,
                                      length=rounds)

    flow_d = jnp.stack([vx, vy], axis=-1)
    flow = guess + flow_d
    inside = jnp.all(jnp.abs(flow_d) <= search_radius, axis=-1)
    # Convergence gate: a point still active after the last round either
    # exhausted the reload budget mid-walk (truncated — its flow is NOT at
    # the LK fixed point) or never converged. The cell kernel would keep
    # walking such points; here they are FAILED instead of returned with a
    # biased estimate — measured on hardware, the ~5% truncated tail had
    # up-to-3 px disparity errors that passed every downstream gate and
    # poisoned triangulation depth (PnP translation RPE 5x). Stricter than
    # cv::calcOpticalFlowPyrLK (which only fails on min-eig/out-of-image),
    # a conscious deviation: reject, don't contaminate.
    converged = act_f == 0.0
    return flow, ok & inside & converged
