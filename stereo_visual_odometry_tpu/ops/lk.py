"""Batched pyramidal Lucas-Kanade optical flow.

TPU-native replacement for the four chained ``cv::calcOpticalFlowPyrLK``
calls of the reference's circular matcher
(``/root/reference/src/tracking.cpp:583-622``: 21x21 window, pyramid levels,
30 iterations / 0.01 eps) and its ``deleteBadmatchFeatures`` filter
(``tracking.cpp:623-660``).

Design: all N keypoints advance together — patches, gradients, and the 2x2
normal equations are batched tensors; the per-point iteration is a
``lax.fori_loop`` with masked convergence (no data-dependent trip counts).
Memory access is built around per-point search windows extracted ONCE per
level with contiguous slices; the 30-iteration loop then samples patches by
integer-shift + 4-tap blend (``_shift_blend``) — pure VPU work with no
scattered gathers. The 2x2 solve is closed-form (no linalg call).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import interp, se3


# Max flow change per level beyond the incoming guess (px). The coarsest
# level does the heavy displacement search (stereo disparity /2^L can still
# be tens of px on KITTI); finer levels only refine the upscaled guess.
SEARCH_RADIUS_COARSEST = 20
SEARCH_RADIUS_REFINE = 6


def _slice_windows(img: jax.Array, origin_rc: jax.Array, size_h: int,
                   size_w: int) -> jax.Array:
    """(N, 2) int [row, col] origins -> (N, size_h, size_w) windows."""
    return jax.vmap(
        lambda o: jax.lax.dynamic_slice(img, (o[0], o[1]), (size_h, size_w))
    )(origin_rc)


def _shift_blend(windows: jax.Array, tl_rc: jax.Array, win: int) -> jax.Array:
    """Bilinear patch sampling via integer slice + 4-tap blend.

    Every sample of a patch shares one fractional offset (the sample grid is
    integer-spaced), so bilinear interpolation of the whole (win, win) patch
    is a (win+1, win+1) contiguous slice and four shifted elementwise
    blends — no scattered gathers in the iteration loop. This is what makes
    the LK inner loop map onto the VPU instead of the scalar unit.

    Args:
      windows: (N, S, S) per-point search windows.
      tl_rc: (N, 2) float patch top-left in window coords [row, col].
    """
    sh, sw = windows.shape[-2], windows.shape[-1]
    tl0 = jnp.floor(tl_rc)
    f = tl_rc - tl0
    tl_i = jnp.clip(tl0.astype(jnp.int32), 0,
                    jnp.array([sh - win - 1, sw - win - 1], jnp.int32))
    sub = jax.vmap(
        lambda w, o: jax.lax.dynamic_slice(w, (o[0], o[1]), (win + 1, win + 1))
    )(windows, tl_i)  # (N, win+1, win+1)
    fy = f[:, 0][:, None, None]
    fx = f[:, 1][:, None, None]
    a = sub[:, :win, :win]
    b = sub[:, :win, 1:]
    c = sub[:, 1:, :win]
    d = sub[:, 1:, 1:]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx +
            c * fy * (1 - fx) + d * fy * fx)


def _level_track(img_prev: jax.Array, img_next: jax.Array, pts: jax.Array,
                 guess: jax.Array, win: int, iters: int, eps: float,
                 min_eig: float, search_radius: int,
                 active: jax.Array | None = None) -> tuple[jax.Array, jax.Array]:
    """One pyramid level of LK for all points.

    Args:
      pts: (N, 2) keypoint positions in *this level's* pixel coords.
      guess: (N, 2) current flow estimate in this level's coords.
    Returns: (flow (N, 2), ok (N,) bool).

    Memory-access design: the template patch + gradients are sampled once
    (scattered bilinear gathers, 5 of them); the *iteration loop* reads only
    from per-point (S, S) search windows extracted once with contiguous
    dynamic slices, so its 30 iterations are slice + VPU math. Flow beyond
    ``search_radius`` of the incoming guess fails the point (the pyramid
    absorbs large motion, mirroring PyrLK's per-level search bound).
    """
    h, w = img_next.shape
    n = pts.shape[0]
    r = (win - 1) // 2
    grid = interp.patch_grid(win, dtype=pts.dtype)  # (P, P, 2)
    base = pts[:, None, None, :] + grid[None]       # (N, P, P, 2)

    # Template patch and its spatial gradients (central differences via
    # shifted bilinear samples — matches PyrLK's use of template gradients).
    T = interp.bilinear(img_prev, base)
    dx = jnp.array([1.0, 0.0], dtype=pts.dtype)
    dy = jnp.array([0.0, 1.0], dtype=pts.dtype)
    Ix = (interp.bilinear(img_prev, base + dx) - interp.bilinear(img_prev, base - dx)) * 0.5
    Iy = (interp.bilinear(img_prev, base + dy) - interp.bilinear(img_prev, base - dy)) * 0.5

    g00 = jnp.sum(Ix * Ix, axis=(1, 2))
    g01 = jnp.sum(Ix * Iy, axis=(1, 2))
    g11 = jnp.sum(Iy * Iy, axis=(1, 2))
    det = g00 * g11 - g01 * g01
    # OpenCV's minEigThreshold is on the min eigenvalue of G normalized by
    # window area; same normalization here.
    tr = g00 + g11
    min_eig_val = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) * 0.5 / (win * win)
    ok = min_eig_val > min_eig
    if active is not None:
        ok = ok & active  # masked points do no iterations (active0 below)
    safe_det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    inv00 = g11 / safe_det
    inv01 = -g01 / safe_det
    inv11 = g00 / safe_det

    # Per-point search windows around pts + guess (one contiguous slice).
    # The level image is edge-padded first so patches near borders keep
    # BORDER_REPLICATE semantics (what the gather-based sampler's clamping
    # provided); sizes clamp per-dimension so coarse pyramid levels smaller
    # than the full search window still work.
    pad = r + 1
    img_pad = jnp.pad(img_next, pad, mode="edge")
    hp, wp = h + 2 * pad, w + 2 * pad
    size = win + 1 + 2 * (search_radius + 1)
    size_h = min(size, hp)
    size_w = min(size, wp)
    center = pts + guess                      # (N, 2) [x, y]
    origin_xy = jnp.floor(center) - (r + search_radius + 1) + pad
    origin_rc = jnp.stack([origin_xy[:, 1], origin_xy[:, 0]], axis=-1)
    origin_rc = jnp.clip(origin_rc.astype(jnp.int32), 0,
                         jnp.array([hp - size_h, wp - size_w], jnp.int32))
    windows = _slice_windows(img_pad, origin_rc, size_h, size_w)
    origin_f = (jnp.stack([origin_rc[:, 1], origin_rc[:, 0]], -1)
                .astype(pts.dtype) - pad)

    def body(_, carry):
        v, active = carry
        # Patch top-left (x, y) in window-local coords.
        tl_xy = pts + v - r - origin_f
        tl_rc = jnp.stack([tl_xy[:, 1], tl_xy[:, 0]], axis=-1)
        warped = _shift_blend(windows, tl_rc, win)
        rdiff = T - warped
        b0 = jnp.sum(rdiff * Ix, axis=(1, 2))
        b1 = jnp.sum(rdiff * Iy, axis=(1, 2))
        d0 = inv00 * b0 + inv01 * b1
        d1 = inv01 * b0 + inv11 * b1
        step = jnp.stack([d0, d1], axis=-1)
        v = v + step * active[:, None]
        active = active * (jnp.sum(step * step, axis=-1) > eps * eps)
        return v, active

    v0 = guess
    active0 = ok.astype(pts.dtype)
    v, _ = jax.lax.fori_loop(0, iters, body, (v0, active0))
    # Fail points whose flow left the extracted window.
    inside = jnp.all(jnp.abs(v - guess) <= search_radius, axis=-1)
    return v, ok & inside


def use_pallas_default() -> bool:
    """Pallas LK on real TPU backends; XLA formulation on CPU."""
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


@partial(jax.jit, static_argnames=("win", "levels", "iters", "eps",
                                   "eps_coarse", "min_eig",
                                   "use_pallas", "pallas_kernel",
                                   "rounds_coarse", "rounds_refine"))
def track(pyr_prev: tuple, pyr_next: tuple, pts: jax.Array,
          win: int = 21, levels: int = 3, iters: int = 30, eps: float = 0.01,
          eps_coarse: float = 0.03,
          min_eig: float = 1e-4, use_pallas: bool = False,
          pallas_kernel: str = "cell", init_flow: jax.Array | None = None,
          active: jax.Array | None = None,
          rounds_coarse: int = 8, rounds_refine: int = 2,
          ) -> tuple[jax.Array, jax.Array]:
    """Track N points from prev to next through a factor-2 pyramid.

    Args:
      pyr_prev / pyr_next: tuples of (H/2^l, W/2^l) float32 images,
        level 0 first (from ``pyramid.build_pyramid``).
      pts: (N, 2) [x, y] positions in level-0 coords.
      init_flow: optional (N, 2) level-0 flow guess. A predictive guess
        (disparity prior / motion model) collapses the coarse-level search
        to a local refinement — on TPU the kernel cost scales with pixel-cell
        crossings, so good guesses are the main throughput lever. The
        per-level search radius applies AROUND the guess.

    Returns:
      (next_pts (N, 2), ok (N,) bool). ``ok`` requires a well-conditioned
      gradient matrix at the finest level and the final point in-frame
      (mirrors PyrLK's status output consumed at ``tracking.cpp:623-649``).
    """
    n_levels = min(levels, len(pyr_prev))
    n = pts.shape[0]
    # Pallas kernel wants a block-divisible point count.
    n_pad = 0
    if use_pallas:
        from . import lk_pallas

        n_pad = (-n) % lk_pallas.BLK
        if n_pad:
            pts = jnp.concatenate(
                [pts, jnp.zeros((n_pad, 2), pts.dtype)], axis=0)
            if init_flow is not None:
                init_flow = jnp.concatenate(
                    [init_flow, jnp.zeros((n_pad, 2), init_flow.dtype)], axis=0)
            if active is not None:
                active = jnp.concatenate(
                    [active, jnp.zeros((n_pad,), bool)], axis=0)

    if init_flow is None:
        flow = pts * 0.0  # (N, 2) zeros, right dtype
    else:
        # Coarsest-level units; the loop's x2 rescale walks it back down.
        flow = init_flow.astype(pts.dtype) * (0.5 ** (n_levels - 1))
    ok_all = jnp.ones(pts.shape[0], dtype=bool)
    for lvl in range(n_levels - 1, -1, -1):
        radius = SEARCH_RADIUS_COARSEST if lvl == n_levels - 1 else SEARCH_RADIUS_REFINE
        # Coarse levels only hand a guess to the next level (which searches
        # +-radius around it); iterating them to the finest-level eps is
        # wasted work — on TPU the LK kernel cost scales with iterations.
        eps_l = eps if lvl == 0 else max(eps, eps_coarse)
        scale = 2.0 ** lvl
        pts_l = pts / scale
        ip, inx = pyr_prev[lvl], pyr_next[lvl]
        # Edge-pad levels smaller than the correlation window (coarse levels
        # of small images still carry the large-motion signal).
        ph = max(win + 2 - ip.shape[0], 0)
        pw = max(win + 2 - ip.shape[1], 0)
        if ph or pw:
            ip = jnp.pad(ip, ((0, ph), (0, pw)), mode="edge")
            inx = jnp.pad(inx, ((0, ph), (0, pw)), mode="edge")
        if use_pallas:
            # Mosaic alignment: padded height multiple of 8, width multiple
            # of 128 (extra pad goes bottom/right; coords shift by `pad`).
            pad = (win - 1) // 2 + 2
            eh = (-(ip.shape[0] + 2 * pad)) % 8
            ew = (-(ip.shape[1] + 2 * pad)) % 128
            pads = ((pad, pad + eh), (pad, pad + ew))
            ipp = jnp.pad(ip, pads, mode="edge")
            inxp = jnp.pad(inx, pads, mode="edge")
            if pallas_kernel == "cell":
                from . import lk_pallas_cell

                level_fn = lk_pallas_cell.level_track_pallas_cell
            elif pallas_kernel == "dense":
                from . import lk_dense

                # Reload rounds: the coarsest level absorbs the large
                # residual motion (more pixel-cell crossings); refine levels
                # start within ~a cell of the answer. Dense-backend cost is
                # FIXED per round (window extract + 8 dots for all N), so
                # fewer rounds on refine levels is a direct saving.
                rnds = (rounds_coarse if lvl == n_levels - 1
                        else rounds_refine)
                level_fn = partial(lk_dense.level_track_dense, rounds=rnds)
            else:
                level_fn = lk_pallas.level_track_pallas
            flow, ok = level_fn(
                ipp, inxp, pts_l, flow, win=win, iters=iters, eps=eps_l,
                min_eig=min_eig, search_radius=radius, pad=pad, active=active)
        else:
            flow, ok = _level_track(ip, inx, pts_l, flow,
                                    win, iters, eps_l, min_eig, radius,
                                    active=active)
        ok_all = ok_all & ok
        if lvl > 0:
            flow = flow * 2.0
    next_pts = pts + flow
    h, w = pyr_next[0].shape
    inside = ((next_pts[:, 0] >= 0) & (next_pts[:, 0] <= w - 1) &
              (next_pts[:, 1] >= 0) & (next_pts[:, 1] <= h - 1))
    if n_pad:
        next_pts = next_pts[:n]
        inside = inside[:n]
        ok_all = ok_all[:n]
    return next_pts, ok_all & inside


def disparity_grid(xy: jax.Array, disp: jax.Array, valid: jax.Array,
                   height: int, width: int, cell: int = 64,
                   default_disp: float = 24.0):
    """Rasterize sparse disparities into a coarse per-cell prior grid.

    (N, 2) pixel positions + (N,) disparities -> (H/cell, W/cell) mean
    disparity per cell; empty cells filled with the valid median (or
    ``default_disp`` when nothing is valid). Dense segment-sums only — the
    grid is the cheap temporal memory that makes the next frame's stereo
    LK leg a local refinement instead of a 20-cell coarse search.
    """
    gh = -(-height // cell)
    gw = -(-width // cell)
    cx = jnp.clip((xy[:, 0] / cell).astype(jnp.int32), 0, gw - 1)
    cy = jnp.clip((xy[:, 1] / cell).astype(jnp.int32), 0, gh - 1)
    idx = cy * gw + cx
    v = valid.astype(disp.dtype)
    sums = jax.ops.segment_sum(disp * v, idx, num_segments=gh * gw)
    cnts = jax.ops.segment_sum(v, idx, num_segments=gh * gw)
    # Median of valid disparities as the fill for empty cells.
    big = jnp.where(valid, disp, jnp.inf)
    order = jnp.sort(big)
    n_valid = jnp.sum(valid)
    med = order[jnp.clip(n_valid // 2, 0, disp.shape[0] - 1)]
    med = jnp.where(n_valid > 0, med, jnp.asarray(default_disp, disp.dtype))
    grid = jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1.0), med)
    return grid.reshape(gh, gw)


def sample_disparity(grid: jax.Array, xy: jax.Array, cell: int = 64):
    """Sample the per-cell disparity prior at (N, 2) pixel positions."""
    gh, gw = grid.shape
    cx = jnp.clip((xy[:, 0] / cell).astype(jnp.int32), 0, gw - 1)
    cy = jnp.clip((xy[:, 1] / cell).astype(jnp.int32), 0, gh - 1)
    return grid[cy, cx]


def circular_track(pyrs: tuple, pts_t1l: jax.Array, valid: jax.Array,
                   feature_match_error: float = 2.0,
                   cycle_error: float = 2.0,
                   win: int = 21, levels: int = 3, iters: int = 30,
                   eps: float = 0.01, eps_coarse: float = 0.03,
                   use_pallas: bool = False, pallas_kernel: str = "cell",
                   rig=None, T_pred: jax.Array | None = None,
                   disp_prior: jax.Array | None = None,
                   use_sweep: bool = False, sweep_d_max: int = 48,
                   stereo_levels: int | None = None,
                   temporal_levels: int | None = None,
                   max_disp: float = 192.0, max_guess: float = 160.0,
                   dmap_prev: jax.Array | None = None,
                   rounds_prior: int = 4, rounds_coarse: int = 8,
                   rounds_refine: int = 2):
    """4-way circular LK: t1L -> t1R -> t2R -> t2L -> t1L.

    The reference's loop-consistency matching
    (``LK_Robust_Find_MuliImage_MatchedFeatures``, ``tracking.cpp:583-622``)
    with its filter semantics (``deleteBadmatchFeatures``,
    ``tracking.cpp:623-660``): all four statuses OK, every point in-frame,
    stereo epipolar |Δy| <= feature_match_error in both stereo pairs. We
    additionally bound the closure distance back to the start point
    (``cycle_error``; the reference only checks sign — ``tracking.cpp:637-643``
    — a consciously tightened gate, see SURVEY.md §7).

    Predictive initialization (TPU-first design, not in the reference): the
    kernel cost scales with pixel-cell crossings, so each leg starts from
    the best available guess — the stereo leg from a coarse disparity-prior
    grid (``disp_prior``, the previous frame's disparities), the temporal
    legs from the constant-velocity motion model ``T_pred`` applied to the
    leg-1 triangulation. The legs still run the full iteration + all four
    status/epipolar/cycle gates, so a wrong prior fails the point exactly
    like a failed track (the per-level search radius bounds how far a bad
    guess can pull a point).

    Args:
      pyrs: (pyr_t1l, pyr_t1r, pyr_t2r, pyr_t2l) factor-2 pyramids.
      rig: optional ``StereoRig`` enabling motion-model guesses.
      T_pred: optional (4, 4) predicted T_21 (current from previous).
      disp_prior: optional (N,) per-point disparity guess (level-0 px).
    Returns:
      dict with tracked points in each image and the combined valid mask.
    """
    pyr_t1l, pyr_t1r, pyr_t2r, pyr_t2l = pyrs
    kw = dict(win=win, iters=iters, eps=eps, eps_coarse=eps_coarse,
              use_pallas=use_pallas, pallas_kernel=pallas_kernel,
              rounds_coarse=rounds_coarse, rounds_refine=rounds_refine)
    # Dense-backend reload budget: a leg with a predictive prior starts
    # within a couple of pixels, so fewer rounds cover its cell crossings;
    # an unassisted leg keeps the deep coarse budget.
    kw_prior = dict(kw, rounds_coarse=rounds_prior)
    lv_st = levels if stereo_levels is None else stereo_levels
    lv_tm = levels if temporal_levels is None else temporal_levels
    clipg = lambda g: jnp.clip(g, -max_guess, max_guess)

    g1 = None
    if use_sweep:
        from . import stereo_sweep

        L = min(2, len(pyr_t1l) - 1)
        scale = 2.0 ** L
        # Frame t's t1-pair IS frame t-1's t2-pair: the step loop passes the
        # previous frame's dmap2 back in as ``dmap_prev``, saving one sweep
        # per frame (the sweep is recomputed only on the first frame).
        dmap1 = (dmap_prev if dmap_prev is not None else
                 stereo_sweep.disparity_sweep(pyr_t1l[L], pyr_t1r[L],
                                              d_max=sweep_d_max))
        d0 = jnp.clip(stereo_sweep.sample_map(dmap1, pts_t1l, scale),
                      0.0, max_disp)
        g1 = jnp.stack([-d0, jnp.zeros_like(d0)], axis=-1)
    elif disp_prior is not None:
        d0 = jnp.clip(disp_prior, 0.0, max_disp)
        g1 = jnp.stack([-d0, jnp.zeros_like(d0)], axis=-1)
    p_t1r, ok1 = track(pyr_t1l, pyr_t1r, pts_t1l, init_flow=g1,
                       active=valid, levels=lv_st if g1 is not None else levels,
                       **(kw_prior if g1 is not None else kw))
    ok1 = ok1 & valid

    g2 = g3 = g4 = None
    if rig is not None and T_pred is not None:
        fxB = rig.left.fx * rig.baseline
        d1 = jnp.clip(pts_t1l[:, 0] - p_t1r[:, 0], 1.0, max_disp)
        X = rig.left.unproject(pts_t1l, fxB / d1)
        X2 = se3.transform_points(T_pred, X)
        z2 = jnp.maximum(X2[:, 2], 0.5)
        X2 = X2.at[:, 2].set(z2)
        p2l_pred = rig.left.project(X2)
        d2_pred = jnp.clip(fxB / z2, 0.0, max_disp)
        p2r_pred = p2l_pred - jnp.stack(
            [d2_pred, jnp.zeros_like(d2_pred)], axis=-1)
        g2 = clipg(p2r_pred - p_t1r)
    p_t2r, ok2 = track(pyr_t1r, pyr_t2r, p_t1r, init_flow=g2,
                       active=ok1, levels=lv_tm if g2 is not None else levels,
                       **(kw_prior if g2 is not None else kw))
    ok2 = ok2 & ok1

    if use_sweep:
        # Frame-2 disparity map for the t2R -> t2L leg (flow = +d at t2).
        dmap2 = stereo_sweep.disparity_sweep(pyr_t2l[L], pyr_t2r[L],
                                             d_max=sweep_d_max)
        at = p2l_pred if g2 is not None else p_t2r
        d2s = jnp.clip(stereo_sweep.sample_map(dmap2, at, scale),
                       0.0, max_disp)
        g3 = jnp.stack([d2s, jnp.zeros_like(d2s)], axis=-1)
    elif g2 is not None:
        g3 = clipg(p2l_pred - p_t2r)
    p_t2l, ok3 = track(pyr_t2r, pyr_t2l, p_t2r, init_flow=g3,
                       active=ok2, levels=lv_st if g3 is not None else levels,
                       **(kw_prior if g3 is not None else kw))
    ok3 = ok3 & ok2

    if g2 is not None:
        # Back-leg guess from the MOTION MODEL, not from pts_t1l itself:
        # initializing at the cycle-gate pass condition (pts_t1l - p_t2l)
        # would bias the verification leg toward the local minimum at the
        # expected answer and weaken the forward-backward filter. The
        # reverse of the predicted temporal flow is independent of the
        # tracked result, so a bad forward track still has to *earn* cycle
        # closure through real iterations.
        g4 = clipg(pts_t1l - p2l_pred)
    p_t1l_back, ok4 = track(pyr_t2l, pyr_t1l, p_t2l, init_flow=g4,
                            active=ok3, levels=lv_tm if g4 is not None else levels,
                            **(kw_prior if g4 is not None else kw))

    epi1 = jnp.abs(pts_t1l[:, 1] - p_t1r[:, 1]) <= feature_match_error
    epi2 = jnp.abs(p_t2l[:, 1] - p_t2r[:, 1]) <= feature_match_error
    cyc = jnp.sum((p_t1l_back - pts_t1l) ** 2, axis=-1) <= cycle_error * cycle_error
    ok = valid & ok1 & ok2 & ok3 & ok4 & epi1 & epi2 & cyc
    out = {
        "t1l": pts_t1l, "t1r": p_t1r, "t2r": p_t2r, "t2l": p_t2l,
        "valid": ok,
    }
    if use_sweep:
        out["dmap"] = dmap2  # next frame's dmap_prev
    return out
