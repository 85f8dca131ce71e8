"""Frame-to-frame stereo VO frontends (LK and ORB pipelines), fully jitted.

TPU-native re-architecture of the reference's ``Tracking`` component
(``/root/reference/src/tracking.cpp``): the whole per-frame computation —
detection, 4-way circular LK (or ORB + Hamming association), t-1 stereo
triangulation, RANSAC-PnP, motion gating — is ONE compiled XLA program over
fixed-shape arrays. The host only feeds images and composes the trajectory
(the pose chain is inherently serial, SURVEY.md §7).

Pipeline parity map:
  LK mode  -> ``LK_StereoF2F_PnP_Track``  (``tracking.cpp:258-344``)
  ORB mode -> ``ORB_StereoF2F_PnP_Track`` (``tracking.cpp:168-249``)
  gates    -> min detect 30 (``tracking.cpp:261-265``), min tracked
              (``tracking.cpp:274-279``), inlier ratio (``tracking.cpp:
              491-495``), motion bounds + per-axis euler < 0.1 rad
              (``tracking.cpp:209-233, 305-329``). The LK path uses the
              config bounds (the reference hardcodes them there — a bug we
              do not reproduce, SURVEY.md §7).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..ops import fast, lk, match, orb, pnp, pyramid, se3, select, triangulate
from ..ops.camera import StereoRig


@dataclasses.dataclass(frozen=True)
class VOConfig:
    """Static pipeline configuration (mirrors ``config/default.yaml`` keys +
    ``Parameter``, ``/root/reference/src/parameter.cpp:47-71``)."""

    mode: str = "lk"                  # 'lk' | 'orb'  (track_mode, default.yaml:75)
    height: int = 384                 # padded static image shape
    width: int = 1248
    max_features: int = 1024          # fixed keypoint capacity (nFeatures=2000)
    # FAST / detection
    fast_threshold: float = 20.0      # tracking.cpp:99
    cell: int = 32                    # ~30 px cells, ORBextractor.cpp:737-741
    k_per_cell: int = 8
    # LK
    lk_win: int = 21                  # tracking.cpp:593-618
    lk_levels: int = 3
    lk_iters: int = 30
    pyr_levels: int = 4
    feature_match_error: float = 2.0  # stereo |dy| gate (default.yaml)
    cycle_error: float = 2.0
    # ORB
    orb_levels: int = 8               # default.yaml:91
    orb_scale: float = 1.2
    orb_ini_th: float = 20.0
    orb_min_th: float = 7.0
    # Adaptive Hamming gate max(ratio*min_dist, floor) (tracking.cpp:549-577
    # uses floor 30; with cross-level duplicates suppressed the raw floor-30
    # gate keeps a brittle-thin set on textured scenes — 50 keeps the
    # operating point at a few hundred matches and lets RANSAC do the
    # precision work, as the reference's 500-hypothesis budget intends).
    orb_dist_floor: float = 50.0
    orb_dist_ratio: float = 2.0
    # Reference semantics: BFMatcher::match is ONE-WAY best match
    # (tracking.cpp:543-544); the mutual cross-check compounds with the
    # two-matching + adaptive gate and collapses yield (VERDICT r2 weak#2).
    orb_mutual: bool = False
    # Cross-level keypoint NMS (px; 0 = off). Off by default: the two-grid
    # bin champion rule also suppresses DISTINCT corners within ~radius px,
    # and measured on the synthetic e2e sequence it cuts the tracked set
    # ~4x (285 -> 71) and doubles ATE. With the one-way matcher + floor-50
    # gate the duplicate aliasing it targeted is no longer the yield limiter.
    orb_dedup_radius: float = 0.0
    # Candidate premasks folded into the Hamming matrix BEFORE the argmin
    # (ops/match.py): octave-adjacent levels only (the cross-level duplicate
    # aliasing fix — a corner's true partner is detected at the same octave),
    # epipolar/disparity feasibility for the stereo matching, and a motion
    # bound for the temporal matching. Defaults ON (r5 retune, measured on
    # the 48-frame synthetic e2e at 2048 features: ATE 0.24 -> 0.053,
    # n_tracked 121 -> 485 — scripts/probe_orb_e2e_2048.py); set
    # None/False for the reference-faithful unrestricted brute force.
    orb_max_level_diff: int | None = 1
    orb_stereo_premask: bool = True
    orb_max_disparity: float = 128.0
    orb_temporal_radius: float | None = 150.0
    # Upright BRIEF (describe at angle 0): f2f stereo VO has near-zero
    # in-plane rotation, so rotating the pattern by the per-view-noisy IC
    # angle only flips bits between views of the same corner — upright
    # halves matched-pair Hamming distances (median 29 -> 16 of 256,
    # scripts/probe_orb_dealias2.py).
    orb_upright: bool = True
    # Triangulation depth gate
    z_min: float = 0.5
    z_max: float = 200.0
    # RANSAC-PnP (default.yaml:80-82). inlier_px None = mode-resolved:
    # 0.5 px for LK (the reference's reprojectionError, default.yaml:81 —
    # LK tracks are subpixel so the tight gate pays: measured ATE
    # 0.061 -> 0.023 on the synthetic bench), 2.0 px for ORB (descriptor
    # association is coarser; 0.5 collapses accept to 0.90/ATE 1.5).
    # 256 hypotheses / 6 refine iters are the r4-benched operating point
    # (ATE beat the reproduced reference at accept 1.00); promoted to the
    # shipping default so benched config ≡ shipping config (VERDICT r4
    # weak #5).
    num_hypotheses: int = 256
    inlier_px: float | None = None
    refine_iters: int = 6

    @property
    def inlier_px_resolved(self) -> float:
        if self.inlier_px is not None:
            return self.inlier_px
        return 0.5 if self.mode == "lk" else 2.0
    # Quality gates
    min_features_detect: int = 30     # tracking.cpp:261-265
    min_features_track: int = 10      # num_features_tracking_
    # inlier_rate_ (default.yaml:77 uses 0.01). 0.05 here: strict enough to
    # catch degenerate solves, lax enough not to reject healthy RANSAC poses
    # on low-precision associations (a 0.5 gate rejected every ORB frame at
    # ~10% inlier ratio even when the pose itself was metrically correct).
    min_inlier_rate: float = 0.05
    min_move: float = 0.0005          # minmove_ (m)
    max_move: float = 10.0            # maxmove_ (m)
    max_euler: float = 0.1            # rad per axis, tracking.cpp:212-215
    # Persistent track slots (new capability: multi-frame tracks feed the
    # BA backend; the reference re-detects from scratch every frame).
    persistent_tracks: bool = False
    replenish_min_dist: float = 8.0   # px spacing for new detections
    # LK backend: "auto" = Pallas kernel on TPU, XLA formulation on CPU.
    lk_backend: str = "auto"          # 'auto' | 'pallas' | 'xla'
    # 'dense': Pallas window reads + batched-XLA iteration (ops/lk_dense.py,
    # measured ~3.5x the cell kernel per leg on v5e — the shipping default);
    # 'cell': per-point scalar cell kernel; 'v1': per-iteration reload kernel.
    lk_kernel: str = "dense"
    # Predictive LK initialization (TPU-first: kernel cost scales with
    # pixel-cell crossings, so legs start from a disparity prior + the
    # constant-velocity motion model instead of zero flow).
    lk_predictive: bool = True
    disp_cell: int = 64               # disparity-prior grid cell (px)
    # Dense plane-sweep stereo prior: collapses the LK stereo legs to a
    # finest-level refinement (ops/stereo_sweep.py); temporal legs keep a
    # short pyramid on top of the motion-model guess.
    lk_sweep: bool = True
    lk_sweep_d_max: int = 48
    lk_stereo_levels: int = 1
    lk_temporal_levels: int = 2
    # Dense-backend reload rounds (ops/lk_dense.py): per-leg window-reload
    # budget — prior-guided coarsest / unassisted coarsest / refine levels.
    lk_rounds_prior: int = 4
    lk_rounds_coarse: int = 8
    lk_rounds_refine: int = 2


# Tracking status values (``tracking.h:22-27``).
INITING, TRACKING_GOOD, LOST = 0, 1, 2

# Sentinel for the persistent-track id scatters (larger than any real id).
_ID_BIG = (1 << 30)


def _detect_left(cfg: VOConfig, img_l: jax.Array):
    """Dense FAST + spatially-uniform top-K + subpixel on the left image."""
    score = fast.detect(img_l, cfg.fast_threshold)
    xy, sc, valid = select.grid_top_k(score, cfg.max_features, cell=cfg.cell,
                                      k_per_cell=cfg.k_per_cell)
    # Respect the configured backend: with lk_backend='xla' the whole step
    # must lower without Pallas (the multi-chip dry run targets a virtual
    # CPU mesh while a TPU plugin may own the default platform, so the
    # platform-sniffing default would wrongly pick the Pallas path).
    use_pallas = (None if cfg.lk_backend == "auto"
                  else cfg.lk_backend == "pallas")
    xy = select.subpixel_refine(score, xy, valid, use_pallas=use_pallas)
    return xy, sc, valid



def _make_tri(rig: StereoRig):
    """Pick the triangulation routine at build time (the rig is concrete
    here; inside jit it may be a traced closure capture)."""
    if triangulate.is_rectified(rig):
        return lambda a, b: triangulate.stereo_depth_closed_form(rig, a, b)
    return lambda a, b: triangulate.triangulate_dlt(rig.P_left, rig.P_right, a, b)

def make_lk_frontend(cfg: VOConfig, rig: StereoRig):
    """Build (init_fn, step_fn), both jitted, for the LK pipeline.

    State pytree:
      pyr_l / pyr_r: tuples of pyramid levels of the previous frame
      kp:    (K, 2) previous-left keypoints
      kp_valid: (K,) bool
      T_wc:  (4, 4) accumulated world_from_camera pose (frame_pose_)
      key:   PRNG key for RANSAC sampling
      n_detected: int32 diagnostics
    """

    tri = _make_tri(rig)
    use_pallas = (lk.use_pallas_default() if cfg.lk_backend == "auto"
                  else cfg.lk_backend == "pallas")

    def _build_pyrs(img_l, img_r):
        pl = tuple(pyramid.build_pyramid(img_l.astype(jnp.float32), cfg.pyr_levels))
        pr = tuple(pyramid.build_pyramid(img_r.astype(jnp.float32), cfg.pyr_levels))
        return pl, pr

    gh = -(-cfg.height // cfg.disp_cell)
    gw = -(-cfg.width // cfg.disp_cell)

    @jax.jit
    def init_fn(img_l, img_r, key):
        """StereoInit_f2f (``tracking.cpp:78-92``): detect on frame 0."""
        pl, pr = _build_pyrs(img_l, img_r)
        xy, score, valid = _detect_left(cfg, img_l.astype(jnp.float32))
        n_det = jnp.sum(valid)
        status = jnp.where(n_det >= cfg.min_features_detect, TRACKING_GOOD, INITING)
        state = {
            "pyr_l": pl, "pyr_r": pr, "kp": xy, "kp_valid": valid,
            "T_wc": jnp.eye(4, dtype=jnp.float32),
            "T_21_prev": jnp.eye(4, dtype=jnp.float32), "key": key,
            "status": jnp.int32(status), "n_detected": n_det,
        }
        if cfg.lk_predictive and not cfg.lk_sweep:
            # No prior yet: a mid-range constant (fx*B / ~15 m on KITTI).
            state["disp_grid"] = jnp.full((gh, gw), 24.0, jnp.float32)
        if cfg.lk_predictive and cfg.lk_sweep:
            # Frame-0 disparity map: next step's t1-pair sweep (the step
            # only sweeps its t2 pair and carries the map forward).
            from ..ops import stereo_sweep

            L = min(2, cfg.pyr_levels - 1)
            state["dmap"] = stereo_sweep.disparity_sweep(
                pl[L], pr[L], d_max=cfg.lk_sweep_d_max)
        if cfg.persistent_tracks:
            k = cfg.max_features
            # Compact ids (0..n_valid-1): valid slots need not be a prefix,
            # so slot-index ids would exceed next_id and collide with later
            # fresh ids.
            ids = jnp.where(valid,
                            jnp.cumsum(valid.astype(jnp.int32)) - 1, -1)
            state.update({
                "track_id": ids.astype(jnp.int32),
                "track_age": jnp.zeros(k, jnp.int32),
                "next_id": jnp.asarray(jnp.sum(valid), jnp.int32),
            })
        return state

    @jax.jit
    def step_fn(state, img_l, img_r):
        img_l = img_l.astype(jnp.float32)
        img_r = img_r.astype(jnp.float32)
        pyr_cur_l, pyr_cur_r = _build_pyrs(img_l, img_r)

        # 4-way circular LK: t1L -> t1R -> t2R -> t2L (tracking.cpp:583-622),
        # initialized from the disparity prior + constant-velocity model.
        pred_kw = dict(rounds_prior=cfg.lk_rounds_prior,
                       rounds_coarse=cfg.lk_rounds_coarse,
                       rounds_refine=cfg.lk_rounds_refine)
        if cfg.lk_predictive:
            pred_kw.update(rig=rig, T_pred=state["T_21_prev"])
            if cfg.lk_sweep:
                pred_kw.update(use_sweep=True, sweep_d_max=cfg.lk_sweep_d_max,
                               stereo_levels=cfg.lk_stereo_levels,
                               temporal_levels=cfg.lk_temporal_levels,
                               dmap_prev=state["dmap"])
            else:
                pred_kw.update(disp_prior=lk.sample_disparity(
                    state["disp_grid"], state["kp"], cfg.disp_cell))
        quad = lk.circular_track(
            (state["pyr_l"], state["pyr_r"], pyr_cur_r, pyr_cur_l),
            state["kp"], state["kp_valid"],
            feature_match_error=cfg.feature_match_error,
            cycle_error=cfg.cycle_error,
            win=cfg.lk_win, levels=cfg.lk_levels, iters=cfg.lk_iters,
            use_pallas=use_pallas, pallas_kernel=cfg.lk_kernel, **pred_kw)

        # Triangulate the t-1 stereo pair (tracking.cpp:292-294).
        pts3d, tri_ok = tri(quad["t1l"], quad["t1r"])
        depth_ok = (pts3d[:, 2] > cfg.z_min) & (pts3d[:, 2] < cfg.z_max)
        corr_valid = quad["valid"] & tri_ok & depth_ok
        n_tracked = jnp.sum(corr_valid)

        # RANSAC-PnP of t-1 3D cloud vs current-left pixels (tracking.cpp:299).
        key, sub = jax.random.split(state["key"])
        res = pnp.ransac_pnp(rig.left, pts3d, quad["t2l"], corr_valid, sub,
                             num_hypotheses=cfg.num_hypotheses,
                             inlier_px=cfg.inlier_px_resolved,
                             refine_iters=cfg.refine_iters,
                             T_init=state["T_21_prev"])
        T_21 = res["T"]  # current camera from previous camera

        # Gates (tracking.cpp:305-329 with config bounds, not hardcoded).
        t_norm = jnp.linalg.norm(T_21[:3, 3])
        eulers = jnp.abs(se3.euler_zyx(T_21[:3, :3]))
        gate_track = n_tracked >= cfg.min_features_track
        gate_inlier = res["inlier_ratio"] >= cfg.min_inlier_rate
        gate_move = (t_norm > cfg.min_move) & (t_norm < cfg.max_move)
        gate_rot = jnp.all(eulers < cfg.max_euler)
        accept = gate_track & res["ok"] & gate_inlier & gate_move & gate_rot

        # Pose composition: frame_pose_ *= T^{-1} (tracking.cpp:313-318).
        T_wc_new = jnp.matmul(state["T_wc"], se3.se3_inv(T_21),
                              precision=jax.lax.Precision.HIGHEST)
        T_wc = jnp.where(accept, T_wc_new, state["T_wc"])

        # Fresh detection on the current left image (tracking.cpp:260).
        xy, score, det_valid = _detect_left(cfg, img_l)
        n_det = jnp.sum(det_valid)
        status = jnp.where(n_det >= cfg.min_features_detect,
                           TRACKING_GOOD, LOST).astype(jnp.int32)

        # Constant-velocity motion model for the next frame's PnP init
        # (ORB-SLAM-style; falls back to identity after a rejected frame).
        T_21_prev = jnp.where(accept, T_21, jnp.eye(4, dtype=jnp.float32))
        new_state = {
            "pyr_l": pyr_cur_l, "pyr_r": pyr_cur_r,
            "T_wc": T_wc, "T_21_prev": T_21_prev,
            "key": key, "status": status, "n_detected": n_det,
        }
        if cfg.lk_predictive and cfg.lk_sweep:
            new_state["dmap"] = quad["dmap"]
        if cfg.lk_predictive and not cfg.lk_sweep:
            # Refresh the prior from this frame's tracked stereo pairs.
            new_state["disp_grid"] = lk.disparity_grid(
                quad["t2l"], quad["t2l"][:, 0] - quad["t2r"][:, 0],
                quad["valid"], cfg.height, cfg.width, cfg.disp_cell)
        metrics = {
            "T_21": T_21, "accept": accept, "n_tracked": n_tracked,
            "n_detected": n_det, "n_inliers": res["num_inliers"],
            "inlier_ratio": res["inlier_ratio"], "t_norm": t_norm,
            "tracked_prev": quad["t1l"], "tracked_cur": quad["t2l"],
            "tracked_valid": corr_valid,
        }

        if not cfg.persistent_tracks:
            # Reference behavior: replace the whole feature set every frame.
            new_state.update({"kp": xy, "kp_valid": det_valid})
            return new_state, metrics

        # Persistent slots: surviving tracks keep their slot + id; dead slots
        # are refilled from fresh detections away from live tracks (new
        # capability — multi-frame tracks feed the BA backend).
        k = cfg.max_features
        tracked_xy = quad["t2l"]
        tracked_ok = quad["valid"]
        cand_keep = select.mask_min_distance(xy, det_valid, tracked_xy,
                                             tracked_ok, cfg.replenish_min_dist)
        # Invalid slots first (stable argsort of bool), best candidates first.
        slot_order = jnp.argsort(tracked_ok.astype(jnp.int32), stable=True)
        n_invalid = k - jnp.sum(tracked_ok)
        cand_order = jnp.argsort(jnp.where(cand_keep, -score, jnp.inf))
        write_mask = (jnp.arange(k) < n_invalid) & cand_keep[cand_order]

        def scatter(dst, src_sorted, fill_mask):
            cur = dst[slot_order]
            upd = jnp.where(fill_mask.reshape((-1,) + (1,) * (dst.ndim - 1)),
                            src_sorted, cur)
            return dst.at[slot_order].set(upd)

        new_kp = scatter(tracked_xy, xy[cand_order], write_mask)
        new_valid = scatter(tracked_ok, write_mask, write_mask)
        new_ids_for_slots = state["next_id"] + jnp.cumsum(write_mask) - 1
        ids = jnp.where(tracked_ok, state["track_id"], -1)
        new_ids = scatter(ids, new_ids_for_slots.astype(jnp.int32), write_mask)
        ages = jnp.where(tracked_ok, state["track_age"] + 1, 0)
        new_ages = scatter(ages, jnp.zeros(k, jnp.int32), write_mask)

        # Current-frame stereo depth of surviving tracks (landmark init for
        # the BA backend): triangulate (t2l, t2r).
        pts3d_cur, tri_cur_ok = tri(quad["t2l"], quad["t2r"])
        stereo_ok = (tracked_ok & tri_cur_ok & (pts3d_cur[:, 2] > cfg.z_min) &
                     (pts3d_cur[:, 2] < cfg.z_max))

        new_state.update({
            "kp": new_kp, "kp_valid": new_valid, "track_id": new_ids,
            "track_age": new_ages,
            "next_id": (state["next_id"] + jnp.sum(write_mask)).astype(jnp.int32),
        })
        metrics.update({
            "track_id": new_ids, "track_xy": new_kp, "track_valid": new_valid,
            "track_age": new_ages,
            "pts3d_cur": pts3d_cur, "pts3d_cur_valid": stereo_ok,
            # Right-image position of surviving tracks (stereo BA residuals;
            # slots refilled this frame have stereo_ok False).
            "track_xy_r": quad["t2r"], "track_stereo_valid": stereo_ok,
            "track_id_prev_slots": state["track_id"],
        })
        return new_state, metrics

    return init_fn, step_fn


def make_orb_frontend(cfg: VOConfig, rig: StereoRig):
    """Build (init_fn, step_fn) for the ORB pipeline (yaml default mode).

    State keeps the previous frame's left/right ORB features; each step
    detects on the current pair, associates t1L<->t1R (stereo) and
    t1L<->t2L (temporal) by brute-force Hamming (``tracking.cpp:534-581``),
    triangulates the t-1 stereo matches, and PnPs against current-left
    pixels (``tracking.cpp:186-247``).
    """
    tri = _make_tri(rig)
    orb_kw = dict(n_features=cfg.max_features, levels=cfg.orb_levels,
                  scale_factor=cfg.orb_scale, ini_th=cfg.orb_ini_th,
                  min_th=cfg.orb_min_th, cell=cfg.cell,
                  k_per_cell=cfg.k_per_cell,
                  dedup_radius=cfg.orb_dedup_radius,
                  upright=cfg.orb_upright)
    match_kw = dict(feature_match_error=cfg.feature_match_error,
                    dist_floor=cfg.orb_dist_floor,
                    dist_ratio=cfg.orb_dist_ratio,
                    max_level_diff=cfg.orb_max_level_diff,
                    stereo_premask=cfg.orb_stereo_premask,
                    max_disparity=cfg.orb_max_disparity)

    @jax.jit
    def init_fn(img_l, img_r, key):
        fl, fr = orb.detect_and_describe_pair(
            img_l.astype(jnp.float32), img_r.astype(jnp.float32), **orb_kw)
        n_det = jnp.sum(fl["valid"])
        status = jnp.where(n_det >= cfg.min_features_detect, TRACKING_GOOD, INITING)
        state = {
            "feat_l": fl, "feat_r": fr,
            "T_wc": jnp.eye(4, dtype=jnp.float32),
            "T_21_prev": jnp.eye(4, dtype=jnp.float32), "key": key,
            "status": jnp.int32(status), "n_detected": n_det,
        }
        if cfg.persistent_tracks:
            k = cfg.max_features
            # Compact ids: ORB's valid slots are scattered across per-level
            # segments, so slot-index ids would exceed next_id and collide
            # with later fresh ids.
            v = fl["valid"]
            ids = jnp.where(v, jnp.cumsum(v.astype(jnp.int32)) - 1, -1)
            state.update({
                "track_id": ids.astype(jnp.int32),
                "track_age": jnp.zeros(k, jnp.int32),
                "next_id": jnp.asarray(jnp.sum(v), jnp.int32),
            })
        return state

    @jax.jit
    def step_fn(state, img_l, img_r):
        fl_cur, fr_cur = orb.detect_and_describe_pair(
            img_l.astype(jnp.float32), img_r.astype(jnp.float32), **orb_kw)

        assoc = match.stereo_temporal_match(
            state["feat_l"], state["feat_r"], fl_cur,
            use_mutual=cfg.orb_mutual,
            temporal_radius=cfg.orb_temporal_radius, **match_kw)

        xy_l = state["feat_l"]["xy"]
        xy_r = state["feat_r"]["xy"][assoc["idx_r"]]
        xy_cur = fl_cur["xy"][assoc["idx_t2l"]]

        pts3d, tri_ok = tri(xy_l, xy_r)
        depth_ok = (pts3d[:, 2] > cfg.z_min) & (pts3d[:, 2] < cfg.z_max)
        corr_valid = assoc["valid"] & tri_ok & depth_ok
        n_tracked = jnp.sum(corr_valid)

        key, sub = jax.random.split(state["key"])
        # Per-point confidence by detection octave (ORB-SLAM invSigma2):
        # a feature found at pyramid level l is localized ~scale^l worse.
        lvl = state["feat_l"]["level"]
        inv_sigma2 = (1.0 / cfg.orb_scale ** 2) ** lvl.astype(jnp.float32)
        res = pnp.ransac_pnp(rig.left, pts3d, xy_cur, corr_valid, sub,
                             num_hypotheses=cfg.num_hypotheses,
                             inlier_px=cfg.inlier_px_resolved,
                             refine_iters=cfg.refine_iters,
                             T_init=state["T_21_prev"],
                             weights=inv_sigma2)
        T_21 = res["T"]

        t_norm = jnp.linalg.norm(T_21[:3, 3])
        eulers = jnp.abs(se3.euler_zyx(T_21[:3, :3]))
        accept = ((n_tracked >= cfg.min_features_track) & res["ok"] &
                  (res["inlier_ratio"] >= cfg.min_inlier_rate) &
                  (t_norm > cfg.min_move) & (t_norm < cfg.max_move) &
                  jnp.all(eulers < cfg.max_euler))

        T_wc = jnp.where(
            accept,
            jnp.matmul(state["T_wc"], se3.se3_inv(T_21),
                       precision=jax.lax.Precision.HIGHEST),
            state["T_wc"])
        n_det = jnp.sum(fl_cur["valid"])
        status = jnp.where(n_det >= cfg.min_features_detect,
                           TRACKING_GOOD, LOST).astype(jnp.int32)

        T_21_prev = jnp.where(accept, T_21, jnp.eye(4, dtype=jnp.float32))
        new_state = {
            "feat_l": fl_cur, "feat_r": fr_cur,
            "T_wc": T_wc, "T_21_prev": T_21_prev,
            "key": key, "status": status, "n_detected": n_det,
        }
        metrics = {
            "T_21": T_21, "accept": accept, "n_tracked": n_tracked,
            "n_detected": n_det, "n_inliers": res["num_inliers"],
            "inlier_ratio": res["inlier_ratio"], "t_norm": t_norm,
            "tracked_prev": xy_l, "tracked_cur": xy_cur,
            "tracked_valid": corr_valid,
        }
        if not cfg.persistent_tracks:
            return new_state, metrics

        # Persistent tracks across the descriptor association (VERDICT r4
        # next #4; the LK sibling lives at the end of make_lk_frontend's
        # step). Identity flows along matches: cur-left slot j inherits the
        # track id of the prev-left slot i whose temporal match landed on j
        # (idx_t2l[i] == j). Everything is fixed-shape scatters/gathers.
        k = cfg.max_features
        surv = corr_valid  # prev slot survived the full association
        # Scatter prev ids onto cur slots; on a collision (two prev slots
        # matching the same cur feature) the OLDEST track (smallest id) wins.
        prev_id = jnp.where(surv & (state["track_id"] >= 0),
                            state["track_id"], jnp.int32(_ID_BIG))
        cand = jnp.full((k,), _ID_BIG, jnp.int32).at[assoc["idx_t2l"]].min(prev_id)
        inherited = (cand < _ID_BIG) & fl_cur["valid"]
        # Age of the winning parent: ids are unique per frame, so a one-hot
        # (k, k) lookup recovers the parent slot exactly.
        eq = (state["track_id"][None, :] == cand[:, None]) & surv[None, :]
        age_prev = jnp.max(jnp.where(eq, state["track_age"][None, :], -1), axis=1)
        fresh = fl_cur["valid"] & ~inherited
        fresh_ids = state["next_id"] + jnp.cumsum(fresh.astype(jnp.int32)) - 1
        new_ids = jnp.where(inherited, cand,
                            jnp.where(fresh, fresh_ids, -1)).astype(jnp.int32)
        new_ages = jnp.where(inherited, age_prev + 1, 0).astype(jnp.int32)

        # Current-pair stereo association -> per-slot depth (landmark init
        # for the BA backend; the LK path gets this from its t2l/t2r legs).
        cur_st = match.stereo_match(fl_cur, fr_cur, **match_kw)
        xy_r_cur = fr_cur["xy"][cur_st["idx_r"]]
        pts3d_cur, tri_cur_ok = tri(fl_cur["xy"], xy_r_cur)
        stereo_ok = (cur_st["valid"] & tri_cur_ok &
                     (pts3d_cur[:, 2] > cfg.z_min) &
                     (pts3d_cur[:, 2] < cfg.z_max))

        new_state.update({
            "track_id": new_ids, "track_age": new_ages,
            "next_id": (state["next_id"] +
                        jnp.sum(fresh)).astype(jnp.int32),
        })
        metrics.update({
            "track_id": new_ids, "track_xy": fl_cur["xy"],
            "track_valid": fl_cur["valid"], "track_age": new_ages,
            "pts3d_cur": pts3d_cur, "pts3d_cur_valid": stereo_ok,
            "track_xy_r": xy_r_cur, "track_stereo_valid": stereo_ok,
            "track_id_prev_slots": state["track_id"],
        })
        return new_state, metrics

    return init_fn, step_fn


def make_frontend(cfg: VOConfig, rig: StereoRig):
    """Dispatch on ``cfg.mode`` (the ``track_mode`` switch,
    ``tracking.cpp:115-126``)."""
    if cfg.mode == "lk":
        return make_lk_frontend(cfg, rig)
    if cfg.mode == "orb":
        return make_orb_frontend(cfg, rig)
    raise ValueError(f"unknown mode {cfg.mode!r} (expected 'lk' or 'orb')")


def make_chunked_frontend(cfg: VOConfig, rig: StereoRig):
    """(init_fn, chunk_fn): advance a whole frame chunk in ONE dispatch.

    ``chunk_fn(state, imgs_l (T, H, W), imgs_r (T, H, W))`` scans the
    per-frame step over the chunk on device and returns (state, metrics with
    leading T axis). Amortizes host->device dispatch latency over T frames —
    the offline-throughput mode (per-frame host control flow stays available
    through the plain frontend).
    """
    init_fn, step_fn = make_frontend(cfg, rig)

    keep = ("T_21", "accept", "n_tracked", "n_inliers", "inlier_ratio",
            "t_norm", "n_detected")

    @jax.jit
    def chunk_fn(state, imgs_l, imgs_r):
        def body(carry, xs):
            il, ir = xs
            carry, m = step_fn(carry, il, ir)
            small = {k: m[k] for k in keep if k in m}
            small["T_wc"] = carry["T_wc"]
            return carry, small

        return jax.lax.scan(body, state, (imgs_l, imgs_r))

    return init_fn, chunk_fn
