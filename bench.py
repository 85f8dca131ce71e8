"""Benchmark + accuracy parity: TPU VO vs the reproduced reference pipeline.

Prints ONE JSON line:
  {"metric": "vo_frames_per_s", "value": <tpu fps>, "unit": "frames/s",
   "vs_baseline": <tpu fps / reference fps>, "parity": {...}}

The reference publishes no numbers (BASELINE.md), so the baseline is
*reproduced*: faithful re-executions of BOTH reference pipelines using the
exact OpenCV primitives they call, INCLUDING the pose gates and composition
(``frame_pose_ *= T^-1``, ``/root/reference/src/tracking.cpp:305-329`` LK /
``:209-233`` ORB), timed on this host's CPU over the same synthetic
KITTI-shaped frames with exact ground-truth ego-motion. The ``parity`` block
holds the side-by-side {OpenCV, TPU} x {LK, ORB} table of
{ATE, RPE, accept_rate, fps} — the accuracy-parity loop the north star
requires (trajectories within the reference's ATE bound, BASELINE.json).
"""
from __future__ import annotations

import json
import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

H_RAW, W_RAW = 376, 1241
H, W = 384, 1280
N_FRAMES = 49       # frame 0 initializes; 48 tracked steps = 6 chunks of 8
N_SEQ = 4           # sequences batched per chip (production config-4 shape)
FEATURES = 1024
FX, BASELINE = 718.856, 0.537
K_CAM = np.array([[FX, 0, W_RAW / 2], [0, FX, H_RAW / 2], [0, 0, 1]])
P1 = np.hstack([K_CAM, np.zeros((3, 1))])
P2 = np.hstack([K_CAM, K_CAM @ np.array([[-BASELINE], [0], [0]])])


def make_frames(seed=3, **stress):
    from stereo_visual_odometry_tpu.utils import synthetic

    seq = synthetic.render_sequence(
        n_frames=N_FRAMES, h=H_RAW, w=W_RAW, fx=FX, baseline=BASELINE,
        n_points=9000, speed=1.1, seed=seed, **stress)
    pad = lambda a: np.pad(a, ((0, 0), (0, H - H_RAW), (0, W - W_RAW)), mode="edge")
    return pad(seq["images_l"]), pad(seq["images_r"]), seq["poses_gt"]


# Adversarial variants recorded in the parity table alongside the clean
# sequence (VERDICT r4 next #7): photometric flicker (breaks brightness
# constancy like auto-exposure) and yaw-heavy motion (rotation-dominant
# flow).
STRESS_VARIANTS = {
    "flicker": dict(flicker=0.25),
    "yaw": dict(yaw_rate=0.02),
}


# --------------------------------------------------------------------------
# Reproduced reference pipelines (OpenCV, CPU) — WITH gates + composition.
# --------------------------------------------------------------------------

def _ref_estimate_and_compose(X, pts_cur, frame_pose, mode):
    """The reference's PnP + gates + composition, shared by both pipelines.

    ``OpenCV_EstimatePose_PnP`` (``tracking.cpp:464-501``): solvePnPRansac
    (ITERATIVE, 500 it, 0.5 px, conf 0.99, extrinsic guess), inlier-ratio
    gate (inlier_rate=0.01, ``default.yaml:77``); then per-axis |euler|<0.1
    and the motion bound — hardcoded (0.0005, 10) on the LK path
    (``tracking.cpp:311``), config (minmove=0.05, maxmove=10) on the ORB
    path (``tracking.cpp:215``, ``default.yaml:87-88``); on success
    ``frame_pose_ *= [R|t]^-1`` (``tracking.cpp:313-318``).

    Returns (frame_pose, accepted: bool).
    """
    import cv2

    if len(X) < 6:
        return frame_pose, False
    rvec = np.zeros((3, 1))
    tvec = np.zeros((3, 1))
    ok, rvec, tvec, inliers = cv2.solvePnPRansac(
        X, pts_cur, K_CAM, None, rvec, tvec, useExtrinsicGuess=True,
        iterationsCount=500, reprojectionError=0.5, confidence=0.99,
        flags=cv2.SOLVEPNP_ITERATIVE)
    n_inl = 0 if inliers is None else len(inliers)
    if not ok or n_inl / max(len(X), 1) < 0.01:
        return frame_pose, False
    R, _ = cv2.Rodrigues(rvec)
    # rotationMatrixToEulerAngles (tracking.cpp:427-462 equivalent).
    sy = np.sqrt(R[0, 0] ** 2 + R[1, 0] ** 2)
    if sy > 1e-6:
        eul = np.array([np.arctan2(R[2, 1], R[2, 2]),
                        np.arctan2(-R[2, 0], sy),
                        np.arctan2(R[1, 0], R[0, 0])])
    else:
        eul = np.array([np.arctan2(-R[1, 2], R[1, 1]),
                        np.arctan2(-R[2, 0], sy), 0.0])
    if np.any(np.abs(eul) >= 0.1):
        return frame_pose, False
    nrm2 = float(tvec[0] ** 2 + tvec[1] ** 2 + tvec[2] ** 2)
    lo = 0.0005 if mode == "lk" else 0.05
    if not (lo * lo < nrm2 < 10.0 * 10.0):
        return frame_pose, False
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = tvec[:, 0]
    return frame_pose @ np.linalg.inv(T), True


def run_reference_cpu(il, ir, mode: str) -> dict:
    """Faithful reproduction of a reference pipeline, end to end.

    mode='lk': ``LK_StereoF2F_PnP_Track`` (``tracking.cpp:258-344``) —
    cv::FAST @20 + 4x calcOpticalFlowPyrLK 21x21/3-level/30-iter circular
    matching + status/bounds/epipolar filter (``tracking.cpp:583-660``).
    mode='orb': ``ORB_StereoF2F_PnP_Track`` (``tracking.cpp:168-249``,
    the yaml default) — ORB 2000/8/1.2 on both images, BFMatcher Hamming
    t1L<->t1R and t1L<->t2L, ``dist <= max(2*min_dist, 30)`` in both +
    stereo |dy| < 3 (``tracking.cpp:534-581``, ``default.yaml:66``).
    Both then triangulate t-1 stereo and PnP + gate + compose (see
    ``_ref_estimate_and_compose``).
    """
    import cv2

    frames_l = [x[:H_RAW, :W_RAW].astype(np.uint8) for x in il]
    frames_r = [x[:H_RAW, :W_RAW].astype(np.uint8) for x in ir]
    frame_pose = np.eye(4)
    poses = [frame_pose.copy()]
    accepts, n_tracked = [], []

    if mode == "lk":
        lk_kw = dict(winSize=(21, 21), maxLevel=3,
                     criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT,
                               30, 0.01))
        det = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=True)

        def detect(img):
            kps = det.detect(img, None)
            kps = sorted(kps, key=lambda k: -k.response)[:FEATURES]
            return np.array([k.pt for k in kps], np.float32).reshape(-1, 1, 2)

        prev_pts = detect(frames_l[0])
        t0 = time.perf_counter()
        for i in range(1, N_FRAMES):
            t1l, t1r = frames_l[i - 1], frames_r[i - 1]
            t2l, t2r = frames_l[i], frames_r[i]
            p = prev_pts
            # 4-way circular LK (tracking.cpp:593-618).
            p_r1, s1, _ = cv2.calcOpticalFlowPyrLK(t1l, t1r, p, None, **lk_kw)
            p_r2, s2, _ = cv2.calcOpticalFlowPyrLK(t1r, t2r, p_r1, None, **lk_kw)
            p_l2, s3, _ = cv2.calcOpticalFlowPyrLK(t2r, t2l, p_r2, None, **lk_kw)
            p_l1, s4, _ = cv2.calcOpticalFlowPyrLK(t2l, t1l, p_l2, None, **lk_kw)
            ok = (s1 & s2 & s3 & s4).ravel().astype(bool)
            # deleteBadmatchFeatures: stereo |dy| both pairs (tracking.cpp:639-649).
            ok &= np.abs(p[:, 0, 1] - p_r1[:, 0, 1]) <= 3.0
            ok &= np.abs(p_l2[:, 0, 1] - p_r2[:, 0, 1]) <= 3.0
            a, b, c = p[ok, 0], p_r1[ok, 0], p_l2[ok, 0]
            accepted = False
            if len(a) >= 8:
                X_h = cv2.triangulatePoints(P1, P2, a.T.astype(np.float64),
                                            b.T.astype(np.float64))
                X = (X_h[:3] / X_h[3]).T
                good = X[:, 2] > 0.5
                if good.sum() >= 8:
                    frame_pose, accepted = _ref_estimate_and_compose(
                        X[good], c[good].astype(np.float64), frame_pose, mode)
            poses.append(frame_pose.copy())
            accepts.append(accepted)
            n_tracked.append(int(len(a)))
            prev_pts = detect(t2l)
        dt = time.perf_counter() - t0
    else:
        orb = cv2.ORB_create(nfeatures=2000, scaleFactor=1.2, nlevels=8)
        bf = cv2.BFMatcher(cv2.NORM_HAMMING)

        def gate(matches):
            if not matches:
                return {}
            dmin = min(m.distance for m in matches)
            thr = max(2.0 * dmin, 30.0)
            return {m.queryIdx: m for m in matches if m.distance <= thr}

        kp_l, des_l = orb.detectAndCompute(frames_l[0], None)
        kp_r, des_r = orb.detectAndCompute(frames_r[0], None)
        t0 = time.perf_counter()
        for i in range(1, N_FRAMES):
            kp_l2, des_l2 = orb.detectAndCompute(frames_l[i], None)
            kp_r2, des_r2 = orb.detectAndCompute(frames_r[i], None)
            accepted = False
            n_assoc = 0
            if des_l is not None and des_r is not None and des_l2 is not None:
                st = gate(bf.match(des_l, des_r))      # t1L <-> t1R
                tm = gate(bf.match(des_l, des_l2))     # t1L <-> t2L
                pts_l, pts_r, pts_cur = [], [], []
                for q, m in st.items():
                    if q in tm:
                        pl = kp_l[q].pt
                        pr = kp_r[m.trainIdx].pt
                        if abs(pl[1] - pr[1]) < 3.0:   # feature_match_error
                            pts_l.append(pl)
                            pts_r.append(pr)
                            pts_cur.append(kp_l2[tm[q].trainIdx].pt)
                n_assoc = len(pts_l)
                if n_assoc >= 8:
                    a = np.asarray(pts_l, np.float64)
                    b = np.asarray(pts_r, np.float64)
                    c = np.asarray(pts_cur, np.float64)
                    X_h = cv2.triangulatePoints(P1, P2, a.T, b.T)
                    X = (X_h[:3] / X_h[3]).T
                    good = X[:, 2] > 0.5
                    if good.sum() >= 8:
                        frame_pose, accepted = _ref_estimate_and_compose(
                            X[good], c[good], frame_pose, mode)
            poses.append(frame_pose.copy())
            accepts.append(accepted)
            n_tracked.append(n_assoc)
            kp_l, des_l, kp_r, des_r = kp_l2, des_l2, kp_r2, des_r2
        dt = time.perf_counter() - t0

    n = N_FRAMES - 1
    print(f"[bench] reference cpu {mode}: {n} frames in {dt:.3f}s "
          f"(accept_rate={np.mean(accepts):.2f}, "
          f"n_tracked_mean={np.mean(n_tracked):.0f})", file=sys.stderr)
    return {"fps": n / dt, "poses": np.stack(poses),
            "accept": float(np.mean(accepts)),
            "n_tracked": float(np.mean(n_tracked))}


# --------------------------------------------------------------------------
# TPU pipelines — full-sequence trajectory + timed middle chunks.
# --------------------------------------------------------------------------

def run_tpu(il, ir, mode: str = "lk") -> dict:
    """Chunked on-device scan over the WHOLE sequence: trajectory + accept
    from every frame; fps timed over the middle 4 chunks (32 frames; the
    first two chunks absorb compile + cold-dispatch latency).

    Config = the SHIPPING VOConfig defaults for the mode (the round-3 bench
    pinned ``min_inlier_rate=0.3`` against a retuned 0.05 default and
    measured a pipeline that rejected 94% of frames — VERDICT r3 weak #1).
    """
    import jax
    import jax.numpy as jnp
    from stereo_visual_odometry_tpu.models import frontend
    from stereo_visual_odometry_tpu.ops.camera import StereoRig

    rig = StereoRig.kitti(fx=FX, fy=FX, cx=W_RAW / 2, cy=H_RAW / 2,
                          baseline=BASELINE)
    # ORB runs at 2048 features to match the reference's nFeatures=2000
    # (default.yaml:89); LK at 1024 (the reference's LK path is uncapped
    # FAST output; fixed-capacity top-K is this framework's design).
    n_feat = 2048 if mode == "orb" else FEATURES
    # PnP budget = the VOConfig defaults (benched ≡ shipping, VERDICT r4
    # weak #5: 256/6 is now the shipping default, not a bench-only pin).
    cfg = frontend.VOConfig(mode=mode, height=H, width=W, max_features=n_feat)
    init_fn, chunk_fn = frontend.make_chunked_frontend(cfg, rig)

    # 16-frame chunks amortize the ~0.9 ms/frame per-dispatch floor of the
    # tunnel (measured +8% over chunk=8 at the same step cost).
    chunk = 16
    n_chunks = (N_FRAMES - 1) // chunk  # 3
    timed = range(1, n_chunks)          # chunks 1..2 -> 32 timed frames
    l_all = jax.device_put(jnp.asarray(il))
    r_all = jax.device_put(jnp.asarray(ir))

    state = init_fn(l_all[0], r_all[0], jax.random.PRNGKey(0))
    jax.block_until_ready(state["T_wc"])
    ms = []
    dt = 0.0
    # Timed region holds ONLY dispatches (device arrays accumulate in `ms`);
    # host conversion happens after — np.asarray round trips between chunks
    # were costing ~50 ms/chunk and hiding the real step rate.
    for c in range(n_chunks):
        if c == min(timed):
            jax.block_until_ready(state["T_wc"])
            t0 = time.perf_counter()
        state, m = chunk_fn(state, l_all[1 + c * chunk:1 + (c + 1) * chunk],
                            r_all[1 + c * chunk:1 + (c + 1) * chunk])
        if c == max(timed):
            jax.block_until_ready(state["T_wc"])
            dt = time.perf_counter() - t0
        ms.append(m)
    from stereo_visual_odometry_tpu.utils.hostcopy import device_get_tree

    ms = device_get_tree(ms)
    poses = np.concatenate(
        [np.eye(4)[None]] + [np.asarray(m["T_wc"], np.float64) for m in ms],
        axis=0)
    acc = np.concatenate([m["accept"] for m in ms])
    trk = np.concatenate([m["n_tracked"] for m in ms])
    n_timed = chunk * len(timed)
    fps = n_timed / dt
    print(f"[bench] tpu {mode}: {n_timed} timed frames in {dt:.3f}s "
          f"(accept_rate={acc.mean():.2f} over {len(acc)} frames, "
          f"n_tracked_mean={trk.mean():.0f})", file=sys.stderr)
    return {"fps": fps, "poses": poses, "accept": float(acc.mean()),
            "n_tracked": float(trk.mean())}


def run_tpu_ba() -> dict:
    """Config-3 leg (VERDICT r4 next #3): sliding-window BA on hardware.

    A 120-frame yaw-heavy KITTI-shaped drift sequence; A/B
    {frontend-only persistent LK} vs {+ BA with marginalization} on the
    SAME frames, reporting both ATEs and the measured window-solve wall
    time (assembly + device solve + copy-back).
    """
    from stereo_visual_odometry_tpu.models.backend import BackendConfig
    from stereo_visual_odometry_tpu.models.frontend import VOConfig
    from stereo_visual_odometry_tpu.models.system import System
    from stereo_visual_odometry_tpu.utils import synthetic, trajectory
    from stereo_visual_odometry_tpu.utils.config import CameraConfig, RunConfig

    seq = synthetic.render_sequence(n_frames=120, h=H_RAW, w=W_RAW, fx=FX,
                                    baseline=BASELINE, n_points=20000,
                                    speed=1.1, seed=11, yaw_rate=0.01,
                                    cloud_extent=(40.0, 8.0, 260.0))
    pad = lambda a: np.pad(a, ((0, 0), (0, H - H_RAW), (0, W - W_RAW)),
                           mode="edge")
    frames = list(zip(pad(seq["images_l"]), pad(seq["images_r"])))
    vo = VOConfig(mode="lk", height=H, width=W, max_features=FEATURES,
                  min_features_track=8, persistent_tracks=True)
    run_cfg = RunConfig(camera=CameraConfig(fx=FX, fy=FX, cx=W_RAW / 2,
                                            cy=H_RAW / 2, baseline=BASELINE),
                        vo=vo)

    out = {}
    solves = []
    for label, bcfg in (
            ("frontend_only", None),
            ("ba_marg", BackendConfig(window=6, kf_every=4)),
            ("ba_drop_oldest", BackendConfig(window=6, kf_every=4,
                                             marginalize=False))):
        sys_ = System(run_cfg, backend_cfg=bcfg)
        traj = sys_.run(frames)
        ate = trajectory.ate_rmse(traj, seq["poses_gt"], align=False)
        out[f"ate_{label}_m"] = round(float(ate), 4)
        if label == "ba_marg":
            solves = [m["ba"]["wall_s"] for m in sys_.metrics if "ba" in m]
    out["n_frames"] = len(frames)
    out["n_solves"] = len(solves)
    # Median, not mean: the first solve's wall includes the jit compile of
    # the prior-carrying bundle_adjust trace and would dominate a mean.
    out["ms_per_solve"] = round(1e3 * float(np.median(solves)), 1) if solves else None
    out["improved"] = bool(out["ate_ba_marg_m"] <= out["ate_frontend_only_m"])
    print(f"[bench] tpu ba: frontend ATE={out['ate_frontend_only_m']} vs "
          f"BA+marg {out['ate_ba_marg_m']} vs drop-oldest "
          f"{out['ate_ba_drop_oldest_m']} "
          f"({out['n_solves']} solves, {out['ms_per_solve']} ms/solve)",
          file=sys.stderr)
    return out


def bench_tpu_batched(il: np.ndarray, ir: np.ndarray) -> float:
    """Per-chip throughput: S sequences vmapped, frames scanned on device.

    This is the deployment shape (BASELINE.json config 4: sequences sharded
    across chips — here S sequences saturate ONE chip; the mesh axis scales
    it across chips with no collectives).
    """
    import jax
    import jax.numpy as jnp
    from stereo_visual_odometry_tpu.models import frontend
    from stereo_visual_odometry_tpu.ops.camera import StereoRig
    from stereo_visual_odometry_tpu.parallel import sequences

    rig = StereoRig.kitti(fx=FX, fy=FX, cx=W_RAW / 2, cy=H_RAW / 2,
                          baseline=BASELINE)
    cfg = frontend.VOConfig(mode="lk", height=H, width=W,
                            max_features=FEATURES, min_features_track=8)
    init_fn, step_fn = frontend.make_frontend(cfg, rig)

    l_all = jax.device_put(jnp.broadcast_to(jnp.asarray(il), (N_SEQ,) + il.shape))
    r_all = jax.device_put(jnp.broadcast_to(jnp.asarray(ir), (N_SEQ,) + ir.shape))
    keys = jax.random.split(jax.random.PRNGKey(0), N_SEQ)

    chunk = (N_FRAMES - 1) // 2
    state = jax.vmap(init_fn)(l_all[:, 0], r_all[:, 0], keys)
    jax.block_until_ready(state["T_wc"])
    state, m = sequences.run_chunk_scan(
        step_fn, state, l_all[:, 1:1 + chunk], r_all[:, 1:1 + chunk])
    jax.block_until_ready(state["T_wc"])

    t0 = time.perf_counter()
    state, m = sequences.run_chunk_scan(
        step_fn, state, l_all[:, 1 + chunk:1 + 2 * chunk],
        r_all[:, 1 + chunk:1 + 2 * chunk])
    jax.block_until_ready(state["T_wc"])
    dt = time.perf_counter() - t0
    frames = N_SEQ * chunk
    print(f"[bench] tpu batched: {frames} frames ({N_SEQ} seqs x {chunk}) in "
          f"{dt:.3f}s, accept_rate={np.asarray(m['accept']).mean():.2f}",
          file=sys.stderr)
    return frames / dt


def run_tpu_parity(il, ir) -> dict:
    """Compact on-hardware kernel parity check, recorded every round.

    Mosaic-compiled Pallas kernels vs the XLA formulations on the real chip
    (the ``tests_tpu/`` suite is the full version; interpret-mode parity on
    CPU is necessary but not sufficient — PERF.md, VERDICT r3 weak #3).
    """
    import jax
    import jax.numpy as jnp
    from stereo_visual_odometry_tpu.ops import (fast, interp, lk, patch_pallas,
                                                pyramid, select)

    if jax.devices()[0].platform == "cpu":
        return {"ok": False, "skipped": "no TPU attached"}

    i0 = jnp.asarray(il[0], jnp.float32)
    i1 = jnp.asarray(il[1], jnp.float32)
    score = fast.detect(i0, 20.0)
    kp, _, valid = select.grid_top_k(score, 256, cell=32, k_per_cell=2)

    # Patch extraction: Pallas vs XLA gather.
    pp = patch_pallas.extract_patches(i0, kp, 21, use_pallas=True)
    px = interp.sample_patches(i0, kp, 21)
    patch_err = float(jnp.max(jnp.abs(pp - px)))

    # Full 3-level LK track vs the XLA formulation, for BOTH Pallas
    # backends — 'dense' is the shipping VOConfig default, 'cell' the
    # fallback (ADVICE r4: the parity block must exercise the production
    # kernel, not just the fallback).
    p0 = tuple(pyramid.build_pyramid(i0, 4))
    p1 = tuple(pyramid.build_pyramid(i1, 4))
    pts_x, ok_x = lk.track(p0, p1, kp, levels=3, active=valid, use_pallas=False)
    per_kernel = {}
    ok = patch_err < 2e-3
    for kern in ("dense", "cell"):
        pts_p, ok_p = lk.track(p0, p1, kp, levels=3, active=valid,
                               use_pallas=True, pallas_kernel=kern)
        both = np.asarray(ok_x & ok_p & valid)
        n_both = int(both.sum())
        flow_med = (float(np.median(np.abs(np.asarray(pts_p) -
                                           np.asarray(pts_x))[both]))
                    if n_both else float("nan"))
        per_kernel[kern] = {"median_px": round(flow_med, 6), "n": n_both}
        ok = ok and n_both >= 30 and flow_med < 0.05
    # ORB descriptor stability on hardware: the MXU BRIEF contraction
    # vs an independent f64 numpy evaluation of the same patches (compact
    # version of tests_tpu/test_orb_tpu.py — VERDICT r4 next #5).
    from stereo_visual_odometry_tpu.ops import orb

    blur = pyramid.gaussian_blur(i0)
    patches = patch_pallas.extract_patches(blur, kp, orb.DESC_PATCH)
    ang = orb.ic_angle_from_patches(orb._ic_crop(patches))
    bits_tpu = np.asarray(orb.brief_bits_from_patches(patches, ang))
    p_np = np.asarray(patches, np.float64).reshape(patches.shape[0], -1)
    D_np = np.asarray(orb._bin_diff_weights(), np.float64)
    bins = np.round(np.mod(np.asarray(ang, np.float64), 2 * np.pi)
                    / (2 * np.pi) * orb.N_ANGLE_BINS).astype(int) % orb.N_ANGLE_BINS
    diffs_ref = np.einsum("np,nkp->nk", p_np, D_np[bins])
    bits_ref = diffs_ref > 0
    vmask = np.asarray(valid)
    ham = np.sum(bits_tpu[vmask] != bits_ref[vmask], axis=1)
    orb_ham = float(np.median(ham))
    # Meaningful bits (|pair difference| > 1 intensity unit) must be stable
    # vs f64; zero-difference bits have no defined sign in any format.
    meaningful = np.abs(diffs_ref[vmask]) > 1.0
    flips = (bits_tpu[vmask] != bits_ref[vmask]) & meaningful
    ok = ok and orb_ham == 0.0 and flips.sum() <= 1e-4 * meaningful.sum()

    res = {"ok": bool(ok), "patch_max_err_px": round(patch_err, 6),
           "lk_median_disagreement_px": per_kernel["dense"]["median_px"],
           "n_points_compared": per_kernel["dense"]["n"],
           "per_kernel": per_kernel,
           "orb_brief_median_hamming_vs_f64": round(orb_ham, 3)}
    print(f"[bench] tpu kernel parity: {res}", file=sys.stderr)
    return res


def main():
    from stereo_visual_odometry_tpu.utils import trajectory

    il, ir, poses_gt = make_frames()

    def metrics(res):
        ate = trajectory.ate_rmse(res["poses"], poses_gt)
        rpe_t, rpe_r = trajectory.rpe(res["poses"], poses_gt)
        return {"fps": round(res["fps"], 2), "ate_m": round(ate, 4),
                "rpe_t_m": round(rpe_t, 4), "rpe_r_rad": round(rpe_r, 5),
                "accept_rate": round(res["accept"], 3),
                "n_tracked": round(res["n_tracked"], 1)}

    # Reproduced reference baselines (cached: a property of this host + the
    # fixed synthetic sequence). Schema v2 = with trajectory/gates/ATE.
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BASELINE_MEASURED.json")
    cached = {}
    if os.path.exists(cache):
        cached = json.load(open(cache))
    if cached.get("schema") != 2:
        cached = {"schema": 2,
                  "note": "faithful OpenCV re-execution of both reference "
                          "pipelines (tracking.cpp:258-344 LK, :168-249 ORB) "
                          "with gates + pose composition (:305-329), on this "
                          "host, over the bench synthetic sequence"}
    ref = {}
    for mode in ("lk", "orb"):
        key = f"reference_{mode}"
        if key in cached:
            ref[mode] = cached[key]
            print(f"[bench] cached reference {mode}: {ref[mode]}", file=sys.stderr)
        else:
            ref[mode] = metrics(run_reference_cpu(il, ir, mode))
            cached[key] = ref[mode]
            json.dump(cached, open(cache, "w"), indent=1)

    tpu_parity = run_tpu_parity(il, ir)
    tpu = {mode: metrics(run_tpu(il, ir, mode)) for mode in ("lk", "orb")}

    parity = {"opencv_lk": ref["lk"], "opencv_orb": ref["orb"],
              "tpu_lk": tpu["lk"], "tpu_orb": tpu["orb"]}
    for mode in ("lk", "orb"):
        print(f"[bench] parity {mode}: TPU ate={tpu[mode]['ate_m']} vs "
              f"OpenCV ate={ref[mode]['ate_m']}; fps {tpu[mode]['fps']} vs "
              f"{ref[mode]['fps']} ({tpu[mode]['fps'] / ref[mode]['fps']:.1f}x)",
              file=sys.stderr)

    # Stress variants: same parity loop on adversarial sequences (reference
    # runs cached per variant; TPU reruns hit the already-compiled programs).
    for var, kw in STRESS_VARIANTS.items():
        il_v, ir_v, gt_v = make_frames(**kw)

        def metrics_v(res):
            ate = trajectory.ate_rmse(res["poses"], gt_v)
            rpe_t, rpe_r = trajectory.rpe(res["poses"], gt_v)
            return {"fps": round(res["fps"], 2), "ate_m": round(ate, 4),
                    "rpe_t_m": round(rpe_t, 4), "rpe_r_rad": round(rpe_r, 5),
                    "accept_rate": round(res["accept"], 3),
                    "n_tracked": round(res["n_tracked"], 1)}

        for mode in ("lk", "orb"):
            key = f"reference_{mode}_{var}"
            if key in cached:
                ref_v = cached[key]
            else:
                ref_v = metrics_v(run_reference_cpu(il_v, ir_v, mode))
                cached[key] = ref_v
                json.dump(cached, open(cache, "w"), indent=1)
            tpu_v = metrics_v(run_tpu(il_v, ir_v, mode))
            parity[f"opencv_{mode}_{var}"] = ref_v
            parity[f"tpu_{mode}_{var}"] = tpu_v
            print(f"[bench] stress {var}/{mode}: TPU ate={tpu_v['ate_m']} "
                  f"accept={tpu_v['accept_rate']} vs OpenCV "
                  f"ate={ref_v['ate_m']} accept={ref_v['accept_rate']}",
                  file=sys.stderr)

    ba = run_tpu_ba()

    # Headline: best mode by speedup, each vs ITS OWN reproduced baseline.
    lk_ratio = tpu["lk"]["fps"] / ref["lk"]["fps"]
    orb_ratio = tpu["orb"]["fps"] / ref["orb"]["fps"]
    fps, ratio = ((tpu["orb"]["fps"], orb_ratio) if orb_ratio >= lk_ratio
                  else (tpu["lk"]["fps"], lk_ratio))
    print(json.dumps({
        "metric": "vo_frames_per_s",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(ratio, 3),
        "parity": parity,
        "tpu_parity": tpu_parity,
        "ba": ba,
    }))


if __name__ == "__main__":
    main()
