"""Sliding-window backend: keyframes, landmark bookkeeping, local BA.

The map/keyframe layer the reference declared but never built (``MapPoint``
forward-declared, keyframe flags never set — SURVEY.md §1). Host-side
bookkeeping stays in numpy ring buffers; the optimization itself is the
jitted Schur-complement LM of ``models/ba.py`` over fixed-capacity arrays,
so every ``optimize()`` call hits the same compiled executable.

Flow (BASELINE.json config 3): the frontend (persistent-track mode) emits
per-frame track observations + current-frame stereo depths; every
``kf_every`` frames (or on track-loss) a keyframe is created; landmarks are
initialized from the keyframe's stereo triangulation (world frame); local BA
refines the window's poses + landmarks with the oldest pose(s) fixed; the
corrected latest-keyframe pose is propagated back to the live trajectory.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from . import ba
from ..ops.camera import Pinhole


@dataclasses.dataclass
class BackendConfig:
    window: int = 6            # keyframes in the optimization window
    kf_every: int = 5          # frames between keyframes
    max_landmarks: int = 512   # landmark capacity per window
    max_obs: int = 4096        # observation capacity per window
    ba_iters: int = 8
    huber_px: float = 2.0
    min_track_obs: int = 2     # landmark must be seen in >= 2 keyframes
    # Schur-marginalize sliding keyframes into a pose prior instead of
    # dropping their information (models/marg.py; SURVEY §7 step 5).
    marginalize: bool = True
    # Exponential forgetting on the CARRIED prior at each slide. A
    # first-order prior is linearized at slide-time poses and never
    # re-linearized; chaining it undecayed accumulates stale-linearization
    # bias over long sequences (200-frame probe: undecayed marg ATE 4.81 vs
    # drop-oldest 2.84). Decay bounds the staleness horizon (sum of
    # gamma^k) while keeping the most recent windows' marginalized
    # information — the standard sliding-window forgetting compromise.
    prior_decay: float = 0.5
    # Which landmarks to consume at a slide (scripts/probe_prior_decay.py):
    #   "dying":           every landmark whose track ended. Frees window
    #                      capacity for younger landmarks — wins when the
    #                      feature budget exceeds max_landmarks (shipping
    #                      1024-feature config: bench BA leg marg 0.17 vs
    #                      drop-oldest 0.30 ATE).
    #   "underconstrained": only dying landmarks with <= 1 other observing
    #                      keyframe (what drop-oldest would discard
    #                      outright). Never consumes live constraints —
    #                      matches drop-oldest when capacity is ample
    #                      (200-frame probe: 2.84 == drop-oldest vs 3.9
    #                      for "dying").
    marg_policy: str = "dying"


class SlidingWindowBA:
    """Keyframe window + local bundle adjustment (stereo residuals).

    Right-camera observations are first-class: without them a windowed
    monocular BA has a free scale gauge (the cost can drop while the
    trajectory scale drifts); the rig baseline pins it.
    """

    def __init__(self, cam: Pinhole, cfg: BackendConfig = BackendConfig(),
                 T_rl: np.ndarray | None = None):
        self.cam = cam
        self.cfg = cfg
        self.T_rl = np.eye(4) if T_rl is None else np.asarray(T_rl, np.float64)
        self.kf_poses: list[np.ndarray] = []      # T_wc per keyframe
        self.kf_obs: list[dict[int, np.ndarray]] = []  # track_id -> uv
        self.landmarks: dict[int, np.ndarray] = {}     # track_id -> world xyz
        self.frame_of_kf: list[int] = []
        self._frames_since_kf = 10 ** 9
        self._last_kf_n_tracked = 0
        # Marginalization prior over the current window's pose slots
        # (None until the first slide). Numpy pytree of marg.empty_prior
        # shape with capacity cfg.window.
        self.prior: dict | None = None

    # ------------------------------------------------------------------ #

    def should_add_keyframe(self, frame_idx: int, n_tracked: int) -> bool:
        # Cadence OR track-loss. The loss gate compares like-for-like: the
        # frontend's n_tracked now vs n_tracked when the last keyframe was
        # made (r4 compared n_tracked against the obs-DICT size — all valid
        # slots including fresh detections — which fired a keyframe nearly
        # every frame: 85 solves over the 120-frame bench leg).
        if not self.kf_obs:
            return True
        return (self._frames_since_kf >= self.cfg.kf_every or
                n_tracked < 0.5 * max(self._last_kf_n_tracked, 1))

    def add_keyframe(self, frame_idx: int, T_wc: np.ndarray, track_id,
                     track_xy, track_valid, pts3d_cur, pts3d_valid,
                     track_xy_r=None, track_stereo_valid=None,
                     n_tracked: int | None = None) -> None:
        """Record a keyframe from frontend per-frame metrics arrays."""
        self._last_kf_n_tracked = (int(np.sum(np.asarray(track_valid)))
                                   if n_tracked is None else int(n_tracked))
        track_id = np.asarray(track_id)
        track_xy = np.asarray(track_xy)
        track_valid = np.asarray(track_valid)
        pts3d_cur = np.asarray(pts3d_cur)
        pts3d_valid = np.asarray(pts3d_valid)
        track_xy_r = None if track_xy_r is None else np.asarray(track_xy_r)
        track_stereo_valid = (np.zeros(len(track_id), bool)
                              if track_stereo_valid is None
                              else np.asarray(track_stereo_valid))
        T_wc = np.asarray(T_wc, np.float64)

        # obs: track_id -> (uv_left, uv_right-or-None).
        obs = {}
        for i, t in enumerate(track_id):
            if track_valid[i] and t >= 0:
                uv_r = (track_xy_r[i] if track_xy_r is not None
                        and track_stereo_valid[i] else None)
                obs[int(t)] = (track_xy[i], uv_r)
        self.kf_poses.append(T_wc)
        self.kf_obs.append(obs)
        self.frame_of_kf.append(frame_idx)
        # Landmark init: first stereo depth wins (stable anchor; BA refines).
        R, t = T_wc[:3, :3], T_wc[:3, 3]
        for i, tid in enumerate(track_id):
            tid = int(tid)
            if tid >= 0 and track_valid[i] and pts3d_valid[i] and tid not in self.landmarks:
                self.landmarks[tid] = R @ pts3d_cur[i] + t
        # Slide the window: marginalize (default) or drop-oldest.
        if len(self.kf_poses) > self.cfg.window:
            if self.cfg.marginalize:
                self._marginalize_oldest()
            self.kf_obs.pop(0)
            self.kf_poses.pop(0)
            self.frame_of_kf.pop(0)
            live = set()
            for o in self.kf_obs:
                live.update(o.keys())
            for tid in list(self.landmarks):
                if tid not in live:
                    del self.landmarks[tid]
        self._frames_since_kf = 0

    def _marginalize_oldest(self) -> None:
        """Schur-marginalize keyframe 0 + its DYING landmarks into a pose
        prior over the surviving window (models/marg.py).

        Only landmarks whose track has ended (observed by keyframe 0 but
        not by the newest keyframe) are eliminated — their full observation
        history is consumed and their information lives on in the prior.
        Landmarks still being tracked stay LIVE in the map with their
        remaining observations: freezing a live landmark into a linearized
        prior blocks its future refinement and measured WORSE than
        drop-oldest (r5 A/B, scripts/probe_ba_ab.py, when live landmarks
        were consumed); with the dying-only policy the prior keeps what
        drop-oldest discards without paying that price. The carried prior
        is decayed by ``cfg.prior_decay`` per slide (exponential
        forgetting) to bound stale-linearization bias over long chains —
        see BackendConfig and scripts/probe_prior_decay.py. This is the
        standard production-VIO scheme (OKVIS/VINS lineage).
        """
        from . import marg

        Kp1 = len(self.kf_poses)              # window + 1 at slide time
        W = self.cfg.window
        live_now = set(self.kf_obs[-1])
        # Landmark consumption set per cfg.marg_policy (see BackendConfig:
        # the capacity/constraint trade is measured in
        # scripts/probe_prior_decay.py).
        if self.cfg.marg_policy == "dying":
            m_tids = [t for t in self.kf_obs[0]
                      if t in self.landmarks and t not in live_now]
        else:  # "underconstrained"
            n_other = {t: 0 for t in self.kf_obs[0]}
            for o in self.kf_obs[1:]:
                for t in o:
                    if t in n_other:
                        n_other[t] += 1
            m_tids = [t for t in self.kf_obs[0]
                      if t in self.landmarks and t not in live_now
                      and n_other[t] <= 1]
        if not m_tids:
            return
        m_tids = m_tids[: self.cfg.max_landmarks]
        tid_to_idx = {t: i for i, t in enumerate(m_tids)}

        L = self.cfg.max_landmarks
        points = np.zeros((L, 3), np.float32)
        for t, i in tid_to_idx.items():
            points[i] = self.landmarks[t]
        obs_kf = np.zeros(self.cfg.max_obs, np.int32)
        obs_lm = np.zeros(self.cfg.max_obs, np.int32)
        obs_uv = np.zeros((self.cfg.max_obs, 2), np.float32)
        obs_w = np.zeros(self.cfg.max_obs, np.float32)
        obs_right = np.zeros(self.cfg.max_obs, bool)
        m = 0
        for k, o in enumerate(self.kf_obs):
            for tid in list(o):
                i = tid_to_idx.get(tid)
                if i is None:
                    continue
                uv, uv_r = o[tid]
                if m < self.cfg.max_obs:
                    obs_kf[m], obs_lm[m], obs_uv[m], obs_w[m] = k, i, uv, 1.0
                    m += 1
                if uv_r is not None and m < self.cfg.max_obs:
                    obs_kf[m], obs_lm[m], obs_uv[m] = k, i, uv_r
                    obs_right[m], obs_w[m] = True, 1.0
                    m += 1
                if k > 0:
                    del o[tid]  # consumed (kf 0's own dict is popped anyway)

        poses_cw = np.stack([np.linalg.inv(T) for T in self.kf_poses]
                            ).astype(np.float32)           # (W+1, 4, 4)
        carry_H = carry_b = None
        if self.prior is not None:
            # Re-express the existing prior (slots 0..W-1 of the pre-slide
            # window) at the current poses, embedded into (W+1)-slot arrays.
            H_s, b_s = marg.shift_prior(
                jax.tree_util.tree_map(jnp.asarray, self.prior),
                jnp.asarray(poses_cw[:W]))
            g = self.cfg.prior_decay
            carry_H = jnp.zeros((Kp1, Kp1, 6, 6), jnp.float32
                                ).at[:W, :W].set(g * H_s)
            carry_b = jnp.zeros((Kp1, 6), jnp.float32).at[:W].set(g * b_s)

        prior = marg.build_prior(
            self.cam, jnp.asarray(poses_cw), jnp.asarray(points),
            jnp.asarray(obs_kf), jnp.asarray(obs_lm), jnp.asarray(obs_uv),
            jnp.asarray(obs_w), jnp.asarray(self.cfg.huber_px, jnp.float32),
            obs_right=jnp.asarray(obs_right),
            T_rl=jnp.asarray(self.T_rl, jnp.float32),
            carry_H=carry_H, carry_b=carry_b)
        # Truncate (W+1)-slot output to the W-slot post-slide window.
        self.prior = {k: np.asarray(v)[:W] if k != "H"
                      else np.asarray(v)[:W, :W]
                      for k, v in prior.items()}
        for t in m_tids:
            del self.landmarks[t]

    def tick(self) -> None:
        self._frames_since_kf += 1

    # ------------------------------------------------------------------ #

    def optimize(self) -> dict | None:
        """Run local BA over the current window; update poses/landmarks.

        Returns dict(correction (4, 4): right-multiplicative pose fix for
        the latest keyframe, cost_initial, cost_final) or None if the
        window is too small.
        """
        import time

        K = len(self.kf_poses)
        if K < 2:
            return None
        t_start = time.perf_counter()
        cfg = self.cfg

        # Landmarks observed by >= min_track_obs window keyframes.
        counts: dict[int, int] = {}
        for o in self.kf_obs:
            for tid in o:
                if tid in self.landmarks:
                    counts[tid] = counts.get(tid, 0) + 1
        tids = [t for t, c in counts.items() if c >= cfg.min_track_obs]
        if len(tids) < 8:
            return None
        tids = tids[: cfg.max_landmarks]
        tid_to_idx = {t: i for i, t in enumerate(tids)}

        L = cfg.max_landmarks
        points = np.zeros((L, 3), np.float32)
        for t, i in tid_to_idx.items():
            points[i] = self.landmarks[t]

        obs_kf = np.zeros(cfg.max_obs, np.int32)
        obs_lm = np.zeros(cfg.max_obs, np.int32)
        obs_uv = np.zeros((cfg.max_obs, 2), np.float32)
        obs_w = np.zeros(cfg.max_obs, np.float32)
        obs_right = np.zeros(cfg.max_obs, bool)
        m = 0
        for k, o in enumerate(self.kf_obs):
            for tid, (uv, uv_r) in o.items():
                i = tid_to_idx.get(tid)
                if i is None or m >= cfg.max_obs:
                    continue
                obs_kf[m] = k
                obs_lm[m] = i
                obs_uv[m] = uv
                obs_w[m] = 1.0
                m += 1
                if uv_r is not None and m < cfg.max_obs:
                    obs_kf[m] = k
                    obs_lm[m] = i
                    obs_uv[m] = uv_r
                    obs_right[m] = True
                    obs_w[m] = 1.0
                    m += 1

        # BA runs on camera_from_world.
        poses_cw = np.stack([np.linalg.inv(T) for T in self.kf_poses]).astype(np.float32)
        pad = self.cfg.window - K
        if pad:
            poses_cw = np.concatenate(
                [poses_cw, np.tile(np.eye(4, dtype=np.float32), (pad, 1, 1))])

        # The carried marginalization prior joins the solve as a quadratic
        # over the window pose slots (slot indexing matches kf_poses; the
        # prior was truncated to window capacity at build time).
        prior = (None if self.prior is None else
                 jax.tree_util.tree_map(jnp.asarray, self.prior))
        out = ba.bundle_adjust(
            self.cam, jnp.asarray(poses_cw), jnp.asarray(points),
            jnp.asarray(obs_kf), jnp.asarray(obs_lm), jnp.asarray(obs_uv),
            jnp.asarray(obs_w), n_iters=cfg.ba_iters, n_fixed=1,
            huber_px=cfg.huber_px, prune_px=4 * cfg.huber_px,
            obs_right=jnp.asarray(obs_right),
            T_rl=jnp.asarray(self.T_rl, jnp.float32), prior=prior)

        new_cw = np.asarray(out["poses"], np.float64)[:K]
        new_points = np.asarray(out["points"])
        old_last_wc = self.kf_poses[-1].copy()
        for k in range(K):
            self.kf_poses[k] = np.linalg.inv(new_cw[k])
        for t, i in tid_to_idx.items():
            self.landmarks[t] = new_points[i].astype(np.float64)

        # Correction mapping the un-refined latest-KF pose to the refined one:
        # T_new = correction @ T_old  =>  apply to the live pose too.
        correction = self.kf_poses[-1] @ np.linalg.inv(old_last_wc)
        return {"correction": correction,
                "cost_initial": float(out["cost_initial"]),
                "cost_final": float(out["cost_final"]),
                "n_landmarks": len(tids), "n_obs": m, "n_kf": K,
                # Wall includes assembly + device solve + host copy-back —
                # the number that matters for keyframe-rate budgeting.
                "wall_s": time.perf_counter() - t_start}
