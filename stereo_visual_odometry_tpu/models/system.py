"""System driver: config -> dataset -> per-frame VO loop -> trajectory.

TPU-native replacement for the reference's ``System`` runtime
(``/root/reference/src/System.cpp``): construction wires
config -> rig -> frontend (``System.cpp:15-27``), ``run()`` is the blocking
per-frame loop (``System.cpp:31-43``), ``step()`` processes one stereo pair
with wall-clock timing (``System.cpp:46-58``), and ``step_online()`` is the
``Step_ros`` equivalent for externally-fed frames (``System.cpp:60-74``).

Unlike the reference (whose only outputs are two OpenCV windows), the driver
records the full trajectory, per-frame metrics, and can write KITTI-format
pose files; the tracking state machine (INITING/TRACKING_GOOD/LOST,
``tracking.h:22-27``) runs here on the host, with working LOST->reinit
recovery (dead-stubbed in the reference, ``tracking.cpp:70-72, 662-665``).
"""
from __future__ import annotations

import time
from typing import Iterable

import numpy as np
import jax
import jax.numpy as jnp

from . import frontend as frontend_mod
from ..utils.config import RunConfig, rig_from_config
from ..utils import trajectory as traj_mod
from ..utils.logging import get_logger


class System:
    """End-to-end VO runtime around the jitted frontends."""

    def __init__(self, config: RunConfig, backend_cfg=None):
        self.config = config
        self.rig = rig_from_config(config.camera)
        self.vo_cfg = config.vo
        self.init_fn, self.step_fn = frontend_mod.make_frontend(self.vo_cfg, self.rig)
        self.key = jax.random.PRNGKey(config.seed)
        self.state = None
        self.status = frontend_mod.INITING
        self.lost_count = 0
        self.max_lost_before_reinit = 3
        self.poses: list[np.ndarray] = []
        self.metrics: list[dict] = []
        self.frame_times: list[float] = []
        self.frame_idx = 0
        self.log = get_logger("system")
        # Optional sliding-window BA backend (needs persistent tracks).
        self.backend = None
        if backend_cfg is not None:
            from .backend import SlidingWindowBA

            assert self.vo_cfg.persistent_tracks, \
                "BA backend requires VOConfig(persistent_tracks=True)"
            self.backend = SlidingWindowBA(self.rig.left, backend_cfg,
                                           T_rl=np.asarray(self.rig.T_rl))

    # ------------------------------------------------------------------ #

    def step(self, img_l: np.ndarray, img_r: np.ndarray) -> dict:
        """Process one stereo pair; returns the per-frame metric dict.

        Mirrors ``System::Step`` + ``Tracking::AddFrame`` dispatch
        (``System.cpp:46-58``, ``tracking.cpp:49-73``).
        """
        t0 = time.perf_counter()
        il = jnp.asarray(img_l)
        ir = jnp.asarray(img_r)

        if self.state is None or self.status == frontend_mod.INITING:
            self.key, sub = jax.random.split(self.key)
            self.state = self.init_fn(il, ir, sub)
            self.status = int(self.state["status"])
            m = {"accept": False, "init": True,
                 "n_detected": int(self.state["n_detected"])}
        else:
            self.state, metrics = self.step_fn(self.state, il, ir)
            jax.block_until_ready(self.state["T_wc"])
            self.status = int(self.state["status"])
            from ..utils.hostcopy import device_get_tree

            m = device_get_tree(metrics)
            m["accept"] = bool(metrics["accept"])
            m["init"] = False
            # LOST handling: the reference stubs this out; we reinitialize
            # after a few consecutive feature-starved frames.
            if self.status == frontend_mod.LOST:
                self.lost_count += 1
                if self.lost_count >= self.max_lost_before_reinit:
                    self.log.warning("tracking lost %d frames; reinitializing",
                                     self.lost_count)
                    T_wc = np.asarray(self.state["T_wc"])
                    self.key, sub = jax.random.split(self.key)
                    self.state = self.init_fn(il, ir, sub)
                    self.state["T_wc"] = jnp.asarray(T_wc)
                    self.lost_count = 0
            else:
                self.lost_count = 0

        # Association overlay dump (the reference's displayTracking window,
        # tracking.cpp:354-382, rendered offline instead of imshow'd).
        if (self.config.overlay_dir and not m.get("init")
                and self.frame_idx % max(self.config.overlay_every, 1) == 0):
            self._dump_overlay(img_l, m)

        # Sliding-window BA backend (config 3): keyframe + local refine.
        if self.backend is not None and not m.get("init"):
            self.backend.tick()
            if self.backend.should_add_keyframe(self.frame_idx, int(m["n_tracked"])):
                T_wc = np.asarray(self.state["T_wc"], np.float64)
                self.backend.add_keyframe(
                    self.frame_idx, T_wc, m["track_id"], m["track_xy"],
                    m["track_valid"], m["pts3d_cur"], m["pts3d_cur_valid"],
                    track_xy_r=m["track_xy_r"],
                    track_stereo_valid=m["track_stereo_valid"],
                    n_tracked=int(m["n_tracked"]))
                res = self.backend.optimize()
                if res is not None:
                    # Propagate the refined latest-keyframe correction to the
                    # live pose so the trajectory benefits immediately.
                    corrected = res["correction"] @ T_wc
                    self.state["T_wc"] = jnp.asarray(corrected, jnp.float32)
                    m["ba"] = res

        dt = time.perf_counter() - t0
        self.frame_times.append(dt)
        self.poses.append(np.asarray(self.state["T_wc"], np.float64))
        m["time_s"] = dt
        self.metrics.append(m)
        self.frame_idx += 1
        return m

    step_online = step  # ``Step_ros`` equivalent: externally-fed frames.

    def _dump_overlay(self, img_l: np.ndarray, m: dict) -> None:
        """Write the per-frame association overlay PNG for this frame."""
        import os

        from ..utils.viz import draw_tracks

        os.makedirs(self.config.overlay_dir, exist_ok=True)
        path = os.path.join(self.config.overlay_dir,
                            f"tracks_{self.frame_idx:06d}.png")
        draw_tracks(path, np.asarray(img_l),
                    np.asarray(m["tracked_prev"]),
                    np.asarray(m["tracked_cur"]),
                    np.asarray(m["tracked_valid"]))

    # ------------------------------------------------------------------ #

    def run(self, frames: Iterable[tuple[np.ndarray, np.ndarray]],
            max_frames: int = -1) -> np.ndarray:
        """Blocking loop over an iterable of stereo pairs (``System::Run``).

        Returns the (N, 4, 4) trajectory; also writes it to
        ``config.trajectory_out`` if set.
        """
        for i, (il, ir) in enumerate(frames):
            if 0 <= max_frames <= i:
                break
            m = self.step(il, ir)
            if i % 50 == 0:
                self.log.info("frame %d status=%d time=%.1fms", i, self.status,
                              1e3 * m["time_s"])
        traj = np.stack(self.poses) if self.poses else np.zeros((0, 4, 4))
        if self.config.trajectory_out:
            traj_mod.save_kitti(self.config.trajectory_out, traj)
            self.log.info("wrote %d poses to %s", len(traj),
                          self.config.trajectory_out)
        return traj

    def run_chunked(self, frames: Iterable[tuple[np.ndarray, np.ndarray]],
                    chunk: int = 8, max_frames: int = -1) -> np.ndarray:
        """Offline-throughput loop: scan the step over frame chunks on device
        (one dispatch per ``chunk`` frames). Not compatible with the BA
        backend (which needs per-frame host bookkeeping) — use ``run`` there.

        Keeps the product semantics of ``run``: per-frame metric dicts land
        in ``self.metrics`` (accept, n_tracked, inlier_ratio, ...; timing is
        the chunk wall-clock split evenly across its frames), and the
        LOST->reinit recovery runs at chunk granularity — if the trailing
        frames of a chunk are feature-starved, the next chunk starts from a
        fresh detection (pose preserved), exactly like ``step``'s recovery.
        """
        assert self.backend is None, "chunked mode is frontend-only"
        init_fn, chunk_fn = frontend_mod.make_chunked_frontend(self.vo_cfg, self.rig)
        buf_l: list[np.ndarray] = []
        buf_r: list[np.ndarray] = []
        t_start = time.perf_counter()

        def flush():
            if not buf_l:
                return
            il = jnp.asarray(np.stack(buf_l))
            ir = jnp.asarray(np.stack(buf_r))
            if self.state is None:
                self.key, sub = jax.random.split(self.key)
                self.state = init_fn(il[0], ir[0], sub)
                self.poses.append(np.asarray(self.state["T_wc"], np.float64))
                self.metrics.append({"accept": False, "init": True,
                                     "n_detected": int(self.state["n_detected"]),
                                     "time_s": 0.0})
                self.frame_times.append(0.0)
                il, ir = il[1:], ir[1:]
                if il.shape[0] == 0:
                    buf_l.clear(); buf_r.clear()
                    return
            t0 = time.perf_counter()
            self.state, m = chunk_fn(self.state, il, ir)
            jax.block_until_ready(self.state["T_wc"])
            dt = time.perf_counter() - t0
            from ..utils.hostcopy import device_get_tree

            m = device_get_tree(m)
            n = len(m["T_wc"])
            per_frame = dt / max(n, 1)
            statuses = np.where(
                m["n_detected"] >= self.vo_cfg.min_features_detect,
                frontend_mod.TRACKING_GOOD, frontend_mod.LOST)
            for t in range(n):
                self.poses.append(np.asarray(m["T_wc"][t], np.float64))
                self.metrics.append({
                    "accept": bool(m["accept"][t]), "init": False,
                    "n_tracked": int(m["n_tracked"][t]),
                    "n_detected": int(m["n_detected"][t]),
                    "n_inliers": int(m["n_inliers"][t]),
                    "inlier_ratio": float(m["inlier_ratio"][t]),
                    "t_norm": float(m["t_norm"][t]),
                    "T_21": np.asarray(m["T_21"][t], np.float64),
                    "time_s": per_frame,
                })
                self.frame_times.append(per_frame)
                if statuses[t] == frontend_mod.LOST:
                    self.lost_count += 1
                else:
                    self.lost_count = 0
            self.status = int(self.state["status"])
            # LOST recovery at chunk granularity (``step``'s reinit policy):
            # reinitialize from the last frame, preserving the pose chain.
            if self.lost_count >= self.max_lost_before_reinit:
                self.log.warning(
                    "tracking lost %d frames; reinitializing (chunked)",
                    self.lost_count)
                T_wc = np.asarray(self.state["T_wc"])
                self.key, sub = jax.random.split(self.key)
                self.state = init_fn(il[-1], ir[-1], sub)
                self.state["T_wc"] = jnp.asarray(T_wc)
                self.status = int(self.state["status"])
                self.lost_count = 0
            buf_l.clear(); buf_r.clear()

        for i, (il, ir) in enumerate(frames):
            if 0 <= max_frames <= i:
                break
            buf_l.append(il)
            buf_r.append(ir)
            if len(buf_l) == chunk + (1 if self.state is None else 0):
                flush()
        flush()
        self.frame_idx = len(self.poses)
        traj = np.stack(self.poses) if self.poses else np.zeros((0, 4, 4))
        if self.config.trajectory_out:
            traj_mod.save_kitti(self.config.trajectory_out, traj)
        return traj

    def run_kitti(self) -> np.ndarray:
        """Run on the configured KITTI sequence directory."""
        from ..utils.kitti import KittiStereoDataset

        ds = KittiStereoDataset(self.config.dataset_dir,
                                static_hw=(self.vo_cfg.height, self.vo_cfg.width))
        return self.run(ds.iter_prefetch(), self.config.max_frames)

    # ------------------------------------------------------------------ #

    @property
    def fps(self) -> float:
        ts = self.frame_times[1:]  # skip compile frame
        return len(ts) / sum(ts) if ts else 0.0

    def summary(self) -> dict:
        acc = [m.get("accept", False) for m in self.metrics if not m.get("init")]
        return {
            "frames": len(self.poses),
            "fps": self.fps,
            "accept_rate": float(np.mean(acc)) if acc else 0.0,
            "status": self.status,
        }
