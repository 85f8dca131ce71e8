"""Does the BA backend pay its way? (VERDICT r4 next #3)

A 200-frame drift-inducing synthetic sequence (yaw-heavy + speed), LK
persistent-track frontend; A/B/C:
  A. frontend-only (persistent tracks, no backend)
  B. backend with marginalization (shipping default)
  C. backend with drop-oldest (marginalize=False)
Reports ATE for each + per-solve wall time. CPU run (hardware latency is
benched separately in bench.py's --ba leg).
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np

from stereo_visual_odometry_tpu.models.backend import BackendConfig
from stereo_visual_odometry_tpu.models.frontend import VOConfig
from stereo_visual_odometry_tpu.models.system import System
from stereo_visual_odometry_tpu.utils import synthetic, trajectory
from stereo_visual_odometry_tpu.utils.config import CameraConfig, RunConfig

N = 200
H, W = 256, 320  # cell-divisible (grid_top_k needs H, W % 32 == 0)
# yaw 0.008: enough rotation to accumulate drift, not enough to sweep the
# camera off the landmark cloud (0.02 lost tracking outright: accept 0.48).
# cloud_extent must cover the 200 m trajectory or tracking starves.
seq = synthetic.render_sequence(n_frames=N, h=H, w=W, fx=300.0, speed=1.0,
                                n_points=24000, yaw_rate=0.008, seed=11,
                                cloud_extent=(40.0, 8.0, 300.0))
rp = seq["rig"]
frames = list(zip(seq["images_l"], seq["images_r"]))


def run(label, backend_cfg):
    vo = VOConfig(mode="lk", height=H, width=W, max_features=256,
                  num_hypotheses=128, min_features_track=8,
                  min_inlier_rate=0.3, persistent_tracks=True)
    run_cfg = RunConfig(camera=CameraConfig(fx=rp["fx"], fy=rp["fy"],
                                            cx=rp["cx"], cy=rp["cy"],
                                            baseline=rp["baseline"]),
                        vo=vo)
    sys_ = System(run_cfg, backend_cfg=backend_cfg)
    t0 = time.perf_counter()
    traj = sys_.run(frames)
    wall = time.perf_counter() - t0
    ate = trajectory.ate_rmse(traj, seq["poses_gt"], align=False)
    ba_runs = [m["ba"] for m in sys_.metrics if "ba" in m]
    acc = np.mean([m.get("accept", False) for m in sys_.metrics if not m.get("init")])
    print(f"{label:28s} ATE={ate:.4f} accept={acc:.2f} n_ba={len(ba_runs)} "
          f"wall={wall:.0f}s", flush=True)
    return ate


bcfg = dict(window=6, kf_every=3, max_landmarks=512, max_obs=4096, ba_iters=8)
a = run("frontend-only", None)
b = run("BA + marginalization", BackendConfig(marginalize=True, **bcfg))
c = run("BA + drop-oldest", BackendConfig(marginalize=False, **bcfg))
print(f"\nimprovement BA+marg vs frontend: {100 * (a - b) / a:.1f}%  "
      f"marg vs drop-oldest: {100 * (c - b) / max(c, 1e-9):.1f}%")
