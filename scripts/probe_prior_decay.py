"""Sweep BackendConfig.prior_decay on the 200-frame drift probe.

The carried first-order prior is never re-linearized; chained undecayed
over ~66 slides it accumulates stale-linearization bias (probe_ba_ab with
gamma=1: marg ATE 4.81 vs drop-oldest 2.84). This sweeps the forgetting
factor to pick the shipping default: gamma=0 keeps only the current
slide's marginalized information, gamma=1 is the undecayed chain.
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
H, W = 256, 320
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
    n_ba = sum(1 for m in sys_.metrics if "ba" in m)
    print(f"{label:28s} ATE={ate:.4f} n_ba={n_ba} wall={wall:.0f}s",
          flush=True)
    return ate


bcfg = dict(window=6, kf_every=3, max_landmarks=512, max_obs=4096, ba_iters=8)
run("drop-oldest", BackendConfig(marginalize=False, **bcfg))
for g in (0.0, 0.3, 0.5, 0.8, 1.0):
    run(f"marg decay={g}", BackendConfig(marginalize=True, prior_decay=g,
                                         **bcfg))
