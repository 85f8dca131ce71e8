"""A/B ORB gate settings on the e2e synthetic test: ATE + tracked counts."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from stereo_visual_odometry_tpu.models import frontend
from stereo_visual_odometry_tpu.ops.camera import Pinhole, StereoRig
from stereo_visual_odometry_tpu.utils import synthetic, trajectory

seq = synthetic.render_sequence(n_frames=12, h=256, w=384, fx=300.0, speed=1.0)
rp = seq["rig"]
cam = Pinhole.create(rp["fx"], rp["fy"], rp["cx"], rp["cy"])
rig = StereoRig.create(cam, cam, t_rl=[-rp["baseline"], 0, 0])

for label, kw in [
    ("r2 default (mutual, floor30, nodedup)",
     dict(orb_mutual=True, orb_dist_floor=30.0, orb_dedup_radius=0.0)),
    ("mutual, floor30, dedup3", dict(orb_mutual=True, orb_dist_floor=30.0)),
    ("nomutual, floor30, dedup3", dict(orb_dist_floor=30.0)),
    ("nomutual, floor50, dedup3", dict()),
    ("nomutual, floor50, nodedup", dict(orb_dedup_radius=0.0)),
    ("mutual, floor50, dedup3", dict(orb_mutual=True)),
    ("nomutual, floor40, dedup3", dict(orb_dist_floor=40.0)),
]:
    cfg = frontend.VOConfig(mode="orb", height=256, width=384, max_features=512,
                            num_hypotheses=256, min_inlier_rate=0.3,
                            min_features_track=8, **kw)
    init_fn, step_fn = frontend.make_frontend(cfg, rig)
    state = init_fn(jnp.asarray(seq["images_l"][0]), jnp.asarray(seq["images_r"][0]),
                    jax.random.PRNGKey(0))
    poses, accepts, tracked, inl = [np.eye(4)], [], [], []
    for f in range(1, 12):
        state, m = step_fn(state, jnp.asarray(seq["images_l"][f]),
                           jnp.asarray(seq["images_r"][f]))
        poses.append(np.asarray(state["T_wc"], np.float64))
        accepts.append(bool(m["accept"]))
        tracked.append(int(m["n_tracked"]))
        inl.append(float(m["inlier_ratio"]))
    ate = trajectory.ate_rmse(np.stack(poses), seq["poses_gt"], align=False)
    print(f"{label:40s} ate={ate:.3f} accept={np.mean(accepts):.2f} "
          f"tracked={np.mean(tracked):.0f} inlier_ratio={np.mean(inl):.2f}")
