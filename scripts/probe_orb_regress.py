"""Probe: which round-3 yield change regressed the ORB e2e ATE."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from stereo_visual_odometry_tpu.models import frontend
from stereo_visual_odometry_tpu.ops.camera import Pinhole, StereoRig
from stereo_visual_odometry_tpu.utils import synthetic, trajectory


def run(mode="orb", n_frames=12, h=256, w=384, speed=1.0, **kw):
    seq = synthetic.render_sequence(n_frames=n_frames, h=h, w=w, fx=300.0, speed=speed)
    rp = seq["rig"]
    cam = Pinhole.create(rp["fx"], rp["fy"], rp["cx"], rp["cy"])
    rig = StereoRig.create(cam, cam, t_rl=[-rp["baseline"], 0, 0])
    cfg = frontend.VOConfig(mode=mode, height=h, width=w, max_features=512,
                            num_hypotheses=256,
                            min_inlier_rate=0.3, min_features_track=8, **kw)
    init_fn, step_fn = frontend.make_frontend(cfg, rig)
    state = init_fn(jnp.asarray(seq["images_l"][0]), jnp.asarray(seq["images_r"][0]),
                    jax.random.PRNGKey(0))
    poses = [np.eye(4)]
    accepts, ntr = [], []
    for f in range(1, n_frames):
        state, m = step_fn(state, jnp.asarray(seq["images_l"][f]),
                           jnp.asarray(seq["images_r"][f]))
        poses.append(np.asarray(state["T_wc"], np.float64))
        accepts.append(bool(m["accept"]))
        ntr.append(int(m["n_tracked"]))
    est = np.stack(poses)
    ate = trajectory.ate_rmse(est, seq["poses_gt"], align=False)
    return ate, np.mean(accepts), ntr


variants = {
    "new (floor50, no mutual, dedup3)": {},
    "floor30": dict(orb_dist_floor=30.0),
    "mutual on": dict(orb_mutual=True),
    "dedup off": dict(orb_dedup_radius=0.0),
    "old (floor30, mutual, dedup off)": dict(orb_dist_floor=30.0, orb_mutual=True,
                                             orb_dedup_radius=0.0),
}
for name, kw in variants.items():
    ate, acc, ntr = run(**kw)
    print(f"{name:38s} ATE={ate:.3f} accept={acc:.2f} n_tracked={ntr}")
