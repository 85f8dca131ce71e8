"""E2E ATE A/B of ORB de-aliasing configs on the bench sequence (CPU).

The matcher-level probes (probe_orb_dealias*.py) pick candidates; this
decides: full 48-frame VO with each VOConfig variant, ATE/accept/yield.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax
import jax.numpy as jnp

from stereo_visual_odometry_tpu.models import frontend
from stereo_visual_odometry_tpu.ops.camera import Pinhole, StereoRig
from stereo_visual_odometry_tpu.utils import synthetic, trajectory

H_RAW, W_RAW = 376, 1241
H, W = 384, 1280
FX, BASE = 718.856, 0.537

seq = synthetic.render_sequence(n_frames=48, h=H_RAW, w=W_RAW, fx=FX,
                                baseline=BASE, n_points=9000, speed=1.1, seed=3)
pad = lambda a: np.pad(a, ((0, 0), (0, H - H_RAW), (0, W - W_RAW)), mode="edge")
il, ir = pad(seq["images_l"]), pad(seq["images_r"])
gt = seq["poses_gt"]
cam = Pinhole.create(FX, FX, W_RAW / 2, H_RAW / 2)
rig = StereoRig.create(cam, cam, t_rl=[-BASE, 0, 0])


def run(label, **kw):
    cfg = frontend.VOConfig(mode="orb", height=H, width=W, **kw)
    init_fn, step_fn = frontend.make_frontend(cfg, rig)
    state = init_fn(jnp.asarray(il[0]), jnp.asarray(ir[0]), jax.random.PRNGKey(0))
    poses = [np.eye(4)]
    acc, ntr, nin = [], [], []
    for f in range(1, len(il)):
        state, m = step_fn(state, jnp.asarray(il[f]), jnp.asarray(ir[f]))
        poses.append(np.asarray(state["T_wc"], np.float64))
        acc.append(bool(m["accept"])); ntr.append(int(m["n_tracked"]))
        nin.append(int(m["n_inliers"]))
    est = np.stack(poses)
    ate = trajectory.ate_rmse(est, gt)
    print(f"{label:34s} ATE={ate:.4f} accept={np.mean(acc):.2f} "
          f"ntr(med)={int(np.median(ntr))} nin(med)={int(np.median(nin))}",
          flush=True)


MASKS = dict(orb_max_level_diff=1, orb_stereo_premask=True,
             orb_temporal_radius=150.0)
run("ship (r4 default)")
run("up f30 masks", orb_upright=True, orb_dist_floor=30.0, **MASKS)
run("up f50 masks", orb_upright=True, orb_dist_floor=50.0, **MASKS)
run("up f40 masks", orb_upright=True, orb_dist_floor=40.0, **MASKS)
run("up f30 masks lvl4", orb_upright=True, orb_dist_floor=30.0,
    orb_levels=4, **MASKS)
run("up f50 no-masks", orb_upright=True, orb_dist_floor=50.0)
