"""Probe: ORB CLI operating point on TPU — ATE under gate/match variants."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

from stereo_visual_odometry_tpu.models import frontend
from stereo_visual_odometry_tpu.ops.camera import Pinhole, StereoRig
from stereo_visual_odometry_tpu.utils.kitti import KittiStereoDataset
from stereo_visual_odometry_tpu.utils import trajectory

ds = KittiStereoDataset("/tmp/kitti_syn/seq")
H, W = ds.static_hw
gt = trajectory.load_kitti("/tmp/kitti_syn/gt.txt")
cam = Pinhole.create(718.856, 718.856, 1241 / 2, 376 / 2)
rig = StereoRig.create(cam, cam, t_rl=[-0.537, 0, 0])
frames = [ds[i] for i in range(len(ds))]

def run(**kw):
    cfg = frontend.VOConfig(mode="orb", height=H, width=W, **kw)
    init_fn, step_fn = frontend.make_frontend(cfg, rig)
    state = init_fn(jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]),
                    jax.random.PRNGKey(0))
    poses = [np.eye(4)]
    acc, ntr, nin = [], [], []
    for f in range(1, len(frames)):
        state, m = step_fn(state, jnp.asarray(frames[f][0]), jnp.asarray(frames[f][1]))
        poses.append(np.asarray(state["T_wc"], np.float64))
        acc.append(bool(m["accept"])); ntr.append(int(m["n_tracked"]))
        nin.append(int(m["n_inliers"]))
    est = np.stack(poses)
    n = min(len(gt), len(est))
    ate = trajectory.ate_rmse(est[:n], gt[:n])
    print(f"  ATE={ate:.3f} accept={np.mean(acc):.2f} "
          f"ntr(med)={int(np.median(ntr))} nin(med)={int(np.median(nin))}")

for name, kw in {
    "default (inlier 0.5)": {},
    "inlier 0.05": dict(min_inlier_rate=0.05),
    "inlier 0.05 + mutual": dict(min_inlier_rate=0.05, orb_mutual=True),
    "inlier 0.05 + floor30": dict(min_inlier_rate=0.05, orb_dist_floor=30.0),
}.items():
    print(name)
    run(**kw)
