"""Probe: per-frame gate diagnostics for the ORB CLI operating point on TPU."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

from stereo_visual_odometry_tpu.models import frontend
from stereo_visual_odometry_tpu.ops.camera import Pinhole, StereoRig
from stereo_visual_odometry_tpu.utils.kitti import KittiStereoDataset

ds = KittiStereoDataset("/tmp/kitti_syn/seq")
H, W = ds.static_hw
print("static", H, W)
cam = Pinhole.create(718.856, 718.856, 1241 / 2, 376 / 2)
rig = StereoRig.create(cam, cam, t_rl=[-0.537, 0, 0])
cfg = frontend.VOConfig(mode="orb", height=H, width=W)
print("cfg floor/mutual/dedup/inlier_rate:", cfg.orb_dist_floor, cfg.orb_mutual,
      cfg.orb_dedup_radius, cfg.min_inlier_rate)
init_fn, step_fn = frontend.make_frontend(cfg, rig)
il, ir = ds[0]
state = init_fn(jnp.asarray(il), jnp.asarray(ir), jax.random.PRNGKey(0))
print("init status", int(state["status"]), "n_feat",
      int(state["feat_l"]["valid"].sum()))
for f in range(1, 8):
    il, ir = ds[f]
    state, m = step_fn(state, jnp.asarray(il), jnp.asarray(ir))
    out = {k: np.asarray(v).tolist() for k, v in m.items()}
    print(f"f{f}: " + " ".join(f"{k}={out[k] if not isinstance(out[k], float) else round(out[k],4)}"
                               for k in sorted(out)))
