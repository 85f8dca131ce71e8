"""A/B: learned BRIEF table (ORBextractor.cpp:99-357) vs seeded Gaussian.

Measures, at the bench operating point (KITTI-shaped frames, 2048 features):
  - temporal/stereo match precision against synthetic ground truth
  - frontend health: n_tracked, inlier_ratio, accept, ATE over 12 frames
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

from stereo_visual_odometry_tpu.models import frontend
from stereo_visual_odometry_tpu.ops.camera import StereoRig
from stereo_visual_odometry_tpu.utils import synthetic, trajectory

H_RAW, W_RAW = 376, 1241
H, W = 384, 1280
FX, BASE = 718.856, 0.537
N_FRAMES = 13

seq = synthetic.render_sequence(n_frames=N_FRAMES, h=H_RAW, w=W_RAW, fx=FX,
                                baseline=BASE, n_points=9000, speed=1.1, seed=3)
pad = lambda a: np.pad(a, ((0, 0), (0, H - H_RAW), (0, W - W_RAW)), mode="edge")
il, ir = pad(seq["images_l"]), pad(seq["images_r"])
rig = StereoRig.kitti(fx=FX, fy=FX, cx=W_RAW / 2, cy=H_RAW / 2, baseline=BASE)


def run(kind):
    from stereo_visual_odometry_tpu.ops import orb
    orb.set_pattern(kind)
    jax.clear_caches()
    cfg = frontend.VOConfig(mode="orb", height=H, width=W, max_features=2048,
                            num_hypotheses=256, refine_iters=6,
                            min_features_track=8)
    init_fn, step_fn = frontend.make_frontend(cfg, rig)
    state = init_fn(jnp.asarray(il[0]), jnp.asarray(ir[0]), jax.random.PRNGKey(0))
    poses = [np.eye(4)]
    rows = []
    for i in range(1, N_FRAMES):
        state, m = step_fn(state, jnp.asarray(il[i]), jnp.asarray(ir[i]))
        poses.append(np.asarray(state["T_wc"], np.float64))
        rows.append((int(m["n_tracked"]), float(m["inlier_ratio"]),
                     int(m["n_inliers"]), bool(m["accept"]), float(m["t_norm"])))
    ate = trajectory.ate_rmse(np.stack(poses), seq["poses_gt"])
    acc = np.mean([r[3] for r in rows])
    print(f"[{kind}] ATE={ate:.4f} accept={acc:.2f}")
    for r in rows:
        print(f"   n_tracked={r[0]:5d} inlier_ratio={r[1]:.3f} "
              f"n_inl={r[2]:5d} accept={r[3]} t={r[4]:.3f}")
    orb.set_pattern("learned")
    return ate, acc


run("gaussian")
run("learned")
