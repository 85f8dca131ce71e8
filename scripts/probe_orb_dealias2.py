"""Round 2: upright BRIEF + fewer pyramid levels, on top of the best
matcher config from probe_orb_dealias.py (lvl<=1, stereo premask, tr150).

Also prints the Hamming distance percentiles of GT-TRUE stereo pairs to
see how much each change tightens the descriptor itself.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax.numpy as jnp

from stereo_visual_odometry_tpu.ops import orb, match, triangulate
from stereo_visual_odometry_tpu.ops.camera import StereoRig
from stereo_visual_odometry_tpu.utils import synthetic

H_RAW, W_RAW = 376, 1241
H, W = 384, 1280
FX, BASE = 718.856, 0.537

seq = synthetic.render_sequence(n_frames=6, h=H_RAW, w=W_RAW, fx=FX,
                                baseline=BASE, n_points=9000, speed=1.1, seed=3)
pad = lambda a: np.pad(a, ((0, 0), (0, H - H_RAW), (0, W - W_RAW)), mode="edge")
il, ir = pad(seq["images_l"]), pad(seq["images_r"])
rig = StereoRig.kitti(fx=FX, fy=FX, cx=W_RAW / 2, cy=H_RAW / 2, baseline=BASE)
i = 3
T_gt = np.linalg.inv(seq["poses_gt"][i + 1]) @ seq["poses_gt"][i]


def run(levels, upright, floor, mld=1):
    kw = dict(n_features=2048, levels=levels, scale_factor=1.2, ini_th=20.0,
              min_th=7.0, cell=32, k_per_cell=8, upright=upright)
    fl1, fr1 = orb.detect_and_describe_pair(jnp.asarray(il[i]), jnp.asarray(ir[i]), **kw)
    fl2, _ = orb.detect_and_describe_pair(jnp.asarray(il[i + 1]), jnp.asarray(ir[i + 1]), **kw)
    assoc = match.stereo_temporal_match(
        fl1, fr1, fl2, feature_match_error=2.0, dist_floor=float(floor),
        dist_ratio=2.0, max_level_diff=mld, stereo_premask=True,
        temporal_radius=150.0)
    v = np.asarray(assoc["valid"])
    xy_l = np.asarray(fl1["xy"])
    xy_r = np.asarray(fr1["xy"][assoc["idx_r"]])
    xy_c = np.asarray(fl2["xy"][assoc["idx_t2l"]])
    X, tri_ok = triangulate.stereo_depth_closed_form(rig, jnp.asarray(xy_l),
                                                     jnp.asarray(xy_r))
    X = np.asarray(X)
    ok = v & np.asarray(tri_ok) & (X[:, 2] > 0.5) & (X[:, 2] < 200)
    Xc = X[ok] @ T_gt[:3, :3].T + T_gt[:3, 3]
    uv = np.stack([FX * Xc[:, 0] / Xc[:, 2] + W_RAW / 2,
                   FX * Xc[:, 1] / Xc[:, 2] + H_RAW / 2], -1)
    err = np.linalg.norm(uv - xy_c[ok], axis=-1)
    n = int(ok.sum())
    # Distance stats of surviving matches.
    bs = np.asarray(assoc["dist_stereo"])[ok]
    pct = np.percentile(bs, [25, 50, 75]).astype(int) if n else [-1] * 3
    print(f"levels={levels} upright={int(upright)} floor={floor:3d}: "
          f"tracked={n:5d} true@2px={(err < 2.0).mean() if n else 0:.3f} "
          f"med_err={np.median(err) if n else -1:.2f} "
          f"stereo_dist_pct={pct}")


for levels, upright, floor in [
    (8, False, 50), (8, True, 50), (8, True, 30),
    (4, False, 50), (4, True, 50), (4, True, 30),
    (2, True, 50), (2, True, 30), (1, True, 30),
    (4, True, 64), (2, True, 64),
]:
    run(levels, upright, floor)
