"""A/B the level-aware + geometry-premasked matcher against ground truth.

VERDICT r4 next #1: cross-level duplicate aliasing splits match votes.
Sweep (max_level_diff, stereo_premask, temporal_radius, dist_floor) and
classify every surviving association against the synthetic GT pose:
tracked count, precision@2px, median reprojection error.
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

kw = dict(n_features=2048, levels=8, scale_factor=1.2, ini_th=20.0, min_th=7.0,
          cell=32, k_per_cell=8, dedup_radius=0.0)

i = 3
fl1, fr1 = orb.detect_and_describe_pair(jnp.asarray(il[i]), jnp.asarray(ir[i]), **kw)
fl2, fr2 = orb.detect_and_describe_pair(jnp.asarray(il[i + 1]), jnp.asarray(ir[i + 1]), **kw)
T_gt = np.linalg.inv(seq["poses_gt"][i + 1]) @ seq["poses_gt"][i]

print(f"valid t1L={int(jnp.sum(fl1['valid']))}")


def classify(assoc):
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
    return n, (err < 2.0).mean() if n else 0.0, float(np.median(err)) if n else -1


# (label, max_level_diff, stereo_premask, temporal_radius, floor)
variants = [
    ("baseline floor50",            None, False, None, 50),
    ("lvl<=1 floor50",              1,    False, None, 50),
    ("lvl<=0 floor50",              0,    False, None, 50),
    ("lvl<=1 +stereo_pre floor50",  1,    True,  None, 50),
    ("lvl<=1 +st_pre +tr150 f50",   1,    True,  150.0, 50),
    ("lvl<=0 +st_pre +tr150 f50",   0,    True,  150.0, 50),
    ("lvl<=1 +st_pre +tr150 f30",   1,    True,  150.0, 30),
    ("lvl<=1 +st_pre +tr150 f64",   1,    True,  150.0, 64),
    ("lvl<=1 +st_pre +tr150 f80",   1,    True,  150.0, 80),
    ("st_pre+tr150 only f50",       None, True,  150.0, 50),
]
for label, mld, sp, tr, floor in variants:
    assoc = match.stereo_temporal_match(
        fl1, fr1, fl2, feature_match_error=2.0, dist_floor=float(floor),
        dist_ratio=2.0, use_mutual=False, max_level_diff=mld,
        stereo_premask=sp, temporal_radius=tr)
    n, prec, med = classify(assoc)
    print(f"{label:30s} tracked={n:5d} true@2px={prec:.3f} median_err={med:.2f}")
