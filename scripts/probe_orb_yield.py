"""Diagnose ORB association yield at the bench operating point.

VERDICT r2 weak#2: n_tracked_last=36 of 2048 features. Instrument each gate
in ops/match.stereo_temporal_match to find which stage kills matches.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_odometry_tpu.ops import orb, match
from stereo_visual_odometry_tpu.utils import synthetic

H_RAW, W_RAW = 376, 1241
H, W = 384, 1280
seq = synthetic.render_sequence(n_frames=3, h=H_RAW, w=W_RAW, fx=718.856,
                                baseline=0.537, n_points=9000, speed=1.1, seed=3)
pad = lambda a: np.pad(a, ((0, 0), (0, H - H_RAW), (0, W - W_RAW)), mode="edge")
il, ir = pad(seq["images_l"]), pad(seq["images_r"])

orb_kw = dict(n_features=2048, levels=8, scale_factor=1.2, ini_th=20.0,
              min_th=7.0, cell=32, k_per_cell=8)

f1l, f1r = orb.detect_and_describe_pair(jnp.asarray(il[0], jnp.float32),
                                        jnp.asarray(ir[0], jnp.float32), **orb_kw)
f2l, _ = orb.detect_and_describe_pair(jnp.asarray(il[1], jnp.float32),
                                      jnp.asarray(ir[1], jnp.float32), **orb_kw)

print("valid t1l:", int(f1l["valid"].sum()), "t1r:", int(f1r["valid"].sum()),
      "t2l:", int(f2l["valid"].sum()))

d_st = match.hamming_matrix(f1l["desc"], f1r["desc"], f1l["valid"], f1r["valid"])
d_tm = match.hamming_matrix(f1l["desc"], f2l["desc"], f1l["valid"], f2l["valid"])
idx_r, best_st = match.match_best(d_st)
idx_t, best_tm = match.match_best(d_tm)

v0 = f1l["valid"] & (best_st < (1 << 30)) & (best_tm < (1 << 30))
print("stage0 both-matched:", int(v0.sum()))

mu_st = match.mutual_mask(d_st, idx_r)
mu_tm = match.mutual_mask(d_tm, idx_t)
print("  mutual stereo:", int((v0 & mu_st).sum()),
      " mutual temporal:", int((v0 & mu_tm).sum()),
      " both:", int((v0 & mu_st & mu_tm).sum()))
v1 = v0 & mu_st & mu_tm

min_st = int(jnp.min(jnp.where(v1, best_st, 1 << 30)))
min_tm = int(jnp.min(jnp.where(v1, best_tm, 1 << 30)))
print("  min_dist stereo:", min_st, "-> thr", max(2 * min_st, 30),
      " min_dist temporal:", min_tm, "-> thr", max(2 * min_tm, 30))
# distance histograms of surviving
bs = np.asarray(jnp.where(v1, best_st, -1))
bt = np.asarray(jnp.where(v1, best_tm, -1))
print("  stereo dist percentiles (valid):",
      np.percentile(bs[bs >= 0], [10, 25, 50, 75, 90]).astype(int))
print("  temporal dist percentiles (valid):",
      np.percentile(bt[bt >= 0], [10, 25, 50, 75, 90]).astype(int))

g_st = match.reference_distance_gate(best_st, v1)
g_tm = match.reference_distance_gate(best_tm, v1)
print("stage2 dist-gate stereo:", int(g_st.sum()),
      " temporal:", int(g_tm.sum()), " both:", int((g_st & g_tm).sum()))
v2 = g_st & g_tm

y_l = f1l["xy"][:, 1]; y_r = f1r["xy"][idx_r, 1]
epi = jnp.abs(y_l - y_r) < 2.0
x_l = f1l["xy"][:, 0]; x_r = f1r["xy"][idx_r, 0]
disp = (x_l - x_r) > 0.0
print("stage3 epipolar:", int((v2 & epi).sum()), " +disparity:",
      int((v2 & epi & disp).sum()))

# What does the full function report?
assoc = match.stereo_temporal_match(f1l, f1r, f2l)
print("full stereo_temporal_match valid:", int(assoc["valid"].sum()))

print("\n--- variants ---")
for label, use_mutual, floor in [("no-mutual floor30", False, 30.0),
                                 ("no-mutual floor50", False, 50.0),
                                 ("mutual floor50", True, 50.0),
                                 ("no-mutual floor64", False, 64.0)]:
    a = match.stereo_temporal_match(f1l, f1r, f2l, dist_floor=floor,
                                    use_mutual=use_mutual)
    print(f"{label}: {int(a['valid'].sum())}")

# Duplicate-keypoint diagnosis: how many t1l keypoints are within 2px of
# another t1l keypoint (cross-level duplicates)?
xy = np.asarray(f1l["xy"])
d2 = np.sum((xy[:, None] - xy[None]) ** 2, -1)
np.fill_diagonal(d2, 1e9)
print("t1l kp with a <2px neighbor:", int((d2.min(1) < 4.0).sum()), "/ 2048")
lvl = np.asarray(f1l["level"])
print("level histogram:", np.bincount(lvl, minlength=8))
