"""Compare our ORB association yield vs cv2 ORB on the same frames."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import cv2
import jax.numpy as jnp
import numpy as np

from stereo_visual_odometry_tpu.ops import orb, match
from stereo_visual_odometry_tpu.utils import synthetic

H_RAW, W_RAW = 376, 1241
seq = synthetic.render_sequence(n_frames=3, h=H_RAW, w=W_RAW, fx=718.856,
                                baseline=0.537, n_points=9000, speed=1.1, seed=3)
il = seq["images_l"].astype(np.uint8)
ir = seq["images_r"].astype(np.uint8)

# --- cv2 reproduction (bench_reference_cpu_orb association) ---
ocv = cv2.ORB_create(nfeatures=2000, scaleFactor=1.2, nlevels=8)
bf = cv2.BFMatcher(cv2.NORM_HAMMING)
kp_l, des_l = ocv.detectAndCompute(il[0], None)
kp_r, des_r = ocv.detectAndCompute(ir[0], None)
kp_l2, des_l2 = ocv.detectAndCompute(il[1], None)
print("cv2 kp counts:", len(kp_l), len(kp_r), len(kp_l2))
m_st = bf.match(des_l, des_r)
m_tm = bf.match(des_l, des_l2)
st_d = np.array([m.distance for m in m_st])
tm_d = np.array([m.distance for m in m_tm])
print("cv2 stereo dist pct:", np.percentile(st_d, [10, 25, 50, 75, 90]).astype(int),
      "min", int(st_d.min()))
print("cv2 temporal dist pct:", np.percentile(tm_d, [10, 25, 50, 75, 90]).astype(int))
tm = {m.queryIdx: m for m in m_tm}
# reference gate: max(2*min, 30) in both + |dy|<2
thr_st = max(2 * st_d.min(), 30)
thr_tm = max(2 * tm_d.min(), 30)
n_keep = 0
for m in m_st:
    if m.queryIdx in tm and m.distance <= thr_st and tm[m.queryIdx].distance <= thr_tm:
        dy = abs(kp_l[m.queryIdx].pt[1] - kp_r[m.trainIdx].pt[1])
        if dy < 2.0:
            n_keep += 1
print(f"cv2 reference-gate survivors: {n_keep}  (thr_st={thr_st}, thr_tm={thr_tm})")
# bench gate (dist<=50):
n50 = sum(1 for m in m_st if m.queryIdx in tm and m.distance <= 50)
print("cv2 bench-gate (<=50, both matched):", n50)

# --- ours: correctness of temporal matches (flow magnitude sanity) ---
pad = lambda a: np.pad(a, ((0, 0), (0, 384 - H_RAW), (0, 1280 - W_RAW)), mode="edge")
ilp, irp = pad(seq["images_l"]), pad(seq["images_r"])
f1l, f1r = orb.detect_and_describe_pair(jnp.asarray(ilp[0], jnp.float32),
                                        jnp.asarray(irp[0], jnp.float32),
                                        n_features=2048)
f2l, _ = orb.detect_and_describe_pair(jnp.asarray(ilp[1], jnp.float32),
                                      jnp.asarray(irp[1], jnp.float32),
                                      n_features=2048)
d_tm = match.hamming_matrix(f1l["desc"], f2l["desc"], f1l["valid"], f2l["valid"])
idx_t, best_tm = match.match_best(d_tm)
v = f1l["valid"]
flow = np.asarray(f2l["xy"])[np.asarray(idx_t)] - np.asarray(f1l["xy"])
fm = np.linalg.norm(flow, axis=1)[np.asarray(v)]
print("our temporal-match flow magnitude pct:",
      np.percentile(fm, [10, 25, 50, 75, 90]).astype(int),
      " (speed 1.1 m fwd -> expect mostly <40 px)")
bt = np.asarray(best_tm)[np.asarray(v)]
plaus = fm < 40
print(f"plausible-flow fraction: {plaus.mean():.2f};"
      f" dist pct | plausible: {np.percentile(bt[plaus], [25, 50, 75]).astype(int)}"
      f" | implausible: {np.percentile(bt[~plaus], [25, 50, 75]).astype(int)}")
