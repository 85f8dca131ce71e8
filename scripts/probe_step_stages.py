"""On-device stage attribution for the LK step inside the production scan.

Rebuilds the step from ops pieces; toggles each stage off to get its
marginal cost. All variants scan 8 frames in one dispatch.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from stereo_visual_odometry_tpu.ops import fast, lk, pnp, pyramid, select, triangulate, se3
from stereo_visual_odometry_tpu.ops.camera import StereoRig
from stereo_visual_odometry_tpu.utils import synthetic

H, W = 384, 1280
N = 1024
T = 8
seq = synthetic.render_sequence(n_frames=T + 2, h=376, w=1241, fx=718.856,
                                baseline=0.537, n_points=9000, speed=1.1, seed=3)
padf = lambda a: np.pad(a, ((0, 0), (0, H - 376), (0, W - 1241)), mode="edge")
il = jnp.asarray(padf(seq["images_l"]), jnp.float32)
ir = jnp.asarray(padf(seq["images_r"]), jnp.float32)
rig = StereoRig.kitti(fx=718.856, fy=718.856, cx=1241 / 2, cy=376 / 2, baseline=0.537)

def detect(img):
    score = fast.detect(img, 20.0)
    xy, sc, valid = select.grid_top_k(score, N, cell=32, k_per_cell=8)
    xy = select.subpixel_refine(score, xy, valid)
    return xy, valid

def make_chunk(stages):
    pyr_on = "pyr" in stages
    det_on = "det" in stages
    lk_on = "lk" in stages
    tri_on = "tri" in stages
    pnp_on = "pnp" in stages

    def step(carry, xs):
        pyr_l, pyr_r, kp, kp_valid, key, acc = carry
        img_l, img_r = xs
        if pyr_on:
            pc_l = tuple(pyramid.build_pyramid(img_l, 4))
            pc_r = tuple(pyramid.build_pyramid(img_r, 4))
        else:
            pc_l, pc_r = pyr_l, pyr_r
        if lk_on:
            quad = lk.circular_track((pyr_l, pyr_r, pc_r, pc_l), kp, kp_valid,
                                     win=21, levels=3, iters=30, use_pallas=True)
        else:
            quad = {"t1l": kp, "t1r": kp + 1.0, "t2r": kp + 1.0, "t2l": kp + 0.5,
                    "valid": kp_valid}
        if tri_on:
            pts3d, tri_ok = triangulate.stereo_depth_closed_form(rig, quad["t1l"], quad["t1r"])
            corr_valid = quad["valid"] & tri_ok & (pts3d[:, 2] > 0.5) & (pts3d[:, 2] < 200.0)
        else:
            pts3d = jnp.concatenate([quad["t1l"], jnp.ones((N, 1))], axis=1)
            corr_valid = quad["valid"]
        key, sub = jax.random.split(key)
        if pnp_on:
            res = pnp.ransac_pnp(rig.left, pts3d, quad["t2l"], corr_valid, sub,
                                 num_hypotheses=256, inlier_px=2.0, refine_iters=6,
                                 T_init=jnp.eye(4, dtype=jnp.float32))
            Tm = res["T"]
        else:
            Tm = jnp.eye(4, dtype=jnp.float32) + 1e-30 * pts3d[0, 0]
        if det_on:
            xy, det_valid = detect(img_l)
        else:
            xy, det_valid = kp, kp_valid
        acc = acc + Tm[0, 3] + jnp.sum(xy[0]) + quad["t2l"][0, 0]
        return (pc_l, pc_r, xy, det_valid, key, acc), acc

    @jax.jit
    def chunk(pyr_l, pyr_r, kp, kp_valid, key, ils, irs):
        carry = (pyr_l, pyr_r, kp, kp_valid, key, jnp.float32(0.0))
        carry, accs = jax.lax.scan(step, carry, (ils, irs))
        return accs

    return chunk

pyr_l0 = tuple(pyramid.build_pyramid(il[0], 4))
pyr_r0 = tuple(pyramid.build_pyramid(ir[0], 4))
kp0, v0 = detect(il[0])
key = jax.random.PRNGKey(0)
args = (pyr_l0, pyr_r0, kp0, v0, key, il[1:T+1], ir[1:T+1])

ALL = ("pyr", "det", "lk", "tri", "pnp")
results = {}
for drop in (None,) + ALL:
    stages = tuple(s for s in ALL if s != drop)
    chunk = make_chunk(stages)
    out = jax.block_until_ready(chunk(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(chunk(*args))
    dt = (time.perf_counter() - t0) / T * 1e3
    tag = "FULL" if drop is None else f"-{drop}"
    results[tag] = dt
    print(f"[{tag:5s}] {dt:.3f} ms/frame", flush=True)
full = results["FULL"]
for s in ALL:
    print(f"marginal {s}: {full - results['-' + s]:.3f} ms/frame", flush=True)
