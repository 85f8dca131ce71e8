"""Cumulative bisect of the ORB step inside the real chunked scan."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from stereo_visual_odometry_tpu.ops import orb, match, pnp, se3, triangulate
from stereo_visual_odometry_tpu.ops.camera import StereoRig
from stereo_visual_odometry_tpu.utils import synthetic

H, W = 384, 1280
T = 8
seq = synthetic.render_sequence(n_frames=T + 2, h=376, w=1241, fx=718.856,
                                baseline=0.537, n_points=9000, speed=1.1, seed=3)
padf = lambda a: np.pad(a, ((0, 0), (0, H - 376), (0, W - 1241)), mode="edge")
il = jnp.asarray(padf(seq["images_l"]), jnp.float32)
ir = jnp.asarray(padf(seq["images_r"]), jnp.float32)
rig = StereoRig.kitti(fx=718.856, fy=718.856, cx=1241/2, cy=376/2, baseline=0.537)
kw = dict(n_features=2048, levels=8, scale_factor=1.2, ini_th=20.0, min_th=7.0,
          cell=32, k_per_cell=8)

def make_chunk(upto):
    def step(carry, xs):
        fl_prev, fr_prev, key, acc = carry
        img_l, img_r = xs
        fl, fr = orb.detect_and_describe_pair(img_l, img_r, **kw)
        out = jnp.sum(fl["xy"]) + jnp.sum(fl["desc"].astype(jnp.float32))
        if upto >= 2:
            assoc = match.stereo_temporal_match(fl_prev, fr_prev, fl)
            out = out + jnp.sum(assoc["idx_r"]) + jnp.sum(assoc["valid"])
        if upto >= 3:
            xy_l = fl_prev["xy"]
            xy_r = fr_prev["xy"][assoc["idx_r"]]
            xy_cur = fl["xy"][assoc["idx_t2l"]]
            pts3d, tri_ok = triangulate.stereo_depth_closed_form(rig, xy_l, xy_r)
            corr = assoc["valid"] & tri_ok & (pts3d[:, 2] > 0.5) & (pts3d[:, 2] < 200.0)
            key, sub = jax.random.split(key)
            res = pnp.ransac_pnp(rig.left, pts3d, xy_cur, corr, sub,
                                 num_hypotheses=256, inlier_px=2.0, refine_iters=6,
                                 T_init=jnp.eye(4, dtype=jnp.float32))
            out = out + res["T"][0, 3]
        return (fl, fr, key, acc + out), out

    @jax.jit
    def chunk(fl0, fr0, key, ils, irs):
        carry = (fl0, fr0, key, jnp.float32(0.0))
        carry, outs = jax.lax.scan(step, carry, (ils, irs))
        return outs
    return chunk

fl0, fr0 = orb.detect_and_describe_pair(il[0], ir[0], **kw)
key = jax.random.PRNGKey(0)
for upto, tag in ((1, "extract only"), (2, "+ match"), (3, "+ tri/pnp")):
    chunk = make_chunk(upto)
    out = jax.block_until_ready(chunk(fl0, fr0, key, il[1:T+1], ir[1:T+1]))
    t0 = time.perf_counter()
    out = jax.block_until_ready(chunk(fl0, fr0, key, il[1:T+1], ir[1:T+1]))
    print(f"[{tag:13s}] {(time.perf_counter()-t0)/T*1e3:.3f} ms/frame", flush=True)
