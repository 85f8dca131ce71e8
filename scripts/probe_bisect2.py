"""Post-PnP-fix bisect: ORB (extract/match/pnp) and LK (track/pnp) splits."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from stereo_visual_odometry_tpu.ops import orb, match, pnp, triangulate, fast, select, lk, pyramid
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

def run(chunk, args, tag):
    out = jax.block_until_ready(chunk(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(chunk(*args))
    print(f"[{tag:16s}] {(time.perf_counter()-t0)/T*1e3:.3f} ms/frame", flush=True)

# ---- ORB: extract+match vs +pnp ---- #
def make_orb(upto):
    def step(carry, xs):
        fl_prev, fr_prev, key, acc = carry
        img_l, img_r = xs
        fl, fr = orb.detect_and_describe_pair(img_l, img_r, **kw)
        assoc = match.stereo_temporal_match(fl_prev, fr_prev, fl)
        out = jnp.sum(assoc["idx_r"]) + jnp.sum(fl["desc"].astype(jnp.float32))
        if upto >= 2:
            xy_l = fl_prev["xy"]; xy_r = fr_prev["xy"][assoc["idx_r"]]
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
        carry, outs = jax.lax.scan(step, (fl0, fr0, key, jnp.float32(0.0)), (ils, irs))
        return outs
    return chunk

fl0, fr0 = orb.detect_and_describe_pair(il[0], ir[0], **kw)
key = jax.random.PRNGKey(0)
run(make_orb(1), (fl0, fr0, key, il[1:T+1], ir[1:T+1]), "orb ext+match")
run(make_orb(2), (fl0, fr0, key, il[1:T+1], ir[1:T+1]), "orb + pnp")

# ---- LK: pyr+detect+track vs +pnp ---- #
N = 1024
def detect(img):
    score = fast.detect(img, 20.0)
    xy, sc, valid = select.grid_top_k(score, N, cell=32, k_per_cell=8)
    return select.subpixel_refine(score, xy, valid), valid

def make_lk(upto):
    def step(carry, xs):
        pyr_l, pyr_r, kp, kpv, Tp, key, acc = carry
        img_l, img_r = xs
        pc_l = tuple(pyramid.build_pyramid(img_l, 4))
        pc_r = tuple(pyramid.build_pyramid(img_r, 4))
        quad = lk.circular_track((pyr_l, pyr_r, pc_r, pc_l), kp, kpv,
                                 win=21, levels=3, iters=30, use_pallas=True,
                                 rig=rig, T_pred=Tp, use_sweep=True,
                                 stereo_levels=1, temporal_levels=2)
        out = jnp.sum(quad["t2l"]) + jnp.sum(quad["valid"])
        Tn = Tp
        if upto >= 2:
            pts3d, tri_ok = triangulate.stereo_depth_closed_form(rig, quad["t1l"], quad["t1r"])
            corr = quad["valid"] & tri_ok & (pts3d[:, 2] > 0.5) & (pts3d[:, 2] < 200.0)
            key, sub = jax.random.split(key)
            res = pnp.ransac_pnp(rig.left, pts3d, quad["t2l"], corr, sub,
                                 num_hypotheses=256, inlier_px=2.0, refine_iters=6,
                                 T_init=Tp)
            out = out + res["T"][0, 3]
            Tn = res["T"]
        xy, v = detect(img_l)
        return (pc_l, pc_r, xy, v, Tn, key, acc + out), out
    @jax.jit
    def chunk(pyr_l, pyr_r, kp, kpv, key, ils, irs):
        carry = (pyr_l, pyr_r, kp, kpv, jnp.eye(4, dtype=jnp.float32), key, jnp.float32(0.0))
        carry, outs = jax.lax.scan(step, carry, (ils, irs))
        return outs
    return chunk

pyr_l0 = tuple(pyramid.build_pyramid(il[0], 4))
pyr_r0 = tuple(pyramid.build_pyramid(ir[0], 4))
kp0, v0 = detect(il[0])
args = (pyr_l0, pyr_r0, kp0, v0, key, il[1:T+1], ir[1:T+1])
run(make_lk(1), args, "lk pyr+det+track")
run(make_lk(2), args, "lk + pnp")
