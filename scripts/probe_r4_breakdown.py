"""Round-4 stage attribution for the production LK step on hardware.

Times, each as an 8-frame on-device scan (amortized dispatch):
  full step | circular_track(prod cfg) | disparity sweeps | pyramids |
  detect+topk+subpixel | triangulate | ransac_pnp
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from stereo_visual_odometry_tpu.models import frontend
from stereo_visual_odometry_tpu.ops import fast, lk, pnp, pyramid, select, triangulate, stereo_sweep
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


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps / T * 1e3
    print(f"{name:30s} {dt:7.3f} ms/frame")
    return dt


# --- full production step ------------------------------------------------- #
cfg = frontend.VOConfig(mode="lk", height=H, width=W, max_features=N,
                        num_hypotheses=256, refine_iters=6)
init_fn, chunk_fn = frontend.make_chunked_frontend(cfg, rig)
state = init_fn(il[0], ir[0], jax.random.PRNGKey(0))
jax.block_until_ready(state["T_wc"])
full = timeit("full step", lambda: chunk_fn(state, il[1:1+T], ir[1:1+T]))

# --- circular track alone (prod predictive+sweep config) ------------------ #
pyr_l0 = tuple(pyramid.build_pyramid(il[0], 4))
pyr_r0 = tuple(pyramid.build_pyramid(ir[0], 4))
score = fast.detect(il[0], 20.0)
kp, sc, valid = select.grid_top_k(score, N, cell=32, k_per_cell=8)
Tpred = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(1.1)


@jax.jit
def scan_track(kp, valid, ils, irs):
    def body(carry, xs):
        pl_, pr_ = carry
        img_l, img_r = xs
        pc_l = tuple(pyramid.build_pyramid(img_l, 4))
        pc_r = tuple(pyramid.build_pyramid(img_r, 4))
        quad = lk.circular_track((pl_, pr_, pc_r, pc_l), kp, valid,
                                 win=21, levels=3, iters=30, use_pallas=True,
                                 rig=rig, T_pred=Tpred, use_sweep=True,
                                 sweep_d_max=48, stereo_levels=1,
                                 temporal_levels=2)
        return (pc_l, pc_r), quad["t2l"][0, 0]
    _, accs = jax.lax.scan(body, (pyr_l0, pyr_r0), (ils, irs))
    return accs

trk = timeit("pyramid+sweep+track", scan_track, kp, valid, il[1:1+T], ir[1:1+T])


@jax.jit
def scan_pyr(ils, irs):
    def body(c, xs):
        img_l, img_r = xs
        pc_l = tuple(pyramid.build_pyramid(img_l, 4))
        pc_r = tuple(pyramid.build_pyramid(img_r, 4))
        return c, pc_l[3][0, 0] + pc_r[3][0, 0]
    return jax.lax.scan(body, 0.0, (ils, irs))[1]

timeit("2x pyramid", scan_pyr, il[1:1+T], ir[1:1+T])


@jax.jit
def scan_sweep(ils, irs):
    def body(c, xs):
        img_l, img_r = xs
        pl2 = pyramid.build_pyramid(img_l, 3)[2]
        pr2 = pyramid.build_pyramid(img_r, 3)[2]
        dmap = stereo_sweep.disparity_sweep(pl2, pr2, d_max=48)
        return c, dmap[0, 0]
    return jax.lax.scan(body, 0.0, (ils, irs))[1]

timeit("1x sweep (+pyr to L2)", scan_sweep, il[1:1+T], ir[1:1+T])


@jax.jit
def scan_det(ils):
    def body(c, img_l):
        score = fast.detect(img_l, 20.0)
        xy, sc, v = select.grid_top_k(score, N, cell=32, k_per_cell=8)
        xy = select.subpixel_refine(score, xy, v)
        return c, xy[0, 0]
    return jax.lax.scan(body, 0.0, ils)[1]

timeit("detect+topk+subpix", scan_det, il[1:1+T])

pts3d = rig.left.unproject(kp, jnp.full((N,), 10.0))
obs = rig.left.project(pts3d)


@jax.jit
def scan_pnp(pts3d, obs, valid, keys):
    def body(c, key):
        res = pnp.ransac_pnp(rig.left, pts3d, obs, valid, key,
                             num_hypotheses=256, inlier_px=2.0, refine_iters=6,
                             T_init=jnp.eye(4, dtype=jnp.float32))
        return c, res["T"][0, 3]
    return jax.lax.scan(body, 0.0, keys)[1]

keys = jax.random.split(jax.random.PRNGKey(1), T)
timeit("ransac_pnp 256x6", scan_pnp, pts3d, obs, valid, keys)


@jax.jit
def scan_tri(a, b):
    def body(c, _):
        p, ok = triangulate.stereo_depth_closed_form(rig, a, b)
        return c, p[0, 0]
    return jax.lax.scan(body, 0.0, jnp.arange(T))[1]

timeit("triangulate", scan_tri, kp, kp - jnp.array([24.0, 0.0]))

# --- per-leg track cost: stereo leg (1 level) vs temporal leg (2 levels) -- #
pyr_l1 = tuple(pyramid.build_pyramid(il[1], 4))
pyr_r1 = tuple(pyramid.build_pyramid(ir[1], 4))
d0 = jnp.full((N,), 24.0)
g1 = jnp.stack([-d0, jnp.zeros_like(d0)], axis=-1)


from functools import partial


@partial(jax.jit, static_argnums=(0,))
def scan_leg(levels, g, pyr_a, pyr_b):
    def body(c, _):
        p, ok = lk.track(pyr_a, pyr_b, kp, init_flow=g, active=valid,
                         levels=levels, win=21, iters=30, use_pallas=True)
        return c, p[0, 0]
    return jax.lax.scan(body, 0.0, jnp.arange(T))[1]

timeit("1 leg, 1 level (stereo)", lambda: scan_leg(1, g1, pyr_l0, pyr_r0))
timeit("1 leg, 2 levels (temporal)", lambda: scan_leg(2, jnp.zeros((N, 2)), pyr_l0, pyr_l1))
print(f"full={full:.3f} trk={trk:.3f}")
