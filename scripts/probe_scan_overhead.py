"""Is lax.scan/fori_loop wrapping the slowdown? Compare:
A. dependent direct dispatches of one cell level call (block each)
B. fori_loop(20) of the same dependent calls, one dispatch
C. full LK frontend step: per-frame direct dispatch vs 8-frame chunked scan
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from stereo_visual_odometry_tpu.ops import lk_pallas_cell

H, W = 384, 1280
N = 1024
rng = np.random.default_rng(7)
base = rng.random((H + 64, W + 64)).astype(np.float32) * 255
for _ in range(3):
    base = (base + np.roll(base, 1, 0) + np.roll(base, -1, 0)) / 3
    base = (base + np.roll(base, 1, 1) + np.roll(base, -1, 1)) / 3
img0 = base[32:32 + H, 32:32 + W]
img1 = base[30:30 + H, 29:29 + W]
pts = np.stack([rng.uniform(30, W - 30, N), rng.uniform(30, H - 30, N)], -1).astype(np.float32)
pad = 12
pads = ((pad, pad + (-(H + 2 * pad)) % 8), (pad, pad + (-(W + 2 * pad)) % 128))
ip = jnp.pad(jnp.asarray(img0), pads, mode="edge")
inx = jnp.pad(jnp.asarray(img1), pads, mode="edge")
ptsj = jnp.asarray(pts)
guess = jnp.zeros_like(ptsj)
fn = lk_pallas_cell.level_track_pallas_cell

# A: dependent direct dispatches, block each
g = guess
flow, ok = jax.block_until_ready(fn(ip, inx, ptsj, g, win=21, iters=30, search_radius=6, pad=pad))
t0 = time.perf_counter()
for _ in range(20):
    flow, ok = fn(ip, inx, ptsj, g, win=21, iters=30, search_radius=6, pad=pad)
    g = guess + 1e-30 * flow
    jax.block_until_ready(flow)
dt = (time.perf_counter() - t0) / 20
print(f"[A direct dependent blocked] {dt*1e3:.3f} ms/call", flush=True)

# B: fori_loop in one dispatch
@jax.jit
def chain(ip, inx, pts, guess):
    def body(i, g):
        flow, ok = fn(ip, inx, pts, g, win=21, iters=30, search_radius=6, pad=pad)
        return guess + 1e-30 * flow
    return jax.lax.fori_loop(0, 20, body, guess)
jax.block_until_ready(chain(ip, inx, ptsj, guess))
t0 = time.perf_counter()
jax.block_until_ready(chain(ip, inx, ptsj, guess))
dt = (time.perf_counter() - t0) / 20
print(f"[B fori_loop(20) one dispatch] {dt*1e3:.3f} ms/call", flush=True)

# B2: unrolled 20 calls in one jit (no loop construct)
@jax.jit
def unrolled(ip, inx, pts, guess):
    g = guess
    for _ in range(20):
        flow, ok = fn(ip, inx, pts, g, win=21, iters=30, search_radius=6, pad=pad)
        g = guess + 1e-30 * flow
    return g
jax.block_until_ready(unrolled(ip, inx, ptsj, guess))
t0 = time.perf_counter()
jax.block_until_ready(unrolled(ip, inx, ptsj, guess))
dt = (time.perf_counter() - t0) / 20
print(f"[B2 unrolled(20) one dispatch] {dt*1e3:.3f} ms/call", flush=True)

# C: full LK frontend, per-frame dispatch vs chunked scan
from stereo_visual_odometry_tpu.models import frontend
from stereo_visual_odometry_tpu.ops.camera import StereoRig
from stereo_visual_odometry_tpu.utils import synthetic

seq = synthetic.render_sequence(n_frames=18, h=376, w=1241, fx=718.856,
                                baseline=0.537, n_points=9000, speed=1.1, seed=3)
padf = lambda a: np.pad(a, ((0, 0), (0, H - 376), (0, W - 1241)), mode="edge")
il, ir = padf(seq["images_l"]), padf(seq["images_r"])
rig = StereoRig.kitti(fx=718.856, fy=718.856, cx=1241 / 2, cy=376 / 2, baseline=0.537)
cfg = frontend.VOConfig(mode="lk", height=H, width=W, max_features=N,
                        num_hypotheses=256, refine_iters=6,
                        min_inlier_rate=0.3, min_features_track=8)
init_fn, step_fn = frontend.make_frontend(cfg, rig)
l_all = jax.device_put(jnp.asarray(il))
r_all = jax.device_put(jnp.asarray(ir))
state = init_fn(l_all[0], r_all[0], jax.random.PRNGKey(0))
state, m = step_fn(state, l_all[1], r_all[1])
jax.block_until_ready(state["T_wc"])
t0 = time.perf_counter()
nstep = 0
for i in range(2, 18):
    state, m = step_fn(state, l_all[i], r_all[i])
    nstep += 1
jax.block_until_ready(state["T_wc"])
dt = (time.perf_counter() - t0) / nstep
print(f"[C per-frame dispatch LK step] {dt*1e3:.3f} ms/frame ({1/dt:.1f} fps)", flush=True)
