"""Direct timing: per-dispatch and chained, with output value checks."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from stereo_visual_odometry_tpu.ops import lk_pallas_cell
import lk_pallas_block  # archived kernel, lives in scripts/

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
eh = (-(H + 2 * pad)) % 8
ew = (-(W + 2 * pad)) % 128
pads = ((pad, pad + eh), (pad, pad + ew))
ip = jnp.pad(jnp.asarray(img0), pads, mode="edge")
inx = jnp.pad(jnp.asarray(img1), pads, mode="edge")
ptsj = jnp.asarray(pts)
guess = jnp.zeros_like(ptsj)

def bench(fn, tag, reps=10):
    flow, ok = jax.block_until_ready(fn(ip, inx, ptsj, guess, win=21, iters=30,
                                        search_radius=6, pad=pad))
    t0 = time.perf_counter()
    for _ in range(reps):
        flow, ok = fn(ip, inx, ptsj, guess, win=21, iters=30,
                      search_radius=6, pad=pad)
    jax.block_until_ready(flow)
    dt = (time.perf_counter() - t0) / reps
    print(f"[{tag}] {dt*1e3:.3f} ms/dispatch  flow[0]={np.asarray(flow)[0]}, ok={np.asarray(ok).mean():.2f}", flush=True)

# empty-dispatch reference: measures pure roundtrip
@jax.jit
def nothing(x):
    return x + 1.0
jax.block_until_ready(nothing(ptsj))
t0 = time.perf_counter()
for _ in range(10):
    o = nothing(ptsj)
jax.block_until_ready(o)
print(f"[roundtrip] {(time.perf_counter()-t0)/10*1e3:.3f} ms", flush=True)

bench(lk_pallas_cell.level_track_pallas_cell, "cell")
bench(lk_pallas_block.level_track_pallas_block, "block")
