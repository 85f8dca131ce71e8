"""Hardware probe: block kernel (v3) vs cell kernel — compile, parity, timing.

Times one LK level (384x1280, 1024 pts) with an on-device rep chain so the
~28 ms tunnel dispatch latency doesn't swamp the number.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from stereo_visual_odometry_tpu.ops import lk_pallas_cell
import lk_pallas_block  # archived kernel, lives in scripts/

H, W = 384, 1280
N = 1024
R = 20
rng = np.random.default_rng(7)
base = rng.random((H + 64, W + 64)).astype(np.float32) * 255
# smooth it a bit (separable box blur x3) for realistic gradients
for _ in range(3):
    base = (base + np.roll(base, 1, 0) + np.roll(base, -1, 0)) / 3
    base = (base + np.roll(base, 1, 1) + np.roll(base, -1, 1)) / 3
img0 = base[32:32 + H, 32:32 + W]
img1 = base[30:30 + H, 29:29 + W]  # shift (2, 3)
pts = np.stack([rng.uniform(30, W - 30, N), rng.uniform(30, H - 30, N)], -1).astype(np.float32)

pad = 12
eh = (-(H + 2 * pad)) % 8
ew = (-(W + 2 * pad)) % 128
pads = ((pad, pad + eh), (pad, pad + ew))
ip = jnp.pad(jnp.asarray(img0), pads, mode="edge")
inx = jnp.pad(jnp.asarray(img1), pads, mode="edge")
ptsj = jnp.asarray(pts)
guess = jnp.zeros_like(ptsj)

def timed(fn, tag):
    @partial(jax.jit, static_argnames=())
    def chain(ip, inx, pts, guess):
        def body(i, carry):
            g, acc = carry
            flow, ok = fn(ip, inx, pts, g, win=21, iters=30,
                          search_radius=6, pad=pad)
            return g + 0e-20 * flow, acc + flow
        g, acc = jax.lax.fori_loop(0, R, body, (guess, jnp.zeros_like(guess)))
        return acc
    t0 = time.perf_counter()
    out = jax.block_until_ready(chain(ip, inx, ptsj, guess))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = jax.block_until_ready(chain(ip, inx, ptsj, guess))
    dt = time.perf_counter() - t0
    print(f"[{tag}] compile+1st: {t_compile:.1f}s; {R} reps: {dt*1e3:.1f} ms "
          f"=> {dt/R*1e3:.3f} ms/level-call", flush=True)
    return out / R

f_cell, ok_cell = lk_pallas_cell.level_track_pallas_cell(
    ip, inx, ptsj, guess, win=21, iters=30, search_radius=6, pad=pad)
f_blk, ok_blk = lk_pallas_block.level_track_pallas_block(
    ip, inx, ptsj, guess, win=21, iters=30, search_radius=6, pad=pad)
f_cell, ok_cell, f_blk, ok_blk = map(np.asarray, (f_cell, ok_cell, f_blk, ok_blk))
both = ok_cell & ok_blk
d = np.linalg.norm(f_cell[both] - f_blk[both], axis=1)
print(f"[parity] ok_cell={ok_cell.mean():.3f} ok_blk={ok_blk.mean():.3f} "
      f"max|flow diff|={d.max():.2e} (n={both.sum()})", flush=True)
err = np.linalg.norm(f_blk[both] - [3.0, 2.0], axis=1)
print(f"[truth] median err vs (3,2): {np.median(err):.3f}", flush=True)

timed(lk_pallas_cell.level_track_pallas_cell, "cell")
timed(lk_pallas_block.level_track_pallas_block, "block")
