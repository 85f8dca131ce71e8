"""Isolate why pallas calls are slow when image operands change per scan step."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from stereo_visual_odometry_tpu.ops import lk_pallas_cell

H, W = 384, 1280
N = 1024
R = 16
rng = np.random.default_rng(7)
img = jnp.asarray(rng.random((H, W)).astype(np.float32) * 255)
pts = jnp.asarray(np.stack([rng.uniform(30, W - 30, N), rng.uniform(30, H - 30, N)], -1).astype(np.float32))
guess = jnp.zeros_like(pts)
pad = 12
pads = ((pad, pad + (-(H + 2 * pad)) % 8), (pad, pad + (-(W + 2 * pad)) % 128))
ipad = jnp.pad(img, pads, mode="edge")
fn = lk_pallas_cell.level_track_pallas_cell

def timeit(f, args, tag, reps=R):
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"[{tag}] {dt:.3f} ms/iter", flush=True)

# 1: loop-invariant images
@jax.jit
def chain_inv(ip, pts, guess):
    def body(i, g):
        flow, ok = fn(ip, ip, pts, g, win=21, iters=30, search_radius=6, pad=pad)
        return guess + 1e-30 * flow
    return jax.lax.fori_loop(0, R, body, guess)
timeit(chain_inv, (ipad, pts, guess), "invariant imgs")

# 2: images change per iteration (cheap elementwise update)
@jax.jit
def chain_var(ip, pts, guess):
    def body(i, carry):
        g, im = carry
        flow, ok = fn(im, im, pts, g, win=21, iters=30, search_radius=6, pad=pad)
        return (guess + 1e-30 * flow, im + 1.0)
    g, im = jax.lax.fori_loop(0, R, body, (guess, ip))
    return g
timeit(chain_var, (ipad, pts, guess), "varying imgs ")

# 3: varying images, NO pallas call — just a reduction of the image
@jax.jit
def chain_novar(ip, pts, guess):
    def body(i, carry):
        g, im = carry
        s = jnp.sum(im) * 1e-30
        return (g + s, im + 1.0)
    g, im = jax.lax.fori_loop(0, R, body, (guess, ip))
    return g
timeit(chain_novar, (ipad, pts, guess), "no pallas    ")

# 4: varying images + edge pad per iteration + pallas
@jax.jit
def chain_pad(img, pts, guess):
    def body(i, carry):
        g, im = carry
        ip2 = jnp.pad(im, pads, mode="edge")
        flow, ok = fn(ip2, ip2, pts, g, win=21, iters=30, search_radius=6, pad=pad)
        return (guess + 1e-30 * flow, im + 1.0)
    g, im = jax.lax.fori_loop(0, R, body, (guess, img))
    return g
timeit(chain_pad, (img, pts, guess), "pad + pallas ")
