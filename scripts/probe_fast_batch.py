"""Is fewer-bigger the right call for FAST on this backend?"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from stereo_visual_odometry_tpu.ops import fast

rng = np.random.default_rng(0)
H, W = 384, 1280
shapes = [(384, 1280), (320, 1067), (267, 889), (222, 741),
          (185, 617), (154, 514), (129, 428), (107, 357)]
imgs = [jnp.asarray(rng.random(s).astype(np.float32) * 255) for s in shapes]
atlas = jnp.asarray(rng.random((1728, 1280)).astype(np.float32) * 255)
batch = jnp.asarray(rng.random((8, H, W)).astype(np.float32) * 255)

R = 10
def timeit(f, args, tag):
    o = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    o = jax.block_until_ready(f(*args))
    print(f"[{tag}] {(time.perf_counter()-t0)/R*1e3:.3f} ms/iter", flush=True)

@jax.jit
def per_level(*imgs):
    def body(i, acc):
        s = 0.0
        for im in imgs:
            s = s + jnp.sum(fast.detect(im + acc * 1e-30, 7.0))
        return s
    return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
timeit(per_level, imgs, "8 per-level passes")

@jax.jit
def atlas_pass(a):
    def body(i, acc):
        return jnp.sum(fast.detect(a + acc * 1e-30, 7.0))
    return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
timeit(atlas_pass, (atlas,), "1 atlas (1728x1280)")

@jax.jit
def batched(b):
    def body(i, acc):
        s = jax.vmap(lambda im: fast.fast_score(im, 7.0))(b + acc * 1e-30)
        # batched separable NMS (no reduce_window)
        m = s
        for ax in (1, 2):
            m = jnp.maximum(jnp.maximum(m, jnp.roll(m, 1, axis=ax)), jnp.roll(m, -1, axis=ax))
        s = jnp.where((s >= m) & (s > 0), s, 0.0)
        return jnp.sum(s)
    return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
timeit(batched, (batch,), "1 batched (8,384,1280)")
