"""What is the ~0.9 ms/frame floor in every scanned program?"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

H, W, T = 384, 1280, 8
il = jnp.asarray(np.random.rand(T, H, W).astype(np.float32))
ir = jnp.asarray(np.random.rand(T, H, W).astype(np.float32))


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps / T * 1e3
    print(f"{name:30s} {dt:7.3f} ms/frame")


@jax.jit
def scan_empty(x):
    def body(c, _):
        return c, c
    return jax.lax.scan(body, 0.0, jnp.arange(T))[1]

timeit("empty scan", scan_empty, 0.0)


@jax.jit
def scan_img(ils):
    def body(c, img):
        return c, img[0, 0]
    return jax.lax.scan(body, 0.0, ils)[1]

timeit("scan over images", scan_img, il)


@jax.jit
def scan_sum(ils, irs):
    def body(c, xs):
        a, b = xs
        return c, jnp.sum(a) + jnp.sum(b)
    return jax.lax.scan(body, 0.0, (ils, irs))[1]

timeit("scan sum both", scan_sum, il, ir)

from stereo_visual_odometry_tpu.ops import pyramid, triangulate
from stereo_visual_odometry_tpu.ops.camera import StereoRig
rig = StereoRig.kitti(fx=718.0, fy=718.0, cx=W / 2, cy=H / 2, baseline=0.537)
kp = jnp.asarray(np.random.rand(1024, 2).astype(np.float32) * 300 + 50)


@jax.jit
def scan_tri(a, b):
    def body(c, _):
        p, ok = triangulate.stereo_depth_closed_form(rig, a, b)
        return c, p[0, 0]
    return jax.lax.scan(body, 0.0, jnp.arange(T))[1]

timeit("triangulate scan", scan_tri, kp, kp - jnp.array([24.0, 0.0]))


@jax.jit
def tri_once(a, b):
    p, ok = triangulate.stereo_depth_closed_form(rig, a, b)
    return p[0, 0]

def rep_tri(a, b):
    outs = [tri_once(a, b) for _ in range(T)]
    return outs[-1]

timeit("triangulate 8x no-scan", rep_tri, kp, kp - jnp.array([24.0, 0.0]))


@jax.jit
def scan_pyr(ils):
    def body(c, img):
        p = pyramid.build_pyramid(img, 4)
        return c, p[3][0, 0]
    return jax.lax.scan(body, 0.0, ils)[1]

timeit("1x pyramid scan", scan_pyr, il)
