"""Hardware A/B: dense-XLA LK backend vs the scalar cell kernel.

Times scanned (8x amortized) level-track legs at the production shape
(1024 pts, 384x1280) under three init qualities, plus the full production
step with each kernel. Also validates flow agreement on-device.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from stereo_visual_odometry_tpu.models import frontend
from stereo_visual_odometry_tpu.ops import lk, pyramid
from stereo_visual_odometry_tpu.ops.camera import StereoRig
from stereo_visual_odometry_tpu.utils import synthetic

H, W, N, T = 384, 1280, 1024, 8
seq = synthetic.render_sequence(n_frames=T + 2, h=376, w=1241, fx=718.856,
                                baseline=0.537, n_points=9000, speed=1.1, seed=3)
padf = lambda a: np.pad(a, ((0, 0), (0, H - 376), (0, W - 1241)), mode="edge")
il = jnp.asarray(padf(seq["images_l"]), jnp.float32)
ir = jnp.asarray(padf(seq["images_r"]), jnp.float32)
rig = StereoRig.kitti(fx=718.856, fy=718.856, cx=1241 / 2, cy=376 / 2, baseline=0.537)

rng = np.random.RandomState(0)
kp = jnp.asarray(np.stack([rng.uniform(40, 1200, N),
                           rng.uniform(40, 340, N)], -1), jnp.float32)
valid = jnp.ones((N,), bool)
pyr_a = tuple(pyramid.build_pyramid(il[0], 4))
pyr_b = tuple(pyramid.build_pyramid(il[1], 4))


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps / T * 1e3
    print(f"{name:42s} {dt:7.3f} ms/frame", flush=True)
    return dt


@partial(jax.jit, static_argnums=(0, 1))
def scan_leg(kernel, levels, g, pa, pb):
    def body(c, _):
        p, ok = lk.track(pa, pb, kp, init_flow=g, active=valid,
                         levels=levels, win=21, iters=30, use_pallas=True,
                         pallas_kernel=kernel)
        return c, (p[0, 0], jnp.sum(ok))
    return jax.lax.scan(body, 0.0, jnp.arange(T))[1]

g_zero = jnp.zeros((N, 2), jnp.float32)
g_good = jnp.asarray(rng.normal(size=(N, 2)).astype(np.float32)) * 0.5

for kern in ("cell", "dense"):
    timeit(f"leg 1-level zero-init [{kern}]", lambda: scan_leg(kern, 1, g_zero, pyr_a, pyr_b))
    timeit(f"leg 1-level good-init [{kern}]", lambda: scan_leg(kern, 1, g_good, pyr_a, pyr_b))
    timeit(f"leg 2-level zero-init [{kern}]", lambda: scan_leg(kern, 2, g_zero, pyr_a, pyr_b))

# On-device agreement at 1 level.
p_c, ok_c = lk.track(pyr_a, pyr_b, kp, init_flow=g_good, active=valid,
                     levels=1, win=21, iters=30, use_pallas=True,
                     pallas_kernel="cell")
p_d, ok_d = lk.track(pyr_a, pyr_b, kp, init_flow=g_good, active=valid,
                     levels=1, win=21, iters=30, use_pallas=True,
                     pallas_kernel="dense")
both = np.asarray(ok_c & ok_d)
d = np.abs(np.asarray(p_c) - np.asarray(p_d))[both]
print(f"agreement: ok_c={np.asarray(ok_c).mean():.2f} ok_d={np.asarray(ok_d).mean():.2f} "
      f"median|d|={np.median(d):.4f} p99={np.percentile(d, 99):.3f}", flush=True)

# Full production step (dense only; cell measured 15.46 in probe_r4).
for kern in ("dense",):
    cfg = frontend.VOConfig(mode="lk", height=H, width=W, max_features=N,
                            num_hypotheses=256, refine_iters=6, lk_kernel=kern)
    init_fn, chunk_fn = frontend.make_chunked_frontend(cfg, rig)
    state = init_fn(il[0], ir[0], jax.random.PRNGKey(0))
    jax.block_until_ready(state["T_wc"])
    timeit(f"full step [{kern}]", lambda: chunk_fn(state, il[1:1 + T],
                                                   ir[1:1 + T]))
