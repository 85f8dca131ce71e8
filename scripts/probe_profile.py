"""Try jax.profiler device tracing on the axon backend for one LK chunk."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from stereo_visual_odometry_tpu.models import frontend
from stereo_visual_odometry_tpu.ops.camera import StereoRig
from stereo_visual_odometry_tpu.utils import synthetic

H, W = 384, 1280
seq = synthetic.render_sequence(n_frames=10, h=376, w=1241, fx=718.856,
                                baseline=0.537, n_points=9000, speed=1.1, seed=3)
padf = lambda a: np.pad(a, ((0, 0), (0, H - 376), (0, W - 1241)), mode="edge")
il = jnp.asarray(padf(seq["images_l"]), jnp.float32)
ir = jnp.asarray(padf(seq["images_r"]), jnp.float32)
rig = StereoRig.kitti(fx=718.856, fy=718.856, cx=1241/2, cy=376/2, baseline=0.537)
cfg = frontend.VOConfig(mode="lk", height=H, width=W, max_features=1024,
                        num_hypotheses=256, refine_iters=6,
                        min_inlier_rate=0.3, min_features_track=8)
init_fn, chunk_fn = frontend.make_chunked_frontend(cfg, rig)
state = init_fn(il[0], ir[0], jax.random.PRNGKey(0))
state, m = chunk_fn(state, il[1:9], ir[1:9])
jax.block_until_ready(state["T_wc"])
with jax.profiler.trace("/tmp/jaxtrace"):
    state, m = chunk_fn(state, il[1:9], ir[1:9])
    jax.block_until_ready(state["T_wc"])
print("trace written", flush=True)
