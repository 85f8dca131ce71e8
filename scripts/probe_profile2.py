"""Profile both LK and ORB chunks; print top ops by device time."""
import os, sys, time, gzip, json, collections, glob
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

def prof(mode, n_feat, tag):
    cfg = frontend.VOConfig(mode=mode, height=H, width=W, max_features=n_feat,
                            num_hypotheses=256, refine_iters=6,
                            min_inlier_rate=0.3, min_features_track=8)
    init_fn, chunk_fn = frontend.make_chunked_frontend(cfg, rig)
    state = init_fn(il[0], ir[0], jax.random.PRNGKey(0))
    state, m = chunk_fn(state, il[1:9], ir[1:9])
    jax.block_until_ready(state["T_wc"])
    d = f"/tmp/jaxtrace_{tag}"
    with jax.profiler.trace(d):
        state, m = chunk_fn(state, il[1:9], ir[1:9])
        jax.block_until_ready(state["T_wc"])
    path = sorted(glob.glob(d + "/plugins/profile/*/vm.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    agg = collections.Counter(); cnt = collections.Counter()
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and not e.get("name", "").startswith("$"):
            agg[e["name"]] += e["dur"]; cnt[e["name"]] += 1
    print(f"==== {tag} top ops (8 frames) ====", flush=True)
    for name, dur in agg.most_common(25):
        print(f"{dur/1e3:9.3f} ms x{cnt[name]:4d}  {name[:100]}", flush=True)

prof("lk", 1024, "lk")
prof("orb", 2048, "orb")
