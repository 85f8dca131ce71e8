"""Per-chip multi-sequence batching A/B (VERDICT r3 weak #6 / next #9).

Measures the vmapped frontend (S sequences per chip, the config-4 per-chip
shape) against S x single-sequence fps. Pass condition: batched throughput
>= 0.8 * S * single-seq fps. The dense LK backend's window extractor and
the cell kernel both carry custom_vmap rules (stacked-image lowering), so
the batched path no longer hits Mosaic's generic batched lowering.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import bench
from stereo_visual_odometry_tpu.models import frontend
from stereo_visual_odometry_tpu.ops.camera import StereoRig
from stereo_visual_odometry_tpu.parallel import sequences

S = 4
T = 16
il, ir, gt = bench.make_frames()
rig = StereoRig.kitti(fx=bench.FX, fy=bench.FX, cx=bench.W_RAW / 2,
                      cy=bench.H_RAW / 2, baseline=bench.BASELINE)
cfg = frontend.VOConfig(mode="lk", height=bench.H, width=bench.W,
                        max_features=1024, num_hypotheses=256, refine_iters=6)

# single-sequence reference rate (chunked scan, same T)
init_fn, chunk_fn = frontend.make_chunked_frontend(cfg, rig)
l_all = jnp.asarray(il); r_all = jnp.asarray(ir)
state = init_fn(l_all[0], r_all[0], jax.random.PRNGKey(0))
out = chunk_fn(state, l_all[1:1 + T], r_all[1:1 + T])
jax.block_until_ready(out[0]["T_wc"])
t0 = time.perf_counter()
for _ in range(3):
    out = chunk_fn(state, l_all[1:1 + T], r_all[1:1 + T])
jax.block_until_ready(out[0]["T_wc"])
single_fps = 3 * T / (time.perf_counter() - t0)
print(f"single-seq: {single_fps:.1f} fps", flush=True)

# batched S sequences
init1, step1 = frontend.make_frontend(cfg, rig)
lb = jnp.broadcast_to(l_all[None], (S,) + l_all.shape)
rb = jnp.broadcast_to(r_all[None], (S,) + r_all.shape)
keys = jax.random.split(jax.random.PRNGKey(0), S)
bstate = jax.vmap(init1)(lb[:, 0], rb[:, 0], keys)
jax.block_until_ready(bstate["T_wc"])
out = sequences.run_chunk_scan(step1, bstate, lb[:, 1:1 + T], rb[:, 1:1 + T])
jax.block_until_ready(out[0]["T_wc"])
t0 = time.perf_counter()
for _ in range(3):
    out = sequences.run_chunk_scan(step1, bstate, lb[:, 1:1 + T], rb[:, 1:1 + T])
jax.block_until_ready(out[0]["T_wc"])
batched_fps = 3 * S * T / (time.perf_counter() - t0)
acc = np.asarray(out[1]["accept"]).mean()
print(f"batched S={S}: {batched_fps:.1f} fps total "
      f"({batched_fps / S:.1f}/seq, {batched_fps / (S * single_fps):.2f}x ideal, "
      f"accept={acc:.2f})", flush=True)
print(f"pass(>=0.8*S*single): {batched_fps >= 0.8 * S * single_fps}")
