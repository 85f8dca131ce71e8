"""Bisect ransac_pnp internals in a scan harness."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from stereo_visual_odometry_tpu.ops import pnp, se3
from stereo_visual_odometry_tpu.ops.camera import StereoRig

rig = StereoRig.kitti(fx=718.856, fy=718.856, cx=620.0, cy=188.0, baseline=0.537)
cam = rig.left
N, H = 1024, 256
T = 16
rng = np.random.default_rng(0)
pts3d = jnp.asarray(np.stack([rng.uniform(-20, 20, N), rng.uniform(-5, 5, N),
                              rng.uniform(4, 60, N)], -1).astype(np.float32))
T_true = np.eye(4, dtype=np.float32); T_true[:3, 3] = [0.1, 0.02, 1.0]
pc = np.asarray(pts3d) @ T_true[:3, :3].T + T_true[:3, 3]
px = np.stack([718.856 * pc[:, 0] / pc[:, 2] + 620.0,
               718.856 * pc[:, 1] / pc[:, 2] + 188.0], -1).astype(np.float32)
px += rng.normal(0, 0.3, px.shape).astype(np.float32)
px = jnp.asarray(px)
valid = jnp.ones(N, bool)

MIN_SAMPLE = pnp.MIN_SAMPLE

def make(variant, num_h=256):
    def step(carry, key):
        acc, Tp = carry
        p3 = pts3d + acc * 1e-30
        norm2d = pnp._normalize_pixels(cam, px)
        scores = jax.random.uniform(key, (num_h, N))
        scores = jnp.where(valid[None, :], scores, -jnp.inf)
        idx_l = []
        work = scores
        lane = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        for _ in range(MIN_SAMPLE):
            am = jnp.argmax(work, axis=-1).astype(jnp.int32)
            idx_l.append(am)
            work = jnp.where(lane == am[:, None], -jnp.inf, work)
        samp_idx = jnp.stack(idx_l, axis=-1)
        out = jnp.sum(samp_idx).astype(jnp.float32)
        if variant == "sample":
            return (acc + out, Tp), out
        n_dlt = min(64, num_h)
        T_seed = Tp
        def dlt_h(idx):
            return pnp._dlt_pose(p3[idx], norm2d[idx], valid[idx].astype(jnp.float32))
        def gn_h(idx):
            return pnp.gauss_newton_pose(cam, T_seed, p3[idx], px[idx],
                                         valid[idx].astype(jnp.float32), iters=4,
                                         huber_px=1e6)
        if variant in ("dlt", "hyp", "score", "full"):
            T_dlt = jax.vmap(dlt_h)(samp_idx[:n_dlt])
            out = out + jnp.sum(T_dlt[:, 0, 3])
        if variant in ("gn", "hyp", "score", "full"):
            T_gn = jax.vmap(gn_h)(samp_idx[n_dlt:])
            out = out + jnp.sum(T_gn[:, 0, 3])
        if variant in ("score", "full"):
            T_hyp = jnp.concatenate([T_dlt, T_gn, Tp[None]], axis=0)
            e2 = jax.vmap(lambda Tm: pnp._reproj_err2(cam, Tm, p3, px))(T_hyp)
            thr2 = 4.0
            msac = jnp.sum(jnp.where(valid[None, :], jnp.minimum(e2, thr2), 0.0), -1)
            msac = jnp.where(jnp.isnan(msac), jnp.inf, msac)
            best = jnp.argmin(msac)
            T_best = T_hyp[best]
            inl = (e2[best] <= thr2) & valid
            out = out + T_best[0, 3]
        if variant == "full":
            T_out, inl_out = T_best, inl
            for _ in range(2):
                T_ref = pnp.gauss_newton_pose(cam, T_out, p3, px,
                                              inl_out.astype(jnp.float32),
                                              iters=6, huber_px=2.0)
                e2r = pnp._reproj_err2(cam, T_ref, p3, px)
                ir_ = (e2r <= thr2) & valid
                use = jnp.sum(ir_) >= jnp.sum(inl_out)
                T_out = jnp.where(use, T_ref, T_out)
                inl_out = jnp.where(use, ir_, inl_out)
            out = out + T_out[0, 3]
        return (acc + out, Tp), out
    @jax.jit
    def chunk(keys):
        carry, outs = jax.lax.scan(step, (jnp.float32(0.0), jnp.eye(4, dtype=jnp.float32)), keys)
        return outs
    return chunk

keys = jax.random.split(jax.random.PRNGKey(1), T)
for variant in ("sample", "dlt", "gn", "hyp", "score", "full"):
    chunk = make(variant)
    out = jax.block_until_ready(chunk(keys))
    t0 = time.perf_counter()
    out = jax.block_until_ready(chunk(keys))
    print(f"[{variant:7s}] {(time.perf_counter()-t0)/T*1e3:.3f} ms/call", flush=True)
