"""Roofline for the production LK step (VERDICT r4 next #9).

For every stage of the shipping LK frontend step this measures ms/frame on
the chip (8-frame on-device scan, amortized dispatch) and sets it against
an ANALYTIC floor: the larger of (HBM bytes / 819 GB/s) and
(FLOPs / VPU or MXU peak). The per-stage bytes/FLOPs formulas live in
``_analytic()`` below and are written up in PERF.md ("Round-5 roofline").

v5e single-chip peaks used:
  HBM       819 GB/s
  MXU bf16  197 TFLOP/s   (f32 ~ 1/4 of that)
  VPU f32   ~3.9 TFLOP/s  (8 sublanes x 128 lanes x 4 ALUs x 0.94 GHz)
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from stereo_visual_odometry_tpu.models import frontend
from stereo_visual_odometry_tpu.ops import (fast, lk, pnp, pyramid, select,
                                            triangulate, stereo_sweep)
from stereo_visual_odometry_tpu.ops.camera import StereoRig
from stereo_visual_odometry_tpu.utils import synthetic

HBM = 819e9
VPU = 3.9e12
H, W = 384, 1280
N = 1024
T = 8
B = 4  # f32 bytes

seq = synthetic.render_sequence(n_frames=T + 2, h=376, w=1241, fx=718.856,
                                baseline=0.537, n_points=9000, speed=1.1,
                                seed=3)
padf = lambda a: np.pad(a, ((0, 0), (0, H - 376), (0, W - 1241)), mode="edge")
il = jnp.asarray(padf(seq["images_l"]), jnp.float32)
ir = jnp.asarray(padf(seq["images_r"]), jnp.float32)
rig = StereoRig.kitti(fx=718.856, fy=718.856, cx=1241 / 2, cy=376 / 2,
                      baseline=0.537)

PX = [H * W // 4 ** l for l in range(4)]         # pixels per pyramid level


def _analytic():
    """Per-frame (bytes, flops) floors per stage. See PERF.md for derivation."""
    a = {}
    # 2x pyramid: read L0, then per level 5-tap separable blur (2 passes,
    # XLA fuses the taps) + 2x2 subsample write. Floor: read each level
    # once, write the next: sum(read Li + write Li+1).
    pyr1 = sum(PX[:3]) * B + sum(PX[1:]) * B
    a["2x pyramid"] = (2 * pyr1, 2 * sum(PX[:3]) * 22)
    # disparity sweep at L2, 48 shifts: read both L2 once (shifts are
    # rolls of a VMEM-resident level), 48 x (diff+abs+boxsum ~ 8 flops)/px.
    a["sweep L2 d48"] = (2 * PX[2] * B, PX[2] * 48 * 8)
    # FAST + grid_top_k + subpixel: 16 rotated comparisons x 2 polarities
    # + score; XLA fuses rolls of a VMEM tile -> floor reads L0 once,
    # writes score once; ~16*2*3 flops/px for the circle test, plus
    # top-k reductions (~2 passes over score).
    a["detect+topk+subpix"] = (4 * PX[0] * B, PX[0] * 16 * 2 * 3)
    # LK legs: every extract_windows_int call streams the level image
    # into VMEM (full-image BlockSpec) + writes (N, S, S).
    # Schedule (circular_track): 2 stereo legs @ 1 level (L0, prior ->
    # rounds_prior=4) and 2 temporal legs @ 2 levels (L1 coarse rounds=8
    # with motion prior -> 4; L0 refine rounds=2). Each leg-level does
    # 1 template extraction (win+3=24) + (rounds+1) window extractions
    # (win+1=22).
    win = 22
    ext = lambda px, rounds: (rounds + 2) * (px * B + N * win * win * B)
    bytes_lk = (2 * ext(PX[0], 4)            # stereo legs, L0, prior rounds
                + 2 * (ext(PX[1], 4) + ext(PX[0], 2)))   # temporal legs
    # flops: per round one (N, 8, 23^2) einsum + K~8 scalar inner iters.
    flops_lk = 4 * 2 * (5 * (N * 8 * 529 * 2))
    a["4 LK legs"] = (bytes_lk, flops_lk)
    # triangulate closed form: O(N) vector math.
    a["triangulate"] = (N * 8 * B, N * 60)
    # RANSAC-PnP H=512 hyp x N pts scoring x (refine 10 + dlt iters ~4):
    # (H, N) residual matrix materialized per iteration.
    Hh, it = 512, 14
    a["ransac_pnp 512x10"] = (Hh * N * B * it, Hh * N * 40 * it)
    return a


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps / T * 1e3


def main():
    meas = {}

    cfg = frontend.VOConfig(mode="lk", height=H, width=W, max_features=N,
                            min_features_track=8)
    init_fn, chunk_fn = frontend.make_chunked_frontend(cfg, rig)
    state = init_fn(il[0], ir[0], jax.random.PRNGKey(0))
    jax.block_until_ready(state["T_wc"])
    meas["FULL STEP"] = timeit("full", lambda: chunk_fn(
        state, il[1:1 + T], ir[1:1 + T]))

    @jax.jit
    def scan_pyr(ils, irs):
        def body(c, xs):
            pc_l = pyramid.build_pyramid(xs[0], 4)
            pc_r = pyramid.build_pyramid(xs[1], 4)
            return c, pc_l[3][0, 0] + pc_r[3][0, 0]
        return jax.lax.scan(body, 0.0, (ils, irs))[1]

    meas["2x pyramid"] = timeit("pyr", scan_pyr, il[1:1 + T], ir[1:1 + T])

    @jax.jit
    def scan_sweep(pl2, pr2):
        def body(c, _):
            return c, stereo_sweep.disparity_sweep(pl2, pr2, d_max=48)[0, 0]
        return jax.lax.scan(body, 0.0, jnp.arange(T))[1]

    pl2 = pyramid.build_pyramid(il[0], 3)[2]
    pr2 = pyramid.build_pyramid(ir[0], 3)[2]
    meas["sweep L2 d48"] = timeit("sweep", scan_sweep, pl2, pr2)

    @jax.jit
    def scan_det(ils):
        def body(c, img_l):
            score = fast.detect(img_l, 20.0)
            xy, sc, v = select.grid_top_k(score, N, cell=32, k_per_cell=8)
            xy = select.subpixel_refine(score, xy, v)
            return c, xy[0, 0]
        return jax.lax.scan(body, 0.0, ils)[1]

    meas["detect+topk+subpix"] = timeit("det", scan_det, il[1:1 + T])

    pyr_l0 = tuple(pyramid.build_pyramid(il[0], 4))
    pyr_r0 = tuple(pyramid.build_pyramid(ir[0], 4))
    score = fast.detect(il[0], 20.0)
    kp, sc, valid = select.grid_top_k(score, N, cell=32, k_per_cell=8)
    Tpred = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(1.1)

    @jax.jit
    def scan_track(kp, valid, ils, irs):
        def body(carry, xs):
            pl_, pr_ = carry
            pc_l = tuple(pyramid.build_pyramid(xs[0], 4))
            pc_r = tuple(pyramid.build_pyramid(xs[1], 4))
            quad = lk.circular_track((pl_, pr_, pc_r, pc_l), kp, valid,
                                     win=21, levels=3, iters=30,
                                     use_pallas=True, pallas_kernel="dense",
                                     rig=rig, T_pred=Tpred,
                                     use_sweep=True, sweep_d_max=48,
                                     stereo_levels=1, temporal_levels=2)
            return (pc_l, pc_r), quad["t2l"][0, 0]
        return jax.lax.scan(body, (pyr_l0, pyr_r0), (ils, irs))[1]

    t_trk = timeit("trk", scan_track, kp, valid, il[1:1 + T], ir[1:1 + T])
    meas["4 LK legs"] = t_trk - meas["2x pyramid"] - meas["sweep L2 d48"]

    pts3d = rig.left.unproject(kp, jnp.full((N,), 10.0))
    obs = rig.left.project(pts3d)

    @jax.jit
    def scan_pnp(keys):
        def body(c, key):
            res = pnp.ransac_pnp(rig.left, pts3d, obs, valid, key,
                                 num_hypotheses=512, inlier_px=2.0,
                                 refine_iters=10,
                                 T_init=jnp.eye(4, dtype=jnp.float32))
            return c, res["T"][0, 3]
        return jax.lax.scan(body, 0.0, keys)[1]

    meas["ransac_pnp 512x10"] = timeit(
        "pnp", scan_pnp, jax.random.split(jax.random.PRNGKey(1), T))

    @jax.jit
    def scan_tri(a, b):
        def body(c, _):
            p, ok = triangulate.stereo_depth_closed_form(rig, a, b)
            return c, p[0, 0]
        return jax.lax.scan(body, 0.0, jnp.arange(T))[1]

    meas["triangulate"] = timeit("tri", scan_tri, kp,
                                 kp - jnp.array([24.0, 0.0]))

    ana = _analytic()
    print(f"{'stage':24s} {'meas ms':>8s} {'MB':>7s} {'MFLOP':>7s} "
          f"{'floor ms':>9s} {'x off':>6s}  bound")
    tot_floor = 0.0
    acc = 0.0
    for k, t in meas.items():
        if k == "FULL STEP":
            continue
        by, fl = ana[k]
        f_bw, f_fl = by / HBM * 1e3, fl / VPU * 1e3
        floor = max(f_bw, f_fl)
        tot_floor += floor
        acc += t
        print(f"{k:24s} {t:8.3f} {by/1e6:7.2f} {fl/1e6:7.1f} {floor:9.4f} "
              f"{t/floor:6.0f}  {'HBM' if f_bw >= f_fl else 'VPU'}")
    full = meas["FULL STEP"]
    print(f"{'sum of stages':24s} {acc:8.3f} {'':7s} {'':7s} {tot_floor:9.4f}")
    print(f"{'FULL STEP (meas)':24s} {full:8.3f}   unattributed "
          f"{full - acc:.3f} ms (state scatter/compose + dispatch floor)")
    print(f"speed-of-light ratio: {full / tot_floor:.0f}x off; "
          f"roofline step = {tot_floor:.3f} ms -> {1e3/ (tot_floor):.0f} fps")


if __name__ == "__main__":
    main()
