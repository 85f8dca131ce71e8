"""Throughput-vs-devices scaling harness (BASELINE.json target #3).

Measures both parallel axes of the framework over a device mesh:

  * sequence sharding (config 4): S sequences advance in lockstep over the
    ``seq`` axis (embarrassingly parallel, zero collectives);
  * distributed BA (config 5): observation table sharded over the ``ba``
    axis, per-shard normal-equation assembly + psum Schur reduction.

Weak scaling: per-device work is held constant while the device count grows,
so ideal wall-clock is FLAT and efficiency(n) = t(1) / t(n).

The harness is hardware-ready (pass ``--platform tpu`` on a pod slice); on
this machine it runs on the virtual CPU mesh
(``--xla_force_host_platform_device_count``). NOTE the virtual-mesh caveat:
N virtual devices share this host's physical cores (2 here), so beyond
#cores the measured "efficiency" bounds collective/partition OVERHEAD, not
real parallel speedup — the shape rehearsal the driver's dryrun also does,
with timing attached. Results land in SCALING.json.

Usage: python scripts/measure_scaling.py [--devices 1 2 4 8] [--platform cpu]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--obs-per-device", type=int, default=8192)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    n_max = max(args.devices)
    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_max}").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import numpy as np
    import jax
    import jax.numpy as jnp

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from stereo_visual_odometry_tpu.models import frontend
    from stereo_visual_odometry_tpu.ops.camera import Pinhole, StereoRig
    from stereo_visual_odometry_tpu.parallel import dist_ba, sequences
    from stereo_visual_odometry_tpu.parallel.mesh import make_mesh, shard_leading
    from stereo_visual_odometry_tpu.utils import synthetic

    host_cores = os.cpu_count()
    result = {"platform": args.platform, "host_cores": host_cores,
              "note": ("weak scaling: per-device work constant; ideal t(n) "
                       "flat, eff = t(1)/t(n). Virtual CPU devices beyond "
                       "#cores time-share — overhead rehearsal, not speedup."),
              "seq_sharding": [], "dist_ba": []}

    def timeit(fn, reps):
        fn()  # warm (compile)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    # ---- axis 1: sequence sharding (per-device work = 1 sequence) -------- #
    h, w, T = 192, 256, args.frames
    seqs = [synthetic.render_sequence(n_frames=T, h=h, w=w, fx=300.0,
                                      speed=1.0, seed=s) for s in range(n_max)]
    il = np.stack([s["images_l"] for s in seqs])
    ir = np.stack([s["images_r"] for s in seqs])
    rp = seqs[0]["rig"]
    cam = Pinhole.create(rp["fx"], rp["fy"], rp["cx"], rp["cy"])
    rig = StereoRig.create(cam, cam, t_rl=[-rp["baseline"], 0, 0])
    cfg = frontend.VOConfig(mode="lk", height=h, width=w, max_features=256,
                            num_hypotheses=128, min_features_track=8)
    init_fn, step_fn = frontend.make_frontend(cfg, rig)

    base_t = None
    for n in args.devices:
        mesh = make_mesh(n, axis="seq", platform=args.platform)
        sh = shard_leading(mesh)
        l = jax.device_put(jnp.asarray(il[:n]), sh)
        r = jax.device_put(jnp.asarray(ir[:n]), sh)
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        state = jax.vmap(init_fn)(l[:, 0], r[:, 0], keys)
        jax.block_until_ready(state["T_wc"])

        def run():
            st, m = sequences.run_chunk_scan(step_fn, state, l[:, 1:], r[:, 1:])
            return st["T_wc"]

        t = timeit(run, args.reps)
        base_t = base_t or t
        fps = n * (T - 1) / t
        result["seq_sharding"].append(
            {"devices": n, "wall_s": round(t, 4), "frames_per_s": round(fps, 2),
             "weak_efficiency": round(base_t / t, 3)})
        print(f"[seq] n={n}: {t*1e3:7.1f} ms/chunk  {fps:8.1f} fps  "
              f"eff={base_t/t:.2f}", file=sys.stderr)

    # ---- axis 2: distributed BA (per-device work = obs_per_device) ------- #
    rng = np.random.default_rng(7)
    n_kf, n_lm = 8, 512
    bcam = Pinhole.create(500.0, 500.0, 320.0, 240.0)
    poses_gt = np.stack([np.eye(4)] * n_kf).astype(np.float32)
    for k in range(n_kf):
        poses_gt[k][:3, 3] = [0.02 * k, -0.01 * k, -0.8 * k]
    pts_gt = np.stack([rng.uniform(-8, 8, n_lm), rng.uniform(-4, 4, n_lm),
                       rng.uniform(8, 40, n_lm)], -1).astype(np.float32)

    base_t = None
    for n in args.devices:
        m_obs = args.obs_per_device * n
        kf = rng.integers(0, n_kf, m_obs).astype(np.int32)
        lm = rng.integers(0, n_lm, m_obs).astype(np.int32)
        pc = np.einsum("mij,mj->mi", poses_gt[kf][:, :3, :3], pts_gt[lm]) \
            + poses_gt[kf][:, :3, 3]
        uv = np.stack([500 * pc[:, 0] / pc[:, 2] + 320,
                       500 * pc[:, 1] / pc[:, 2] + 240], -1).astype(np.float32)
        wgt = (pc[:, 2] > 1).astype(np.float32)
        poses_init = poses_gt.copy()
        poses_init[1:, :3, 3] += rng.normal(size=(n_kf - 1, 3)).astype(np.float32) * 0.05
        pts_init = pts_gt + rng.normal(size=pts_gt.shape).astype(np.float32) * 0.2

        mesh = make_mesh(n, axis="ba", platform=args.platform)
        solve = dist_ba.make_distributed_ba(bcam, mesh, n_kf=n_kf, n_lm=n_lm,
                                            n_iters=6, gm_polish=False)
        # Landmark-coherent shards (the make_distributed_ba contract).
        kf_p, lm_p, uv_p, w_p = dist_ba.partition_obs_by_landmark(
            kf, lm, uv, wgt, n)

        def run():
            out = solve(jnp.asarray(poses_init), jnp.asarray(pts_init),
                        jnp.asarray(kf_p), jnp.asarray(lm_p),
                        jnp.asarray(uv_p), jnp.asarray(w_p))
            return out["cost_final"]

        t = timeit(run, args.reps)
        base_t = base_t or t
        result["dist_ba"].append(
            {"devices": n, "obs": m_obs, "wall_s": round(t, 4),
             "obs_per_s": round(m_obs / t, 0),
             "weak_efficiency": round(base_t / t, 3)})
        print(f"[ba]  n={n}: {t*1e3:7.1f} ms/solve ({m_obs} obs)  "
              f"eff={base_t/t:.2f}", file=sys.stderr)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "SCALING.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
