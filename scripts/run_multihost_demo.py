"""Multi-process distributed-BA worker + launcher (CPU rehearsal shape).

Launcher mode (no args): spawns N worker processes on localhost, each
joining the jax.distributed group; workers build a GLOBAL mesh spanning
processes, shard the observation table with
``multihost.host_local_array``, run the SAME ``dist_ba`` program as
single-host, and process 0 prints the result JSON.

Worker mode: invoked by the launcher with --proc.

On a TPU pod this collapses to ``multihost.initialize()`` (auto-config) +
the same worker body; the CPU rehearsal proves the cross-process program
(collectives over DCN between process-local device groups).

Usage:
  python scripts/run_multihost_demo.py             # 2 procs x 4 devices
  python scripts/run_multihost_demo.py --nprocs 4 --local-devices 2
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def worker(args):
    # Must set device count BEFORE jax import side effects.
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "").split("--xla_force_host")[0].strip()
        + f" --xla_force_host_platform_device_count={args.local_devices}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import numpy as np
    import jax
    import jax.numpy as jnp

    # The ambient env may carry a TPU plugin that ignores JAX_PLATFORMS;
    # force the platform via the config API too (same as tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

    from stereo_visual_odometry_tpu.parallel import dist_ba, multihost
    from stereo_visual_odometry_tpu.ops.camera import Pinhole

    multihost.initialize(coordinator_address=args.coordinator,
                         num_processes=args.nprocs, process_id=args.proc)
    assert jax.process_count() == args.nprocs
    n_global = args.nprocs * args.local_devices
    assert jax.device_count() == n_global, jax.devices()

    # Synthetic BA problem, identical on every process (seeded).
    rng = np.random.default_rng(7)
    n_kf, n_lm = 6, 120
    cam = Pinhole.create(500.0, 500.0, 320.0, 240.0)
    poses_gt = np.stack([np.eye(4) for _ in range(n_kf)]).astype(np.float32)
    for k in range(n_kf):
        poses_gt[k][:3, 3] = [0.02 * k, -0.01 * k, -0.8 * k]
    pts_gt = np.stack([rng.uniform(-8, 8, n_lm), rng.uniform(-4, 4, n_lm),
                       rng.uniform(8, 40, n_lm)], -1).astype(np.float32)
    obs = []
    for k in range(n_kf):
        pc = pts_gt @ poses_gt[k][:3, :3].T + poses_gt[k][:3, 3]
        uv = np.stack([500 * pc[:, 0] / pc[:, 2] + 320,
                       500 * pc[:, 1] / pc[:, 2] + 240], -1)
        for l in range(n_lm):
            if pc[l, 2] > 1:
                obs.append((k, l, uv[l] + rng.normal(size=2) * 0.3))
    m = len(obs)
    obs_kf = np.zeros(m, np.int32)
    obs_lm = np.zeros(m, np.int32)
    obs_uv = np.zeros((m, 2), np.float32)
    obs_w = np.zeros(m, np.float32)
    for i, (k, l, uv) in enumerate(obs):
        obs_kf[i], obs_lm[i], obs_uv[i], obs_w[i] = k, l, uv, 1.0
    # Landmark-coherent global shards; every process computes the SAME
    # deterministic layout, then feeds only its slice of rows.
    obs_kf, obs_lm, obs_uv, obs_w = dist_ba.partition_obs_by_landmark(
        obs_kf, obs_lm, obs_uv, obs_w, n_global)
    m_pad = obs_kf.shape[0]
    poses_init = poses_gt.copy()
    for k in range(1, n_kf):
        poses_init[k][:3, 3] += rng.normal(size=3).astype(np.float32) * 0.05

    mesh = multihost.global_mesh(axis="ba")
    # Each process feeds ONLY its slice of the observation table.
    shard = m_pad // args.nprocs
    lo, hi = args.proc * shard, (args.proc + 1) * shard
    g = lambda a: multihost.host_local_array(mesh, "ba", a[lo:hi])
    r = lambda a: multihost.replicated_array(mesh, a)

    solve = dist_ba.make_distributed_ba(cam, mesh, n_kf=n_kf, n_lm=n_lm,
                                        n_iters=10, gm_polish=True)
    out = solve(r(poses_init), r(pts_gt + rng.normal(size=pts_gt.shape
                                                     ).astype(np.float32) * 0.2),
                g(obs_kf), g(obs_lm), g(obs_uv), g(obs_w))
    # Replicated output: every process holds the full value locally.
    poses = np.asarray(out["poses"].addressable_data(0))
    err = float(np.abs(poses - poses_gt).max())
    if args.proc == 0:
        print(json.dumps({
            "processes": args.nprocs, "devices": n_global,
            "cost_initial": float(out["cost_initial"]),
            "cost_final": float(out["cost_final"]),
            "max_pose_err": err,
            "ok": bool(err < 0.02 and
                       float(out["cost_final"]) < float(out["cost_initial"])),
        }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--proc", type=int, default=None)
    ap.add_argument("--coordinator", default="localhost:58223")
    args = ap.parse_args()

    if args.proc is not None:
        worker(args)
        return

    procs = []
    for i in range(args.nprocs):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--proc", str(i), "--nprocs", str(args.nprocs),
             "--local-devices", str(args.local_devices),
             "--coordinator", args.coordinator],
            stdout=subprocess.PIPE if i == 0 else subprocess.DEVNULL,
            stderr=subprocess.DEVNULL))
    out, _ = procs[0].communicate(timeout=600)
    for p in procs[1:]:
        p.wait(timeout=600)
    sys.stdout.write(out.decode())
    sys.exit(0 if all(p.returncode == 0 for p in procs) else 1)


if __name__ == "__main__":
    main()
