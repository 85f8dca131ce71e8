"""Command-line runner — the ``run_kitti_stereo`` equivalent.

The reference app takes one argument, a YAML path, builds ``System`` and
calls ``Run()`` (``/root/reference/app/run_kitti_stereo.cpp:5-18``). Same
shape here, plus trajectory output, ATE against optional ground truth, and
an offline trajectory plot:

  python -m stereo_visual_odometry_tpu.cli CONFIG.yaml \
      [--dataset DIR] [--mode lk|orb] [--max-frames N] \
      [--out traj.txt] [--gt poses.txt] [--plot traj.png]

CONFIG.yaml may be a reference-format OpenCV YAML (``config/default.yaml``
schema) or omitted entirely (KITTI defaults).
"""
from __future__ import annotations

import argparse
import dataclasses
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", nargs="?", help="reference-format YAML config")
    ap.add_argument("--dataset", default=None, help="KITTI sequence dir")
    ap.add_argument("--mode", choices=["lk", "orb"], default=None)
    ap.add_argument("--max-frames", type=int, default=-1)
    ap.add_argument("--out", default="", help="trajectory output (KITTI format)")
    ap.add_argument("--gt", default="", help="ground-truth poses for ATE/RPE")
    ap.add_argument("--plot", default="", help="trajectory plot output path")
    ap.add_argument("--dump-overlays", default="", metavar="DIR",
                    help="write per-frame association overlays (the "
                         "displayTracking window, offline) into DIR")
    ap.add_argument("--every", type=int, default=10,
                    help="overlay stride (with --dump-overlays)")
    args = ap.parse_args(argv)

    from .utils.config import RunConfig, load_reference_yaml
    from .utils import trajectory as traj_mod
    from .models.system import System

    cfg = load_reference_yaml(args.config) if args.config else RunConfig()
    if args.dataset:
        cfg = dataclasses.replace(cfg, dataset_dir=args.dataset)
    if args.mode:
        cfg = dataclasses.replace(cfg, vo=dataclasses.replace(cfg.vo, mode=args.mode))
    cfg = dataclasses.replace(cfg, max_frames=args.max_frames,
                              trajectory_out=args.out,
                              overlay_dir=args.dump_overlays,
                              overlay_every=args.every)

    if not cfg.dataset_dir:
        ap.error("no dataset: pass --dataset or set dataset_dir in the YAML")

    # Size the static shapes to the actual images.
    from .utils.kitti import KittiStereoDataset, static_shape_for

    probe = KittiStereoDataset(cfg.dataset_dir)
    H, W = probe.static_hw
    cfg = dataclasses.replace(cfg, vo=dataclasses.replace(cfg.vo, height=H, width=W))

    system = System(cfg)
    traj = system.run_kitti()
    s = system.summary()
    print(f"frames={s['frames']} fps={s['fps']:.2f} "
          f"accept_rate={s['accept_rate']:.2%}")

    gt = traj_mod.load_kitti(args.gt) if args.gt else None
    if gt is not None:
        n = min(len(gt), len(traj))
        ate = traj_mod.ate_rmse(traj[:n], gt[:n])
        t_rpe, r_rpe = traj_mod.rpe(traj[:n], gt[:n])
        print(f"ATE={ate:.3f}m RPE_t={t_rpe:.4f}m RPE_r={r_rpe:.5f}rad")
    if args.plot:
        from .utils.viz import plot_trajectory

        plot_trajectory(args.plot, traj, gt)
        print(f"wrote {args.plot}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
