"""Batched multi-sequence evaluation: KITTI 00-10 in one sharded program.

BASELINE.json config 4 as a user-facing driver: S sequences advance in
lockstep — vmapped per-frame step, frames scanned on device in chunks, the
sequence axis laid out over the ``seq`` mesh axis (embarrassingly parallel;
zero collectives). Sequences of different lengths are padded with their last
frame and masked out of the returned trajectories.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..models import frontend as frontend_mod
from ..ops.camera import StereoRig
from ..utils import trajectory as traj_mod
from . import sequences
from .mesh import shard_leading


def evaluate_batch(images_l: np.ndarray, images_r: np.ndarray,
                   lengths: np.ndarray, cfg, rig: StereoRig,
                   mesh: Mesh | None = None, chunk: int = 8, seed: int = 0):
    """Run VO over a batch of sequences.

    Args:
      images_l / images_r: (S, T_max, H, W) frame batches (short sequences
        padded by repeating their last frame).
      lengths: (S,) true sequence lengths.
      cfg: VOConfig; rig: shared camera rig; mesh: optional ``seq`` mesh.

    Returns:
      dict(trajectories: list of (length_s, 4, 4) world_from_camera arrays,
           accept_rate per sequence, frames_per_s aggregate).
    """
    import time

    S, T = images_l.shape[:2]
    init_fn, step_fn = frontend_mod.make_frontend(cfg, rig)

    def put(x):
        x = jnp.asarray(x)
        return jax.device_put(x, shard_leading(mesh)) if mesh is not None else x

    keys = jax.random.split(jax.random.PRNGKey(seed), S)
    state = jax.vmap(init_fn)(put(images_l[:, 0]), put(images_r[:, 0]), keys)
    jax.block_until_ready(state["T_wc"])

    cur = np.tile(np.eye(4), (S, 1, 1))
    poses = [cur.copy()]
    t0 = time.perf_counter()
    for start in range(1, T, chunk):
        end = min(start + chunk, T)
        state, m = sequences.run_chunk_scan(
            step_fn, state, put(images_l[:, start:end]), put(images_r[:, start:end]))
        # Compose world poses from per-frame relative motions on the host
        # (float64 chain; the gates decide which updates apply).
        T21 = np.asarray(m["T_21"], np.float64)       # (T_chunk, S, 4, 4)
        acc = np.asarray(m["accept"])                 # (T_chunk, S)
        for t in range(T21.shape[0]):
            for s in range(S):
                if acc[t, s]:
                    cur[s] = cur[s] @ np.linalg.inv(T21[t, s])
            poses.append(cur.copy())
    jax.block_until_ready(state["T_wc"])
    wall = time.perf_counter() - t0

    all_poses = np.stack(poses, axis=1)  # (S, T, 4, 4)
    trajs = [all_poses[s, : int(lengths[s])] for s in range(S)]
    total_frames = int(np.sum(lengths) - S)
    return {
        "trajectories": trajs,
        "frames_per_s": total_frames / wall if wall > 0 else 0.0,
        "wall_s": wall,
    }


def evaluate_kitti_dirs(seq_dirs: list[str], cfg, rig: StereoRig,
                        mesh: Mesh | None = None, chunk: int = 8,
                        gt_files: list[str] | None = None):
    """Load KITTI sequence directories, run the batch, optionally score ATE."""
    from ..utils.kitti import KittiStereoDataset

    datasets = [KittiStereoDataset(d, static_hw=(cfg.height, cfg.width))
                for d in seq_dirs]
    lengths = np.array([len(d) for d in datasets])
    T = int(lengths.max())
    S = len(datasets)
    il = np.zeros((S, T, cfg.height, cfg.width), np.float32)
    ir = np.zeros_like(il)
    for s, ds in enumerate(datasets):
        for t in range(T):
            l, r = ds[min(t, len(ds) - 1)]
            il[s, t] = l
            ir[s, t] = r
    out = evaluate_batch(il, ir, lengths, cfg, rig, mesh=mesh, chunk=chunk)
    if gt_files:
        out["ate"] = []
        for traj, gt_file in zip(out["trajectories"], gt_files):
            gt = traj_mod.load_kitti(gt_file)
            n = min(len(gt), len(traj))
            out["ate"].append(traj_mod.ate_rmse(traj[:n], gt[:n]))
    return out
