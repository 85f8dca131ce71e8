"""Checkpoint / resume for long VO runs.

The reference has none (SURVEY.md §5: the only persistent output is an
on-screen canvas). Here the full runtime state — trajectory, frame index,
frontend state pytree, keyframe window + landmarks — serializes to one
``.npz`` so an interrupted sequence resumes exactly where it stopped.
"""
from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp


def _flatten_state(state) -> dict:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}, treedef


def save(path: str, system) -> None:
    """Snapshot a ``models.system.System`` to ``path`` (.npz)."""
    arrays = {
        "poses": np.stack(system.poses) if system.poses else np.zeros((0, 4, 4)),
        "frame_idx": np.asarray(system.frame_idx),
        "status": np.asarray(system.status),
        "key": np.asarray(system.key),
    }
    meta = {"has_state": system.state is not None,
            "has_backend": system.backend is not None,
            "lost_count": system.lost_count}
    if system.state is not None:
        flat, treedef = _flatten_state(system.state)
        arrays.update(flat)
        meta["n_leaves"] = len(flat)
    if system.backend is not None:
        b = system.backend
        arrays["kf_poses"] = (np.stack(b.kf_poses) if b.kf_poses
                              else np.zeros((0, 4, 4)))
        arrays["frame_of_kf"] = np.asarray(b.frame_of_kf, np.int64)
        lm_ids = np.asarray(list(b.landmarks.keys()), np.int64)
        arrays["lm_ids"] = lm_ids
        arrays["lm_xyz"] = (np.stack([b.landmarks[i] for i in lm_ids])
                            if len(lm_ids) else np.zeros((0, 3)))
        meta["frames_since_kf"] = int(min(b._frames_since_kf, 10 ** 9))
        # kf observations as ragged json (small).
        meta["kf_obs"] = [
            {str(t): [uv.tolist(), None if uv_r is None else uv_r.tolist()]
             for t, (uv, uv_r) in o.items()}
            for o in b.kf_obs]
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load(path: str, system) -> None:
    """Restore a snapshot produced by ``save`` into ``system`` (built with
    the same config)."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(z["meta_json"]).decode())
    system.poses = list(z["poses"])
    system.frame_idx = int(z["frame_idx"])
    system.status = int(z["status"])
    system.key = jnp.asarray(z["key"])
    system.lost_count = int(meta.get("lost_count", 0))
    if meta["has_state"]:
        # Rebuild the pytree structure from a fresh init, then overwrite leaves.
        assert system.state is not None, \
            "run one frame (or init) before load() so the state structure exists"
        leaves, treedef = jax.tree_util.tree_flatten(system.state)
        new_leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(meta["n_leaves"])]
        system.state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    if meta["has_backend"] and system.backend is not None:
        b = system.backend
        b.kf_poses = list(z["kf_poses"])
        b.frame_of_kf = list(z["frame_of_kf"])
        b.landmarks = {int(i): x for i, x in zip(z["lm_ids"], z["lm_xyz"])}
        b.kf_obs = [
            {int(t): (np.asarray(v[0]), None if v[1] is None else np.asarray(v[1]))
             for t, v in o.items()}
            for o in meta["kf_obs"]]
        b._frames_since_kf = meta.get("frames_since_kf", 10 ** 9)
