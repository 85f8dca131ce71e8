"""Batched device->host transfers.

Through the remote-TPU tunnel every synchronous ``np.asarray(x)`` pays a
full round trip (~7 ms measured); converting a metrics pytree leaf-by-leaf
serializes those round trips. ``device_get_tree`` starts ALL copies
asynchronously first, then materializes — one latency for the whole tree.
"""
from __future__ import annotations

import numpy as np
import jax


def device_get_tree(tree):
    """Fetch a pytree of jax.Arrays as numpy, overlapping the round trips."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    for leaf in leaves:
        if isinstance(leaf, jax.Array):
            try:
                leaf.copy_to_host_async()
            except Exception:
                pass
    return jax.tree_util.tree_unflatten(
        treedef, [np.asarray(leaf) for leaf in leaves])
