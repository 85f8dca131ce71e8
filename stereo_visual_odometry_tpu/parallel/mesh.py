"""Device-mesh helpers for multi-chip / multi-host scale-out.

The reference is single-process, single-thread (SURVEY.md §2): every
parallel axis here is a new capability. Axes:

* ``seq``  — data parallelism over KITTI sequences (BASELINE.json config 4)
* ``ba``   — keyframe-block sharding for distributed bundle adjustment
             (config 5); collectives ride ICI within a slice.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "seq",
              platform: str | None = None) -> Mesh:
    """Mesh over the first ``n_devices`` devices.

    ``platform`` pins a backend (e.g. ``"cpu"`` for the virtual host-device
    dry run: with ``--xla_force_host_platform_device_count=N`` the CPU
    backend exposes N devices even when a TPU plugin claims the default
    platform and ignores ``JAX_PLATFORMS``).
    """
    devs = jax.devices(platform) if platform else jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"need {n} devices on platform={platform or 'default'}, "
            f"have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis,))


def shard_leading(mesh: Mesh, axis: str = "seq") -> NamedSharding:
    """Sharding that splits the leading array axis over the mesh axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
