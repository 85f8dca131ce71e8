"""Multi-host bootstrap: process groups + cross-host meshes + data placement.

The reference has no distributed anything (SURVEY.md §5 "distributed
communication backend: none") — this is the new-capability layer that takes
the single-process mesh code (``mesh.py``, ``dist_ba.py``, ``sequences.py``)
across process boundaries, as BASELINE.json's targets demand (config 5:
multi-host distributed BA; ≥80% scaling efficiency at 2+ hosts).

Design: standard JAX multi-controller SPMD —
  1. every process calls ``initialize()`` (``jax.distributed.initialize``)
     with a shared coordinator address;
  2. meshes are built over ``jax.devices()`` (GLOBAL devices; the mesh axis
     spans hosts, collectives ride ICI within a slice / DCN across);
  3. per-process data enters via ``host_local_array`` ( ``jax.make_array
     _from_process_local_data``), so each host feeds only its shard;
  4. the same jitted programs as single-host run unmodified — the runtime
     inserts the cross-host collectives.

On real TPU pods, ``initialize()`` with no arguments picks everything up
from the TPU environment. For CPU-backend rehearsal (N processes on one
machine, the shape the tests and ``scripts/run_multihost_demo.py`` use),
pass coordinator/num_processes/process_id explicitly.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_count: int | None = None) -> None:
    """Join the multi-process group (idempotent for single-process runs).

    Args mirror ``jax.distributed.initialize``; all-None = TPU-pod
    auto-detection. ``local_device_count`` (CPU rehearsal) caps how many
    host-platform devices this process contributes.
    """
    if local_device_count is not None:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        want = f"--xla_force_host_platform_device_count={local_device_count}"
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " " + want).strip()
    if coordinator_address is None and num_processes is None:
        # Single process or TPU-pod auto-config.
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process CPU: nothing to join
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis: str = "ba", n_devices: int | None = None) -> Mesh:
    """Mesh over the GLOBAL device list (spans all processes)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def host_local_array(mesh: Mesh, axis: str, local: np.ndarray) -> jax.Array:
    """Assemble a global array sharded over ``axis`` from per-process data.

    ``local`` is THIS process's slice of the leading dim; the global shape
    is inferred as ``num_processes * local.shape[0]`` (equal shards).
    """
    sharding = NamedSharding(mesh, P(axis))
    global_shape = (local.shape[0] * jax.process_count(),) + local.shape[1:]
    return jax.make_array_from_process_local_data(sharding, local, global_shape)


def replicated_array(mesh: Mesh, value: np.ndarray) -> jax.Array:
    """Place a host-identical value replicated over every device."""
    sharding = NamedSharding(mesh, P())
    return jax.make_array_from_callback(
        value.shape, sharding, lambda idx: value[idx])
