"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding code paths (sequence sharding, distributed BA psum) are
exercised without TPU hardware via XLA's host-platform device count flag, per
SURVEY.md §4. Must run before jax initializes its backends.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env may point at a TPU

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Belt and braces: if some pytest plugin imported jax before this conftest,
# the env var above was read too late — force the platform via the config
# API as well (effective any time before first backend use).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
