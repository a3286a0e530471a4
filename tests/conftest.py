"""Test configuration.

Forces the JAX CPU backend with 8 virtual devices so multi-chip sharding
(mesh/pjit/shard_map) is exercised without TPU hardware, mirroring the
driver's `dryrun_multichip` environment.
"""
import os
import sys

# Must run before jax is imported anywhere. Force CPU even if the outer
# environment selects a TPU platform (e.g. JAX_PLATFORMS=axon): unit tests
# must be fast and hardware-independent.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize may have already imported jax and registered
# a remote-TPU PJRT plugin (axon); the env var alone is then too late.
# Force the CPU client explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)
