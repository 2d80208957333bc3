"""Test configuration: 8 virtual CPU devices for SPMD/sharding tests.

Setting XLA_FLAGS before the first jax import is the standard way to test
pjit/shard_map logic without TPU hardware (SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not enough on machines whose TPU plugin pre-seeds
# jax_platforms; force the CPU backend explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from clipa_tpu.parallel import create_mesh
    return create_mesh(fsdp=1)


@pytest.fixture(scope="session")
def mesh_4x2():
    from clipa_tpu.parallel import create_mesh
    return create_mesh(fsdp=2)
