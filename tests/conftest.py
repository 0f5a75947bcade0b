"""Test config: run everything on a virtual 8-device CPU mesh.

This is the framework's analogue of the reference's ddp_sim trainer
(reference: configs/trainer/ddp_sim.yaml — 2-process CPU DDP): multi-chip
sharding is validated without TPU hardware by forcing 8 host-platform devices.
Must set flags before jax initialises a backend, hence module level.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The container's sitecustomize imports jax and registers the TPU backend
# before pytest starts, so env vars alone are too late — switch via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)


@pytest.fixture(scope="session")
def mesh8():
    from videotgb_tpu.parallel import create_mesh, MeshConfig

    return create_mesh(MeshConfig(dp=-1, fsdp=1, tp=1))


@pytest.fixture
def rng():
    return np.random.default_rng(0)
