"""Test harness: force an 8-device virtual CPU platform so multi-device
sharding paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon sitecustomize pre-registers the TPU backend with jax_platforms=axon;
# override after import as well so tests always run on the virtual CPU mesh
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from pixelspointspolygons_tpu.parallel import make_mesh

    return make_mesh(8)


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


@pytest.fixture()
def key():
    return jax.random.PRNGKey(0)
