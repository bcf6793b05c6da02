"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before any jax computation: the axon sitecustomize pre-registers a
TPU backend and pins jax_platforms, so we override the config (env vars alone
are ignored once jax.config was touched) and request 8 host devices for
sharding tests.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_devices():
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
