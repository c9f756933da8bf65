"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The reference has no multi-device tests at all (SURVEY.md §4). We test every
sharded code path on CPU with ``xla_force_host_platform_device_count=8`` —
the TPU-native analogue of "test multi-node without a cluster".

Must set env vars before the first ``import jax`` anywhere in the test run.
"""

import os

# Force-set (not setdefault): the environment pins JAX_PLATFORMS=axon (the
# real-TPU tunnel, which only one process may hold at a time — a second jax
# process blocks on it). Tests must never touch the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" (the real-TPU
# tunnel) in every python process, overriding JAX_PLATFORMS. Only one process
# may hold the tunnel — a second blocks indefinitely. Undo it before any
# backend initializes so tests run purely on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
