"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual devices so that sharding/pjit code paths
(data parallel, tensor parallel) are exercised without TPU hardware — the
TPU-native analog of testing multi-node without a cluster (SURVEY.md §4).
"""
import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"  # force: env presets the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The container's sitecustomize registers the TPU (axon) backend at
# interpreter start regardless of env vars; override here, before any
# backend is used.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy jit-compile tests (excluded from the fast tier)"
    )
    config.addinivalue_line(
        "markers",
        "fast: auto-applied to everything not slow; `pytest -m fast` is the "
        "<5-minute single-CPU tier",
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)
