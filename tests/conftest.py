"""Test harness: force an 8-device virtual CPU platform so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4 implication).

The container boots with a sitecustomize that registers a TPU backend and
pins JAX_PLATFORMS, so plain env vars are not enough — we override the jax
config after import, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
