"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding tests work without TPU hardware (SURVEY.md §4)."""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize force-registers a remote TPU backend and
# sets jax_platforms="axon,cpu"; tests must run on the local CPU with 8
# virtual devices, so override before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def three_balls_scene():
    from zraytrace_tpu.scenes import three_balls

    return three_balls()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
