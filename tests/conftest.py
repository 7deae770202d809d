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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    The full suite compiles hundreds of CPU programs in one process
    (interpret-mode Pallas kernels are large); past a cumulative
    threshold the XLA CPU JIT segfaults inside backend_compile_and_load
    (observed deterministically at the same late-suite compile once the
    round-4 tests pushed the count over the line — the same tests pass
    in any smaller grouping). Dropping the jit caches per module keeps
    the resident compiled-code footprint bounded; cross-module program
    reuse is minimal (each file renders its own shapes), so the
    recompile cost is small.
    """
    yield
    jax.clear_caches()
    # the cached sharded closures hold their own jit objects — empty
    # the closure cache too so their executables can be released, and
    # the flash-plane memo so modules don't see each other's packs
    from zraytrace_tpu import render as _render
    from zraytrace_tpu.parallel import mesh as _mesh

    _mesh._sharded_wavefront.cache_clear()
    _render._FLASH_MEMO.clear()


@pytest.fixture(scope="session")
def three_balls_scene():
    from zraytrace_tpu.scenes import three_balls

    return three_balls()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
