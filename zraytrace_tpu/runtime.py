"""Runtime/platform helpers (no reference analogue — the reference is a
single static binary)."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA compilations across processes. The environment compiles
    TPU programs through a remote service, which is slow; caching makes
    repeat renders of the same shapes start in seconds."""
    import jax

    cache_dir = path or os.environ.get(
        "ZRAYTRACE_COMPILE_CACHE", os.path.expanduser("~/.cache/zraytrace_tpu/xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def enable_debug_nans() -> None:
    """Opt-in NaN trapping (SURVEY.md §5: replaces the reference's Zig
    safe-build UB checks). Also honored via ZRAYTRACE_DEBUG_NANS=1."""
    import jax

    jax.config.update("jax_debug_nans", True)


def force_cpu() -> None:
    """Run on the host CPU even when a TPU plugin force-registered itself
    (the environment's sitecustomize sets jax_platforms='axon,cpu')."""
    import jax

    jax.config.update("jax_platforms", "cpu")
