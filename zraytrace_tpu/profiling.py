"""Tracing/profiling helpers.

The reference only has wall-clock spans and per-scanline prints
(raytrace.zig:37-50,139,188-201). Here: phase timers with the same
published totals (RenderStats carries the counter block), plus optional
``jax.profiler`` traces for XLA/TPU timelines.
"""

from __future__ import annotations

import contextlib
import sys
import time


class PhaseTimer:
    """Named wall-clock spans, like the reference's prepare/render split
    (raytrace.zig:197-200)."""

    def __init__(self):
        self.spans: dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name] = self.spans.get(name, 0.0) + time.perf_counter() - t0

    def report(self, file=sys.stderr):
        total = sum(self.spans.values())
        for name, s in self.spans.items():
            print(f"  {name:<24} {s:8.2f} s", file=file)
        print(f"  {'total':<24} {total:8.2f} s", file=file)


@contextlib.contextmanager
def xla_trace(log_dir: str | None):
    """jax.profiler trace (open with TensorBoard / xprof). No-op when
    ``log_dir`` is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def print_render_report(stats, file=sys.stderr):
    """The reference's end-of-render block (raytrace.zig:188-201)."""
    print("Rendering ready", file=file)
    print(f"  Total reflections:     {stats.reflections}", file=file)
    print(f"  Total background hits: {stats.background_hits}", file=file)
    print(f"  Total pixels:          {stats.pixels}", file=file)
    print(f"  Total samples:         {stats.samples}", file=file)
    print(f"  Total rays:            {stats.rays}", file=file)
    print(f"  Recursion limit hits:  {stats.recursion_depth_hits}", file=file)
    print(f"  Wavefront iterations:  {stats.wavefront_iterations}", file=file)
    print(f"  Pixels per second:     {stats.pixels_per_second:.2f}", file=file)
    print(f"  Rays per second:       {stats.rays_per_second:.3e}", file=file)
    print(f"  Total runtime:         {stats.preprocess_seconds + stats.render_seconds:.2f} s",
          file=file)
    print(f"    Prepare runtime:     {stats.preprocess_seconds:.2f} s", file=file)
    print(f"    Render runtime:      {stats.render_seconds:.2f} s", file=file)
