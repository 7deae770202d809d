"""Pallas bounce-megakernel tests (interpreter mode on CPU).

The kernel must reproduce the XLA wavefront exactly — same stateless
RNG streams, same formulas — so images and counters are compared
directly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zraytrace_tpu.ops.bounce_kernel import wavefront_trace_pallas
from zraytrace_tpu.render import wavefront_trace
from zraytrace_tpu.scenes import three_balls


def _run_both(scene, camera, n_pixels_w, n_pixels_h, spp, depth,
              n_lanes, n_slots, seed=42):
    base = jnp.arange(n_lanes, dtype=jnp.int32)
    sums_x, cnt_x = wavefront_trace(
        scene, camera, base, seed, n_pixels_w, n_pixels_h, spp, depth,
        0, None, n_lanes, n_pixels_w * n_pixels_h, n_slots,
    )
    sums_p, cnt_p = wavefront_trace_pallas(
        scene, camera, base, seed, n_pixels_w, n_pixels_h, spp, depth,
        0, n_slots, n_lanes, n_pixels_w * n_pixels_h,
    )
    return (np.asarray(sums_x), np.asarray(cnt_x),
            np.asarray(sums_p), np.asarray(cnt_p))


def _assert_images_close(sx, sp):
    """Counters are bit-exact; images may differ on rare texel-boundary
    lanes (the kernel's polynomial atan2 vs XLA's — both ~1e-7 rad, but a
    nearest-neighbor texel can flip)."""
    diff = np.abs(sx - sp)
    assert (diff > 1e-4).mean() < 0.03, diff.max()
    assert np.median(diff) < 1e-5


def test_kernel_matches_xla_wavefront_mini():
    from tests.test_render import _mini_scene

    scene, camera = _mini_scene()
    sx, cx, sp, cp = _run_both(scene, camera, 16, 8, 3, 5, 128, 1)
    np.testing.assert_array_equal(cx, cp)  # counters bit-exact
    _assert_images_close(sx, sp)


def test_kernel_matches_xla_wavefront_three_balls_textured():
    built = three_balls()
    sx, cx, sp, cp = _run_both(built.scene, built.camera, 16, 16, 2, 6, 256, 1)
    np.testing.assert_array_equal(cx, cp)
    _assert_images_close(sx, sp)


def test_kernel_multi_slot():
    built = three_balls()
    sx, cx, sp, cp = _run_both(built.scene, built.camera, 16, 16, 2, 4, 128, 2)
    np.testing.assert_array_equal(cx, cp)
    _assert_images_close(sx, sp)


def test_render_use_pallas_flag():
    """render(use_pallas=True) routes sphere-only scenes through the
    kernel and matches the XLA result."""
    from zraytrace_tpu.config import RenderParams
    from zraytrace_tpu.render import render

    built = three_balls()
    base = dict(width=16, height=16, samples_per_pixel=2, max_depth=4)
    img_x, st_x = render(built.scene, built.camera, RenderParams(**base))
    img_p, st_p = render(built.scene, built.camera,
                         RenderParams(**base, use_pallas=True))
    assert st_x.rays == st_p.rays
    assert st_x.samples == st_p.samples
    _assert_images_close(img_x, img_p)


def test_kernel_sample_offset():
    built = three_balls()
    base = jnp.arange(128, dtype=jnp.int32)
    sums_a, _ = wavefront_trace_pallas(
        built.scene, built.camera, base, 42, 16, 8, 2, 4, 3, 1, 128, 128)
    sums_b, _ = wavefront_trace(
        built.scene, built.camera, base, 42, 16, 8, 2, 4, 3, None, 128, 128, 1)
    _assert_images_close(np.asarray(sums_a), np.asarray(sums_b))
