"""Round-2 bounce megakernel (bounce_kernel2) tests, interpreter mode.

The B-iteration texel-stall kernel must reproduce the XLA wavefront's
event counters exactly (stalling changes timing, never events) and the
round-1 kernel's image bit-for-bit (identical in-kernel formulas)."""

import jax
import jax.numpy as jnp
import numpy as np

from zraytrace_tpu.legacy.bounce_kernel2 import wavefront_trace_pallas2
from zraytrace_tpu.render import wavefront_trace
from zraytrace_tpu.scenes import three_balls


def _run(scene, camera, w, h, spp, depth, n_lanes, n_slots, B, seed=42):
    base = jnp.arange(n_lanes, dtype=jnp.int32)
    sums_x, cnt_x = wavefront_trace(
        scene, camera, base, seed, w, h, spp, depth,
        0, None, n_lanes, w * h, n_slots,
    )
    sums_p, cnt_p = wavefront_trace_pallas2(
        scene, camera, base, seed, w, h, spp, depth,
        0, n_slots, n_lanes, w * h, n_bounce=B,
    )
    return (np.asarray(sums_x), np.asarray(cnt_x),
            np.asarray(sums_p), np.asarray(cnt_p))


def _assert_images_close(sx, sp):
    """Counters are bit-exact; images may differ on rare texel-boundary
    lanes (polynomial atan2 vs XLA's — both ~1e-7 rad, but a
    nearest-neighbor texel can flip)."""
    diff = np.abs(sx - sp)
    assert (diff > 1e-4).mean() < 0.05, diff.max()
    assert np.median(diff) < 1e-5


def test_kernel2_counters_match_xla():
    built = three_balls()
    sx, cx, sp, cp = _run(built.scene, built.camera, 16, 16, 2, 6, 256, 1, 4)
    # slots 0-4 (rays/reflections/background/recursion/samples) count the
    # same events; slot 5 (iterations) legitimately differs (B per launch)
    np.testing.assert_array_equal(cx[:5], cp[:5])
    _assert_images_close(sx, sp)


def test_kernel2_multi_slot_and_B():
    built = three_balls()
    for B in (1, 8):
        sx, cx, sp, cp = _run(built.scene, built.camera, 16, 16, 2, 4,
                              256, 2, B)
        np.testing.assert_array_equal(cx[:5], cp[:5])
        _assert_images_close(sx, sp)


def test_kernel2_sample_offset():
    built = three_balls()
    base = jnp.arange(256, dtype=jnp.int32)
    sums_a, _ = wavefront_trace_pallas2(
        built.scene, built.camera, base, 42, 16, 8, 2, 4, 3, 1, 256, 128,
        n_bounce=5)
    sums_b, _ = wavefront_trace(
        built.scene, built.camera, base, 42, 16, 8, 2, 4, 3, None, 256, 128, 1)
    _assert_images_close(np.asarray(sums_a), np.asarray(sums_b))
