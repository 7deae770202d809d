"""Round-3 bounce megakernel (bounce_kernel3) tests, interpreter mode.

The deferred-texel kernel must reproduce the XLA wavefront's event
counters exactly (deferral changes timing, never events). Radiance may
differ from kernel2 ONLY in float multiply order (a texel factor applied
after instead of before later albedo factors) — ulp-level, no texel
flips — so the kernel2 comparison is tight where the XLA comparison
inherits the polynomial-atan2 texel-flip tolerance."""

import jax.numpy as jnp
import numpy as np

from zraytrace_tpu.legacy.bounce_kernel2 import wavefront_trace_pallas2
from zraytrace_tpu.ops.bounce_kernel3 import wavefront_trace_pallas3
from zraytrace_tpu.render import wavefront_trace
from zraytrace_tpu.scenes import three_balls


def _run(scene, camera, w, h, spp, depth, n_lanes, n_slots, B, seed=42):
    base = jnp.arange(n_lanes, dtype=jnp.int32)
    sums_x, cnt_x = wavefront_trace(
        scene, camera, base, seed, w, h, spp, depth,
        0, None, n_lanes, w * h, n_slots,
    )
    sums_p, cnt_p = wavefront_trace_pallas3(
        scene, camera, base, seed, w, h, spp, depth,
        0, n_slots, n_lanes, w * h, n_bounce=B,
    )
    return (np.asarray(sums_x), np.asarray(cnt_x),
            np.asarray(sums_p), np.asarray(cnt_p))


def _assert_images_close(sx, sp):
    """vs XLA: counters bit-exact; images may differ on rare
    texel-boundary lanes (polynomial atan2 vs XLA's)."""
    diff = np.abs(sx - sp)
    assert (diff > 1e-4).mean() < 0.05, diff.max()
    assert np.median(diff) < 1e-5


def test_packed_atlas_roundtrip_bitexact():
    """The glue's int32 RGB packing must reproduce the f32 atlas exactly
    (texels are u8/255 by construction, io/png.py:23)."""
    built = three_balls()
    flat = jnp.reshape(built.scene.atlas, (-1, 3))
    au8 = jnp.round(flat * 255.0).astype(jnp.int32)
    packed = (au8[:, 0] << 16) | (au8[:, 1] << 8) | au8[:, 2]
    r = ((packed >> 16) & 255).astype(jnp.float32) / 255.0
    g = ((packed >> 8) & 255).astype(jnp.float32) / 255.0
    b = (packed & 255).astype(jnp.float32) / 255.0
    un = jnp.stack([r, g, b], axis=-1)
    np.testing.assert_array_equal(np.asarray(un), np.asarray(flat))


def test_kernel3_counters_match_xla():
    built = three_balls()
    sx, cx, sp, cp = _run(built.scene, built.camera, 16, 16, 2, 6, 256, 1, 6)
    np.testing.assert_array_equal(cx[:5], cp[:5])
    _assert_images_close(sx, sp)


def test_kernel3_ulp_close_to_kernel2():
    """Same in-kernel formulas as kernel2 — only texel multiply ORDER
    differs, so sums agree to float-ulp level (no texel flips)."""
    built = three_balls()
    base = jnp.arange(256, dtype=jnp.int32)
    for n_slots, B in ((1, 4), (2, 8)):
        args = (built.scene, built.camera, base, 42, 16, 16, 2, 6, 0,
                n_slots, 256, 256)
        s2, c2 = wavefront_trace_pallas2(*args, n_bounce=B)
        s3, c3 = wavefront_trace_pallas3(*args, n_bounce=B)
        np.testing.assert_array_equal(np.asarray(c2)[:5], np.asarray(c3)[:5])
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s3),
                                   rtol=1e-5, atol=1e-6)


def test_kernel3_multi_slot_and_B():
    built = three_balls()
    for B in (1, 8, 32):
        sx, cx, sp, cp = _run(built.scene, built.camera, 16, 16, 2, 4,
                              256, 2, B)
        np.testing.assert_array_equal(cx[:5], cp[:5])
        _assert_images_close(sx, sp)


def test_kernel3_sample_offset():
    built = three_balls()
    base = jnp.arange(256, dtype=jnp.int32)
    sums_a, _ = wavefront_trace_pallas3(
        built.scene, built.camera, base, 42, 16, 8, 2, 4, 3, 1, 256, 128,
        n_bounce=5)
    sums_b, _ = wavefront_trace(
        built.scene, built.camera, base, 42, 16, 8, 2, 4, 3, None, 256, 128, 1)
    _assert_images_close(np.asarray(sums_a), np.asarray(sums_b))


def test_kernel3_sample_interleave():
    """sample_groups splits each pixel's spp over G lanes via the
    rotated base mapping: counters stay bit-exact (streams are keyed by
    (pixel, sample)), pixel sums agree up to group summation order."""
    built = three_balls()
    base = jnp.arange(256, dtype=jnp.int32)
    w, h, spp, depth = 16, 16, 4, 6
    sums_x, cnt_x = wavefront_trace(
        built.scene, built.camera, base, 42, w, h, spp, depth,
        0, None, 256, w * h, 1)
    for G in (2, 4):
        sums_g, cnt_g = wavefront_trace_pallas3(
            built.scene, built.camera, base, 42, w, h, spp, depth,
            0, 1, 256, w * h, n_bounce=8, sample_groups=G)
        np.testing.assert_array_equal(np.asarray(cnt_x)[:5],
                                      np.asarray(cnt_g)[:5])
        _assert_images_close(np.asarray(sums_x), np.asarray(sums_g))
    # G > spp/gspp leaves EMPTY windows (here spp=3 < G=8): they must
    # skip-advance without tracing spurious samples
    sums_e, cnt_e = wavefront_trace_pallas3(
        built.scene, built.camera, base, 42, w, h, 3, depth,
        0, 1, 256, w * h, n_bounce=8, sample_groups=8)
    sums_x3, cnt_x3 = wavefront_trace(
        built.scene, built.camera, base, 42, w, h, 3, depth,
        0, None, 256, w * h, 1)
    np.testing.assert_array_equal(np.asarray(cnt_x3)[:5],
                                  np.asarray(cnt_e)[:5])
    _assert_images_close(np.asarray(sums_x3), np.asarray(sums_e))
    # multi-stripe + offset window: vs the same engine at G=1
    args = (built.scene, built.camera, base, 42, w, 8, 6, 5, 2,
            2, 256, 128)
    s1, c1 = wavefront_trace_pallas3(*args, n_bounce=8)
    s3, c3 = wavefront_trace_pallas3(*args, n_bounce=8, sample_groups=3)
    np.testing.assert_array_equal(np.asarray(c1)[:5], np.asarray(c3)[:5])
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s3),
                               rtol=1e-5, atol=1e-6)


def test_kernel3_exit_frac_invariance():
    """The dynamic exit threshold changes launch boundaries, never
    events or (up to launch-boundary multiply order) sums."""
    built = three_balls()
    base = jnp.arange(256, dtype=jnp.int32)
    args = (built.scene, built.camera, base, 42, 16, 16, 3, 6, 0, 1,
            256, 256)
    s_a, c_a = wavefront_trace_pallas3(*args, n_bounce=16,
                                       exit_frac=(1, 2))
    s_b, c_b = wavefront_trace_pallas3(*args, n_bounce=16,
                                       exit_frac=(3, 4))
    np.testing.assert_array_equal(np.asarray(c_a)[:5], np.asarray(c_b)[:5])
    np.testing.assert_allclose(np.asarray(s_a), np.asarray(s_b),
                               rtol=1e-5, atol=1e-6)


def test_kernel3_mat_classes_identical():
    """Restricted where-chains (static material classes,
    scene.material_classes) must not change a single bit: the same
    table values are selected, the chains just skip rows whose value
    cannot matter for that column."""
    from zraytrace_tpu.scene import material_classes

    built = three_balls()
    base = jnp.arange(256, dtype=jnp.int32)
    args = (built.scene, built.camera, base, 42, 16, 16, 4, 8, 0, 1,
            256, 256)
    s0, c0 = wavefront_trace_pallas3(*args, n_bounce=8, sample_groups=2)
    s1, c1 = wavefront_trace_pallas3(
        *args, n_bounce=8, sample_groups=2,
        mat_classes=material_classes(built.scene))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


def test_render_pallas_max_wavefront_cap():
    """render() narrows the megakernel wavefront to pallas_max_wavefront
    (the measured sweet spot is narrower than max_wavefront); the slot
    remap must keep images and counters layout-invariant."""
    from zraytrace_tpu.config import RenderParams
    from zraytrace_tpu.render import render

    built = three_balls()
    imgs, stats = [], []
    for cap in (256, 1 << 20):
        params = RenderParams(width=32, height=24, samples_per_pixel=2,
                              max_depth=4, use_pallas=True,
                              pallas_max_wavefront=cap)
        img, st = render(built.scene, built.camera, params)
        imgs.append(np.asarray(img))
        stats.append(st)
    assert stats[0].rays == stats[1].rays
    assert stats[0].reflections == stats[1].reflections
    # identical streams; rare texel-boundary flips allowed (grid-shape-
    # dependent f32 fusion of the in-kernel polynomial trig)
    _assert_images_close(imgs[0], imgs[1])


def test_render_pallas_any_image_size():
    """Images whose pixel count is not 256-divisible round the wavefront
    UP (idle padding lanes) instead of falling back to the XLA engine —
    counters must stay exact at awkward sizes."""
    from zraytrace_tpu.config import RenderParams
    from zraytrace_tpu.render import render

    built = three_balls()
    for (w, h) in [(10, 10), (33, 17)]:
        rp = render(built.scene, built.camera,
                    RenderParams(w, h, 2, 3, use_pallas=True))
        rx = render(built.scene, built.camera,
                    RenderParams(w, h, 2, 3, use_pallas=False))
        assert rp[1].rays == rx[1].rays, (w, h)
        assert rp[1].samples == w * h * 2
        _assert_images_close(np.asarray(rp[0]), np.asarray(rx[0]))
