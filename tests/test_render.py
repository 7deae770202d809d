"""Renderer tests.

The strongest check is an independent scalar numpy re-implementation of the
reference's recursive ``rayColor`` (raytrace.zig:62-100) driven by the SAME
stateless RNG streams — the wavefront while-loop must reproduce it exactly,
pixel for pixel.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zraytrace_tpu import rng as zrng
from zraytrace_tpu import scene as sc
from zraytrace_tpu.camera import make_camera
from zraytrace_tpu.config import RenderParams
from zraytrace_tpu.render import background_color, render, trace_closest
from zraytrace_tpu.scene import SceneBuilder


def _mini_scene():
    """Three spheres + glass, reminiscent of the reference's render test
    (raytrace.zig:214-239) with a dielectric added for coverage."""
    b = SceneBuilder()
    gold = b.add_metal_color(sc.COLOR_GOLD)
    purple = b.add_lambertian_color((0.5, 0.0, 0.5))
    green = b.add_lambertian_color(sc.COLOR_GREEN)
    glass = b.add_dielectric(1.52)
    b.add_sphere((0.0, 0.0, 6.0), 2.0, gold)
    b.add_sphere((3.0, 1.0, 4.0), 1.0, purple)
    b.add_sphere((1.0, 102.5, 4.0), 100.0, green)
    b.add_sphere((-1.0, -0.5, 3.0), 0.7, glass)
    camera = make_camera((0.0, 0.0, -7.0), (0.0, 0.0, 1.0), (0.0, 1.0, 0.0), 45.0, 1.0)
    return b.build(), camera


# ---------------------------------------------------------------------------
# Independent scalar oracle (pure numpy, recursive like raytrace.zig:62-100)
# ---------------------------------------------------------------------------


def _oracle_trace(scene, o, d):
    """Scalar closest-hit over spheres (sphere.zig:31-69)."""
    t_min, t_max = 1e-3, np.inf
    best = None
    for i in range(scene.sph_center.shape[0]):
        c = np.asarray(scene.sph_center[i], np.float64)
        r = float(scene.sph_radius[i])
        oc = o - c
        half_b = oc @ d
        cc = oc @ oc - r * r
        disc = half_b * half_b - cc
        if disc < 0:
            continue
        root = np.sqrt(disc)
        for t in (-half_b - root, -half_b + root):
            if t_min < t < t_max:
                t_max = t
                p = o + t * d
                n = (p - c) / r
                best = (t, p, n, int(scene.sph_mat[i]), i)
                break
    return best


def _oracle_ray_color(scene, o, d, depth, pixel, sample, max_depth, seed):
    if depth <= 0:
        return np.zeros(3)
    hit = _oracle_trace(scene, o, d)
    if hit is None:
        t = 0.5 * (d[1] + 1.0)
        return (1 - t) * np.ones(3) + t * np.array([0.5, 0.7, 1.0])
    _, p, outward, mat_id, _ = hit
    front = d @ outward <= 0
    n = outward if front else -outward

    path_depth = max_depth - depth
    rnd = np.asarray(
        zrng.uniform4(seed, jnp.uint32(pixel), jnp.uint32(sample),
                      jnp.uint32(path_depth), zrng.STREAM_SCATTER)
    ).astype(np.float64)

    mt = int(scene.mat_type[mat_id])
    if mt == sc.LAMBERTIAN:
        ruv = np.asarray(
            zrng.random_unit_vector(jnp.float32(rnd[0]), jnp.float32(rnd[1]))
        ).astype(np.float64)
        new_d = n + ruv
        atten = np.asarray(scene.tex_color[int(scene.mat_tex[mat_id])], np.float64)
    elif mt == sc.METAL:
        new_d = d - 2 * (d @ n) * n
        if new_d @ n <= 0:
            return np.zeros(3)
        atten = np.asarray(scene.tex_color[int(scene.mat_tex[mat_id])], np.float64)
    else:  # dielectric (material.zig:109-123)
        ior = float(scene.mat_ior[mat_id])
        ratio = 1.0 / ior if front else ior
        cos_t = min(-(d @ n), 1.0)
        sin_t = np.sqrt(max(0.0, 1 - cos_t * cos_t))
        r0 = (1 - ratio) / (1 + ratio)
        schlick = r0 + (1 - r0) * (1 - cos_t) ** 5
        if ratio * sin_t > 1.0 or schlick > rnd[2]:
            new_d = d - 2 * (d @ n) * n
        else:
            perp = ratio * (d + cos_t * n)
            par = -np.sqrt(abs(1.0 - perp @ perp)) * n
            new_d = perp + par
        atten = np.ones(3)
    new_d = new_d / np.linalg.norm(new_d)
    return atten * _oracle_ray_color(
        scene, p, new_d, depth - 1, pixel, sample, max_depth, seed
    )


def _oracle_render(scene, camera, params):
    w, h, spp = params.width, params.height, params.samples_per_pixel
    img = np.zeros((h, w, 3))
    origin = np.asarray(camera.origin, np.float64)
    ll = np.asarray(camera.lower_left, np.float64)
    horiz = np.asarray(camera.horizontal, np.float64)
    vert = np.asarray(camera.vertical, np.float64)
    for y in range(h):
        for x in range(w):
            pixel = y * w + x
            acc = np.zeros(3)
            for s in range(spp):
                j = np.asarray(
                    zrng.uniform4(params.seed, jnp.uint32(pixel), jnp.uint32(s),
                                  jnp.uint32(0), zrng.STREAM_CAMERA)
                ).astype(np.float64)
                u = (x + j[0] - 0.5) / w
                v = (y + j[1] - 0.5) / h
                d = ll + u * horiz + v * vert - origin
                d = d / np.linalg.norm(d)
                acc += _oracle_ray_color(
                    scene, origin, d, params.max_depth, pixel, s,
                    params.max_depth, params.seed,
                )
            img[y, x] = acc / spp
    return img


def test_wavefront_matches_scalar_oracle():
    scene, camera = _mini_scene()
    params = RenderParams(width=8, height=8, samples_per_pixel=3, max_depth=5)
    img, stats = render(scene, camera, params)
    oracle = _oracle_render(scene, camera, params)
    np.testing.assert_allclose(img, oracle, atol=2e-4)
    assert stats.samples == 8 * 8 * 3
    assert stats.pixels == 64


def test_background_only_scene():
    b = SceneBuilder()
    b.add_lambertian_color(sc.COLOR_GREEN)
    b.add_sphere((0.0, 0.0, 1e6), 1.0, 0)  # effectively invisible
    camera = make_camera((0, 0, -7.0), (0, 0, 1.0), (0, 1.0, 0), 45.0, 1.0)
    scene = b.build()
    params = RenderParams(width=6, height=6, samples_per_pixel=2, max_depth=3)
    img, stats = render(scene, camera, params)
    # every ray escapes on the first bounce
    assert stats.background_hits == stats.samples
    assert stats.rays == stats.samples
    assert stats.reflections == 0
    # sky gradient: brighter blue toward the top (raytrace.zig:53-58)
    assert img[-1].mean(axis=(0,))[2] >= img[0].mean(axis=(0,))[2]
    assert img.min() >= 0.0 and img.max() <= 1.0 + 1e-6


def test_determinism_and_seed_sensitivity():
    scene, camera = _mini_scene()
    params = RenderParams(width=8, height=8, samples_per_pixel=2, max_depth=4)
    img1, _ = render(scene, camera, params)
    img2, _ = render(scene, camera, params)
    np.testing.assert_array_equal(img1, img2)
    img3, _ = render(scene, camera, RenderParams(
        width=8, height=8, samples_per_pixel=2, max_depth=4, seed=7))
    assert not np.array_equal(img1, img3)


def test_tiling_invariant():
    scene, camera = _mini_scene()
    base = dict(width=8, height=8, samples_per_pixel=2, max_depth=4)
    img1, _ = render(scene, camera, RenderParams(**base))
    img2, _ = render(scene, camera, RenderParams(**base, max_wavefront=16))
    np.testing.assert_allclose(img1, img2, atol=1e-6)


def test_counter_semantics():
    scene, camera = _mini_scene()
    params = RenderParams(width=8, height=8, samples_per_pixel=4, max_depth=6)
    _, stats = render(scene, camera, params)
    assert stats.samples == 8 * 8 * 4
    # every processed ray either scatters, misses, or is absorbed
    assert stats.rays >= stats.samples
    assert stats.rays <= stats.samples * params.max_depth
    # Every processed ray scatters, misses, or is absorbed; every sample
    # ends by miss, absorb, or depth exhaustion, so:
    # rays = reflections + misses + absorbs
    #      = reflections + samples - recursion_depth_hits.
    assert stats.rays == stats.reflections + stats.samples - stats.recursion_depth_hits
    assert stats.background_hits <= stats.samples
    assert stats.recursion_depth_hits <= stats.samples


def test_depth_one_is_direct_background_or_black():
    scene, camera = _mini_scene()
    params = RenderParams(width=8, height=8, samples_per_pixel=2, max_depth=1)
    img, stats = render(scene, camera, params)
    # with depth 1: any hit leads to a scatter whose continuation is depth 0
    # -> black (raytrace.zig:64-67); misses give background.
    assert stats.rays == stats.samples
    assert img.min() >= 0.0


def test_multi_slot_lanes_match_full_wavefront():
    """Lanes that walk several strided pixels (slots) must reproduce the
    one-lane-per-pixel result exactly (same stateless sample streams)."""
    scene, camera = _mini_scene()
    base = dict(width=8, height=8, samples_per_pixel=3, max_depth=4)
    img_full, stats_full = render(scene, camera, RenderParams(**base))
    for wavefront in (16, 24, 40):  # 4, 3, 2 slots (incl. ragged tails)
        img_s, stats_s = render(
            scene, camera, RenderParams(**base, max_wavefront=wavefront)
        )
        np.testing.assert_allclose(img_full, img_s, atol=1e-6)
        assert stats_s.samples == stats_full.samples
        assert stats_s.rays == stats_full.rays


def test_max_wavefront_padding_tail():
    scene, camera = _mini_scene()
    # 3 rows per tile with 8 rows -> last tile is padded
    img1, _ = render(scene, camera, RenderParams(
        width=8, height=8, samples_per_pixel=2, max_depth=3, max_wavefront=24))
    img2, _ = render(scene, camera, RenderParams(
        width=8, height=8, samples_per_pixel=2, max_depth=3))
    np.testing.assert_allclose(img1, img2, atol=1e-6)


def test_wavefront_sample_groups_interleave():
    """The XLA wavefront's sample-group interleave (rotated-base
    schedule borrowed from the bounce megakernel) must keep event
    counters bit-exact and the image equal up to float summation order
    — PCG4D streams are keyed by (pixel, sample), so which lane traces
    a window never changes the events."""
    scene, camera = _mini_scene()
    base = dict(width=8, height=8, samples_per_pixel=6, max_depth=4)
    img1, st1 = render(scene, camera, RenderParams(**base))
    for g in (2, 4, 8):  # incl. g > some windows (empty-window skips)
        img_g, st_g = render(scene, camera, RenderParams(
            **base, wavefront_sample_groups=g))
        np.testing.assert_allclose(img1, img_g, rtol=1e-5, atol=1e-6)
        assert st_g.rays == st1.rays
        assert st_g.samples == st1.samples
        assert st_g.reflections == st1.reflections
        assert st_g.background_hits == st1.background_hits


def test_wavefront_sample_groups_multi_slot():
    """Interleave composed with multi-slot lanes (the mesh bench
    configuration's shape)."""
    scene, camera = _mini_scene()
    base = dict(width=8, height=8, samples_per_pixel=4, max_depth=4)
    img1, st1 = render(scene, camera, RenderParams(**base))
    img_g, st_g = render(scene, camera, RenderParams(
        **base, max_wavefront=16, wavefront_sample_groups=4))
    np.testing.assert_allclose(img1, img_g, rtol=1e-5, atol=1e-6)
    assert st_g.rays == st1.rays
    assert st_g.samples == st1.samples


def test_wavefront_groups_tile_coherent_fold():
    """Interleave under the tile-coherent lane map (the mesh bench
    shape): group planes roll-fold back to the G=1 sums; event counters
    (all but the iteration count) stay bit-exact."""
    from zraytrace_tpu.render import _interleave_shift, wavefront_trace

    scene, camera = _mini_scene()
    w, h, spp, depth = 64, 16, 3, 4
    n = 1024  # 1x2 tiles of 512
    base = jnp.arange(n, dtype=jnp.int32)
    s1, c1 = wavefront_trace(scene, camera, base, 7, w, h, spp, depth,
                             0, None, n, w * h, 1, None, True, 1)
    G = 2
    sg, cg = wavefront_trace(scene, camera, base, 7, w, h, spp, depth,
                             0, None, n, w * h, 1, None, True, G)
    np.testing.assert_array_equal(np.asarray(c1)[:5], np.asarray(cg)[:5])
    shf = _interleave_shift(n, G, True)
    fold = np.zeros((n, 3), np.float32)
    for g in range(G):
        fold += np.roll(np.asarray(sg[g]), g * shf, axis=0)
    np.testing.assert_allclose(np.asarray(s1)[0], fold,
                               rtol=1e-5, atol=1e-6)


def test_use_pallas_auto_resolution():
    """use_pallas=None resolves by backend: CPU keeps the XLA wavefront
    (the interpreter-mode kernel is for tests); explicit True/False
    force. Auto-CPU must be image-identical to explicit False."""
    scene, camera = _mini_scene()
    p_auto = RenderParams(width=8, height=8, samples_per_pixel=2,
                          max_depth=3)
    p_off = RenderParams(width=8, height=8, samples_per_pixel=2,
                         max_depth=3, use_pallas=False)
    img_a, st_a = render(scene, camera, p_auto)
    img_o, st_o = render(scene, camera, p_off)
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_o))
    assert st_a.rays == st_o.rays


def test_wavefront_groups_auto_policy():
    """wavefront_sample_groups=None resolves by mesh scale: G=4 at goat
    scale (>= 32768 triangles, straggler-bound dispatches — hardware
    +11%, PERF.md round 3), G=1 below; explicit ints force; always
    clamped to spp."""
    from types import SimpleNamespace

    from zraytrace_tpu.render import wavefront_groups

    p_auto = RenderParams()
    small = SimpleNamespace(n_triangles=6320)   # teapot-size
    goat = SimpleNamespace(n_triangles=158000)  # goat-size
    assert wavefront_groups(p_auto, small, spp=64) == 1
    assert wavefront_groups(p_auto, goat, spp=64) == 4
    assert wavefront_groups(p_auto, goat, spp=2) == 2  # spp clamp
    p_forced = RenderParams(wavefront_sample_groups=2)
    assert wavefront_groups(p_forced, small, spp=64) == 2
    assert wavefront_groups(p_forced, goat, spp=64) == 2
