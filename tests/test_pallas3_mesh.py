"""Mesh megakernel (bounce_kernel3 deferred mesh-hit stall) tests,
interpreter mode.

Mixed scenes (spheres + const-material triangle mesh) route triangle
intersection to the flash RL kernel ONCE per launch: a segment whose
ray can reach the mesh root AABB inside its sphere-winner distance
blocks (the existing suppress-and-replay mechanism) and merges the
glue's answer on replay. Blocking changes timing, never events, so
event counters must be bit-exact vs the XLA mesh wavefront; images
inherit the polynomial-atan2 texel-flip tolerance on textured scenes
(see test_pallas3) and match to float noise on texture-free ones.

Reference semantics under test: closest-hit merge with sphere-wins-ties
(raytrace.zig:75-81 insertion order), triangle normal/material
(triangle.zig:44-69), metal scatter on mesh normals (material.zig:71+).
"""

import numpy as np
import jax.numpy as jnp

from zraytrace_tpu import camera as cam
from zraytrace_tpu.config import RenderParams
from zraytrace_tpu.geometry.bvh import build_tri_bvh
from zraytrace_tpu.ops.bounce_kernel3 import wavefront_trace_pallas3
from zraytrace_tpu.ops.flash_intersect import pack_tri_planes
from zraytrace_tpu.render import mesh_pallas_wanted, render, wavefront_trace
from zraytrace_tpu.scene import SceneBuilder, mesh_materials_const


def _pyramid(center=(1.0, -0.4, -1.0), half=0.4, apex_y=0.8):
    cx, cy, cz = center
    bp = [(cx - half, cy, cz + half), (cx + half, cy, cz + half),
          (cx + half, cy, cz - half), (cx - half, cy, cz - half)]
    apex = (cx, apex_y, cz)
    a, b, c = [], [], []
    for i in range(4):
        a.append(bp[i])
        b.append(bp[(i + 1) % 4])
        c.append(apex)
    # base quad (two triangles) so downward rays can hit mesh too
    a.append(bp[0]); b.append(bp[2]); c.append(bp[1])
    a.append(bp[0]); b.append(bp[3]); c.append(bp[2])
    return (np.array(a, np.float32), np.array(b, np.float32),
            np.array(c, np.float32))


def _mixed_scene(textured: bool):
    b = SceneBuilder()
    if textured:
        img = (np.arange(8 * 16 * 3).reshape(8, 16, 3) % 37
               ).astype(np.float32) / 36.0
        ground = b.add_lambertian(b.add_image_texture(img))
    else:
        ground = b.add_lambertian_color((0.5, 0.5, 0.5))
    b.add_sphere((0.0, -100.5, -1.0), 100.0, ground)
    b.add_sphere((-1.2, 0.0, -1.0), 0.5, b.add_metal_color((0.8, 0.6, 0.2)))
    b.add_sphere((0.0, 0.0, -0.6), 0.3, b.add_dielectric(1.5))
    ta, tb, tc = _pyramid()
    b.add_triangles(ta, tb, tc, b.add_metal_color((0.9, 0.9, 0.9)))
    return b.build()


def _camera():
    return cam.make_camera((0, 0.5, 2.0), (0.3, 0, -1), (0, 1, 0), 60.0, 1.0)


def _flash(scene):
    order = build_tri_bvh(scene.tri_a, scene.tri_b, scene.tri_c).prim_order
    return pack_tri_planes(scene.tri_a, scene.tri_b, scene.tri_c,
                           order=order, tri_mat=scene.tri_mat,
                           const_materials=True)


def _run(scene, tf, w, h, spp, depth, n, n_slots, B, G=1, seed=42):
    base = jnp.arange(n, dtype=jnp.int32)
    sx, cx = wavefront_trace(scene, _camera(), base, seed, w, h, spp,
                             depth, 0, None, n, w * h, n_slots)
    sp, cp = wavefront_trace_pallas3(scene, _camera(), base, seed, w, h,
                                     spp, depth, 0, n_slots, n, w * h,
                                     n_bounce=B, sample_groups=G,
                                     tri_flash=tf)
    return (np.asarray(sx), np.asarray(cx), np.asarray(sp), np.asarray(cp))


def test_mesh_kernel_counters_and_image_exact_untextured():
    """No image textures => no polynomial-uv consumers: counters
    bit-exact AND sums equal to float noise (no texel flips)."""
    scene = _mixed_scene(textured=False)
    tf = _flash(scene)
    sx, cx, sp, cp = _run(scene, tf, 16, 16, 2, 6, 256, 1, 6)
    np.testing.assert_array_equal(cx[:5], cp[:5])
    np.testing.assert_allclose(sx, sp, atol=1e-5)


def test_mesh_kernel_counters_exact_textured_all_configs():
    """Texel deferral and mesh stalls interleave: counters stay
    bit-exact across slot counts, launch caps and sample groups."""
    scene = _mixed_scene(textured=True)
    tf = _flash(scene)
    for n, n_slots, B, G in ((256, 1, 2, 1), (128, 2, 8, 2),
                             (256, 1, 32, 4)):
        sx, cx, sp, cp = _run(scene, tf, 16, 16, 4, 8, n, n_slots, B, G)
        np.testing.assert_array_equal(cx[:5], cp[:5])
        # textured: atan2-poly texel flips allowed, must stay rare
        if G == 1:
            diff = np.abs(sx - sp)
            assert (diff > 1e-4).mean() < 0.05
            assert np.median(diff) < 1e-5


def test_mesh_kernel_B1_per_bounce_mode():
    """n_bounce=1 degenerates to a per-bounce flash+shade pipeline —
    every segment blocks at most once and replays immediately."""
    scene = _mixed_scene(textured=False)
    tf = _flash(scene)
    sx, cx, sp, cp = _run(scene, tf, 16, 16, 2, 4, 256, 1, 1)
    np.testing.assert_array_equal(cx[:5], cp[:5])
    np.testing.assert_allclose(sx, sp, atol=1e-5)


def test_render_routes_mesh_pallas():
    """render(pallas_mesh=True) must take the megakernel and reproduce
    the XLA path's stats exactly."""
    scene = _mixed_scene(textured=True)
    assert mesh_materials_const(scene)
    cam_ = _camera()
    p_x = RenderParams(width=16, height=16, samples_per_pixel=4,
                       max_depth=8, use_pallas=False)
    p_m = RenderParams(width=16, height=16, samples_per_pixel=4,
                       max_depth=8, pallas_mesh=True,
                       pallas_max_wavefront=256, pallas_sample_groups=2,
                       pallas_bounces=8)
    assert mesh_pallas_wanted(p_m, scene, 256)
    # auto (None) resolves by backend: off on CPU, on for a real TPU
    # (hardware-measured, render.mesh_pallas_wanted docstring)
    assert not mesh_pallas_wanted(p_x, scene, 256)
    img_x, st_x = render(scene, cam_, p_x)
    img_m, st_m = render(scene, cam_, p_m)
    for f in ("rays", "reflections", "background_hits",
              "recursion_depth_hits", "samples"):
        assert getattr(st_x, f) == getattr(st_m, f), f
    diff = np.abs(img_x - img_m)
    # 16x16@4spp: a handful of atan2-poly texel flips out of 768
    # subpixels — slightly looser bound than the large-image tests
    assert (diff > 1e-4).mean() < 0.08
    assert np.median(diff) < 1e-5


def test_sphere_only_kernel_unchanged():
    """The sphere-only (has_mesh=False) program is pinned to a golden
    capture recorded before the mesh feature landed: counters exactly,
    sums by f64 total (interpret mode is deterministic). Guards the
    official bench engine against regressions from mesh-feature (or
    any other) kernel3 changes."""
    b = SceneBuilder()
    b.add_sphere((0.0, -100.5, -1.0), 100.0,
                 b.add_lambertian_color((0.5, 0.5, 0.5)))
    b.add_sphere((0.0, 0.0, -1.0), 0.5, b.add_metal_color((0.8, 0.6, 0.2)))
    scene = b.build()
    base = jnp.arange(256, dtype=jnp.int32)
    s1, c1 = wavefront_trace_pallas3(scene, _camera(), base, 42, 16, 16,
                                     2, 6, 0, 1, 256, 256, n_bounce=6)
    golden_counters = [[0, 868], [0, 359], [0, 509], [0, 3], [0, 512],
                       [0, 12]]
    np.testing.assert_array_equal(np.asarray(c1), golden_counters)
    s = np.asarray(s1)
    # f32 image total drifts ~1e-8 relative with XLA:CPU device count
    # (fusion reassociation); a real kernel regression moves it orders
    # of magnitude more
    np.testing.assert_allclose(s.astype(np.float64).sum(),
                               869.3695678710938, rtol=1e-6)
    assert float(np.abs(s).max()) == 2.0
