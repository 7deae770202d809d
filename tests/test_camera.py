"""Camera tests (camera.zig:59-77 semantics)."""

import numpy as np
import jax.numpy as jnp

from zraytrace_tpu.camera import get_rays, make_camera, pixel_uv


def test_origin_is_look_from():
    c = make_camera((1.0, 0, 0), (0, 0, 1.0), (0, 1.0, 0), 45.0, 1.0)
    np.testing.assert_allclose(c.origin, [1.0, 0, 0])


def test_center_ray_points_at_look_at():
    look_from = np.array([0.0, 0.0, -7.0])
    look_at = np.array([0.0, 0.0, 1.0])
    c = make_camera(look_from, look_at, (0, 1.0, 0), 45.0, 1.0)
    o, d = get_rays(c, jnp.array([0.5]), jnp.array([0.5]))
    expected = (look_at - look_from) / np.linalg.norm(look_at - look_from)
    np.testing.assert_allclose(np.asarray(d)[0], expected, atol=1e-6)
    np.testing.assert_allclose(np.asarray(o)[0], look_from)


def test_rays_unit_length():
    c = make_camera((0, 0, -7.0), (0, 0, 1.0), (0, 1.0, 0), 45.0, 1.0)
    u = jnp.linspace(0.0, 1.0, 13)
    v = jnp.linspace(0.0, 1.0, 13)
    uu, vv = jnp.meshgrid(u, v)
    _, d = get_rays(c, uu.ravel(), vv.ravel())
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-6)


def test_fov_spans_expected_angle():
    # vfov 90 at aspect 1: the vertical viewport half-angle is 45 degrees.
    c = make_camera((0, 0, 0), (0, 0, -1.0), (0, 1.0, 0), 90.0, 1.0)
    _, d_bottom = get_rays(c, jnp.array([0.5]), jnp.array([0.0]))
    _, d_top = get_rays(c, jnp.array([0.5]), jnp.array([1.0]))
    cosang = float(jnp.sum(d_bottom[0] * d_top[0]))
    np.testing.assert_allclose(np.degrees(np.arccos(cosang)), 90.0, atol=1e-3)


def test_pixel_uv_matches_reference_formula():
    # raytrace.zig:174-175
    u, v = pixel_uv(3.0, 5.0, 0.25, 0.75, 10.0, 20.0)
    np.testing.assert_allclose(u, (3.0 + 0.25 - 0.5) / 10.0)
    np.testing.assert_allclose(v, (5.0 + 0.75 - 0.5) / 20.0)
