"""Intersection tests mirroring the reference's exact-value checks
(sphere.zig:72-84, triangle.zig:84-118) plus batched/negative-radius cases."""

import numpy as np
import jax.numpy as jnp

from zraytrace_tpu import vecmath as vm
from zraytrace_tpu.geometry.sphere import intersect_spheres, sphere_surface
from zraytrace_tpu.geometry.triangle import intersect_triangles, triangle_surface

T_MIN, T_MAX = 0.1, 10000.0


def _rays(o, d):
    o = jnp.asarray(o, jnp.float32).reshape(-1, 3)
    d = vm.normalize(jnp.asarray(d, jnp.float32).reshape(-1, 3))
    return o, d


class TestSphere:
    def test_head_on_hit(self):
        o, d = _rays([0, 0, -5.0], [0, 0, 1.0])
        centers = jnp.array([[0.0, 0.0, 0.0]])
        radii = jnp.array([1.0])
        t, idx, hit = intersect_spheres(o, d, centers, radii, T_MIN, T_MAX)
        assert bool(hit[0])
        np.testing.assert_allclose(t[0], 4.0, rtol=1e-5)
        p, n, uv = sphere_surface(o, d, t, idx, centers, radii)
        np.testing.assert_allclose(p[0], [0, 0, -1.0], atol=1e-5)
        np.testing.assert_allclose(n[0], [0, 0, -1.0], atol=1e-5)

    def test_miss(self):
        o, d = _rays([0, 5.0, -5.0], [0, 0, 1.0])
        t, idx, hit = intersect_spheres(
            o, d, jnp.array([[0.0, 0.0, 0.0]]), jnp.array([1.0]), T_MIN, T_MAX
        )
        assert not bool(hit[0])

    def test_inside_uses_far_root(self):
        # Ray origin inside the sphere: near root is behind t_min
        # (sphere.zig:56-68).
        o, d = _rays([0, 0, 0.0], [0, 0, 1.0])
        t, idx, hit = intersect_spheres(
            o, d, jnp.array([[0.0, 0.0, 0.0]]), jnp.array([2.0]), T_MIN, T_MAX
        )
        assert bool(hit[0])
        np.testing.assert_allclose(t[0], 2.0, rtol=1e-5)

    def test_negative_radius_gives_inward_normal(self):
        # Hollow-glass trick (sphere.zig:45, scenes.zig:96).
        o, d = _rays([0, 0, -5.0], [0, 0, 1.0])
        centers = jnp.array([[0.0, 0.0, 0.0]])
        for radius, expected_nz in [(1.0, -1.0), (-1.0, 1.0)]:
            radii = jnp.array([radius])
            t, idx, hit = intersect_spheres(o, d, centers, radii, T_MIN, T_MAX)
            _, n, _ = sphere_surface(o, d, t, idx, centers, radii)
            np.testing.assert_allclose(n[0], [0, 0, expected_nz], atol=1e-5)

    def test_closest_of_many_and_tie_break(self):
        o, d = _rays([0, 0, -5.0], [0, 0, 1.0])
        centers = jnp.array([[0.0, 0.0, 4.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
        radii = jnp.array([1.0, 1.0, 1.0])
        t, idx, hit = intersect_spheres(o, d, centers, radii, T_MIN, T_MAX)
        # spheres 1 and 2 are identical: first in table wins
        assert int(idx[0]) == 1
        np.testing.assert_allclose(t[0], 4.0, rtol=1e-5)

    def test_uv_poles_and_seam(self):
        # UV per sphere.zig:47-51: u from atan2(-z,-x)+pi, v from acos(-y).
        o, d = _rays([[0, -5.0, 0]], [[0, 1.0, 0]])
        centers = jnp.array([[0.0, 0.0, 0.0]])
        radii = jnp.array([1.0])
        t, idx, hit = intersect_spheres(o, d, centers, radii, T_MIN, T_MAX)
        _, _, uv = sphere_surface(o, d, t, idx, centers, radii)
        # hit point (0,-1,0): theta = acos(1) = 0 -> v = 0 (up to the
        # 1e-7 pole clip that keeps d(arccos) finite for gradients)
        np.testing.assert_allclose(uv[0, 1], 0.0, atol=2e-3)


class TestTriangle:
    A = [10.0, 5.0, 1.0]
    B = [-10.0, -10.0, 1.0]
    C = [-10.0, 10.0, 1.0]

    def _scene(self):
        return (
            jnp.array([self.A], jnp.float32),
            jnp.array([self.B], jnp.float32),
            jnp.array([self.C], jnp.float32),
        )

    def test_reference_hit(self):
        # triangle.zig:100-118: exact t=11, normal (0,0,-1), front face.
        a, b, c = self._scene()
        o, d = _rays([0.0, 0.0, -10.0], [0.0, 0.0, 1.0])
        t, idx, hit, uv = intersect_triangles(o, d, a, b, c, T_MIN, T_MAX)
        assert bool(hit[0])
        np.testing.assert_allclose(t[0], 11.0, rtol=1e-5)
        p, n = triangle_surface(o, d, t, idx, a, b, c)
        np.testing.assert_allclose(p[0], [0.0, 0.0, 1.0], atol=1e-5)
        # Outward normal per winding; the ray faces it (front face) after
        # the hit-record flip the normal is (0,0,-1).
        front = vm.dot(d, n) <= 0
        flipped = np.where(np.asarray(front)[:, None], np.asarray(n), -np.asarray(n))
        np.testing.assert_allclose(flipped[0], [0.0, 0.0, -1.0], atol=1e-5)

    def test_reference_miss(self):
        # triangle.zig:84-98
        a = jnp.array([[1.0, 0.0, 0.0]])
        b = jnp.array([[0.0, 1.0, 0.0]])
        c = jnp.array([[0.0, 0.0, 1.0]])
        o, d = _rays([1.0, 1.0, 1.0], [1.0, 1.0, 1.0])
        t, idx, hit, uv = intersect_triangles(o, d, a, b, c, T_MIN, T_MAX)
        assert not bool(hit[0])

    def test_backface_culled(self):
        # det >= 1e-6 one-sidedness (triangle.zig:62): approaching from the
        # other side must miss.
        a, b, c = self._scene()
        o, d = _rays([0.0, 0.0, 10.0], [0.0, 0.0, -1.0])
        t, idx, hit, uv = intersect_triangles(o, d, a, b, c, T_MIN, T_MAX)
        assert not bool(hit[0])

    def test_chunked_path_matches_single(self):
        rng = np.random.default_rng(7)
        T = 1000
        a = jnp.asarray(rng.normal(size=(T, 3)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(T, 3)), jnp.float32)
        c = jnp.asarray(rng.normal(size=(T, 3)), jnp.float32)
        o = jnp.asarray(rng.normal(size=(64, 3)) * 5, jnp.float32)
        d = vm.normalize(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32))
        t1, i1, h1, uv1 = intersect_triangles(o, d, a, b, c, T_MIN, T_MAX, chunk=2000)
        t2, i2, h2, uv2 = intersect_triangles(o, d, a, b, c, T_MIN, T_MAX, chunk=128)
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_barycentric_uv(self):
        # Hit exactly at vertex b -> u = 1 (u weights e1 = b - a).
        a = jnp.array([[0.0, 0.0, 5.0]])
        b = jnp.array([[2.0, 0.0, 5.0]])
        c = jnp.array([[0.0, -2.0, 5.0]])  # winding so det > 0 for +z ray
        o, d = _rays([1.99, -0.005, 0.0], [0.0, 0.0, 1.0])
        t, idx, hit, uv = intersect_triangles(o, d, a, b, c, T_MIN, T_MAX)
        assert bool(hit[0])
        np.testing.assert_allclose(uv[0, 0], 0.995, atol=1e-3)
