"""Material megakernel tests (material.zig semantics)."""

import numpy as np
import jax.numpy as jnp

from zraytrace_tpu import scene as sc
from zraytrace_tpu import vecmath as vm
from zraytrace_tpu.materials import scatter, schlick_reflectance
from zraytrace_tpu.scene import SceneBuilder


def _scene_with(kind, ior=1.52, color=(0.5, 0.6, 0.7)):
    b = SceneBuilder()
    if kind == sc.LAMBERTIAN:
        b.add_lambertian_color(color)
    elif kind == sc.METAL:
        b.add_metal_color(color)
    else:
        b.add_dielectric(ior)
    b.add_sphere((0, 0, 0), 1.0, 0)
    return b.build()


def _shade(scene, d_in, normal, front_face=True, rnd=None):
    n = 1
    d_in = vm.normalize(jnp.asarray(d_in, jnp.float32).reshape(n, 3))
    normal = jnp.asarray(normal, jnp.float32).reshape(n, 3)
    ff = jnp.full((n,), front_face)
    uv = jnp.zeros((n, 2), jnp.float32)
    mat = jnp.zeros((n,), jnp.int32)
    if rnd is None:
        rnd = jnp.full((n, 4), 0.5, jnp.float32)
    else:
        rnd = jnp.asarray(rnd, jnp.float32).reshape(n, 4)
    return scatter(scene, d_in, normal, ff, uv, mat, rnd)


class TestMetal:
    def test_perfect_mirror(self):
        scene = _scene_with(sc.METAL)
        d, att, absorbed = _shade(scene, [1.0, -1.0, 0.0], [0.0, 1.0, 0.0])
        np.testing.assert_allclose(
            np.asarray(d)[0], np.array([1.0, 1.0, 0.0]) / np.sqrt(2), atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(att)[0], [0.5, 0.6, 0.7], rtol=1e-6)
        assert not bool(absorbed[0])

    def test_absorbs_below_surface(self):
        # material.zig:91-96: grazing/below-surface reflection is absorbed.
        scene = _scene_with(sc.METAL)
        # Reflection of a ray parallel to the surface has dot(refl, n) == 0.
        d, att, absorbed = _shade(scene, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0])
        assert bool(absorbed[0])


class TestLambertian:
    def test_direction_in_upper_hemisphere_mostly(self):
        scene = _scene_with(sc.LAMBERTIAN)
        n = 2000
        rng = np.random.default_rng(0)
        d_in = vm.normalize(jnp.asarray([[0.3, -1.0, 0.1]] * n, jnp.float32))
        normal = jnp.asarray([[0.0, 1.0, 0.0]] * n, jnp.float32)
        rnd = jnp.asarray(rng.random((n, 4)), jnp.float32)
        d, att, absorbed = scatter(
            scene, d_in, normal, jnp.ones(n, bool),
            jnp.zeros((n, 2)), jnp.zeros(n, jnp.int32), rnd,
        )
        d = np.asarray(d)
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
        # normal + unit vector: cosine-weighted, always upper hemisphere
        assert (d[:, 1] > -1e-6).all()
        assert not np.asarray(absorbed).any()
        np.testing.assert_allclose(np.asarray(att)[0], [0.5, 0.6, 0.7], rtol=1e-6)


class TestDielectric:
    def test_attenuation_white_and_never_absorbs(self):
        scene = _scene_with(sc.DIELECTRIC)
        d, att, absorbed = _shade(scene, [0.0, -1.0, 0.0], [0.0, 1.0, 0.0])
        np.testing.assert_allclose(np.asarray(att)[0], [1.0, 1.0, 1.0])
        assert not bool(absorbed[0])

    def test_head_on_refracts_straight(self):
        scene = _scene_with(sc.DIELECTRIC)
        # head-on: cos=1 -> schlick = r0 = (1-1/1.52)/(1+1/1.52) ~ 0.206;
        # rnd=0.5 > 0.206 -> refract; straight through.
        d, _, _ = _shade(scene, [0.0, -1.0, 0.0], [0.0, 1.0, 0.0])
        np.testing.assert_allclose(np.asarray(d)[0], [0.0, -1.0, 0.0], atol=1e-6)

    def test_total_internal_reflection(self):
        scene = _scene_with(sc.DIELECTRIC)
        # Inside glass (back face, ratio = 1.52), grazing incidence:
        # ratio*sin > 1 -> must reflect regardless of rnd.
        d_in = [1.0, -0.3, 0.0]
        d, _, _ = _shade(
            scene, d_in, [0.0, 1.0, 0.0], front_face=False, rnd=[0.5, 0.5, 0.99, 0.5]
        )
        expected = vm.reflect(vm.normalize(jnp.asarray([d_in], jnp.float32)),
                              jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32))
        np.testing.assert_allclose(np.asarray(d)[0], np.asarray(expected)[0], atol=1e-6)

    def test_schlick_matches_reference_formula(self):
        # material.zig:125-127 — r0 is NOT squared in the reference.
        cos, ratio = 0.7, 1.0 / 1.52
        r0 = (1.0 - ratio) / (1.0 + ratio)
        expected = r0 + (1.0 - r0) * (1.0 - cos) ** 5
        np.testing.assert_allclose(
            float(schlick_reflectance(jnp.float32(cos), jnp.float32(ratio))),
            expected,
            rtol=1e-6,
        )

    def test_stochastic_fresnel_uses_rnd(self):
        scene = _scene_with(sc.DIELECTRIC)
        # Glancing hit from outside: schlick(cos small) is large -> with
        # rnd < schlick we reflect, with rnd ~ 1 we refract.
        d_in = [1.0, -0.1, 0.0]
        d_reflect, _, _ = _shade(scene, d_in, [0, 1.0, 0], rnd=[0.5, 0.5, 0.0, 0.5])
        d_refract, _, _ = _shade(scene, d_in, [0, 1.0, 0], rnd=[0.5, 0.5, 0.9999, 0.5])
        assert np.asarray(d_reflect)[0, 1] > 0  # bounced up
        assert np.asarray(d_refract)[0, 1] < 0  # went through
