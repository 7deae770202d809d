"""Math-core unit tests mirroring the reference's exact-value checks
(vector.zig:164-255, ray.zig:32-39)."""

import numpy as np
import jax.numpy as jnp

from zraytrace_tpu import vecmath as vm


def test_dot_units():
    x = jnp.array([1.0, 0.0, 0.0])
    y = jnp.array([0.0, 1.0, 0.0])
    z = jnp.array([0.0, 0.0, 1.0])
    assert float(vm.dot(x, y)) == 0.0
    assert float(vm.dot(x, x)) == 1.0
    assert float(vm.dot(y, z)) == 0.0


def test_cross_right_handed():
    x = jnp.array([1.0, 0.0, 0.0])
    y = jnp.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(vm.cross(x, y), [0.0, 0.0, 1.0])


def test_normalize_matches_reference_values():
    # vector.zig:232-236: (3,-4,0) -> (0.6,-0.8,0)
    v = jnp.array([3.0, -4.0, 0.0])
    np.testing.assert_allclose(vm.normalize(v), [0.6, -0.8, 0.0], rtol=1e-6)


def test_normalize_zero_is_nan_but_safe_is_zero():
    z = jnp.zeros(3)
    assert np.all(np.isnan(np.asarray(vm.normalize(z))))
    np.testing.assert_array_equal(vm.normalize_safe(z), np.zeros(3))


def test_reflect():
    v = jnp.array([1.0, -1.0, 0.0])
    n = jnp.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(vm.reflect(v, n), [1.0, 1.0, 0.0])


def test_refract_straight_through_at_ratio_one():
    v = vm.normalize(jnp.array([0.0, -1.0, 0.1]))
    n = jnp.array([0.0, 1.0, 0.0])
    out = vm.refract(v, n, 1.0)
    np.testing.assert_allclose(out, v, atol=1e-6)


def test_refract_bends_toward_normal_entering_dense():
    v = vm.normalize(jnp.array([1.0, -1.0, 0.0]))
    n = jnp.array([0.0, 1.0, 0.0])
    out = np.asarray(vm.refract(v, n, 1.0 / 1.5))
    # sin(theta_out) = sin(theta_in)/1.5
    assert abs(out[0] - np.sin(np.arcsin(np.sqrt(0.5)) * 0) - (np.sqrt(0.5) / 1.5)) < 1e-6
    assert out[1] < 0  # still travelling downward
    np.testing.assert_allclose(np.linalg.norm(out), 1.0, rtol=1e-6)


def test_ray_at_matches_reference():
    # ray.zig:32-39: origin (1,1,1), dir (1,2,3) normalized, t=2
    o = jnp.array([1.0, 1.0, 1.0])
    d = vm.normalize(jnp.array([1.0, 2.0, 3.0]))
    p = vm.ray_at(o, d, jnp.float32(2.0))
    np.testing.assert_allclose(
        p, [1.53452253, 2.06904506, 2.60356736], rtol=1e-6
    )


def test_batched_shapes():
    o = jnp.zeros((5, 3))
    d = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (5, 1))
    t = jnp.arange(5.0)
    assert vm.ray_at(o, d, t).shape == (5, 3)
    assert vm.dot(o, d).shape == (5,)
