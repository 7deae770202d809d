"""Transform/instancing tests (the reference's dead geometry.zig layer,
implemented for real + differentiable)."""

import jax
import jax.numpy as jnp
import numpy as np

from zraytrace_tpu.render_diff import render_diff
from zraytrace_tpu.transforms import (
    Pose,
    apply_points,
    rotation_matrix,
    transform_spheres,
    transform_triangles,
)


def test_identity():
    p = Pose.identity()
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(10, 3)), jnp.float32)
    np.testing.assert_allclose(apply_points(p, pts), pts, atol=1e-6)


def test_rotation_matrix_properties():
    aa = jnp.array([0.3, -0.2, 0.9])
    R = np.asarray(rotation_matrix(aa))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)
    # rotation about z by 90 degrees maps x->y
    Rz = np.asarray(rotation_matrix(jnp.array([0.0, 0.0, np.pi / 2])))
    np.testing.assert_allclose(Rz @ np.array([1.0, 0, 0]), [0, 1.0, 0], atol=1e-6)


def test_translate_spheres_with_mask():
    from tests.test_render import _mini_scene

    scene, _ = _mini_scene()
    pose = Pose.identity()._replace(translation=jnp.array([1.0, 2.0, 3.0]))
    mask = jnp.array([True, False, False, False])
    s2 = transform_spheres(scene, pose, mask)
    np.testing.assert_allclose(
        np.asarray(s2.sph_center[0]), np.asarray(scene.sph_center[0]) + [1, 2, 3],
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(s2.sph_center[1:]), np.asarray(scene.sph_center[1:])
    )


def test_pose_gradients_flow_through_render():
    from tests.test_render import _mini_scene

    scene, camera = _mini_scene()

    def loss(translation):
        pose = Pose.identity()._replace(translation=translation)
        s2 = transform_spheres(scene, pose)
        img = render_diff(s2, camera, 8, 8, 2, 3)
        return jnp.mean(img)

    g = np.asarray(jax.grad(loss)(jnp.zeros(3, jnp.float32)))
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_transform_triangles_scale():
    a = jnp.array([[1.0, 0.0, 0.0]])
    b = jnp.array([[0.0, 1.0, 0.0]])
    c = jnp.array([[0.0, 0.0, 1.0]])
    from zraytrace_tpu.scene import SceneBuilder

    sb = SceneBuilder()
    sb.add_lambertian_color((0.5, 0.5, 0.5))
    sb.add_triangle(a[0], b[0], c[0], 0)
    scene = sb.build()
    pose = Pose.identity()._replace(scale=jnp.float32(2.0))
    s2 = transform_triangles(scene, pose)
    np.testing.assert_allclose(np.asarray(s2.tri_a[0]), [2.0, 0, 0], atol=1e-6)
