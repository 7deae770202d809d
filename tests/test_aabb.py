"""AABB tests mirroring the reference's exact-value checks
(aabb.zig:147-254)."""

import numpy as np
import jax.numpy as jnp

from zraytrace_tpu.geometry import aabb


def _box(mn, mx):
    return aabb.from_min_max(jnp.asarray(mn), jnp.asarray(mx))


def test_from_vertices():
    verts = jnp.array([[1.0, 2.0, 3.0], [-1.0, 5.0, 0.0], [0.0, 0.0, 10.0]])
    b = aabb.from_vertices(verts)
    np.testing.assert_allclose(b[0], [-1.0, 0.0, 0.0])
    np.testing.assert_allclose(b[1], [1.0, 5.0, 10.0])


def test_merge():
    a = _box([0, 0, 0], [1, 1, 1])
    b = _box([-1, 0.5, 0], [0.5, 2, 3])
    m = aabb.merge(a, b)
    np.testing.assert_allclose(m[0], [-1, 0, 0])
    np.testing.assert_allclose(m[1], [1, 2, 3])


def test_merge_all():
    boxes = jnp.stack([_box([0, 0, 0], [1, 1, 1]), _box([2, -1, 0], [3, 0, 5])])
    m = aabb.merge_all(boxes)
    np.testing.assert_allclose(m[0], [0, -1, 0])
    np.testing.assert_allclose(m[1], [3, 1, 5])


def test_volume():
    assert float(aabb.volume(_box([0, 0, 0], [2, 3, 4]))) == 24.0


def test_surface_area_reference_formula():
    # aabb.zig:99-107 computes 2(dx^2+dy^2+dz^2) — kept verbatim.
    b = _box([0, 0, 0], [1, 2, 3])
    assert float(aabb.surface_area_reference(b)) == 2.0 * (1 + 4 + 9)
    # the true area differs (what SAH uses)
    assert float(aabb.surface_area(b)) == 2.0 * (2 + 6 + 3)


def test_slab_hit():
    b = _box([-1, -1, -1], [1, 1, 1])
    o = jnp.array([0.0, 0.0, -5.0])
    d = jnp.array([0.0, 0.0, 1.0])
    inv = 1.0 / d
    assert bool(aabb.hit(b, o, inv, 1e-3, 1e30))
    # pointing away
    assert not bool(aabb.hit(b, o, 1.0 / jnp.array([0.0, 0.0, -1.0]).at[2].set(-1.0), 1e-3, 1e30))
    # sideways miss
    o2 = jnp.array([5.0, 0.0, -5.0])
    assert not bool(aabb.hit(b, o2, inv, 1e-3, 1e30))


def test_slab_hit_axis_parallel_ray():
    # division by zero direction components: inf handled by min/max swap
    b = _box([-1, -1, -1], [1, 1, 1])
    o = jnp.array([0.0, 0.0, -5.0])
    d = jnp.array([0.0, 0.0, 1.0])
    inv = jnp.where(jnp.abs(d) > 1e-20, 1.0 / d, 1e20)
    assert bool(aabb.hit(b, o, inv, 1e-3, 1e30))


def test_batched_boxes_and_rays():
    boxes = jnp.stack(
        [_box([-1, -1, 4], [1, 1, 6]), _box([3, 3, 3], [4, 4, 4])]
    )  # (2, 2, 3)
    o = jnp.array([0.0, 0.0, 0.0])
    inv = 1.0 / jnp.array([1e-9, 1e-9, 1.0])
    hits = aabb.hit(boxes, o, inv, 1e-3, 1e30)
    assert hits.shape == (2,)
    assert bool(hits[0]) and not bool(hits[1])
