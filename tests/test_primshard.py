"""Primitive-sharded intersection (SURVEY.md §2 stretch goal): triangles
split over the data axis, per-ray winners reduced with XLA collectives.
Must match the single-device brute intersector exactly, including the
list-order tie-break."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zraytrace_tpu.geometry.triangle import intersect_triangles
from zraytrace_tpu.parallel.mesh import make_mesh
from zraytrace_tpu.parallel.primshard import make_sharded_intersector

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_sharded_intersection_matches_single_device():
    from zraytrace_tpu.scenes import man_and_ball

    built = man_and_ball()
    s = built.scene
    mesh = make_mesh(n_data=8, n_sample=1)
    fn = make_sharded_intersector(mesh, s.n_triangles)

    rng = np.random.default_rng(11)
    n = 1024
    o = jnp.asarray(rng.random((n, 3)) * 30 - 15, jnp.float32)
    # aim at the mesh so a good fraction of rays hit
    centroid = np.asarray(s.tri_a).mean(axis=0)
    jitter = rng.standard_normal((n, 3)) * 2.0
    d0 = centroid + jitter - np.asarray(o)
    d = jnp.asarray(d0 / np.linalg.norm(d0, axis=1, keepdims=True),
                    jnp.float32)

    t_s, i_s, hit_s, uv_s = fn(s.tri_a, s.tri_b, s.tri_c, o, d)
    t_b, i_b, hit_b, uv_b = intersect_triangles(
        o, d, s.tri_a, s.tri_b, s.tri_c, 1e-3, 3.4e38)

    np.testing.assert_array_equal(np.asarray(hit_s), np.asarray(hit_b))
    m = np.asarray(hit_b)
    assert m.sum() > 100  # enough hits for the test to mean something
    # t agrees to rounding (per-shard slices fuse differently than the
    # full-array chunked loop); the winning triangle must match exactly
    np.testing.assert_allclose(np.asarray(t_s)[m], np.asarray(t_b)[m],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_s)[m], np.asarray(i_b)[m])
    np.testing.assert_allclose(np.asarray(uv_s)[m], np.asarray(uv_b)[m],
                               rtol=1e-6, atol=1e-7)
