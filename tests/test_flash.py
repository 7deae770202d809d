"""Flash-intersect kernel tests (interpreter mode): must agree exactly
with the XLA brute-force intersection, including tie-breaks."""

import jax.numpy as jnp
import numpy as np
import pytest

from zraytrace_tpu import vecmath as vm
from zraytrace_tpu.geometry.triangle import intersect_triangles
from zraytrace_tpu.ops.flash_intersect import (
    R_RAYS,
    flash_intersect_triangles,
    pack_tri_planes,
)


def _tri_soup(rng, n):
    base = rng.normal(size=(n, 3)) * 5
    f = lambda: jnp.asarray(base + rng.normal(size=(n, 3)) * 0.4, jnp.float32)
    return f(), f(), f()


@pytest.mark.parametrize("n_tris", [3, 128, 700])
def test_matches_brute(n_tris):
    # local rng: the shared session fixture is consumption-order
    # dependent across test files
    rng = np.random.default_rng(1000 + n_tris)
    a, b, c = _tri_soup(rng, n_tris)
    n = R_RAYS
    o = jnp.asarray(rng.normal(size=(n, 3)) * 12, jnp.float32)
    cent = (a + b + c) / 3.0
    tgt = cent[jnp.asarray(rng.integers(0, n_tris, n))]
    d = vm.normalize(tgt - o)

    planes = pack_tri_planes(a, b, c)
    t1, i1, h1, uv1 = intersect_triangles(o, d, a, b, c, 1e-3, 1e30)
    t2, i2, h2, uv2 = flash_intersect_triangles(planes, o, d, 1e-3)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    hit = np.asarray(h1)
    assert hit.sum() > 0
    # same decomposition, different fusion order: near-grazing triangles
    # round to ~1e-4 relative in f32
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit], rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(i1)[hit], np.asarray(i2)[hit])
    np.testing.assert_allclose(
        np.asarray(uv1)[hit], np.asarray(uv2)[hit], rtol=2e-3, atol=2e-4
    )


def test_backface_culled(rng):
    a = jnp.array([[10.0, 5.0, 1.0]])
    b = jnp.array([[-10.0, -10.0, 1.0]])
    c = jnp.array([[-10.0, 10.0, 1.0]])
    planes = pack_tri_planes(a, b, c)
    o = jnp.tile(jnp.array([[0.0, 0.0, -10.0]]), (R_RAYS, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (R_RAYS, 1))
    t, idx, hit, uv = flash_intersect_triangles(planes, o, d, 1e-3)
    assert bool(np.asarray(hit).all())
    np.testing.assert_allclose(np.asarray(t), 11.0, rtol=1e-5)
    # from behind: culled (triangle.zig:62)
    o2 = jnp.tile(jnp.array([[0.0, 0.0, 10.0]]), (R_RAYS, 1))
    d2 = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (R_RAYS, 1))
    _, _, hit2, _ = flash_intersect_triangles(planes, o2, d2, 1e-3)
    assert not bool(np.asarray(hit2).any())


def test_padding_tris_never_hit(rng):
    # 3 triangles pad to 128: the 125 padding entries must not produce hits
    a, b, c = _tri_soup(rng, 3)
    planes = pack_tri_planes(a, b, c)
    o = jnp.asarray(rng.normal(size=(R_RAYS, 3)) * 2, jnp.float32)
    d = vm.normalize(jnp.asarray(rng.normal(size=(R_RAYS, 3)), jnp.float32))
    t, idx, hit, uv = flash_intersect_triangles(planes, o, d, 1e-3)
    assert (np.asarray(idx)[np.asarray(hit)] < 3).all()
