"""Two-level (grouped) chunk culling in the flash kernel.

Culling a chunk GROUP no ray in the block can reach inside its own
(t_min, t_init] window cannot change any winner — the grouped path
must be bit-identical to per-chunk work lists and to the brute scan
(same one-sidedness/tie semantics, triangle.zig:48-71)."""

import jax.numpy as jnp
import numpy as np
import pytest

import zraytrace_tpu.ops.flash_intersect as fi
from zraytrace_tpu.geometry.triangle import intersect_triangles


@pytest.fixture
def grp_env():
    """Force grouping/coarse on for small meshes; restore after."""
    saved = (fi._GRP_MIN_CHUNKS, fi._GRP, fi._COARSE_MIN_CHUNKS,
             fi._COARSE_STEP, fi._COARSE)
    yield
    (fi._GRP_MIN_CHUNKS, fi._GRP, fi._COARSE_MIN_CHUNKS,
     fi._COARSE_STEP, fi._COARSE) = saved


def _random_mesh(T, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-5, 5, (T, 3)).astype(np.float32)
    spread = lambda: rng.uniform(-0.4, 0.4, (T, 3)).astype(np.float32)
    return centers + spread(), centers + spread(), centers + spread()


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("grp,T", [(4, 700), (8, 1100)])
def test_grouped_matches_ungrouped_and_brute(grp_env, grp, T):
    a, b, c = _random_mesh(T)
    o, d = _rays(512)

    fi._GRP_MIN_CHUNKS = 10 ** 9
    p0 = fi.pack_tri_planes(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    assert p0.group_bounds is None
    t0, i0, h0, uv0 = fi.flash_intersect_triangles(p0, o, d, 1e-3)

    fi._GRP_MIN_CHUNKS, fi._GRP = 2, grp
    p1 = fi.pack_tri_planes(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    assert p1.group_bounds is not None
    n_chunks = p1.planes.shape[1]
    assert p1.group_bounds.shape[0] == -(-n_chunks // grp)
    t1, i1, h1, uv1 = fi.flash_intersect_triangles(p1, o, d, 1e-3)

    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(uv0), np.asarray(uv1))

    tb, ib, hb, _ = intersect_triangles(
        o, d, jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), 1e-3, 3.4e38)
    hb = np.asarray(hb)
    assert hb.sum() > 10  # the probe must exercise real hits
    np.testing.assert_array_equal(hb, np.asarray(h1))
    # brute decomposes into (N,3)@(3,T) matmuls, the RL kernel into
    # dot products — same math, different f32 fusion order (few-ulp t
    # drift on grazing hits); the flash-vs-flash checks above stay
    # bit-exact
    np.testing.assert_allclose(np.asarray(tb)[hb], np.asarray(t1)[hb],
                               rtol=2e-5)


def test_coarse_cap_identical_outputs(grp_env):
    """The coarse-phase occlusion cap tightens reachability only — a
    capped run must reproduce the uncapped outputs exactly (any chunk
    holding the true winner satisfies near <= winner_t <= cap)."""
    a, b, c = _random_mesh(1000, seed=5)
    o, d = _rays(512, seed=6)
    t_init = jnp.full((512,), 8.0, jnp.float32)

    p0 = fi.pack_tri_planes(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    assert p0.coarse is None
    r0 = fi.flash_intersect_triangles(p0, o, d, 1e-3, t_init=t_init)

    fi._COARSE, fi._COARSE_MIN_CHUNKS, fi._COARSE_STEP = True, 2, 4
    p1 = fi.pack_tri_planes(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    assert p1.coarse is not None
    assert p1.coarse.attrs is not None  # lean kernel (no u/v picks)
    r1 = fi.flash_intersect_triangles(p1, o, d, 1e-3, t_init=t_init)
    for x0, x1 in zip(r0, r1):
        np.testing.assert_array_equal(np.asarray(x0), np.asarray(x1))
    assert int(np.asarray(r1[2]).sum()) > 10


def test_grouped_with_t_init_seed(grp_env):
    """Sphere-seeded winners (t_init) must interact with group culling
    exactly as with chunk culling: the seed caps reachability."""
    a, b, c = _random_mesh(900, seed=3)
    o, d = _rays(512, seed=4)
    t_init = jnp.full((512,), 6.0, jnp.float32)

    fi._GRP_MIN_CHUNKS = 10 ** 9
    p0 = fi.pack_tri_planes(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    r0 = fi.flash_intersect_triangles(p0, o, d, 1e-3, t_init=t_init)

    fi._GRP_MIN_CHUNKS, fi._GRP = 2, 8
    p1 = fi.pack_tri_planes(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    r1 = fi.flash_intersect_triangles(p1, o, d, 1e-3, t_init=t_init)
    # winner identity and t are exact; u/v may drift a final ulp — the
    # grouped kernel's unrolled inner loop lets the compiler contract
    # different FMA chains than the single-visit loop
    np.testing.assert_array_equal(np.asarray(r0[0]), np.asarray(r1[0]))
    np.testing.assert_array_equal(np.asarray(r0[1]), np.asarray(r1[1]))
    np.testing.assert_array_equal(np.asarray(r0[2]), np.asarray(r1[2]))
    np.testing.assert_allclose(np.asarray(r0[3]), np.asarray(r1[3]),
                               atol=1e-5)
