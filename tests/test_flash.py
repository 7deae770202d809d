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


def test_t_init_seeding():
    """Sphere-seeded t_max: returned t equals t_init where no triangle
    beats it, hit is True only where a triangle strictly won, and
    winners are unchanged vs the unseeded run."""
    rng = np.random.default_rng(77)
    a, b, c = _tri_soup(rng, 300)
    n = R_RAYS
    o = jnp.asarray(rng.normal(size=(n, 3)) * 12, jnp.float32)
    cent = (a + b + c) / 3.0
    tgt = cent[jnp.asarray(rng.integers(0, 300, n))]
    d = vm.normalize(tgt - o)
    planes = pack_tri_planes(a, b, c)

    t0, i0, h0, uv0 = flash_intersect_triangles(planes, o, d, 1e-3)
    # seed half the rays below their unseeded winner, half far away
    seed_low = np.asarray(rng.random(n) < 0.5)
    t0n = np.asarray(t0)
    ti = np.where(seed_low, np.where(np.asarray(h0), t0n * 0.5, 1.0),
                  3.4e38).astype(np.float32)
    t1, i1, h1, uv1 = flash_intersect_triangles(planes, o, d, 1e-3,
                                                t_init=jnp.asarray(ti))
    h0n, h1n = np.asarray(h0), np.asarray(h1)
    # low-seeded rays: the seed wins (strict beat required)
    assert not h1n[seed_low & h0n].any()
    np.testing.assert_array_equal(np.asarray(t1)[seed_low], ti[seed_low])
    # far-seeded rays: identical winners
    far = ~seed_low
    np.testing.assert_array_equal(h1n[far], h0n[far])
    m = far & h0n
    np.testing.assert_array_equal(np.asarray(t1)[m], t0n[m])
    np.testing.assert_array_equal(np.asarray(i1)[m], np.asarray(i0)[m])


def test_tile_coherent_mapping_bitexact():
    """The 64x8 tile-coherent lane order changes only WHICH lane traces
    which pixel — event counters are bit-identical to the row-major
    order and per-pixel sums agree to float rounding (identical sample
    streams; XLA may contract FMAs differently across the two program
    shapes)."""
    import numpy as np

    from tests.test_render import _mini_scene
    from zraytrace_tpu.render import TILE_H, TILE_W, wavefront_trace

    scene, camera = _mini_scene()
    w, h = 80, 12  # not multiples of the tile shape: partial tiles
    spp, depth = 2, 3
    n_pixels = w * h

    base = jnp.arange(n_pixels, dtype=jnp.int32)
    sums_row, cnt_row = wavefront_trace(
        scene, camera, base, 42, w, h, spp, depth, 0, None,
        n_pixels, n_pixels, 1)

    tx, ty = -(-w // TILE_W), -(-h // TILE_H)
    padded = tx * ty * 512
    # multi-slot: lanes cross invalid padding positions mid-sequence and
    # must skip them without dying (the scene-0 sweep bug)
    n_lanes, n_slots = 512, padded // 512
    base_t = jnp.arange(n_lanes, dtype=jnp.int32)
    sums_tile, cnt_tile = wavefront_trace(
        scene, camera, base_t, 42, w, h, spp, depth, 0, None,
        n_lanes, n_pixels, n_slots, None, True)
    sums_tile = jnp.asarray(sums_tile).reshape(padded, 3)[None]

    # invert the tile map
    g = np.arange(padded)
    blk, within = g // 512, g % 512
    px = (blk % tx) * TILE_W + within % TILE_W
    py = (blk // tx) * TILE_H + within // TILE_W
    valid = (px < w) & (py < h)
    flat = np.zeros((n_pixels, 3), np.float32)
    flat[py[valid] * w + px[valid]] = np.asarray(sums_tile[0])[valid]

    np.testing.assert_allclose(flat, np.asarray(sums_row[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(cnt_row)[:5],
                                  np.asarray(cnt_tile)[:5])

    # the library's shared inverse map must agree with this test's
    # independent reimplementation (render(), showcase + goat tools)
    from zraytrace_tpu.render import untile_pixels

    np.testing.assert_array_equal(
        untile_pixels(np.asarray(sums_tile[0]), w, h), flat)


def test_flash_planes_bvh_order_matches_brute():
    """BVH-ordered planes + the orig-id plane return ORIGINAL triangle
    indices; results must match the brute intersector."""
    import numpy as np

    from zraytrace_tpu.geometry.bvh import build_tri_bvh
    from zraytrace_tpu.geometry.triangle import intersect_triangles
    from zraytrace_tpu.ops.flash_intersect import (
        R_RAYS, flash_intersect_triangles, pack_tri_planes,
    )
    from zraytrace_tpu.scenes import man_and_ball

    built = man_and_ball()
    s = built.scene
    order = build_tri_bvh(s.tri_a, s.tri_b, s.tri_c).prim_order
    planes = pack_tri_planes(s.tri_a, s.tri_b, s.tri_c, order=order)

    rng = np.random.default_rng(7)
    n = R_RAYS
    o = jnp.asarray(rng.random((n, 3)) * 30 - 15, jnp.float32)
    d0 = rng.standard_normal((n, 3))
    d = jnp.asarray(d0 / np.linalg.norm(d0, axis=1, keepdims=True),
                    jnp.float32)

    t_f, i_f, hit_f, uv_f = flash_intersect_triangles(planes, o, d, 1e-3)
    t_b, i_b, hit_b, uv_b = intersect_triangles(
        o, d, s.tri_a, s.tri_b, s.tri_c, 1e-3, 3.4e38)

    np.testing.assert_array_equal(np.asarray(hit_f), np.asarray(hit_b))
    m = np.asarray(hit_b)
    np.testing.assert_allclose(np.asarray(t_f)[m], np.asarray(t_b)[m],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_f)[m], np.asarray(i_b)[m])


def test_attrs_fast_path_image_identical():
    """The const-material attrs path (one packed [unit_fn, mat] gather
    row replacing three vertex rows + the mat row, u/v winner picks
    skipped in-kernel) must render the EXACT same image: the packed
    unit normal is the same f32 computation triangle_surface performs
    per ray, and const materials never read uv."""
    from zraytrace_tpu.geometry.bvh import build_tri_bvh
    from zraytrace_tpu.render import wavefront_trace
    from zraytrace_tpu.scene import mesh_materials_const
    from zraytrace_tpu.scenes import man_and_ball

    built = man_and_ball()
    s, camera = built.scene, built.camera
    assert mesh_materials_const(s)
    order = build_tri_bvh(s.tri_a, s.tri_b, s.tri_c).prim_order
    slow = pack_tri_planes(s.tri_a, s.tri_b, s.tri_c, order=order)
    fast = pack_tri_planes(s.tri_a, s.tri_b, s.tri_c, order=order,
                           tri_mat=s.tri_mat, const_materials=True)
    assert slow.attrs is None and fast.attrs is not None

    n = 512
    base = jnp.arange(n, dtype=jnp.int32)
    args = (s, camera, base, 42, 32, 16, 2, 5, 0, None, n, 512, 1)
    sums_a, cnt_a = wavefront_trace(*args, tri_flash=slow)
    sums_b, cnt_b = wavefront_trace(*args, tri_flash=fast)
    np.testing.assert_array_equal(np.asarray(cnt_a), np.asarray(cnt_b))
    np.testing.assert_array_equal(np.asarray(sums_a), np.asarray(sums_b))


def test_legacy_sublane_kernel_subprocess():
    """The rays-on-sublanes kernel (ZRAYTRACE_FLASH_RL=0) must stay
    equivalent to the brute intersection now that rays-on-lanes is the
    default — env-derived module constants need a fresh process."""
    import os
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from zraytrace_tpu import vecmath as vm
from zraytrace_tpu.geometry.triangle import intersect_triangles
from zraytrace_tpu.ops.flash_intersect import (
    R_RAYS, flash_intersect_triangles, pack_tri_planes, _RL)
assert not _RL
rng = np.random.default_rng(7)
n_tris = 300
base = rng.normal(size=(n_tris, 3)) * 5
f = lambda: jnp.asarray(base + rng.normal(size=(n_tris, 3)) * 0.4,
                        jnp.float32)
a, b, c = f(), f(), f()
n = R_RAYS
o = jnp.asarray(rng.normal(size=(n, 3)) * 12, jnp.float32)
cent = (a + b + c) / 3.0
tgt = cent[jnp.asarray(rng.integers(0, n_tris, n))]
d = vm.normalize(tgt - o)
planes = pack_tri_planes(a, b, c)
assert planes.planes_rl is None
t1, i1, h1, uv1 = intersect_triangles(o, d, a, b, c, 1e-3, 1e30)
t2, i2, h2, uv2 = flash_intersect_triangles(planes, o, d, 1e-3)
np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
hit = np.asarray(h1)
assert hit.sum() > 0
np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit],
                           rtol=1e-3)
np.testing.assert_array_equal(np.asarray(i1)[hit], np.asarray(i2)[hit])
print("LEGACY-OK")
"""
    env = dict(os.environ, ZRAYTRACE_FLASH_RL="0")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "LEGACY-OK" in out.stdout


def test_dense_fallback_kernel_subprocess():
    """Meshes whose chunk count exceeds the RL row-packing VMEM budget
    (ZRAYTRACE_FLASH_RL_ROWS) fall back to the in-kernel transpose read
    of the dense planes — must stay equivalent to the brute path.
    Env-derived module constants need a fresh process."""
    import os
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from zraytrace_tpu import vecmath as vm
from zraytrace_tpu.geometry.triangle import intersect_triangles
from zraytrace_tpu.ops.flash_intersect import (
    R_RAYS, flash_intersect_triangles, pack_tri_planes, _RL,
    _RL_ROWS_MAX_CHUNKS)
assert _RL and _RL_ROWS_MAX_CHUNKS == 1
rng = np.random.default_rng(11)
n_tris = 300  # 3 chunks > budget of 1 -> dense fallback
base = rng.normal(size=(n_tris, 3)) * 5
f = lambda: jnp.asarray(base + rng.normal(size=(n_tris, 3)) * 0.4,
                        jnp.float32)
a, b, c = f(), f(), f()
n = R_RAYS
o = jnp.asarray(rng.normal(size=(n, 3)) * 12, jnp.float32)
cent = (a + b + c) / 3.0
tgt = cent[jnp.asarray(rng.integers(0, n_tris, n))]
d = vm.normalize(tgt - o)
planes = pack_tri_planes(a, b, c)
assert planes.planes_rl is not None and planes.planes_rl.ndim == 1
t1, i1, h1, uv1 = intersect_triangles(o, d, a, b, c, 1e-3, 1e30)
t2, i2, h2, uv2 = flash_intersect_triangles(planes, o, d, 1e-3)
np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
hit = np.asarray(h1)
assert hit.sum() > 0
np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit],
                           rtol=1e-3)
np.testing.assert_array_equal(np.asarray(i1)[hit], np.asarray(i2)[hit])
print("DENSE-OK")
"""
    env = dict(os.environ, ZRAYTRACE_FLASH_RL="1",
               ZRAYTRACE_FLASH_RL_ROWS="1")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "DENSE-OK" in out.stdout


@pytest.mark.parametrize("wh", [(1, 1), (33, 17), (100, 9), (700, 700)])
def test_untile_pixels_roundtrip(wh):
    """untile_pixels must be the exact inverse of the in-trace forward
    tile map (render.lane_pixel's tile branch) at awkward sizes,
    including partial tiles on both axes."""
    from zraytrace_tpu.render import TILE_H, TILE_W, untile_pixels

    w, h = wh
    tx, ty = -(-w // TILE_W), -(-h // TILE_H)
    padded = tx * ty * 512
    g = np.arange(padded)
    blk, within = g // 512, g % 512
    px = (blk % tx) * TILE_W + within % TILE_W
    py = (blk // tx) * TILE_H + within // TILE_W
    pid = np.where((px < w) & (py < h), py * w + px, -1).astype(np.float64)
    out = untile_pixels(pid[:, None], w, h)
    np.testing.assert_array_equal(out[:, 0], np.arange(w * h, dtype=np.float64))
