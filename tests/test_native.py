"""Native (C++) component tests: must agree with the Python fallbacks."""

import numpy as np
import pytest

from zraytrace_tpu.native.api import build_bvh_native, parse_obj_native
from zraytrace_tpu.native.build import native_available
from zraytrace_tpu.scenes import assets_dir

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def test_obj_native_matches_python(tmp_path, monkeypatch):
    path = assets_dir() / "teapot" / "teapot.obj"
    if not path.exists():
        pytest.skip("asset missing")
    native = parse_obj_native(path)
    assert native is not None
    v_n, t_n, faces_n, normals_n = native

    monkeypatch.setenv("ZRAYTRACE_NO_NATIVE", "1")
    from zraytrace_tpu.io.obj import read_obj

    py = read_obj(path)
    np.testing.assert_allclose(v_n, py.vertices, rtol=1e-6)
    np.testing.assert_array_equal(t_n, py.triangles)
    assert faces_n == py.faces
    assert normals_n == len(py.vertex_normals)


def test_obj_native_fan_triangulation(tmp_path):
    p = tmp_path / "pent.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0.5 1.5 0\nv 0 1 0\nf 1 2 3 4 5\n"
    )
    v, t, faces, normals = parse_obj_native(p)
    np.testing.assert_array_equal(t, [[0, 1, 2], [2, 3, 0], [3, 4, 0]])
    assert faces == 1


def test_obj_native_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        parse_obj_native(tmp_path / "missing.obj")
    bad = tmp_path / "bad.obj"
    bad.write_text("v 0 0 0\n" * 7 + "f 1 2 3 4 5 6 7\n")
    from zraytrace_tpu.io.obj import ObjParseError

    with pytest.raises(ObjParseError):
        parse_obj_native(bad)


def test_bvh_native_valid_tree(rng):
    n = 500
    base = rng.normal(size=(n, 3)) * 5
    lo = (base - np.abs(rng.normal(size=(n, 3)))).astype(np.float32)
    hi = (base + np.abs(rng.normal(size=(n, 3)))).astype(np.float32)
    out = build_bvh_native(lo, hi, 4)
    assert out is not None
    nmin, nmax, pstart, pcount, skip, order = out
    np.testing.assert_array_equal(np.sort(order), np.arange(n))
    assert pcount.max() <= 4
    # leaf ranges partition [0, n)
    leaves = pcount > 0
    cover = np.sort(
        np.concatenate(
            [np.arange(s, s + c) for s, c in zip(pstart[leaves], pcount[leaves])]
        )
    )
    np.testing.assert_array_equal(cover, np.arange(n))
    # root box contains everything
    np.testing.assert_array_less(nmin[0] - 1e-5, lo.min(axis=0))
    np.testing.assert_array_less(hi.max(axis=0), nmax[0] + 1e-5)
    # skip links are monotone and in range
    m = len(nmin)
    assert (skip > np.arange(m)).all() and (skip <= m).all()


def test_bvh_native_traversal_matches_brute(rng):
    import jax.numpy as jnp

    from tests.test_bvh import _random_tris
    from zraytrace_tpu import vecmath as vm
    from zraytrace_tpu.geometry.bvh import build_tri_bvh, bvh_closest_triangle
    from zraytrace_tpu.geometry.triangle import intersect_triangles

    a, b, c = _random_tris(rng, 300)
    o = jnp.asarray(rng.normal(size=(200, 3)) * 15, jnp.float32)
    centroids = (a + b + c) / 3.0
    tgt = centroids[jnp.asarray(rng.integers(0, 300, 200))]
    d = vm.normalize(tgt - o)
    bvh = build_tri_bvh(a, b, c)  # uses native when available
    t_b, _, h_b, _ = intersect_triangles(o, d, a, b, c, 1e-3, 1e30)
    t_v, _, h_v, _ = bvh_closest_triangle(bvh, a, b, c, o, d, 1e-3, 1e30)
    np.testing.assert_array_equal(np.asarray(h_b), np.asarray(h_v))
    hit = np.asarray(h_b)
    assert hit.sum() > 50
    np.testing.assert_allclose(np.asarray(t_b)[hit], np.asarray(t_v)[hit], rtol=1e-5)
