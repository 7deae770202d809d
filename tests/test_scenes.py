"""Scene library tests (scenes.zig:26-289)."""

import numpy as np
import pytest

from zraytrace_tpu import scene as sc
from zraytrace_tpu.config import RenderParams
from zraytrace_tpu.render import render
from zraytrace_tpu.scenes import (
    SCENES_BY_NAME,
    UnknownSceneIndex,
    assets_dir,
    build_scene,
)


def _have_assets():
    return (assets_dir() / "teapot" / "teapot.obj").exists()


pytestmark = pytest.mark.skipif(not _have_assets(), reason="assets missing")


def test_three_balls_inventory(three_balls_scene):
    scene = three_balls_scene.scene
    # scenes.zig:83-96: 7 spheres, no mesh.
    assert scene.n_spheres == 7
    assert scene.n_triangles == 0
    radii = np.asarray(scene.sph_radius)
    np.testing.assert_allclose(
        sorted(radii), sorted([100.0, 2.0, 1.0, 1.5, 0.7, 0.9, -0.8])
    )
    # hollow bubble: inner sphere has negative radius (scenes.zig:96)
    assert (radii < 0).sum() == 1
    # dielectric IOR 1.52 (scenes.zig:80)
    die = np.asarray(scene.mat_type) == sc.DIELECTRIC
    assert np.all(np.asarray(scene.mat_ior)[die] == np.float32(1.52))


def test_three_balls_camera(three_balls_scene):
    cam = three_balls_scene.camera
    np.testing.assert_allclose(cam.origin, [0.0, 0.0, -7.0])


def test_scene_indices_match_reference():
    assert SCENES_BY_NAME == {
        "manAndBall": 0,
        "threeBalls": 1,
        "bunnyAndBall": 2,
        "teapotAndBall": 3,
        "teapotAndBallCircle": 4,
        "goat": 5,
    }


def test_unknown_scene_index():
    with pytest.raises(UnknownSceneIndex):
        build_scene(42)


def test_goat_missing_asset():
    # high_poly_goat.obj is absent from the reference repo as well
    # (.MISSING_LARGE_BLOBS).
    with pytest.raises(FileNotFoundError):
        build_scene(5)


def test_mesh_scene_inventories():
    s0 = build_scene(0).scene
    assert s0.n_spheres == 1 and s0.n_triangles > 1900
    s3 = build_scene(3).scene
    assert s3.n_spheres == 1 and s3.n_triangles == 6320
    s4 = build_scene(4).scene
    assert s4.n_spheres == 3 and s4.n_triangles == 6320
    # negative-radius silver sphere (scenes.zig:195)
    assert (np.asarray(s4.sph_radius) < 0).sum() == 1


@pytest.mark.parametrize("index", [0, 1, 2, 3])
def test_low_res_renders(index):
    """All available scenes render at 10x10x2spp, mirroring the reference's
    low-res integration test (scenes.zig:280-289)."""
    built = build_scene(index)
    params = RenderParams(width=10, height=10, samples_per_pixel=2, max_depth=2)
    img, stats = render(built.scene, built.camera, params)
    assert img.shape == (10, 10, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0
    assert stats.samples == 200
