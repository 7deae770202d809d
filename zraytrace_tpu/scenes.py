"""Scene library: the reference's six showcase scenes (scenes.zig:26-277).

Every geometric/material constant is carried over verbatim so forward
renders compare against the Zig oracle. Scene indices 0-5 match
``render_scene`` dispatch (scenes.zig:267-277).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, NamedTuple

from zraytrace_tpu import scene as sc
from zraytrace_tpu.camera import Camera, make_camera
from zraytrace_tpu.io.obj import read_obj
from zraytrace_tpu.io.png import read_png
from zraytrace_tpu.scene import Scene, SceneBuilder


def assets_dir() -> Path:
    env = os.environ.get("ZRAYTRACE_ASSETS")
    if env:
        return Path(env)
    return Path(__file__).resolve().parent.parent / "assets" / "models"


class BuiltScene(NamedTuple):
    scene: Scene
    camera: Camera
    name: str


# The big ground ball shared by all mesh scenes (scenes.zig:40-43 etc.).
_EARTH_X = 1.66445508e-01
_EARTH_Z = 7.37018966e00
_EARTH_RADIUS = 100.0


def _ground(b: SceneBuilder, top: float) -> None:
    green = b.add_lambertian_color(sc.COLOR_GREEN)
    b.add_sphere((_EARTH_X, top - _EARTH_RADIUS, _EARTH_Z), _EARTH_RADIUS, green)


def _add_model(b: SceneBuilder, obj_name: str, mat_id: int) -> None:
    model = read_obj(assets_dir() / obj_name)
    a, bb, c = model.tri_vertices
    b.add_triangles(a, bb, c, mat_id)


def man_and_ball() -> BuiltScene:
    """Scene 0 (scenes.zig:26-52): Man.obj in blue metal on the ground."""
    b = SceneBuilder()
    _ground(b, top=-2.33)
    blue_metal = b.add_metal_color(sc.COLOR_BLUE)
    _add_model(b, "man/Man.obj", blue_metal)
    camera = make_camera((0.0, 0.0, -30.0), (0.0, 0.0, 1.0), (0.0, 1.0, 0.0), 45.0, 1.0)
    return BuiltScene(b.build(), camera, "manAndBall")


def three_balls() -> BuiltScene:
    """Scene 1 (scenes.zig:54-100): the 7-spheres showcase — ground,
    nitor-logo Lambertian, silver mirror, earth-mapped metal, filled glass
    and a hollow glass bubble (nested spheres r=0.9 / r=-0.8, IOR 1.52)."""
    b = SceneBuilder()
    images = assets_dir() / "images"
    earthmap = read_png(images / "earthmap.png")
    nitor = read_png(images / "nitor-logo-25.png")

    green = b.add_lambertian_color(sc.COLOR_GREEN)
    nitor_mat = b.add_lambertian(b.add_image_texture(nitor))
    mirror = b.add_metal_color(sc.COLOR_SILVER)
    earth_mat = b.add_metal(b.add_image_texture(earthmap))
    glass = b.add_dielectric(1.52)  # window glass (scenes.zig:80)

    b.add_sphere((1.0, -102.5, 4.0), 100.0, green)
    b.add_sphere((0.0, 0.0, 8.0), 2.0, nitor_mat)
    b.add_sphere((-3.0, -1.5, 3.0), 1.0, mirror)
    b.add_sphere((3.0, -1.0, 4.0), 1.5, earth_mat)
    b.add_sphere((-1.0, -1.0, 2.0), 0.7, glass)  # filled glass
    # hollow glass bubble (scenes.zig:92-96)
    bubble_center = (0.85, -0.7, 1.5)
    radius, thickness = 0.9, 0.1
    b.add_sphere(bubble_center, radius, glass)
    b.add_sphere(bubble_center, -(radius - thickness), glass)

    camera = make_camera((0.0, 0.0, -7.0), (0.0, 0.0, 1.0), (0.0, 1.0, 0.0), 45.0, 1.0)
    return BuiltScene(b.build(), camera, "threeBalls")


def bunny_and_ball() -> BuiltScene:
    """Scene 2 (scenes.zig:102-126): bunny.obj in silver metal."""
    b = SceneBuilder()
    _ground(b, top=-0.33)
    silver = b.add_metal_color(sc.COLOR_SILVER)
    _add_model(b, "bunny/bunny.obj", silver)
    camera = make_camera((0.0, 0.0, -0.5), (0.0, 0.0, 1.0), (0.0, 1.0, 0.0), 45.0, 1.0)
    return BuiltScene(b.build(), camera, "bunnyAndBall")


def teapot_and_ball() -> BuiltScene:
    """Scene 3 (scenes.zig:206-231): teapot.obj in blue metal."""
    b = SceneBuilder()
    _ground(b, top=-2.33)
    blue_metal = b.add_metal_color(sc.COLOR_BLUE)
    _add_model(b, "teapot/teapot.obj", blue_metal)
    camera = make_camera((0.0, 0.0, -10.0), (0.0, 0.0, 1.0), (0.0, 1.0, 0.0), 45.0, 1.0)
    return BuiltScene(b.build(), camera, "teapotAndBall")


def teapot_and_ball_circle() -> BuiltScene:
    """Scene 4 (scenes.zig:168-204): teapot + inward silver sphere
    (negative radius, scenes.zig:195) + earthmap Lambertian ball."""
    b = SceneBuilder()
    earthmap = read_png(assets_dir() / "images" / "earthmap.png")
    silver = b.add_metal_color(sc.COLOR_SILVER)
    purple_matte = b.add_lambertian(b.add_image_texture(earthmap))
    green = b.add_lambertian_color(sc.COLOR_GREEN)
    blue_metal = b.add_metal_color(sc.COLOR_BLUE)

    b.add_sphere((0.0, 0.0, 6.0), -2.0, silver)
    b.add_sphere((3.0, -1.0, 4.0), 1.0, purple_matte)
    top = -2.33
    b.add_sphere((_EARTH_X, top - _EARTH_RADIUS, _EARTH_Z), _EARTH_RADIUS, green)
    _add_model(b, "teapot/teapot.obj", blue_metal)
    camera = make_camera((-8.0, 0.0, -10.0), (0.0, 0.0, 1.0), (0.0, 1.0, 0.0), 45.0, 1.0)
    return BuiltScene(b.build(), camera, "teapotAndBallCircle")


def goat() -> BuiltScene:
    """Scene 5 (scenes.zig:234-260): high_poly_goat.obj — the asset is
    absent from the reference repo too (.MISSING_LARGE_BLOBS)."""
    b = SceneBuilder()
    silver = b.add_metal_color(sc.COLOR_SILVER)
    _add_model(b, "high_poly_goat.obj", silver)
    _ground(b, top=-2.33)
    camera = make_camera((0.0, 0.0, -1.7), (0.0, 0.0, 1.0), (0.0, 1.0, 0.0), 45.0, 1.0)
    return BuiltScene(b.build(), camera, "goat")


SCENES: dict[int, Callable[[], BuiltScene]] = {
    0: man_and_ball,
    1: three_balls,
    2: bunny_and_ball,
    3: teapot_and_ball,
    4: teapot_and_ball_circle,
    5: goat,
}

SCENES_BY_NAME = {
    "manAndBall": 0,
    "threeBalls": 1,
    "bunnyAndBall": 2,
    "teapotAndBall": 3,
    "teapotAndBallCircle": 4,
    "goat": 5,
}


class UnknownSceneIndex(KeyError):
    """scenes.zig:263-265."""


def build_scene(index: int) -> BuiltScene:
    try:
        builder = SCENES[index]
    except KeyError:
        raise UnknownSceneIndex(index) from None
    return builder()
