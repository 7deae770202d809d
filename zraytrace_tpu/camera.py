"""Pinhole camera as a pure, differentiable function.

Reference semantics: camera.zig:17-53 (look_from/look_at/vup/vfov/aspect ->
origin, lower_left_corner, horizontal, vertical; ``getRay(u, v)``).
No aperture/defocus, exactly like the reference.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from zraytrace_tpu import vecmath as vm


class Camera(NamedTuple):
    """Derived camera frame (camera.zig:11-15). A pytree of f32 arrays, so
    gradients can flow to camera parameters through ``get_rays``."""

    origin: jnp.ndarray  # (3,)
    lower_left: jnp.ndarray  # (3,)
    horizontal: jnp.ndarray  # (3,)
    vertical: jnp.ndarray  # (3,)


def make_camera(look_from, look_at, vup, vfov_degrees, aspect_ratio) -> Camera:
    """Build the camera frame (camera.zig:17-45)."""
    look_from = jnp.asarray(look_from, jnp.float32)
    look_at = jnp.asarray(look_at, jnp.float32)
    vup = jnp.asarray(vup, jnp.float32)
    theta = jnp.pi * vfov_degrees / 180.0
    h = jnp.tan(theta / 2.0)
    viewport_height = 2.0 * h
    viewport_width = aspect_ratio * viewport_height
    w = vm.normalize(look_from - look_at)
    u = vm.normalize(vm.cross(vup, w))
    v = vm.cross(w, u)
    horizontal = u * viewport_width
    vertical = v * viewport_height
    lower_left = look_from - horizontal * 0.5 - vertical * 0.5 - w
    return Camera(look_from, lower_left, horizontal, vertical)


def get_rays(camera: Camera, u: jnp.ndarray, v: jnp.ndarray):
    """Batched ``Camera.getRay`` (camera.zig:46-52).

    ``u``/``v`` are viewport coordinates in [0,1), any shape ``(...)``.
    Returns ``(origins, directions)`` with shape ``(..., 3)``; directions
    are unit length (Ray.init normalizes, ray.zig:11-13).
    """
    d = (
        camera.lower_left
        + u[..., None] * camera.horizontal
        + v[..., None] * camera.vertical
        - camera.origin
    )
    d = vm.normalize(d)
    o = jnp.broadcast_to(camera.origin, d.shape)
    return o, d


def pixel_uv(x, y, jitter_u, jitter_v, width, height):
    """Viewport coords for pixel (x, y) with sub-pixel jitter.

    Matches raytrace.zig:174-175: ``u = (x + rand - 0.5) / width``.
    Row 0 is the image bottom (the PNG writer flips vertically,
    png_image.zig:136).
    """
    u = (x + jitter_u - 0.5) / width
    v = (y + jitter_v - 0.5) / height
    return u, v
