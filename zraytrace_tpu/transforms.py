"""Differentiable per-model transforms (instancing).

The reference sketches this layer but never finishes it: geometry.zig
defines translate/scale/rotate on ``Geometry`` calling Surface methods
that do not exist (geometry.zig:29-50; it compiles only due to Zig's lazy
analysis and is dead code). Here the layer is real, and — being pure
jnp — a differentiable knob: pose parameters admit gradients through the
renderer (SURVEY.md §2 #21).

Transforms are applied host-side/eagerly to scene vertex arrays (bake),
or composed as ``Pose`` pytrees for optimization.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from zraytrace_tpu.scene import Scene


class Pose(NamedTuple):
    """Rigid(+scale) transform: x -> R(rotation) @ (scale * x) + translation.

    ``rotation`` is an axis-angle vector (Rodrigues); all leaves are f32
    and differentiable.
    """

    translation: jnp.ndarray  # (3,)
    rotation: jnp.ndarray  # (3,) axis-angle
    scale: jnp.ndarray  # () uniform scale

    @classmethod
    def identity(cls) -> "Pose":
        return cls(
            translation=jnp.zeros(3, jnp.float32),
            rotation=jnp.zeros(3, jnp.float32),
            scale=jnp.float32(1.0),
        )


def rotation_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula; smooth at zero angle (taylor-safe)."""
    theta2 = jnp.sum(axis_angle * axis_angle)
    theta = jnp.sqrt(theta2 + 1e-24)
    k = axis_angle / theta
    kx, ky, kz = k[0], k[1], k[2]
    K = jnp.array([[0.0, -kz, ky], [kz, 0.0, -kx], [-ky, kx, 0.0]])
    s = jnp.sin(theta)
    c = jnp.cos(theta)
    R = jnp.eye(3) + s * K + (1.0 - c) * (K @ K)
    # near-zero rotation: fall back to identity smoothly
    return jnp.where(theta2 > 1e-16, R, jnp.eye(3))


def apply_points(pose: Pose, points: jnp.ndarray) -> jnp.ndarray:
    """Transform ``(..., 3)`` points."""
    R = rotation_matrix(pose.rotation)
    return (pose.scale * points) @ R.T + pose.translation


def transform_triangles(scene: Scene, pose: Pose, tri_mask=None) -> Scene:
    """Scene with (a subset of) triangles transformed.

    ``tri_mask``: optional boolean (T,) selecting which triangles move
    (per-model transforms when several OBJ models share one scene).
    """
    def move(v):
        moved = apply_points(pose, v)
        if tri_mask is None:
            return moved
        return jnp.where(tri_mask[:, None], moved, v)

    return scene._replace(
        tri_a=move(scene.tri_a), tri_b=move(scene.tri_b), tri_c=move(scene.tri_c)
    )


def transform_spheres(scene: Scene, pose: Pose, sph_mask=None) -> Scene:
    """Scene with (a subset of) sphere centers transformed; radii scale by
    the pose's uniform scale (signed radii keep their sign)."""
    centers = apply_points(pose, scene.sph_center)
    radii = scene.sph_radius * pose.scale
    if sph_mask is not None:
        centers = jnp.where(sph_mask[:, None], centers, scene.sph_center)
        radii = jnp.where(sph_mask, radii, scene.sph_radius)
    return scene._replace(sph_center=centers, sph_radius=radii)
