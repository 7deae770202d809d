from zraytrace_tpu.geometry.sphere import intersect_spheres, sphere_surface
from zraytrace_tpu.geometry.triangle import intersect_triangles, triangle_surface

__all__ = [
    "intersect_spheres",
    "sphere_surface",
    "intersect_triangles",
    "triangle_surface",
]
