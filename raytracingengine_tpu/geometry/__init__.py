from raytracingengine_tpu.geometry.materials import Material, Materials
from raytracingengine_tpu.geometry.primitives import (
    Spheres,
    Planes,
    Triangles,
    Lights,
)
from raytracingengine_tpu.geometry.intersect import (
    FlatScene,
    Hit,
    flatten_scene,
    closest_hit,
    intersect_spheres,
    intersect_planes,
    intersect_triangles,
)

__all__ = [
    "Material",
    "Materials",
    "Spheres",
    "Planes",
    "Triangles",
    "Lights",
    "FlatScene",
    "Hit",
    "flatten_scene",
    "closest_hit",
    "intersect_spheres",
    "intersect_planes",
    "intersect_triangles",
]
