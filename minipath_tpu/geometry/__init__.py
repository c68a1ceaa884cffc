"""Geometry core: rays, AABBs, triangles, and their intersection kernels.

Device-side code is pure ``jax.numpy`` functions over SoA arrays (the TPU
replacement for the reference's 8-lane SIMD types, cf.
``/root/reference/src/geometry/mod.rs:9-11``); host-side scene building uses a
small generic ``AABB`` class over NumPy points.
"""

from minipath_tpu.geometry.aabb import AABB, slab_test
from minipath_tpu.geometry.ray import Rays, make_rays
from minipath_tpu.geometry.triangle import (
    barycentric_interpolate,
    moller_trumbore,
    triangle_geometric_normal,
)

# Error tolerance for general purpose calculations in the raytracer.
# (Reference: /root/reference/src/geometry/mod.rs:15)
EPSILON = 1e-6

__all__ = [
    "AABB",
    "EPSILON",
    "Rays",
    "barycentric_interpolate",
    "make_rays",
    "moller_trumbore",
    "slab_test",
    "triangle_geometric_normal",
]
