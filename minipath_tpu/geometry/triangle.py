"""Triangle intersection and barycentric interpolation (device-side).

The TPU counterpart of the reference's 8-wide Möller–Trumbore kernel
(``/root/reference/src/geometry/triangle.rs:187-216``): two-sided, no det
epsilon (a zero determinant yields an infinite ``inv_det`` whose NaN products
fail every comparison, so degenerate/padding triangles are misses), same mask
``u >= 0 & v >= 0 & u+v <= 1``. Instead of 8 SIMD lanes, everything is
vectorized over arbitrary leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _cross(a, b):
    return jnp.cross(a, b)


def moller_trumbore(v0, v1, v2, origin, direction):
    """Two-sided ray/triangle intersection.

    All args are ``(..., 3)`` and broadcast together. Returns
    ``(mask, t, u, v)`` with shape ``(...)``. ``t`` may be negative or
    non-finite where ``mask`` is False; callers clip with ``t >= 0`` and their
    own ``max_t`` as the reference traversal does
    (``ray_bvh_intersection.rs:125``).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    ray_cross_e2 = _cross(direction, e2)
    det = _dot(e1, ray_cross_e2)
    inv_det = 1.0 / det  # may be +-inf for degenerate triangles
    s = origin - v0
    u = inv_det * _dot(s, ray_cross_e2)
    s_cross_e1 = _cross(s, e1)
    v = inv_det * _dot(direction, s_cross_e1)
    t = inv_det * _dot(e2, s_cross_e1)
    mask = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return mask, t, u, v


def triangle_geometric_normal(v0, v1, v2):
    """Unnormalized geometric normal ``(v1-v0) x (v2-v0)``.

    Matches the reference's ``Triangle::normal`` orientation convention
    (``triangle.rs:141``); shading uses ``|dot|`` so handedness is benign.
    """
    return _cross(v1 - v0, v2 - v0)


def barycentric_interpolate(u, v, a, b, c):
    """Interpolate vertex attributes with barycentric ``(u, v)``.

    ``a`` gets weight ``1-u-v``, ``b`` weight ``u``, ``c`` weight ``v``
    (reference ``BarycentricCoordinates::interpolate``, ``triangle.rs:220-238``).
    ``u``/``v`` are ``(...)``, attributes are ``(..., D)``.
    """
    w = 1.0 - u - v
    return a * w[..., None] + b * u[..., None] + c * v[..., None]
