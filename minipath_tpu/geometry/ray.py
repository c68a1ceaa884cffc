"""Rays as SoA pytrees.

Semantics follow the reference ``Ray`` type
(``/root/reference/src/geometry/mod.rs:34-67``): direction is normalized, and
``inv_direction`` maps zero direction components to +infinity regardless of
the sign of the zero.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Rays(NamedTuple):
    """A batch of rays in SoA layout. All fields have shape ``(..., 3)``."""

    origin: jnp.ndarray
    direction: jnp.ndarray  # normalized
    inv_direction: jnp.ndarray  # 1/direction with 0 -> +inf


def make_rays(origin, direction) -> Rays:
    """Build rays from (unnormalized) directions.

    Zero direction components invert to +inf (sign of zero ignored), matching
    the reference constructor (``geometry/mod.rs:45-54``).
    """
    origin = jnp.asarray(origin, jnp.float32)
    direction = jnp.asarray(direction, jnp.float32)
    norm = jnp.sqrt(jnp.sum(direction * direction, axis=-1, keepdims=True))
    direction = direction / norm
    inv = jnp.where(direction == 0.0, jnp.inf, 1.0 / direction)
    return Rays(origin=origin, direction=direction, inv_direction=inv)


def point_at(rays: Rays, t) -> jnp.ndarray:
    """Point along the ray at parameter ``t`` (shape ``(...,)``)."""
    return rays.origin + rays.direction * jnp.asarray(t)[..., None]


def advance_by(rays: Rays, distance) -> Rays:
    """New rays moved ``distance`` along their direction (same direction)."""
    return Rays(
        origin=point_at(rays, distance),
        direction=rays.direction,
        inv_direction=rays.inv_direction,
    )
