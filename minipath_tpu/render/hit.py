"""Hit records as SoA pytrees.

Batched counterpart of the reference ``HitRecord``
(``/root/reference/src/geometry/mod.rs:71-80``) — one extra ``hit`` mask field
replaces Rust's ``Option``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class HitRecords(NamedTuple):
    """Batched hit records; all fields share leading batch dims."""

    hit: jnp.ndarray  # (...) bool
    t: jnp.ndarray  # (...) f32 distance along ray
    point: jnp.ndarray  # (..., 3)
    normal: jnp.ndarray  # (..., 3) normalized
    material: jnp.ndarray  # (...) i32
    texture_coords: jnp.ndarray  # (..., 3)


def miss_records(batch_shape) -> HitRecords:
    return HitRecords(
        hit=jnp.zeros(batch_shape, bool),
        t=jnp.full(batch_shape, jnp.inf, jnp.float32),
        point=jnp.zeros(batch_shape + (3,), jnp.float32),
        normal=jnp.zeros(batch_shape + (3,), jnp.float32),
        material=jnp.zeros(batch_shape, jnp.int32),
        texture_coords=jnp.zeros(batch_shape + (3,), jnp.float32),
    )
