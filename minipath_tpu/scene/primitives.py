"""Analytic primitives.

Counterpart of ``/root/reference/src/scene/primitives.rs``: a :class:`Sphere`
implementing the ``Object`` protocol with the same quadratic near/far root
selection (``primitives.rs:16-47``) — vectorized over ray batches.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from minipath_tpu.geometry.aabb import AABB
from minipath_tpu.render.hit import HitRecords


@dataclass(frozen=True)
class Sphere:
    center: tuple = (0.0, 0.0, 0.0)
    radius: float = 1.0
    material: int = 0

    def intersect(self, rays, t_max=jnp.inf) -> HitRecords:
        """Closest intersection: near root if >= 0, else far root if >= 0,
        else miss (matching ``primitives.rs:16-47``)."""
        center = jnp.asarray(self.center, jnp.float32)
        oc = rays.origin - center
        # direction is normalized => a == 1
        half_b = jnp.sum(oc * rays.direction, axis=-1)
        c = jnp.sum(oc * oc, axis=-1) - self.radius * self.radius
        disc = half_b * half_b - c
        sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_near = -half_b - sqrt_disc
        t_far = -half_b + sqrt_disc
        t = jnp.where(t_near >= 0.0, t_near, t_far)
        hit = (disc >= 0.0) & (t >= 0.0) & (t < t_max)
        t = jnp.where(hit, t, jnp.inf)
        point = rays.origin + rays.direction * jnp.where(hit, t, 0.0)[..., None]
        normal = (point - center) / self.radius
        batch = rays.origin.shape[:-1]
        return HitRecords(
            hit=hit,
            t=t,
            point=point,
            normal=normal,
            material=jnp.full(batch, self.material, jnp.int32),
            texture_coords=jnp.zeros(batch + (3,), jnp.float32),
        )

    def get_bounding_box(self) -> AABB:
        c = np.asarray(self.center, np.float32)
        r = np.float32(self.radius)
        return AABB(c - r, c + r)
