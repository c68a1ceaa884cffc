"""Materials and environments for the path-tracing integrator.

The reference carries only a placeholder ``material: usize`` per triangle
(``/root/reference/src/geometry/mod.rs:78``, always 0). This module is the
"hook where the integrator plugs in" (SURVEY.md) filled in: a SoA material
table usable from jit — Lambertian / metal / dielectric / emissive — plus
simple environment lights.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

LAMBERTIAN = 0
METAL = 1
DIELECTRIC = 2
EMISSIVE = 3


class MaterialTable(NamedTuple):
    """SoA material parameters, indexed by the BVH's per-triangle ids."""

    kind: jnp.ndarray  # (n,) i32
    albedo: jnp.ndarray  # (n, 3) f32
    emission: jnp.ndarray  # (n, 3) f32
    param: jnp.ndarray  # (n,) f32 — fuzz for metal, ior for dielectric


def lambertian(albedo) -> dict:
    return dict(kind=LAMBERTIAN, albedo=albedo, emission=(0, 0, 0), param=0.0)


def metal(albedo, fuzz: float = 0.0) -> dict:
    return dict(kind=METAL, albedo=albedo, emission=(0, 0, 0), param=fuzz)


def dielectric(ior: float = 1.5) -> dict:
    return dict(kind=DIELECTRIC, albedo=(1, 1, 1), emission=(0, 0, 0), param=ior)


def emissive(color, strength: float = 1.0) -> dict:
    c = np.asarray(color, np.float32) * strength
    return dict(kind=EMISSIVE, albedo=(0, 0, 0), emission=tuple(c), param=0.0)


def material_table(materials) -> MaterialTable:
    """Build a device table from a list of material dicts (see helpers)."""
    if not materials:
        materials = [lambertian((0.8, 0.8, 0.8))]
    return MaterialTable(
        kind=jnp.asarray([m["kind"] for m in materials], jnp.int32),
        albedo=jnp.asarray([m["albedo"] for m in materials], jnp.float32),
        emission=jnp.asarray([m["emission"] for m in materials], jnp.float32),
        param=jnp.asarray([m["param"] for m in materials], jnp.float32),
    )


class Environment(NamedTuple):
    """Environment light: ``color(d) = mix(horizon, zenith, (dy+1)/2)``.

    Set both colors equal for a uniform environment; zeros for darkness.
    """

    horizon: jnp.ndarray  # (3,)
    zenith: jnp.ndarray  # (3,)

    @classmethod
    def uniform(cls, color) -> "Environment":
        c = jnp.asarray(color, jnp.float32)
        return cls(horizon=c, zenith=c)

    @classmethod
    def sky(cls) -> "Environment":
        return cls(
            horizon=jnp.asarray([1.0, 1.0, 1.0], jnp.float32),
            zenith=jnp.asarray([0.5, 0.7, 1.0], jnp.float32),
        )

    @classmethod
    def none(cls) -> "Environment":
        z = jnp.zeros(3, jnp.float32)
        return cls(horizon=z, zenith=z)

    def radiance(self, direction) -> jnp.ndarray:
        """Environment radiance for ``(..., 3)`` directions."""
        t = (direction[..., 1] + 1.0) * 0.5
        return self.horizon * (1.0 - t[..., None]) + self.zenith * t[..., None]
