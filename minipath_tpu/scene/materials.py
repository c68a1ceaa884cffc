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
import jax
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


class LightTable(NamedTuple):
    """Emissive-triangle table for next-event estimation (NEE).

    Built from the BVH's padded triangle packets: every triangle whose
    material is EMISSIVE and whose area is non-zero (padding lanes are
    degenerate, so they fall out naturally) becomes a light. Selection is
    power-weighted (area x mean emission) via an inverse-CDF lookup.
    Lights are two-sided, matching ``scatter``'s orientation-independent
    emission.
    """

    v0: jnp.ndarray  # (L, 3) f32
    e1: jnp.ndarray  # (L, 3) f32 edge v1-v0
    e2: jnp.ndarray  # (L, 3) f32 edge v2-v0
    normal: jnp.ndarray  # (L, 3) f32 unit geometric normal
    area: jnp.ndarray  # (L,) f32
    emission: jnp.ndarray  # (L, 3) f32
    pmf: jnp.ndarray  # (L,) f32 selection probability
    cdf: jnp.ndarray  # (L,) f32 inclusive cumulative pmf
    tri_light: jnp.ndarray  # (M*8,) i32 padded-global tri id -> light id or -1


def build_light_table(tri_packets, tri_material, materials: MaterialTable):
    """Host-side light-table build; returns ``None`` when the scene has no
    emissive triangles. ``tri_packets`` is the BVH's ``(M, 8, 3, 3)`` packed
    vertex array and ``tri_material`` its ``(M*8,)`` material ids."""
    tp = np.asarray(tri_packets, np.float64).reshape(-1, 3, 3)
    mat = np.asarray(tri_material, np.int64)
    kind = np.asarray(materials.kind)
    e1 = tp[:, 1] - tp[:, 0]
    e2 = tp[:, 2] - tp[:, 0]
    n = np.cross(e1, e2)
    area2 = np.linalg.norm(n, axis=-1)
    is_light = (kind[mat] == EMISSIVE) & (area2 > 0)
    idx = np.nonzero(is_light)[0]
    if idx.size == 0:
        return None
    # A spatially-split BVH (build_bvh(spatial_splits=True)) references one
    # triangle from several leaves, so identical emissive lanes can appear
    # more than once in the packed array. Each physical emitter must be ONE
    # light (else its sampling density doubles while hit_light_pdf reports
    # a single copy's pdf — biased MIS). Dedupe by exact vertex identity,
    # keeping first-occurrence order, and map every duplicate lane to the
    # shared light id.
    key9 = tp[idx].reshape(idx.size, 9)
    _, first, inv = np.unique(key9, axis=0, return_index=True, return_inverse=True)
    order = np.argsort(first)  # unique emitters in first-appearance order
    rank = np.empty_like(order)
    rank[order] = np.arange(order.size)
    keep = idx[first[order]]  # one representative lane per emitter
    light_of_lane = rank[inv].astype(np.int32)

    emission = np.asarray(materials.emission, np.float64)[mat[keep]]
    area = area2[keep] * 0.5
    power = area * emission.mean(axis=-1)
    if power.sum() <= 0.0:
        # Emissive materials with zero radiance: no sampleable lights
        # (avoids a 0/0 pmf that would poison NEE with NaNs).
        return None
    pmf = power / power.sum()
    cdf = np.cumsum(pmf)
    cdf[-1] = 1.0
    tri_light = np.full(mat.shape[0], -1, np.int32)
    tri_light[idx] = light_of_lane
    return LightTable(
        v0=jnp.asarray(tp[keep, 0], jnp.float32),
        e1=jnp.asarray(e1[keep], jnp.float32),
        e2=jnp.asarray(e2[keep], jnp.float32),
        normal=jnp.asarray(n[keep] / area2[keep, None], jnp.float32),
        area=jnp.asarray(area, jnp.float32),
        emission=jnp.asarray(emission, jnp.float32),
        pmf=jnp.asarray(pmf, jnp.float32),
        cdf=jnp.asarray(cdf, jnp.float32),
        tri_light=jnp.asarray(tri_light),
    )


def material_rows(materials: MaterialTable, mat_id):
    """Fetch per-lane material parameters through ONE packed ``(M, 8)``
    gather instead of four small-table gathers. XLA:TPU lowers each gather
    to a ~3.4 ns/row dynamic-slice loop, so four separate lookups on a
    4.15M-ray wavefront cost ~240 ms/bounce; one packed row costs ~45 ms
    (tools/sweep_pt16.py one-hot/packed probe). ``kind`` rides as f32
    (values 0..3 are exact) and is cast back.

    Returns ``(kind i32, param, albedo (...,3), emission (...,3))``."""
    packed = jnp.concatenate(
        [
            materials.kind.astype(jnp.float32)[:, None],
            materials.param[:, None],
            materials.albedo,
            materials.emission,
        ],
        axis=-1,
    )
    row = packed[mat_id]
    return (
        row[..., 0].astype(jnp.int32),
        row[..., 1],
        row[..., 2:5],
        row[..., 5:8],
    )


def sample_lights(lights: LightTable, key, x, strat=None):
    """Sample one light point per shading point ``x`` ``(N, 3)``.

    Returns ``(y, wi, pdf_solid, emission, cos_y, li)``: the light point,
    the unit direction towards it, the solid-angle pdf of having sampled
    that direction (selection pmf x area-to-solid-angle), the light's
    radiance, the (two-sided) cosine at the light, and the sampled light's
    index (useful as an occlusion-batch sort key).

    ``strat`` is ``None`` (iid) or ``(s, pid, spp, salt)``: the light
    selection and the triangle-point pair then draw from per-pixel
    jittered strata (:mod:`minipath_tpu.render.stratify`) — same
    distribution, lower variance."""
    from minipath_tpu.render.stratify import strat1d, strat2d

    ks, kt = jax.random.split(key)
    n = x.shape[0]
    u = jax.random.uniform(ks, (n,))
    if strat is not None:
        s_idx, pid, spp, salt = strat
        u = strat1d(u, s_idx, pid, spp, salt + 0)
    li = jnp.clip(
        jnp.searchsorted(lights.cdf, u, side="left"), 0, lights.cdf.shape[0] - 1
    )
    # One packed (L, 17) row gather instead of seven small-table gathers —
    # measured 723 -> 44 ms on the 4.15M-ray atrium wavefront (each gather
    # is a ~3.4 ns/row dynamic-slice loop on TPU; tools/sweep_pt16.py).
    packed = jnp.concatenate(
        [
            lights.v0,
            lights.e1,
            lights.e2,
            lights.normal,
            lights.emission,
            lights.pmf[:, None],
            lights.area[:, None],
        ],
        axis=-1,
    )
    row = packed[li]
    v0 = row[:, 0:3]
    e1 = row[:, 3:6]
    e2 = row[:, 6:9]
    ln = row[:, 9:12]
    em = row[:, 12:15]
    pmf = row[:, 15]
    area = row[:, 16]
    r = jax.random.uniform(kt, (n, 2))
    if strat is not None:
        r0, r1 = strat2d(r[:, 0], r[:, 1], s_idx, pid, spp, salt + 1)
        r = jnp.stack([r0, r1], axis=-1)
    s = jnp.sqrt(r[:, 0])
    bu = (1.0 - s)[:, None]
    bv = (r[:, 1] * s)[:, None]
    y = v0 + bu * e1 + bv * e2
    seg = y - x
    dist2 = jnp.sum(seg * seg, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    wi = seg / dist[:, None]
    cos_y = jnp.abs(jnp.sum(wi * ln, axis=-1))
    pdf_solid = pmf / area * dist2 / jnp.maximum(cos_y, 1e-8)
    return y, wi, pdf_solid, em, cos_y, li


def hit_light_pdf(lights: LightTable, tri, direction, t):
    """Solid-angle pdf that NEE would have sampled the emitter hit by a
    BSDF ray (``tri`` global padded ids, unit ``direction``, distance
    ``t``) — the other half of the MIS power heuristic. 0 for non-lights."""
    li = lights.tri_light[jnp.maximum(tri, 0)]
    valid = (tri >= 0) & (li >= 0)
    lis = jnp.maximum(li, 0)
    # Packed (L, 5) row: normal, pmf, area in one gather (see sample_lights).
    packed = jnp.concatenate(
        [lights.normal, lights.pmf[:, None], lights.area[:, None]], axis=-1
    )
    row = packed[lis]
    cos_y = jnp.abs(jnp.sum(direction * row[..., 0:3], axis=-1))
    pdf = row[..., 3] / row[..., 4] * (t * t) / jnp.maximum(cos_y, 1e-8)
    return jnp.where(valid, pdf, 0.0)


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
