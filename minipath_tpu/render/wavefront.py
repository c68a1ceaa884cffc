"""Wavefront path tracer — the renderer's north-star integrator.

This extends the reference's primary-ray-only worker
(``/root/reference/src/renderer/worker.rs:51-65``) into a full Monte Carlo
path tracer, built the TPU-first way (BASELINE.json north star): per-bounce
SoA ray queues over the Pallas traversal kernel, masked BSDF sampling with
counter-based RNG, and cumsum-based stream compaction so dead lanes are
squeezed out of packets between bounces. A "megakernel" mode keeps dead
lanes in place (no compaction) for the convergence/perf comparison the
benchmark configs call for.

All hit data (normal, material) comes out of the traversal kernel, so
bounces do no per-ray gathers except the O(#materials) table lookups.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.camera import CameraSampler, sample_rays
from minipath_tpu.parallel.mesh import gen_frame_rays9, unpack_frame
from minipath_tpu.render.pallas_kernels import (
    KernelHits,
    PallasScene,
    PTScene,
    trace_packets_pallas_pt,
    trace_scene,
)
from minipath_tpu.render.stratify import render_seed, strat1d, strat2d
from minipath_tpu.scene.materials import (
    DIELECTRIC,
    EMISSIVE,
    Environment,
    LAMBERTIAN,
    METAL,
    LightTable,
    MaterialTable,
    hit_light_pdf,
    material_rows,
    sample_lights,
)

_EPS = 1e-3  # self-intersection offset along the facing normal


def _dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def _normalize(v):
    return v * jax.lax.rsqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-30))


def _unit_vector_from_uniforms(u_z, u_phi):
    """Uniform sphere directions from two [0, 1) uniforms — the shared
    body of :func:`_sample_unit_vector` and scatter_full's stratified
    sphere sample."""
    z = -1.0 + 2.0 * u_z
    phi = 2.0 * np.pi * u_phi
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def _sample_unit_vector(key, shape):
    """Uniform directions on the sphere, shape ``(..., 3)``."""
    k1, k2 = jax.random.split(key)
    return _unit_vector_from_uniforms(
        jax.random.uniform(k1, shape), jax.random.uniform(k2, shape)
    )


def _reflect(d, n):
    return d - 2.0 * _dot(d, n) * n


def scatter(
    materials: MaterialTable, key, direction, normal, mat_id
):
    """Masked BSDF sampling for a batch of hits.

    Args are ``(..., 3)`` ray directions and shading normals plus ``(...)``
    material ids. Returns ``(new_direction, attenuation, emitted, terminate)``
    — all branches are computed and selected per-lane (lockstep-friendly).
    """
    return scatter_full(materials, key, direction, normal, mat_id)[:4]


# Fuzz below this is a perfect mirror (delta lobe, pdf-less); at or above
# it the metal becomes a sampleable glossy lobe NEE can cover.
GLOSSY_MIN_FUZZ = 1e-3


def phong_exponent(fuzz):
    """Cosine-power exponent matched to the metal ``fuzz`` parameter via
    the standard roughness mapping ``n = 2/fuzz^2 - 2`` (fuzz 0.1 -> a
    tight ~200-power lobe, fuzz 1 -> cosine)."""
    return 2.0 / jnp.maximum(fuzz, GLOSSY_MIN_FUZZ) ** 2 - 2.0


def phong_pdf(n_exp, cos_alpha):
    """Solid-angle pdf of the normalized cosine-power lobe at angle
    ``alpha`` from its axis (stable for exponents up to ~1e6)."""
    c = jnp.clip(cos_alpha, 0.0, 1.0)
    powed = jnp.exp(n_exp * jnp.log(jnp.maximum(c, 1e-12)))
    return jnp.where(c > 0.0, (n_exp + 1.0) / (2.0 * np.pi) * powed, 0.0)


def _orthobasis(w):
    """Two unit tangents orthogonal to unit vectors ``w`` ``(..., 3)``."""
    a = jnp.where(
        (jnp.abs(w[..., 0:1]) > 0.9),
        jnp.asarray([0.0, 1.0, 0.0], w.dtype),
        jnp.asarray([1.0, 0.0, 0.0], w.dtype),
    )
    t1 = _normalize(jnp.cross(a, w))
    t2 = jnp.cross(w, t1)
    return t1, t2


def scatter_full(
    materials: MaterialTable, key, direction, normal, mat_id, strat=None
):
    """:func:`scatter` plus the MIS inputs next-event estimation needs:
    returns ``(new_direction, attenuation, emitted, terminate, pdf,
    diffuse)`` where ``pdf`` is the solid-angle pdf of the sampled
    direction for the sampleable lobes — cosine-weighted Lambertian and
    glossy (fuzzy) metal — and 0 for delta/emissive lanes; ``diffuse``
    marks Lambertian lanes (NEE uses the material table to identify glossy
    lanes and their lobe).

    Fuzzy metal is a normalized Phong lobe about the mirror direction
    (:func:`phong_exponent`), which has a closed-form pdf — the "masked
    BSDF sampling" north star extended so next-event estimation covers
    glossy surfaces instead of skipping them. The implied BRDF is
    ``albedo * phong_pdf / cos_in``, making lobe sampling contribute
    exactly ``albedo`` per bounce (the same throughput rule as the
    reference-style fuzz-sphere metal it replaces). ``fuzz <
    GLOSSY_MIN_FUZZ`` stays a perfect mirror (delta, pdf 0).

    ``strat`` is ``None`` (iid dimensions, the reference behavior) or
    ``(s, pid, spp, salt)`` — per-lane sample index / pixel id plus static
    spp and dimension-salt base — in which case the Lambertian sphere
    sample, the glossy lobe sample, and the dielectric reflect/refract
    decision draw from per-pixel jittered strata
    (:mod:`minipath_tpu.render.stratify`): same marginals, unbiased, lower
    variance."""
    kind, param, albedo, emission = material_rows(materials, mat_id)

    d_dot_n = _dot(direction, normal)  # (..., 1)
    front = d_dot_n < 0.0  # ray hits the front face
    nf = jnp.where(front, normal, -normal)  # facing normal

    k_lam, k_fuzz, k_refr = jax.random.split(key, 3)
    batch = mat_id.shape

    # Lambertian: cosine-weighted via (nf + unit vector). The sphere
    # sample is drawn through explicit (z, phi) uniforms so stratification
    # can tile them.
    k_z, k_phi = jax.random.split(k_lam)
    u_z = jax.random.uniform(k_z, batch)
    u_phi = jax.random.uniform(k_phi, batch)
    if strat is not None:
        s_idx, pid, spp, salt = strat
        u_z, u_phi = strat2d(u_z, u_phi, s_idx, pid, spp, salt + 0)
    unit = _unit_vector_from_uniforms(u_z, u_phi)
    lam_dir = _normalize(nf + unit)
    # Guard the degenerate case (unit vector ~ -nf).
    lam_bad = jnp.sum(lam_dir * nf, axis=-1, keepdims=True) <= 1e-6
    lam_dir = jnp.where(lam_bad, nf, lam_dir)

    # Metal: perfect mirror when fuzz ~ 0, else a cosine-power lobe about
    # the mirror direction.
    refl = _normalize(_reflect(direction, nf))
    glossy = param >= GLOSSY_MIN_FUZZ
    n_exp = phong_exponent(param)
    u = jax.random.uniform(k_fuzz, batch + (2,))
    if strat is not None:
        u0, u1 = strat2d(u[..., 0], u[..., 1], s_idx, pid, spp, salt + 1)
        u = jnp.stack([u0, u1], axis=-1)
    cos_a = jnp.exp(jnp.log(jnp.maximum(u[..., 0], 1e-12)) / (n_exp + 1.0))
    sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))
    phi = 2.0 * np.pi * u[..., 1]
    t1, t2 = _orthobasis(refl)
    lobe_dir = (
        refl * cos_a[..., None]
        + t1 * (sin_a * jnp.cos(phi))[..., None]
        + t2 * (sin_a * jnp.sin(phi))[..., None]
    )
    met_dir = jnp.where(glossy[..., None], lobe_dir, refl)
    met_absorbed = jnp.sum(met_dir * nf, axis=-1) <= 0.0
    met_pdf = jnp.where(glossy, phong_pdf(n_exp, cos_a), 0.0)

    # Dielectric: refract or reflect (Schlick).
    ior = jnp.maximum(param, 1.0001)
    eta = jnp.where(front[..., 0], 1.0 / ior, ior)[..., None]
    cos_theta = jnp.minimum(-_dot(direction, nf), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    cannot_refract = eta * sin_theta > 1.0
    r0 = ((1.0 - eta) / (1.0 + eta)) ** 2
    schlick = r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5
    reflectance_rand = jax.random.uniform(k_refr, batch)
    if strat is not None:
        reflectance_rand = strat1d(reflectance_rand, s_idx, pid, spp, salt + 2)
    reflectance_rand = reflectance_rand[..., None]
    do_reflect = cannot_refract | (schlick > reflectance_rand)
    perp = eta * (direction + cos_theta * nf)
    para = -jnp.sqrt(jnp.abs(1.0 - jnp.sum(perp * perp, axis=-1, keepdims=True))) * nf
    refr_dir = _normalize(perp + para)
    refl_dir = _normalize(_reflect(direction, nf))
    die_dir = jnp.where(do_reflect, refl_dir, refr_dir)

    is_lam = (kind == LAMBERTIAN)[..., None]
    is_met = (kind == METAL)[..., None]
    is_die = (kind == DIELECTRIC)[..., None]
    is_emi = kind == EMISSIVE

    new_dir = jnp.where(
        is_lam, lam_dir, jnp.where(is_met, met_dir, jnp.where(is_die, die_dir, nf))
    )
    attenuation = jnp.where(
        is_die, jnp.ones_like(albedo), jnp.where(is_emi[..., None], 0.0, albedo)
    )
    emitted = jnp.where(is_emi[..., None], emission, 0.0)
    terminate = is_emi | (is_met[..., 0] & met_absorbed)
    # Solid-angle pdf of the sampled direction for the sampleable lobes;
    # delta lanes (mirror, dielectric) report 0 so emitter hits through
    # them get full MIS weight.
    lam_pdf = jnp.maximum(jnp.sum(new_dir * nf, axis=-1), 0.0) / np.pi
    diffuse = is_lam[..., 0]
    pdf = jnp.where(
        diffuse, lam_pdf, jnp.where(is_met[..., 0], met_pdf, 0.0)
    )
    return new_dir, attenuation, emitted, terminate, pdf, diffuse


def _pack_rays9(packet_size: int, live_rays, origin, direction, inv_direction):
    """Shared tracer preamble: pad the ray stream to whole packets (by
    repeating the LAST ray, which is coherent with its packet so the
    duplicate lanes add no node visits), convert a live-ray count to a
    live-packet count (dead rays form a suffix after compaction), and pack
    into the kernels' ``(B, 9, P//128, 128)`` layout. Returns
    ``(rays9, live_packets, padded_count)``; callers slice results
    ``[:N]``."""
    N = origin.shape[0]
    Np = -(-N // packet_size) * packet_size
    if Np != N:
        pad = jnp.full(Np - N, N - 1, jnp.int32)
        origin = jnp.concatenate([origin, origin[pad]], axis=0)
        direction = jnp.concatenate([direction, direction[pad]], axis=0)
        inv_direction = jnp.concatenate(
            [inv_direction, inv_direction[pad]], axis=0
        )
    B = Np // packet_size
    live_packets = None
    if live_rays is not None:
        live_packets = (
            jnp.asarray(live_rays, jnp.int32) + packet_size - 1
        ) // packet_size
    r9 = jnp.concatenate([origin, direction, inv_direction], axis=-1)
    r9 = jnp.swapaxes(r9.reshape(B, packet_size, 9), 1, 2)
    return r9.reshape(B, 9, packet_size // 128, 128), live_packets, Np


def make_pallas_tracer(
    scene: PallasScene,
    *,
    stack_size: int,
    packet_size: int = 2048,
    interpret: bool = False,
):
    """Tracer over the Pallas kernel.

    Returns ``(tracer_fn, tracer_state)``: the function is closed over only
    STATIC configuration and takes the scene as its first (pytree) argument —
    closing over device arrays would bake the whole scene into the compiled
    program as constants, blowing the scoped-VMEM budget and program size.
    """
    assert packet_size % 128 == 0, packet_size

    def tracer(state: PallasScene, origin, direction, inv_direction, live_rays=None):
        N = origin.shape[0]
        r9, live_packets, Np = _pack_rays9(
            packet_size, live_rays, origin, direction, inv_direction
        )
        kh = trace_scene(
            state,
            r9,
            stack_size=stack_size,
            interpret=interpret,
            live_packets=live_packets,
        )
        return KernelHits(
            t=kh.t.reshape(Np)[:N],
            tri=kh.tri.reshape(Np)[:N],
            normal=kh.normal.reshape(Np, 3)[:N],
            material=kh.material.reshape(Np)[:N],
            overflow=kh.overflow,
            inner_visits=kh.inner_visits,
            leaf_tests=kh.leaf_tests,
        )

    return tracer, scene


def shade_from_flat(shade_flat, tri, u, v):
    """One-row gather + barycentric interpolation out of a PTScene's
    ``shade_flat`` table: returns ``(normal, material, texture_coords)`` for
    the kernel's winning ``(tri, u, v)`` (the hit-finalization of
    ``ray_bvh_intersection.rs:66-95``, deferred out of the hot loop).

    The row layout is a measured trade: ONE (N, 20) row gather beats 19
    fused 1-D column gathers 12x on the TPU (0.74 vs ~9 Mpaths/s at
    1080p/16spp — XLA lowers every 1-D gather to a serial ~3.4 ns/row
    dynamic-slice loop, and 19 of them dominate the frame), but its
    (8, 128)-tiled output pads the 20-wide minor dim 6.4x, so the HLO
    temp is ~128 B/ray. Callers bound the wavefront chunk size (see
    render_frame_pt's samples_per_packet) — ~4M rays/chunk keeps the
    temp ~0.5 GB; a single 16M-ray chunk OOMs compile at 16 GB.

    The table is f16 (see ``build_shade_flat``): the gather is byte-bound
    (2.3x faster at half-width rows, round-5 microbench), and all the
    interpolation below runs in f32 after one fused up-cast."""
    u = u[:, None]
    v = v[:, None]
    row = shade_flat[jnp.maximum(tri, 0)].astype(jnp.float32)  # one gather
    n0 = row[:, 0:3]
    normal = n0 + u * (row[:, 3:6] - n0) + v * (row[:, 6:9] - n0)
    normal = _normalize(normal)
    uv0 = row[:, 10:13]
    tex = uv0 + u * (row[:, 13:16] - uv0) + v * (row[:, 16:19] - uv0)
    return normal, row[:, 9].astype(jnp.int32), tex


def _trace_pt_any(state, r9, *, stack_size, interpret, live_packets,
                  t_max=np.inf, anyhit=False, sort_children=True):
    """Dispatch a lean PT trace to the f32 or quantized kernel by scene
    type; both return the same :class:`PTHits` contract. QPTScene infers
    its HBM-vs-VMEM triangle residency from the row width (see
    ``pallas_kernels.QPTScene``)."""
    from minipath_tpu.render.pallas_kernels import (
        QPTScene,
        trace_packets_pallas_q,
    )

    if isinstance(state, QPTScene):
        return trace_packets_pallas_q(
            state,
            r9,
            stack_size=stack_size,
            t_max=t_max,
            interpret=interpret,
            live_packets=live_packets,
            hbm_tris=state.hbm_tris,
            lean=True,
            anyhit=anyhit,
        )
    return trace_packets_pallas_pt(
        state,
        r9,
        stack_size=stack_size,
        t_max=t_max,
        interpret=interpret,
        live_packets=live_packets,
        anyhit=anyhit,
        sort_children=sort_children,
    )


def make_pt_tracer(
    scene,
    *,
    stack_size: int,
    packet_size: int = 2048,
    interpret: bool = False,
):
    """Tracer over the lean PT kernel (``trace_packets_pallas_pt``), or its
    quantized / HBM-streamed twins (``trace_packets_pallas_q(lean=True)``)
    when given a ``QPTScene`` — the one full-featured path at any scene
    size, like the reference's single traversal
    (``ray_bvh_intersection.rs:26-96``).

    The kernel returns only ``(t, tri, u, v)``; the winner's shading normal,
    material, and texture coordinates come from ONE 40-byte (f16) row gather per
    ray out of ``scene.shade_flat`` (HBM-side), interpolated with the
    kernel's barycentrics — measured ~1.8x faster end to end on compacted
    bounce packets than the full kernel, which pays ~20 normal-interpolation
    vector ops per triangle lane inside the leaf loop (tools/sweep_pt7.py).

    Same ``(tracer_fn, tracer_state)`` contract as :func:`make_pallas_tracer`.
    """
    assert packet_size % 128 == 0, packet_size

    def tracer(state, origin, direction, inv_direction, live_rays=None):
        N = origin.shape[0]
        r9, live_packets, Np = _pack_rays9(
            packet_size, live_rays, origin, direction, inv_direction
        )
        ph = _trace_pt_any(
            state,
            r9,
            stack_size=stack_size,
            interpret=interpret,
            live_packets=live_packets,
        )
        tri = ph.tri.reshape(Np)[:N]
        normal, material, tex = shade_from_flat(
            state.shade_flat,
            tri,
            ph.u.reshape(Np)[:N],
            ph.v.reshape(Np)[:N],
        )
        return KernelHits(
            t=ph.t.reshape(Np)[:N],
            tri=tri,
            normal=normal,
            material=material,
            overflow=ph.overflow,
            inner_visits=ph.inner_visits,
            leaf_tests=ph.leaf_tests,
            texture_coords=tex,
        )

    return tracer, scene


def make_xla_tracer(bvh, *, stack_size: int, packet_size: int = 256):
    """Portable tracer over the pure-XLA packet traversal (CPU-friendly).
    Returns ``(tracer_fn, tracer_state)`` like :func:`make_pallas_tracer`."""
    from minipath_tpu.geometry.ray import Rays
    from minipath_tpu.render.traversal import finalize_hits, trace_packets

    def tracer(state, origin, direction, inv_direction, live_rays=None):
        del live_rays  # the XLA engine runs the whole batch in lockstep
        N = origin.shape[0]
        B = N // packet_size
        rays = Rays(
            origin=origin.reshape(B, packet_size, 3),
            direction=direction.reshape(B, packet_size, 3),
            inv_direction=inv_direction.reshape(B, packet_size, 3),
        )
        res = trace_packets(state, rays, stack_size=stack_size)
        hits = finalize_hits(state, rays, res)
        return KernelHits(
            t=jnp.where(res.tri >= 0, res.t, jnp.inf).reshape(N),
            tri=res.tri.reshape(N),
            normal=hits.normal.reshape(N, 3),
            material=hits.material.reshape(N),
        )

    return tracer, bvh


# Shadow rays are parameterized by the UNNORMALIZED segment to the light
# point: t runs in segment units, so one STATIC t_max tests exactly
# "anything strictly between origin and origin+segment" without per-ray
# t_max support in the kernels. The margin below t=1 is only a float32
# guard band (~100 ulp) — geometric endpoint epsilons are the CALLER's job
# and must be absolute (the NEE loop pulls both segment ends back by _EPS
# world units), otherwise the blind zone near a light would grow linearly
# with its distance.
_SHADOW_T_MAX = 1.0 - 1e-5


def make_pt_shadow_tracer(
    scene,
    *,
    stack_size: int,
    packet_size: int = 2048,
    interpret: bool = False,
    sort_children: bool = True,
):
    """Occlusion tracer over the lean PT kernel (anyhit mode), or the
    quantized / HBM-streamed anyhit kernel when given a ``QPTScene``
    (occlusion then inherits the quantized tolerance: hits within
    ~box/65535 of the segment end may classify either way). Either way
    lanes retire on their first hit and fully-occluded packets drop the
    remaining stack wholesale — NEE shadow rays never pay a closest-hit
    trace at any scene size.

    Returns ``(shadow_fn, scene)`` like the tracer factories;
    ``shadow(state, origin, segment, live_rays=None) -> (N,) bool`` is True
    where something blocks the segment ``origin -> origin+segment``.

    ``sort_children`` keeps the near-first push ordering; for anyhit the
    tradeoff differs from closest-hit (lanes retire at the FIRST hit, so
    ordering only matters for how fast occluders are found) — exposed for
    measurement (tools/sweep_shadow.py; f32 kernel only).
    """
    assert packet_size % 128 == 0, packet_size

    def shadow(state, origin, segment, live_rays=None):
        N = origin.shape[0]
        inv = jnp.where(segment == 0.0, jnp.inf, 1.0 / segment)
        r9, live_packets, Np = _pack_rays9(
            packet_size, live_rays, origin, segment, inv
        )
        ph = _trace_pt_any(
            state,
            r9,
            stack_size=stack_size,
            t_max=_SHADOW_T_MAX,
            interpret=interpret,
            live_packets=live_packets,
            anyhit=True,
            sort_children=sort_children,
        )
        return ph.tri.reshape(Np)[:N] >= 0

    return shadow, scene


def make_xla_shadow_tracer(bvh, *, stack_size: int, packet_size: int = 256):
    """Portable occlusion tracer (same contract as
    :func:`make_pt_shadow_tracer`) over the pure-XLA engine."""
    from minipath_tpu.geometry.ray import Rays
    from minipath_tpu.render.traversal import trace_packets

    def shadow(state, origin, segment, live_rays=None):
        del live_rays
        N = origin.shape[0]
        B = N // packet_size
        inv = jnp.where(segment == 0.0, jnp.inf, 1.0 / segment)
        rays = Rays(
            origin=origin.reshape(B, packet_size, 3),
            direction=segment.reshape(B, packet_size, 3),
            inv_direction=inv.reshape(B, packet_size, 3),
        )
        res = trace_packets(
            state, rays, t_max=_SHADOW_T_MAX, stack_size=stack_size
        )
        return res.tri.reshape(N) >= 0

    return shadow, bvh


class _PathState(NamedTuple):
    origin: jnp.ndarray  # (N, 3)
    direction: jnp.ndarray  # (N, 3)
    inv_direction: jnp.ndarray  # (N, 3)
    throughput: jnp.ndarray  # (N, 3)
    radiance: jnp.ndarray  # (N, 3)
    pixel: jnp.ndarray  # (N,) i32 — flat pixel index in packet layout
    active: jnp.ndarray  # (N,) bool
    # (N,) f32 BSDF pdf of `direction` at its origin vertex, 0 for camera
    # rays and specular bounces — the MIS input for NEE emitter-hit
    # weighting. None when NEE is off (nothing carries or compacts it).
    prev_pdf: jnp.ndarray | None = None


def _direction_bin(d: jnp.ndarray) -> jnp.ndarray:
    """Direction -> one of 96 bins: 6 dominant-axis faces x 4x4 quantized
    minor components. Finer than octants: a bin spans a ~28-degree cone
    instead of 90 degrees, which is what bounds the BVH frustum a sorted
    packet traverses (measured 3.3 vs 2.2 Mrays/s on bounce-1 rays vs
    octant binning, tools/sweep_pt2.py).

    Branchless selects, no gathers: the take_along_axis formulation cost
    ~183 ms on the 4.15M-ray wavefront (three per-row gathers) — the
    single biggest piece of the per-bounce shadow-sort glue; this one is
    ~10 ms (tools/sweep_pt15.py anatomy)."""
    x, y, z = d[:, 0], d[:, 1], d[:, 2]
    axv, ayv, azv = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    ax0 = (axv >= ayv) & (axv >= azv)
    ax1 = (~ax0) & (ayv >= azv)
    major = jnp.where(ax0, x, jnp.where(ax1, y, z))
    m1 = jnp.where(ax0, y, jnp.where(ax1, z, x))
    m2 = jnp.where(ax0, z, jnp.where(ax1, x, y))
    face = (
        jnp.where(ax0, 0, jnp.where(ax1, 2, 4)).astype(jnp.int32)
        + (major > 0)
    )
    inv_major = 1.0 / jnp.maximum(jnp.abs(major), 1e-9)
    q1 = jnp.clip(((m1 * inv_major + 1.0) * 2.0).astype(jnp.int32), 0, 3)
    q2 = jnp.clip(((m2 * inv_major + 1.0) * 2.0).astype(jnp.int32), 0, 3)
    return (face << 4) | (q1 << 2) | q2  # 0..95


def _morton16(cell: jnp.ndarray) -> jnp.ndarray:
    """Interleave three 4-bit cell coordinates into a 12-bit Morton code —
    spatially adjacent cells stay adjacent in sort order (raster order puts
    whole planes between neighbors)."""
    out = jnp.zeros_like(cell[:, 0])
    for b in range(4):
        for ax in range(3):
            out = out | (((cell[:, ax] >> b) & 1) << (3 * b + (2 - ax)))
    return out


def _compact(state: _PathState, fine_direction: bool = True) -> _PathState:
    """Coherence-restoring compaction: sort rays by (dead?, direction bin,
    Morton position cell), direction-major. Dead rays sink to the back —
    they form a suffix, so the tracer's live-prefix early exit skips whole
    packets — and live rays regain the directional/spatial clustering that
    packet traversal needs: bounced rays in an arbitrary order cost the
    packet the UNION of every lane's traversal (measured 0.5 Mrays/s fully
    scrambled vs ~210 coherent on the atrium).

    ``fine_direction`` picks the key measured best per bounce depth
    (tools/sweep_pt3.py on real bounce-k rays): first-bounce directions
    still correlate with camera-facing surfaces, so 96 direction bins win
    (3.4 vs 2.2 Mrays/s); deeper bounces are isotropic and coarse octants
    with better spatial locality win (1.7 vs 0.9 Mrays/s for fine bins).

    State rides through one variadic lax.sort as payload operands;
    inv_direction is recomputed (cheaper than carrying it)."""
    o = state.origin
    lo = jnp.min(o, axis=0)
    hi = jnp.max(o, axis=0)
    scale = 16.0 / jnp.maximum(hi - lo, 1e-6)
    cell = jnp.clip((o - lo) * scale, 0, 15).astype(jnp.int32)  # (N, 3)
    cell_id = _morton16(cell)  # 12 bits
    if fine_direction:
        dbin = _direction_bin(state.direction)  # 7 bits
    else:
        d = state.direction
        dbin = (
            (d[:, 0] > 0).astype(jnp.int32) * 4
            + (d[:, 1] > 0).astype(jnp.int32) * 2
            + (d[:, 2] > 0).astype(jnp.int32)
        )
    dead = (~state.active).astype(jnp.int32)
    key = (dead << 19) | (dbin << 12) | cell_id
    # Variadic lax.sort: the payload rides through the sorting network as
    # extra operands instead of argsort + per-row gathers — measured ~2.7x
    # on the TPU for this shape (228 -> 84 ms per compaction on the
    # 4.15M-ray atrium wavefront; tools/sweep_pt16.py). The dead bit tops
    # the key, so live rays form a prefix and `active` needs no carrying.
    ops = [key]
    for col in (state.origin, state.direction, state.throughput,
                state.radiance):
        ops.extend(col[:, i] for i in range(3))
    if state.prev_pdf is not None:
        ops.append(state.prev_pdf)
    ops.append(state.pixel)
    sorted_ops = jax.lax.sort(ops, dimension=0, is_stable=False, num_keys=1)
    d = jnp.stack(sorted_ops[4:7], axis=-1)
    inv = jnp.where(d == 0.0, jnp.inf, 1.0 / d)
    n_live = jnp.sum(state.active.astype(jnp.int32))
    return _PathState(
        origin=jnp.stack(sorted_ops[1:4], axis=-1),
        direction=d,
        inv_direction=inv,
        throughput=jnp.stack(sorted_ops[7:10], axis=-1),
        radiance=jnp.stack(sorted_ops[10:13], axis=-1),
        pixel=sorted_ops[-1],
        active=jnp.arange(key.shape[0], dtype=jnp.int32) < n_live,
        prev_pdf=sorted_ops[13] if state.prev_pdf is not None else None,
    )


@partial(
    jax.jit,
    static_argnames=(
        "tracer",
        "width",
        "height",
        "px_block",
        "samples",
        "bounces",
        "compaction",
        "shadow_tracer",
        "shadow_sort",
        "shadow_rr",
        "nee_max_depth",
        "rr_start",
        "rr_floor",
        "min_live_frac",
        "strat_spp",
        "with_sumsq",
        "clamp",
    ),
)
def _pt_chunk(
    tracer_state,
    materials: MaterialTable,
    env: Environment,
    sampler: CameraSampler,
    key,
    *,
    tracer,
    width: int,
    height: int,
    px_block,
    samples: int,
    bounces: int,
    compaction: bool,
    lights=None,
    shadow_tracer=None,
    shadow_sort: str = "pos",
    shadow_rr: bool = True,
    nee_max_depth: int | None = None,
    rr_start: int = 3,
    rr_floor: float = 0.05,
    min_live_frac: float | None = None,
    strat_spp: int | None = None,
    strat_offset=0,
    strat_seed=0,
    with_sumsq: bool = False,
    clamp: float | None = None,
):
    """Trace ``samples`` spp of camera paths; returns ``(B0, bp, 3)`` RGB
    sums per packet-pixel (same layout as the parity frame renderer) —
    plus the per-pixel luminance sum of squares when ``with_sumsq``."""
    rays9, _ = gen_frame_rays9(
        sampler, key, width=width, height=height, px_block=px_block,
        samples=samples, strat_spp=strat_spp, strat_offset=strat_offset,
        strat_seed=strat_seed,
    )
    return _pt_trace(
        tracer_state, materials, env, rays9, key,
        tracer=tracer, samples=samples, bounces=bounces, compaction=compaction,
        lights=lights, shadow_tracer=shadow_tracer, shadow_sort=shadow_sort,
        shadow_rr=shadow_rr, nee_max_depth=nee_max_depth, rr_start=rr_start,
        rr_floor=rr_floor, min_live_frac=min_live_frac,
        strat_spp=strat_spp, strat_offset=strat_offset, strat_seed=strat_seed,
        with_sumsq=with_sumsq, clamp=clamp,
    )


def _pt_trace(
    tracer_state,
    materials: MaterialTable,
    env: Environment,
    rays9,
    key,
    *,
    tracer,
    samples: int,
    bounces: int,
    compaction: bool,
    lights=None,
    shadow_tracer=None,
    shadow_sort: str = "pos",
    shadow_rr: bool = True,
    nee_max_depth: int | None = None,
    rr_start: int = 3,
    rr_floor: float = 0.05,
    min_live_frac: float | None = None,
    strat_spp: int | None = None,
    strat_offset=0,
    strat_seed=0,
    live_rays=None,
    with_sumsq: bool = False,
    clamp: float | None = None,
):
    """The bounce loop for an arbitrary camera-ray batch ``rays9``
    (whole frame or one device's shard). Returns ``(B0, bp, 3)`` sums.

    ``live_rays`` (traced scalar) marks only the first N rays live — the
    adaptive sampler renders packets in allocation order and skips the
    dead suffix in-kernel from bounce 0. ``with_sumsq`` additionally
    returns the per-pixel sum of squared per-sample luminances
    ``(B0, bp)`` (the pilot pass's variance estimate).

    When ``lights`` (a :class:`LightTable`) and ``shadow_tracer`` are given,
    next-event estimation runs at every diffuse vertex: one explicit light
    sample + occlusion ray per bounce, combined with BSDF sampling by the
    MIS power heuristic (emitter hits through diffuse bounces are
    down-weighted by the pdf NEE had for that direction; specular chains
    keep full weight). Unbiased either way — NEE only moves variance.
    """
    nee = lights is not None and shadow_tracer is not None
    if nee_max_depth is not None and not nee:
        raise ValueError("nee_max_depth given without lights/shadow_tracer")
    B0, _, S, LN = rays9.shape
    P0 = S * LN
    N = B0 * P0
    flat = jnp.swapaxes(rays9.reshape(B0, 9, P0), 1, 2).reshape(N, 9)
    pixel = jnp.arange(N, dtype=jnp.int32)  # identity: one path per slot

    state = _PathState(
        origin=flat[:, 0:3],
        direction=flat[:, 3:6],
        inv_direction=flat[:, 6:9],
        throughput=jnp.ones((N, 3), jnp.float32),
        radiance=jnp.zeros((N, 3), jnp.float32),
        pixel=pixel,
        active=(
            jnp.ones((N,), bool)
            if live_rays is None
            else jnp.arange(N, dtype=jnp.int32) < live_rays
        ),
        prev_pdf=jnp.zeros((N,), jnp.float32) if nee else None,
    )

    for bounce in range(bounces):
        live = None if live_rays is None else jnp.int32(live_rays)
        if compaction and bounce > 0:
            state = _compact(state, fine_direction=bounce == 1)
            # Dead rays are now a suffix; tell the tracer the live count so
            # whole-dead packets exit early in-kernel.
            live = jnp.sum(state.active.astype(jnp.int32))
            if min_live_frac is not None:
                # Wavefront tail cutoff (OPT-IN, biased): once the live
                # fraction drops below the threshold, retire the whole
                # wavefront. The remaining paths' future contribution is
                # dropped — unlike per-ray roulette there is no reweighting
                # (all-or-nothing survival of the tail would spike variance
                # instead). The traced live count feeds the kernels'
                # early-exit, so the cut needs NO host sync; it trims the
                # per-bounce fixed overhead (XLA glue + compaction sort)
                # that dominates once traversal has compacted away.
                cut = live < jnp.int32(min_live_frac * N)
                state = state._replace(active=state.active & ~cut)
                live = jnp.where(cut, jnp.int32(0), live)
        kh = tracer(
            tracer_state, state.origin, state.direction, state.inv_direction, live
        )
        hit = (kh.tri >= 0) & state.active
        missed = (~(kh.tri >= 0)) & state.active

        # Environment on miss (terminates the path). The environment is not
        # light-sampled, so its contribution needs no MIS weight.
        env_rad = env.radiance(state.direction)
        radiance = state.radiance + jnp.where(
            missed[..., None], state.throughput * env_rad, 0.0
        )

        # BSDF sampling at hits. With stratification on, each lane's
        # sample index / pixel id derive from `state.pixel` — the original
        # packet-layout flat index, which compaction carries — so every
        # bounce's BSDF and light dimensions stay stratified per pixel even
        # after rays have been permuted (salts are per bounce and per
        # dimension; see render/stratify.py for the unbiasedness argument).
        bkey = jax.random.fold_in(key, bounce + 1)
        strat_b = strat_nee = None
        if strat_spp is not None:
            bp0 = P0 // samples
            within = state.pixel % P0
            s_idx = strat_offset + within // bp0
            pid_s = (
                (state.pixel // P0) * bp0 + within % bp0
            ) ^ jnp.int32(strat_seed)
            strat_b = (s_idx, pid_s, strat_spp, 8 * bounce)
            strat_nee = (s_idx, pid_s, strat_spp, 8 * bounce + 4)
        new_dir, atten, emitted, terminate, bsdf_pdf, diffuse = scatter_full(
            materials, bkey, state.direction, kh.normal, kh.material,
            strat=strat_b,
        )
        if nee:
            # MIS: weight the emitter hit by how likely BSDF sampling was
            # to find it relative to NEE from the PREVIOUS vertex.
            pdf_l = hit_light_pdf(lights, kh.tri, state.direction, kh.t)
            pp = state.prev_pdf
            w_b = jnp.where(
                pp > 0.0, pp * pp / (pp * pp + pdf_l * pdf_l), 1.0
            )
            emitted = emitted * w_b[..., None]
        radiance = radiance + jnp.where(
            hit[..., None], state.throughput * emitted, 0.0
        )
        throughput = jnp.where(
            hit[..., None], state.throughput * atten, state.throughput
        )

        point = state.origin + state.direction * kh.t[..., None]
        d_dot_n = jnp.sum(state.direction * kh.normal, axis=-1, keepdims=True)
        nf = jnp.where(d_dot_n < 0, kh.normal, -kh.normal)

        # ``nee_max_depth`` caps the shadow passes to the first K vertices:
        # deep vertices skip the (expensive) occlusion trace and instead
        # hand FULL BSDF weight to the next emitter hit by zeroing the
        # carried prev_pdf below — exactly the delta-lobe mechanism, so the
        # estimator stays unbiased; only deep-bounce direct light loses its
        # variance reduction, where throughput (and thus variance share) is
        # already small.
        nee_here = nee and (nee_max_depth is None or bounce < nee_max_depth)
        if nee_here:
            # Next-event estimation at diffuse AND glossy vertices: sample
            # one light point, trace the occlusion segment, add the
            # MIS-weighted direct contribution. Glossy metal participates
            # through its Phong lobe (closed-form pdf); mirror/dielectric
            # lanes are delta lobes NEE cannot cover and keep full BSDF
            # weight instead.
            #
            # Occlusion traces PER BOUNCE. A deferred variant (queue every
            # bounce's segments, one bounces-times-denser anyhit launch
            # after the loop) was measured SLOWER (11.75 s vs 10.2 s NEE
            # frame): the packet count is the same either way, and the
            # 5x-sized concat + argsort + scatter + segment_sum XLA glue
            # costs more than the marginally-tighter packets save.
            # Same packed row scatter_full gathered — XLA CSEs the lookup.
            kindv, fuzzv, albedo, _ = material_rows(materials, kh.material)
            glossy = (kindv == METAL) & (fuzzv >= GLOSSY_MIN_FUZZ)
            cand = (diffuse | glossy) & hit
            lkey = jax.random.fold_in(bkey, 11)
            sh_o = point + nf * _EPS
            y, wi, pdf_nee, em_l, cos_y, light_i = sample_lights(
                lights, lkey, sh_o, strat=strat_nee
            )
            cos_x = jnp.sum(wi * nf, axis=-1)
            cand = cand & (cos_x > 0.0) & (cos_y > 1e-6) & (pdf_nee > 0.0)
            if shadow_rr:
                # Shadow-ray Russian roulette: prune low-throughput
                # candidates BEFORE the occlusion trace and reweight the
                # survivors by 1/q — unbiased (E[1{u<q}/q] = 1), and the
                # trace cost tracks the candidate count because candidates
                # are compacted to a packet prefix below. Measured on the
                # atrium wavefront (tools/sweep_pt15.py): candidates drop
                # to 75/57/45/35% of the full set at bounces 1-4 with
                # trace time following (e.g. 327 -> 168 ms at bounce 4);
                # bounce 0 is untouched (throughput is still 1).
                q_rr = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 1.0)
                u_rr = jax.random.uniform(
                    jax.random.fold_in(lkey, 3), q_rr.shape
                )
                cand = cand & (u_rr < q_rr)
                rr_w = 1.0 / q_rr
            else:
                rr_w = jnp.ones_like(cos_x)
            # Pull the light-side endpoint back by an ABSOLUTE epsilon
            # (matching the surface-side _EPS offset) so the occlusion
            # blind zone near the light doesn't scale with its distance.
            seg = y - wi * _EPS - sh_o
            # The shadow batch has its OWN coherence structure: segment
            # directions point at sampled light points, not along the bounce
            # rays the wavefront was sorted by. Re-sort so candidates form a
            # compact prefix of coherent packets — the anyhit kernel then
            # traverses only ceil(#cand/P) packets instead of every live
            # packet half-filled with parked lanes. Position-major is the
            # measured default (10.22 s vs direction-major 10.61 s NEE
            # frame, tools/sweep_pt13.py): segments CONVERGE on the lights,
            # so spatial neighbors run nearly parallel while a direction
            # bin collects rays from all over the scene. "light" bins by
            # the sampled emitter first (every ray in a packet then aims
            # at the SAME panel) — measured 10.47 s, also behind "pos":
            # with few large emitters the bin splits spatial clusters
            # without tightening the frustum a packet traverses.
            sh_o_safe = jnp.where(cand[..., None], sh_o, 0.0)
            lo = jnp.min(jnp.where(cand[..., None], sh_o_safe, jnp.inf), axis=0)
            hi = jnp.max(jnp.where(cand[..., None], sh_o_safe, -jnp.inf), axis=0)
            scale = 16.0 / jnp.maximum(hi - lo, 1e-6)
            cell = jnp.clip((sh_o_safe - lo) * scale, 0, 15).astype(jnp.int32)
            if shadow_sort == "dir":
                skey = (_direction_bin(wi) << 12) | _morton16(cell)
            elif shadow_sort == "light":
                skey = (light_i.astype(jnp.int32) << 12) | _morton16(cell)
            elif shadow_sort == "fromlight":
                # MEASURED DEAD END (kept so tuning doesn't re-explore):
                # trace the segment from the LIGHT end (flipped at launch
                # below; occlusion of an interval is direction-symmetric).
                # The hope: a packet then shares a near-point origin (one
                # emitter) and a cone of directions — pinhole-primary
                # geometry, which the kernel traverses ~10x faster than
                # surface-scattered packets. Measured on the atrium NEE
                # frame (tools/sweep_pt13.py, 960x540@8spp): 6.92 s vs
                # "pos" 6.69 s, identical estimator mean. The emitters are
                # large area panels, so flipped origins spread across the
                # whole panel and the "pinhole" never materializes, while
                # the far endpoints (the receiving surfaces) diverge worse
                # than the pos-sorted forward segments. Key: emitter major,
                # 28-degree bin of the flipped direction, Morton cell of
                # the surface endpoint as the finer refinement.
                skey = (
                    (jnp.minimum(light_i.astype(jnp.int32), 255) << 19)
                    | (_direction_bin(-wi) << 12)
                    | _morton16(cell)
                )
            else:  # "pos": position-major for light-converging segments
                skey = (_morton16(cell) << 7) | _direction_bin(wi)
            skey = (((~cand).astype(jnp.int32)) << 27) | skey
            n_cand = jnp.sum(cand.astype(jnp.int32))
            # Variadic lax.sort carries the payload THROUGH the sorting
            # network instead of argsort + per-row gathers — measured ~2x
            # on the TPU for this shape (100 -> 57 ms on the 4.15M-ray
            # atrium wavefront; tools/sweep_pt16.py). The iota operand
            # recovers `order` for the inverse scatter. The ~cand top bit
            # puts every candidate strictly before every non-candidate, so
            # the sorted candidate mask is just the length-n_cand prefix.
            iota = jnp.arange(skey.shape[0], dtype=jnp.int32)
            sorted_ops = jax.lax.sort(
                [skey, iota,
                 sh_o[:, 0], sh_o[:, 1], sh_o[:, 2],
                 seg[:, 0], seg[:, 1], seg[:, 2]],
                dimension=0, is_stable=False, num_keys=1,
            )
            order = sorted_ops[1]
            cand_s = iota < n_cand
            # Park the (now-suffix) non-candidate lanes far outside the
            # scene so partial boundary packets miss at the root.
            o_sorted = jnp.stack(sorted_ops[2:5], axis=-1)
            s_sorted = jnp.stack(sorted_ops[5:8], axis=-1)
            if shadow_sort == "fromlight":
                # Launch the reversed interval: origin at the (pulled-back)
                # light point, segment toward the surface. Same [0, 1-eps]
                # parametric range, same blocker set, same result bit.
                o_sorted, s_sorted = o_sorted + s_sorted, -s_sorted
            sh_o_eff = jnp.where(cand_s[..., None], o_sorted, 1e9)
            seg_eff = jnp.where(cand_s[..., None], s_sorted, 1.0)
            occ_s = shadow_tracer(tracer_state, sh_o_eff, seg_eff, n_cand)
            occluded = jnp.zeros_like(occ_s).at[order].set(occ_s)
            # BSDF value x cos and BSDF pdf toward the light, per lobe:
            # Lambertian f*cos = albedo/pi * cos_x (pdf cos_x/pi); glossy
            # f*cos = albedo * phong_pdf(wi) (the lobe's implied BRDF —
            # see scatter_full), pdf = the same phong_pdf.
            refl_v = _normalize(_reflect(state.direction, nf))
            lobe_pdf_L = phong_pdf(
                phong_exponent(fuzzv), jnp.sum(wi * refl_v, axis=-1)
            )
            pdf_b_L = jnp.where(glossy, lobe_pdf_L, cos_x / np.pi)
            fcos = jnp.where(
                glossy[..., None],
                albedo * lobe_pdf_L[..., None],
                albedo / np.pi * cos_x[..., None],
            )
            w_nee = pdf_nee * pdf_nee / (
                pdf_nee * pdf_nee + pdf_b_L * pdf_b_L
            )
            contrib = (
                state.throughput * fcos * em_l
                * (w_nee / pdf_nee * rr_w)[..., None]
            )
            radiance = radiance + jnp.where(
                (cand & ~occluded)[..., None], contrib, 0.0
            )

        # Dielectric transmission crosses the surface: offset along the new
        # direction instead of the facing normal.
        offset_dir = jnp.where(
            jnp.sum(new_dir * nf, axis=-1, keepdims=True) >= 0, nf, -nf
        )
        new_origin = point + offset_dir * _EPS
        inv = jnp.where(new_dir == 0.0, jnp.inf, 1.0 / new_dir)

        active = hit & ~terminate
        # Russian roulette after ``rr_start`` bounces: kill paths with
        # probability 1 - max(throughput) and reweight survivors — the
        # estimator stays unbiased, and because compaction packs live rays
        # into a prefix, every killed path directly removes trace work from
        # all later bounces (the oracle-ceiling measurement in
        # pallas_kernels.py shows traversal itself is within ~20% of its
        # union-bound floor, so fewer rays is the remaining lever).
        if bounce >= rr_start:
            p_continue = jnp.clip(jnp.max(throughput, axis=-1), rr_floor, 1.0)
            rr = jax.random.uniform(jax.random.fold_in(bkey, 7), active.shape)
            survived = rr < p_continue
            throughput = jnp.where(
                (active & survived)[..., None],
                throughput / p_continue[..., None],
                throughput,
            )
            active = active & survived

        state = _PathState(
            origin=jnp.where(hit[..., None], new_origin, state.origin),
            direction=jnp.where(hit[..., None], new_dir, state.direction),
            inv_direction=jnp.where(hit[..., None], inv, state.inv_direction),
            throughput=throughput,
            radiance=radiance,
            pixel=state.pixel,
            active=active,
            # bsdf_pdf is already 0 for delta lobes, so emitter hits through
            # mirrors/glass keep full weight; diffuse AND glossy carry their
            # lobe pdf into the next vertex's MIS. Vertices past
            # nee_max_depth carry 0: their direct light was NOT light-
            # sampled, so the next emitter hit must keep full weight.
            prev_pdf=(
                jnp.where(hit, bsdf_pdf, 0.0)
                if nee_here
                else (jnp.zeros_like(bsdf_pdf) if nee else None)
            ),
        )

    # Paths still active after the bounce budget contribute nothing more.
    rad = jax.ops.segment_sum(state.radiance, state.pixel, num_segments=N)
    rad = rad.reshape(B0, P0, 3)
    bp = P0 // samples
    per_sample = rad.reshape(B0, samples, bp, 3)
    if clamp is not None:
        # Firefly clamp: cap each SAMPLE's radiance before averaging — a
        # standard production variance control (biased: dims speckles
        # brighter than ``clamp``). Opt-in only.
        per_sample = jnp.minimum(per_sample, clamp)
    out = per_sample.sum(axis=1)
    if with_sumsq:
        from minipath_tpu.utils import LUMA_WEIGHTS

        lum = jnp.einsum("bspc,c->bsp", per_sample, jnp.asarray(LUMA_WEIGHTS))
        return out, (lum * lum).sum(axis=1)
    return out


def make_pt_renderer_sharded(
    mesh,
    tracer,
    *,
    width: int,
    height: int,
    px_block=(16, 16),
    samples_per_packet: int = 8,
    bounces: int = 6,
    compaction: bool = True,
    axis: str = "d",
    lights: LightTable | None = None,
    shadow_tracer=None,
    shadow_rr: bool = True,
    nee_max_depth: int | None = None,
    rr_start: int = 3,
    rr_floor: float = 0.05,
    min_live_frac: float | None = None,
    stratify: bool = True,
    sobol: bool = False,
):
    """Multi-chip wavefront path tracer over a 1-D device mesh.

    Each device owns a contiguous range of the frame's packet blocks,
    generates its camera rays in-jit, and runs the WHOLE bounce loop —
    including compaction, which stays device-local (rays never migrate
    between chips, so there are no per-bounce collectives; the only
    cross-chip traffic is the final image-shard gather). RNG decorrelates
    by folding the mesh position into the key.

    Returns ``render(tracer_state, materials, sampler, key, spp, env=None)
    -> (H, W, 4)`` mean image.
    """
    from jax.sharding import PartitionSpec as P

    bh, bw = px_block
    hc, wc = -(-height // bh), -(-width // bw)
    B = hc * wc
    n_dev = int(mesh.devices.size)
    B_pad = -(-B // n_dev) * n_dev
    B_loc = B_pad // n_dev

    def local_chunk(
        tracer_state, materials, env, sampler, key, lights_arg, strat_offset,
        strat_seed, samples: int, strat_spp: int | None,
    ):
        d = jax.lax.axis_index(axis)
        key = jax.random.fold_in(key, d)
        from minipath_tpu.parallel.mesh import gen_rays9_blocks

        rays9 = gen_rays9_blocks(
            sampler, key, d * B_loc,
            block_count=B_loc, wc=wc, px_block=px_block, samples=samples,
            strat_spp=strat_spp, strat_offset=strat_offset,
            strat_seed=strat_seed,
        )
        return _pt_trace(
            tracer_state, materials, env, rays9, key,
            tracer=tracer, samples=samples, bounces=bounces,
            compaction=compaction,
            lights=lights_arg, shadow_tracer=shadow_tracer,
            shadow_rr=shadow_rr, nee_max_depth=nee_max_depth,
            rr_start=rr_start, rr_floor=rr_floor,
            min_live_frac=min_live_frac,
            strat_spp=strat_spp, strat_offset=strat_offset,
            strat_seed=strat_seed,
        )

    cache = {}

    def chunk_fn(samples: int, strat_spp: int | None):
        if (samples, strat_spp) not in cache:
            cache[(samples, strat_spp)] = jax.jit(
                jax.shard_map(
                    partial(local_chunk, samples=samples, strat_spp=strat_spp),
                    mesh=mesh,
                    in_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
                    out_specs=P(axis),
                    check_vma=False,
                )
            )
        return cache[(samples, strat_spp)]

    def render(tracer_state, materials, sampler, key, spp: int, env=None):
        if env is None:
            env = Environment.sky()
        seed = render_seed(key)
        acc = None
        done = 0
        chunk = 0
        while done < spp:
            n = min(samples_per_packet, spp - done)
            part = chunk_fn(
                n, (-spp if sobol else spp) if stratify else None
            )(
                tracer_state, materials, env, sampler,
                jax.random.fold_in(key, 1000 + chunk), lights,
                jnp.int32(done), seed,
            )
            acc = part if acc is None else acc + part
            done += n
            chunk += 1
        rgb = unpack_frame(
            jnp.concatenate([acc[:B], jnp.zeros_like(acc[:B, :, :1])], -1),
            width, height, (hc, wc), px_block,
        )[..., :3]
        rgb = rgb / spp
        alpha = jnp.ones_like(rgb[..., :1])
        return jnp.concatenate([rgb, alpha], axis=-1)

    return render


def render_frame_pt(
    tracer,
    tracer_state,
    materials: MaterialTable,
    sampler: CameraSampler,
    key,
    *,
    width: int,
    height: int,
    spp: int,
    bounces: int = 6,
    env: Environment | None = None,
    px_block=(16, 16),
    samples_per_packet: int = 8,
    compaction: bool = True,
    lights: LightTable | None = None,
    shadow_tracer=None,
    shadow_sort: str = "pos",
    shadow_rr: bool = True,
    nee_max_depth: int | None = None,
    rr_start: int = 3,
    rr_floor: float = 0.05,
    min_live_frac: float | None = None,
    stratify: bool = True,
    sobol: bool = False,
    strat_total: int | None = None,
    strat_offset: int = 0,
    strat_seed=None,
    return_variance: bool = False,
    clamp: float | None = None,
) -> jnp.ndarray:
    """Path-traced frame: mean RGB + alpha=1, shape ``(H, W, 4)``.

    ``(tracer, tracer_state)`` comes from :func:`make_pallas_tracer` (TPU)
    or :func:`make_xla_tracer` (portable); keep the same tracer function
    object across calls to reuse the jit cache. Pass ``lights``
    (:func:`minipath_tpu.scene.materials.build_light_table`) together with a
    ``shadow_tracer`` (:func:`make_pt_shadow_tracer` /
    :func:`make_xla_shadow_tracer`) to enable next-event estimation.
    ``shadow_rr`` (default on) Russian-roulettes low-throughput shadow
    candidates before the occlusion trace — still unbiased, and the
    deep-bounce anyhit pass gets ~2x cheaper for a small variance cost.
    ``rr_start`` is the first bounce at which path Russian roulette may
    kill a ray (survival probability = max throughput channel, survivors
    reweighted — unbiased at any setting); lower values trade deep-bounce
    trace time for variance. ``rr_floor`` is the survival-probability
    floor (default 0.05): raising it makes the roulette GENTLER — dim
    paths survive at least that often (reweighted, still unbiased), so
    more rays trace but variance drops (tools/sweep_rr2.py measures the
    efficiency trade). ``min_live_frac`` (opt-in, BIASED) retires
    the whole wavefront once fewer than that fraction of paths remain
    live — it drops the tail's remaining contribution to skip per-bounce
    fixed overhead; leave ``None`` for exact results.
    ``stratify`` (default on) draws the film/lens, BSDF, and light-sample
    dimensions from per-pixel jittered strata spanning the full ``spp``
    (:mod:`minipath_tpu.render.stratify`) — identical estimator mean,
    lower variance than iid sampling at the same spp. ``sobol`` upgrades
    those same dimensions to per-pixel Owen-scrambled Sobol points
    (padded 2-D Sobol; see stratify.py's low-discrepancy section) —
    still exactly unbiased, measured lower variance than jittered strata
    at equal spp (QUALITY.json ``sobol``); requires ``stratify=True``.
    ``strat_total``/``strat_offset`` widen the stratum window beyond this
    call: a progressive accumulator rendering many small-spp passes can
    pass the per-round total and this pass's global sample offset so the
    strata tile across passes (e.g. the GUI viewport's spp-1 passes
    stratify over 64-pass rounds). Exactly unbiased at every completed
    round; mid-round the running mean over-weights the strata drawn so
    far, an error that vanishes as passes accumulate.
    ``return_variance`` also returns the per-pixel variance OF THE MEAN
    (luminance, ``(H, W)``) — the noise estimate the variance-guided
    denoiser and diagnostics consume.
    """
    if env is None:
        env = Environment.sky()
    if (lights is None) != (shadow_tracer is None):
        raise ValueError("NEE needs both lights= and shadow_tracer=")
    if return_variance and spp < 2:
        raise ValueError("return_variance needs spp >= 2")
    if sobol and not stratify:
        raise ValueError("sobol=True requires stratify=True")
    if strat_seed is None:
        # One pairing seed per render, shared by every chunk of the
        # stratum window (render/stratify.py: required for unbiasedness).
        strat_seed = render_seed(key)
    strat_seed = jnp.int32(strat_seed)
    bh, bw = px_block
    hc, wc = -(-height // bh), -(-width // bw)
    acc = None
    acc_sq = None
    done = 0
    chunk = 0
    while done < spp:
        n = min(samples_per_packet, spp - done)
        part = _pt_chunk(
            tracer_state,
            materials,
            env,
            sampler,
            jax.random.fold_in(key, 1000 + chunk),
            tracer=tracer,
            width=width,
            height=height,
            px_block=px_block,
            samples=n,
            bounces=bounces,
            compaction=compaction,
            lights=lights,
            shadow_tracer=shadow_tracer,
            shadow_sort=shadow_sort,
            shadow_rr=shadow_rr,
            nee_max_depth=nee_max_depth,
            rr_start=rr_start,
            rr_floor=rr_floor,
            min_live_frac=min_live_frac,
            # Negative strat_spp = Owen-scrambled Sobol (stratify.py): the
            # sign rides the existing static argument through every chunk.
            strat_spp=(
                (-1 if sobol else 1) * (strat_total or spp)
                if stratify else None
            ),
            strat_offset=jnp.int32(strat_offset + done),
            strat_seed=strat_seed,
            with_sumsq=return_variance,
            clamp=clamp,
        )
        if return_variance:
            part, part_sq = part
            acc_sq = part_sq if acc_sq is None else acc_sq + part_sq
        acc = part if acc is None else acc + part
        done += n
        chunk += 1
    rgb = unpack_frame(
        jnp.concatenate([acc, jnp.zeros_like(acc[..., :1])], -1),
        width,
        height,
        (hc, wc),
        px_block,
    )[..., :3]
    rgb = rgb / spp
    alpha = jnp.ones_like(rgb[..., :1])
    img = jnp.concatenate([rgb, alpha], axis=-1)
    if return_variance:
        from minipath_tpu.utils import LUMA_WEIGHTS

        lum_sum = jnp.einsum("bpc,c->bp", acc, jnp.asarray(LUMA_WEIGHTS))
        # Sample variance of per-sample luminance, over spp, divided by
        # spp = the variance of the pixel's MEAN estimate.
        var = jnp.maximum(
            acc_sq - lum_sum * lum_sum / spp, 0.0
        ) / ((spp - 1) * spp)
        var_img = unpack_frame(
            jnp.broadcast_to(
                var[..., None], var.shape + (4,)
            ),
            width, height, (hc, wc), px_block,
        )[..., 0]
        return img, var_img
    return img
