"""Integrators: how a camera sample becomes a color.

The parity integrator reproduces the reference worker exactly
(``/root/reference/src/renderer/worker.rs:51-65``): cast a camera ray,
shade hits as grayscale ``|ray_dir . normal|`` with alpha 1, misses as
transparent black. It operates on whole tiles of packets instead of one
sample at a time.

The wavefront path-tracing integrator (bounces, materials, lights) lives in
``wavefront.py`` — this module is the reference-capability surface.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from minipath_tpu.camera import CameraSampler, sample_rays
from minipath_tpu.render.hit import HitRecords
from minipath_tpu.render.traversal import intersect_bvh
from minipath_tpu.scene.bvh.build import BvhArrays


def shade_normal_dot(rays, hits: HitRecords) -> jnp.ndarray:
    """Grayscale ``|d . n|`` shading with alpha, transparent miss
    (``worker.rs:59-64``). Returns RGBA ``(..., 4)``."""
    dot = jnp.abs(jnp.sum(rays.direction * hits.normal, axis=-1))
    rgba = jnp.stack([dot, dot, dot, jnp.ones_like(dot)], axis=-1)
    return jnp.where(hits.hit[..., None], rgba, 0.0)


def tile_pixel_packets(tile_origin, tile_shape, packet_shape):
    """Pixel coordinates of a tile grouped into coherent ray packets.

    Returns ``(n_packets, P, 2)`` float32 (x, y) coordinates where each
    packet is a ``packet_shape`` pixel block — the TPU replacement for the
    reference's per-pixel loop (``screen_block.rs:104-128``); spatially
    compact packets keep traversal coherent.
    """
    th, tw = tile_shape
    ph, pw = packet_shape
    assert th % ph == 0 and tw % pw == 0, (tile_shape, packet_shape)
    ys = jnp.arange(th, dtype=jnp.int32)
    xs = jnp.arange(tw, dtype=jnp.int32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (th, tw)
    pix = jnp.stack([gx, gy], axis=-1)  # (th, tw, 2) as (x, y)
    pix = pix.reshape(th // ph, ph, tw // pw, pw, 2)
    pix = pix.transpose(0, 2, 1, 3, 4).reshape(-1, ph * pw, 2)
    return pix.astype(jnp.float32) + jnp.asarray(tile_origin, jnp.float32)


def unpack_tile(values: jnp.ndarray, tile_shape, packet_shape) -> jnp.ndarray:
    """Inverse of :func:`tile_pixel_packets` for per-pixel values
    ``(n_packets, P, C)`` -> ``(th, tw, C)``."""
    th, tw = tile_shape
    ph, pw = packet_shape
    c = values.shape[-1]
    v = values.reshape(th // ph, tw // pw, ph, pw, c)
    return v.transpose(0, 2, 1, 3, 4).reshape(th, tw, c)


def _film_strat(pix, spp: int, s_idx, key):
    """Stratification tuple for :func:`sample_rays` on integer pixel
    coordinates ``pix (..., 2)``: per-pixel id packs (y, x) into one i32
    (frames up to 16384 px wide), XORed with a key-derived seed so the
    stratum pairings re-randomize per pass (render/stratify.py). The film
    jitter and lens sample then tile per-pixel strata over the pass's
    ``spp`` — the BASELINE parity config's "stratified pixel sampling"."""
    from minipath_tpu.parallel.mesh import CAMERA_SALT
    from minipath_tpu.render.stratify import render_seed

    pid = (pix[..., 1].astype(jnp.int32) << 14) | (
        pix[..., 0].astype(jnp.int32) & 0x3FFF
    )
    return (s_idx, pid ^ render_seed(key), spp, CAMERA_SALT)


@partial(
    jax.jit,
    static_argnames=("tile_shape", "packet_shape", "spp", "stack_size"),
)
def render_tile_sum_bvh(
    bvh: BvhArrays,
    sampler: CameraSampler,
    tile_origin,
    key,
    *,
    tile_shape,
    packet_shape,
    spp: int,
    stack_size: int,
) -> jnp.ndarray:
    """Sum of ``spp`` RGBA samples for one tile, shape ``(th, tw, 4)``.

    All samples of all packets are traced in ONE batched traversal call —
    sample-level Monte Carlo parallelism becomes a batch dimension instead of
    the reference's serial per-pixel loop (``worker.rs:41-43``).
    """
    pix = tile_pixel_packets(tile_origin, tile_shape, packet_shape)  # (nb,P,2)
    nb, P = pix.shape[:2]
    keys = jax.random.split(key, spp)
    s_ids = jnp.arange(spp, dtype=jnp.int32)
    rays = jax.vmap(
        lambda k, s: sample_rays(
            sampler, pix, k, strat=_film_strat(pix, spp, s, key)
        )
    )(keys, s_ids)
    # (spp, nb, P, ...) -> fold samples into the packet batch dim.
    rays = jax.tree.map(lambda a: a.reshape((spp * nb,) + a.shape[2:]), rays)
    hits = intersect_bvh(bvh, rays, stack_size=stack_size)
    rgba = shade_normal_dot(rays, hits)  # (spp*nb, P, 4)
    rgba_sum = rgba.reshape(spp, nb, P, 4).sum(axis=0)
    return unpack_tile(rgba_sum, tile_shape, packet_shape)


@partial(
    jax.jit,
    static_argnames=("sphere", "tile_shape", "packet_shape", "spp"),
)
def render_tile_sum_sphere(
    sphere,
    sampler: CameraSampler,
    tile_origin,
    key,
    *,
    tile_shape,
    packet_shape,
    spp: int,
) -> jnp.ndarray:
    """Like :func:`render_tile_sum_bvh` for the analytic sphere object."""
    pix = tile_pixel_packets(tile_origin, tile_shape, packet_shape)
    nb, P = pix.shape[:2]
    keys = jax.random.split(key, spp)
    s_ids = jnp.arange(spp, dtype=jnp.int32)
    rays = jax.vmap(
        lambda k, s: sample_rays(
            sampler, pix, k, strat=_film_strat(pix, spp, s, key)
        )
    )(keys, s_ids)
    rays = jax.tree.map(lambda a: a.reshape((spp * nb,) + a.shape[2:]), rays)
    hits = sphere.intersect(rays)
    rgba = shade_normal_dot(rays, hits)
    rgba_sum = rgba.reshape(spp, nb, P, 4).sum(axis=0)
    return unpack_tile(rgba_sum, tile_shape, packet_shape)


@partial(
    jax.jit,
    static_argnames=("tile_shape", "packet_shape", "spp", "stack_size"),
)
def render_tile_sum_bvh_pallas(
    scene,
    sampler: CameraSampler,
    tile_origin,
    key,
    *,
    tile_shape,
    packet_shape,
    spp: int,
    stack_size: int,
) -> jnp.ndarray:
    """Pallas-kernel version of :func:`render_tile_sum_bvh`.

    Packets are multi-sample (pixel tile x spp, sample-major) and shading
    comes from the kernel's in-kernel |d.n| output, so there are no per-ray
    gathers. ``spp`` here is per-pass (the machinery chunks larger sample
    counts); keep ``packet pixels * spp`` within a few thousand rays.
    """
    from minipath_tpu.render.pallas_kernels import rays_to_rays9, trace_scene

    pix = tile_pixel_packets(tile_origin, tile_shape, packet_shape)  # (nb,bp,2)
    nb, bp = pix.shape[:2]
    pix = jnp.tile(pix, (1, spp, 1))  # sample-major (nb, spp*bp, 2)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, pix.shape[:2], 1) // bp
    rays = sample_rays(
        sampler, pix, key, strat=_film_strat(pix, spp, s_idx, key)
    )
    kh = trace_scene(scene, rays_to_rays9(rays), stack_size=stack_size)
    dot = jnp.abs(jnp.sum(rays.direction * kh.normal, axis=-1))
    hit = (kh.tri >= 0).astype(jnp.float32)
    shaded = dot * hit
    rgba = jnp.stack([shaded, shaded, shaded, hit], axis=-1)  # (nb, spp*bp, 4)
    rgba_sum = rgba.reshape(nb, spp, bp, 4).sum(axis=1)
    return unpack_tile(rgba_sum, tile_shape, packet_shape)


@partial(
    jax.jit,
    static_argnames=("tile_shape", "packet_shape", "spp", "stack_size"),
)
def render_tile_batch_bvh_pallas(
    scene,
    sampler: CameraSampler,
    tile_origins,  # (K, 2) f32
    tile_indices,  # (K,) i32 — global tile ids for RNG decorrelation
    key,
    *,
    tile_shape,
    packet_shape,
    spp: int,
    stack_size: int,
) -> jnp.ndarray:
    """Batched-tile Pallas renderer: K tiles per device dispatch.

    One dispatch per ~25 ms host<->device roundtrip is the scheduler's unit
    of work, so tiles are batched (the reference's analog is one tile per
    worker-thread loop iteration, machinery.rs:70-91). Returns
    ``(K, th, tw, 4)`` RGBA sums over ``spp`` samples.
    """
    from minipath_tpu.render.pallas_kernels import rays_to_rays9, trace_scene

    K = tile_origins.shape[0]
    base = tile_pixel_packets((0.0, 0.0), tile_shape, packet_shape)  # (nb,bp,2)
    nb, bp = base.shape[:2]
    pix = base[None] + tile_origins[:, None, None, :]  # (K, nb, bp, 2)
    pix = pix.reshape(K * nb, bp, 2)
    pix = jnp.tile(pix, (1, spp, 1))  # sample-major (K*nb, spp*bp, 2)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(tile_indices)  # (K,)
    # One key per tile: expand to packets by folding packet index.
    pkt_keys = jax.vmap(
        lambda k: jax.vmap(lambda j: jax.random.fold_in(k, j))(jnp.arange(nb))
    )(keys).reshape(K * nb)
    s_row = jnp.arange(spp * bp, dtype=jnp.int32) // bp  # sample-major rows
    rays = jax.vmap(
        lambda p, k: sample_rays(
            sampler, p, k, strat=_film_strat(p, spp, s_row, key)
        )
    )(pix, pkt_keys)
    kh = trace_scene(scene, rays_to_rays9(rays), stack_size=stack_size)
    dot = jnp.abs(jnp.sum(rays.direction * kh.normal, axis=-1))
    hit = (kh.tri >= 0).astype(jnp.float32)
    shaded = dot * hit
    rgba = jnp.stack([shaded, shaded, shaded, hit], axis=-1)
    rgba_sum = rgba.reshape(K, nb, spp, bp, 4).sum(axis=2)
    tiles = jax.vmap(
        lambda v: unpack_tile(v, tile_shape, packet_shape)
    )(rgba_sum)
    return tiles


@partial(
    jax.jit,
    static_argnames=("tile_shape", "packet_shape", "spp", "stack_size"),
)
def render_tile_batch_bvh_xla(
    bvh: BvhArrays,
    sampler: CameraSampler,
    tile_origins,
    tile_indices,
    key,
    *,
    tile_shape,
    packet_shape,
    spp: int,
    stack_size: int,
) -> jnp.ndarray:
    """Batched-tile portable (pure-XLA) renderer, same contract as the
    Pallas version."""
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(tile_indices)

    def one(origin, k):
        return render_tile_sum_bvh(
            bvh,
            sampler,
            origin,
            k,
            tile_shape=tile_shape,
            packet_shape=packet_shape,
            spp=spp,
            stack_size=stack_size,
        )

    return jax.vmap(one)(tile_origins, keys)


@partial(
    jax.jit,
    static_argnames=("sphere", "tile_shape", "packet_shape", "spp"),
)
def render_tile_batch_sphere(
    sphere,
    sampler: CameraSampler,
    tile_origins,
    tile_indices,
    key,
    *,
    tile_shape,
    packet_shape,
    spp: int,
) -> jnp.ndarray:
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(tile_indices)

    def one(origin, k):
        return render_tile_sum_sphere(
            sphere,
            sampler,
            origin,
            k,
            tile_shape=tile_shape,
            packet_shape=packet_shape,
            spp=spp,
        )

    return jax.vmap(one)(tile_origins, keys)
