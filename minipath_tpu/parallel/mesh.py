"""Whole-frame rendering, single-chip and sharded over a device mesh.

The reference's parallel machine is a pool of pinned OS threads pulling tiles
off an atomic cursor (``/root/reference/src/renderer/machinery.rs:31-62,
205-210``). The TPU-native equivalent here is data parallelism over *ray
packets*: the frame's packets are statically sharded across a 1-D device mesh
with ``jax.shard_map`` — scene arrays replicated, pixels sharded — and every
device runs the identical packet-traversal program on its shard. Sample
accumulation happens on-device in a ``fori_loop`` (flat memory at any spp);
no collectives are needed until the shards are gathered into the image, which
XLA does on the output sharding.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from minipath_tpu.camera import CameraSampler, sample_rays
from minipath_tpu.render.integrator import shade_normal_dot
from minipath_tpu.render.traversal import finalize_hits, trace_packets
from minipath_tpu.scene.bvh.build import BvhArrays

PACKET_SHAPE = (16, 16)


def make_device_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (len(devices), n_devices)
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def frame_pixel_packets(width: int, height: int, packet_shape=PACKET_SHAPE, pad_packets_to: int = 1):
    """Full-frame pixel coordinates grouped into coherent packets.

    Returns ``(pixels, (ph_count, pw_count))`` where pixels is
    ``(n_packets, P, 2)`` float32 (x, y); the frame is padded up to packet
    multiples and optionally to a packet-count multiple (for even device
    sharding) with off-screen packets.
    """
    ph, pw = packet_shape
    hp, wp = _round_up(height, ph), _round_up(width, pw)
    ys = np.arange(hp, dtype=np.int32)
    xs = np.arange(wp, dtype=np.int32)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    pix = np.stack([gx, gy], axis=-1).astype(np.float32)  # (hp, wp, 2)
    pix = pix.reshape(hp // ph, ph, wp // pw, pw, 2)
    pix = pix.transpose(0, 2, 1, 3, 4).reshape(-1, ph * pw, 2)
    n = pix.shape[0]
    n_padded = _round_up(n, pad_packets_to)
    if n_padded != n:
        # Off-screen padding packets (traced, cropped away).
        pad = np.tile(pix[-1:], (n_padded - n, 1, 1))
        pix = np.concatenate([pix, pad], axis=0)
    return jnp.asarray(pix), (hp // ph, wp // pw)


def unpack_frame(rgba: jnp.ndarray, width: int, height: int, packet_counts, packet_shape=PACKET_SHAPE) -> jnp.ndarray:
    """Inverse of :func:`frame_pixel_packets`: ``(n_packets, P, 4)`` ->
    cropped ``(height, width, 4)``."""
    ph, pw = packet_shape
    hc, wc = packet_counts
    v = rgba[: hc * wc].reshape(hc, wc, ph, pw, 4)
    v = v.transpose(0, 2, 1, 3, 4).reshape(hc * ph, wc * pw, 4)
    return v[:height, :width]


def frame_pixel_packets_ms(
    width: int,
    height: int,
    px_block=(8, 8),
    samples: int = 4,
    pad_packets_to: int = 1,
):
    """Multi-sample packets: each packet is a ``px_block`` pixel tile
    repeated ``samples`` times (sample-major), so P = bh*bw*samples rays
    share one traversal. Smaller spatial footprint per packet means a
    smaller BVH node union and fewer traversal steps per ray; the extra
    samples ride along for free in the vector dimension.

    Returns ``(pixels (B, P, 2), packet_counts)``.
    """
    pixels, counts = frame_pixel_packets(width, height, px_block, pad_packets_to)
    pixels = jnp.tile(pixels, (1, samples, 1))
    return pixels, counts


def unpack_frame_ms(
    rgba: jnp.ndarray,
    width: int,
    height: int,
    packet_counts,
    px_block=(8, 8),
    samples: int = 4,
) -> jnp.ndarray:
    """Inverse of :func:`frame_pixel_packets_ms`: sums the sample slots then
    unpacks pixel blocks. Input ``(B, P, C)`` -> ``(height, width, C)`` sums."""
    B, P, C = rgba.shape
    bp = P // samples
    summed = rgba.reshape(B, samples, bp, C).sum(axis=1)
    return unpack_frame(summed, width, height, packet_counts, px_block)


def gen_rays9_blocks(
    sampler: CameraSampler,
    key,
    block_start,  # traced i32 — first packet-block index (shard offset)
    *,
    block_count: int,
    wc: int,
    px_block=(8, 8),
    samples: int = 4,
    strat_spp: int | None = None,
    strat_offset=0,
    strat_seed=0,
    block_ids=None,
):
    """Multi-sample packet rays for ``block_count`` pixel blocks starting at
    ``block_start`` in the frame's row-major block order (``wc`` blocks per
    row). The shard-aware core of :func:`gen_frame_rays9`: a device mesh
    shards the frame by giving each device its own block range.

    ``strat_spp`` (static) enables per-pixel stratified film/lens sampling
    over the pixel's TOTAL spp; ``strat_offset`` (traced) is this chunk's
    first global sample index, so stratification spans chunk boundaries
    when spp exceeds the per-packet sample count. ``strat_seed`` (traced,
    from :func:`minipath_tpu.render.stratify.render_seed` on the RENDER
    key) re-randomizes the stratum pairings per render — required for
    unbiasedness (see render/stratify.py) — and must be identical for
    every chunk of one stratum window.

    ``block_ids`` (``(block_count,)`` i32, traced) overrides the contiguous
    range with an explicit per-packet block index — the adaptive sampler
    renders packets in allocation order this way.
    """
    from minipath_tpu.render.pallas_kernels import rays_to_rays9

    bh, bw = px_block
    bp = bh * bw
    # Packet-major pixel coordinates: packet b covers block (by, bx).
    if block_ids is not None:
        b_idx = jnp.broadcast_to(
            block_ids.astype(jnp.int32)[:, None], (block_count, bp)
        )
    else:
        b_idx = block_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_count, bp), 0
        )
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (block_count, bp), 1)
    by, bx = b_idx // wc, b_idx % wc
    py, px = p_idx // bw, p_idx % bw
    pix = jnp.stack(
        [(bx * bw + px).astype(jnp.float32), (by * bh + py).astype(jnp.float32)],
        axis=-1,
    )  # (block_count, bp, 2)
    pix = jnp.tile(pix, (1, samples, 1))  # (block_count, P, 2) sample-major
    strat = None
    if strat_spp is not None:
        P = samples * bp
        s_idx = strat_offset + jax.lax.broadcasted_iota(
            jnp.int32, (block_count, P), 1
        ) // bp
        pid = (by * bh + py) * (wc * bw) + (bx * bw + px)  # global pixel id
        pid = jnp.tile(pid, (1, samples)) ^ jnp.int32(strat_seed)
        strat = (s_idx, pid, strat_spp, CAMERA_SALT)
    rays = sample_rays(sampler, pix, key, strat=strat)
    return rays_to_rays9(rays)


# Dimension-salt base for the camera's film/lens strata — clear of the
# per-bounce salts the wavefront integrator uses (8 per bounce).
CAMERA_SALT = 1 << 12


@partial(
    jax.jit,
    static_argnames=("width", "height", "px_block", "samples", "strat_spp"),
)
def gen_frame_rays9(
    sampler: CameraSampler,
    key,
    *,
    width: int,
    height: int,
    px_block=(8, 8),
    samples: int = 4,
    strat_spp: int | None = None,
    strat_offset=0,
    strat_seed=0,
):
    """Generate the whole frame's multi-sample packet rays in-jit.

    Pixel coordinates are computed from iota (no multi-hundred-MB host
    constant arrays), then jittered/lens-sampled and packed to the kernel's
    ``(B, 9, P//128, 128)`` layout. Returns ``(rays9, packet_counts)``.
    ``strat_spp``/``strat_offset``/``strat_seed`` as in
    :func:`gen_rays9_blocks`.
    """
    bh, bw = px_block
    hp, wp = _round_up(height, bh), _round_up(width, bw)
    hc, wc = hp // bh, wp // bw
    rays9 = gen_rays9_blocks(
        sampler,
        key,
        jnp.int32(0),
        block_count=hc * wc,
        wc=wc,
        px_block=px_block,
        samples=samples,
        strat_spp=strat_spp,
        strat_offset=strat_offset,
        strat_seed=strat_seed,
    )
    return rays9, (hc, wc)


def _sample_loop(bvh: BvhArrays, sampler: CameraSampler, pixels, key, spp: int, stack_size: int):
    """Accumulate ``spp`` shaded samples for the given pixel packets."""

    def one_sample(s, acc):
        k = jax.random.fold_in(key, s)
        rays = sample_rays(sampler, pixels, k)
        result = trace_packets(bvh, rays, stack_size=stack_size)
        hits = finalize_hits(bvh, rays, result)
        return acc + shade_normal_dot(rays, hits)

    init = jnp.zeros(pixels.shape[:-1] + (4,), jnp.float32)
    return jax.lax.fori_loop(0, spp, one_sample, init)


@partial(jax.jit, static_argnames=("spp", "stack_size"))
def render_packets_sum(bvh: BvhArrays, sampler: CameraSampler, pixels, key, *, spp: int, stack_size: int):
    """Single-dispatch sum of ``spp`` samples over packets ``(B, P, 2)``."""
    return _sample_loop(bvh, sampler, pixels, key, spp, stack_size)


def render_frame_sum(
    bvh: BvhArrays,
    sampler: CameraSampler,
    key,
    *,
    width: int,
    height: int,
    spp: int,
    stack_size: int,
    packet_shape=PACKET_SHAPE,
) -> jnp.ndarray:
    """Whole-frame single-device render: sum of spp RGBA samples (H, W, 4)."""
    pixels, counts = frame_pixel_packets(width, height, packet_shape)
    rgba = render_packets_sum(bvh, sampler, pixels, key, spp=spp, stack_size=stack_size)
    return unpack_frame(rgba, width, height, counts, packet_shape)


def make_sharded_renderer(mesh: Mesh, *, spp: int, stack_size: int, axis: str = "d"):
    """Build a jitted shard_map renderer over ``mesh``.

    Returns ``fn(bvh, sampler, pixels, key) -> (B, P, 4)`` where the packet
    batch ``B`` must be divisible by the mesh size; scene and camera are
    replicated, packets are sharded, and each device folds its mesh position
    into the RNG key so samples decorrelate across shards.
    """

    def local_render(bvh, sampler, pixels, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return _sample_loop(bvh, sampler, pixels, key, spp, stack_size)

    sharded = jax.shard_map(
        local_render,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(sharded)


def render_frame_sum_sharded(
    bvh: BvhArrays,
    sampler: CameraSampler,
    key,
    mesh: Mesh,
    *,
    width: int,
    height: int,
    spp: int,
    stack_size: int,
    packet_shape=PACKET_SHAPE,
    axis: str = "d",
) -> jnp.ndarray:
    """Whole-frame render sharded across a device mesh (H, W, 4) sample-sum."""
    n_dev = mesh.devices.size
    pixels, counts = frame_pixel_packets(width, height, packet_shape, pad_packets_to=n_dev)
    fn = make_sharded_renderer(mesh, spp=spp, stack_size=stack_size, axis=axis)
    rgba = fn(bvh, sampler, pixels, key)
    return unpack_frame(rgba, width, height, counts, packet_shape)
