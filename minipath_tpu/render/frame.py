"""Production whole-frame renderer on the Pallas traversal kernel.

One jitted dispatch per sample-chunk: in-jit ray generation (no host pixel
arrays), Pallas packet traversal, hit finalization, parity shading, and
on-device sample accumulation. Packets are multi-sample (a 16x16 pixel tile
repeated for S samples) — the traversal cost is dominated by per-packet
scalar stepping, so extra samples in the vector dimension are nearly free
(measured: P=256 -> 11 Mrays/s, P=8192 -> 236 Mrays/s on the 250k-triangle
atrium at 1080p on one v5e chip).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.camera import CameraSampler
from minipath_tpu.parallel.mesh import (
    gen_frame_rays9,
    gen_rays9_blocks,
    unpack_frame,
)
from minipath_tpu.render.pallas_kernels import (
    PallasScene,
    QuantizedPallasScene,
    prepare_scene,
    trace_scene,
)
from minipath_tpu.geometry.ray import Rays
from minipath_tpu.scene.bvh.build import BvhArrays


def rays9_to_rays(rays9: jnp.ndarray) -> Rays:
    """Inverse of ``rays_to_rays9``: ``(B, 9, S, 128)`` -> Rays of (B, P, 3)."""
    B, _, S, LN = rays9.shape
    flat = rays9.reshape(B, 9, S * LN)
    stacked = jnp.swapaxes(flat, 1, 2)  # (B, P, 9)
    return Rays(
        origin=stacked[..., 0:3],
        direction=stacked[..., 3:6],
        inv_direction=stacked[..., 6:9],
    )


def _shade_parity_sum(rays9, kh, samples: int):
    """Parity shading entirely from kernel outputs — no per-ray gathers
    (worker.rs:59-64: grayscale |d.n| with alpha on hit, transparent miss).
    Returns ``(B, bp, 4)`` RGBA sums over the sample-major packet dim."""
    rays = rays9_to_rays(rays9)
    dot = jnp.abs(jnp.sum(rays.direction * kh.normal, axis=-1))
    hit = (kh.tri >= 0).astype(jnp.float32)
    shaded = dot * hit
    rgba = jnp.stack([shaded, shaded, shaded, hit], axis=-1)  # (B, P, 4)
    B, P, _ = rgba.shape
    bp = P // samples
    return rgba.reshape(B, samples, bp, 4).sum(axis=1)


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "px_block", "samples", "stack_size", "interpret",
        "strat_spp",
    ),
)
def _render_chunk(
    bvh: BvhArrays,
    scene,
    sampler: CameraSampler,
    key,
    *,
    width: int,
    height: int,
    px_block,
    samples: int,
    stack_size: int,
    interpret: bool = False,
    strat_spp: int | None = None,
    strat_offset=0,
    strat_seed=0,
):
    """One chunk: ``samples`` spp for every pixel. Returns ``(B, bp, 4)``
    RGBA sums over the chunk's samples (bp = pixels per packet)."""
    rays9, _counts = gen_frame_rays9(
        sampler, key, width=width, height=height, px_block=px_block,
        samples=samples, strat_spp=strat_spp, strat_offset=strat_offset,
        strat_seed=strat_seed,
    )
    kh = trace_scene(scene, rays9, stack_size=stack_size, interpret=interpret)
    return _shade_parity_sum(rays9, kh, samples)


def render_frame_pallas(
    bvh: BvhArrays,
    sampler: CameraSampler,
    key,
    *,
    width: int,
    height: int,
    spp: int,
    stack_size: int,
    px_block=(16, 16),
    samples_per_packet: int = 16,
    scene: "PallasScene | QuantizedPallasScene | None" = None,
    interpret: bool = False,
    stratify: bool = True,
    sobol: bool = False,
) -> jnp.ndarray:
    """Full-frame mean image ``(H, W, 4)`` float32 in [0, 1].

    ``stratify`` (default on) draws the film jitter and lens sample from
    per-pixel jittered strata spanning the full ``spp`` — the "stratified
    pixel sampling" of the BASELINE parity config: identical mean,
    visibly less edge/DOF noise at the same spp than the reference's iid
    jitter (`camera.rs:176-180`). ``sobol`` upgrades those dimensions to
    per-pixel Owen-scrambled Sobol points (stratify.py's spp < 0 mode) —
    unbiased; additionally, every sample is then a pure function of
    (pixel id, sample index, render seed), so single-device and sharded
    renders of the same key are seed-matched bit-for-bit (the multichip
    dryrun's exactness check rides on this).
    """
    if scene is None:
        scene = prepare_scene(bvh)
    from minipath_tpu.render.stratify import render_seed

    seed = render_seed(key)  # one pairing seed per render (stratify.py)
    bh, bw = px_block
    hc = -(-height // bh)
    wc = -(-width // bw)

    acc = None
    done = 0
    chunk_id = 0
    while done < spp:
        n = min(samples_per_packet, spp - done)
        part = _render_chunk(
            bvh,
            scene,
            sampler,
            jax.random.fold_in(key, chunk_id),
            width=width,
            height=height,
            px_block=px_block,
            samples=n,
            stack_size=stack_size,
            interpret=interpret,
            strat_spp=((-spp if sobol else spp) if stratify else None),
            strat_offset=jnp.int32(done),
            strat_seed=seed,
        )
        acc = part if acc is None else acc + part
        done += n
        chunk_id += 1
    img = unpack_frame(acc, width, height, (hc, wc), px_block)
    return img / spp


def make_frame_renderer_sharded(
    mesh,
    *,
    width: int,
    height: int,
    stack_size: int,
    px_block=(16, 16),
    samples_per_packet: int = 16,
    axis: str = "d",
    interpret: bool = False,
):
    """Multi-chip whole-frame Pallas renderer over a device mesh.

    The frame's packet blocks are statically sharded over the 1-D ``mesh``
    (the scheduler role of ``machinery.rs:31-62,205-210`` at chip
    granularity): the scene is replicated — every chip keeps its own full
    VMEM-resident copy — each device generates the camera rays for its own
    contiguous block range in-jit and runs the SAME traversal kernel on
    them, and the only collective is the gather of the per-device image
    shards implied by the output sharding. RNG is decorrelated by folding
    each device's mesh position into the key.

    Returns ``render(scene, sampler, key, spp) -> (H, W, 4)`` mean image;
    ``scene`` may be a :class:`PallasScene` or :class:`QuantizedPallasScene`.
    """
    from jax.sharding import PartitionSpec as P

    bh, bw = px_block
    hc = -(-height // bh)
    wc = -(-width // bw)
    B = hc * wc
    n_dev = int(mesh.devices.size)
    B_pad = -(-B // n_dev) * n_dev  # off-frame padding blocks trace air
    B_loc = B_pad // n_dev

    def local_chunk(
        scene, sampler, key, strat_offset, strat_seed, samples: int,
        strat_spp: int | None,
    ):
        d = jax.lax.axis_index(axis)
        rays9 = gen_rays9_blocks(
            sampler,
            jax.random.fold_in(key, d),
            d * B_loc,
            block_count=B_loc,
            wc=wc,
            px_block=px_block,
            samples=samples,
            strat_spp=strat_spp,
            strat_offset=strat_offset,
            strat_seed=strat_seed,
        )
        kh = trace_scene(scene, rays9, stack_size=stack_size, interpret=interpret)
        return _shade_parity_sum(rays9, kh, samples)

    # One compiled program per chunk size; samples_per_packet stays constant
    # across passes so there is exactly one in practice.
    cache = {}

    def chunk_fn(samples: int, strat_spp: int | None):
        if (samples, strat_spp) not in cache:
            cache[(samples, strat_spp)] = jax.jit(
                jax.shard_map(
                    partial(local_chunk, samples=samples, strat_spp=strat_spp),
                    mesh=mesh,
                    in_specs=(P(), P(), P(), P(), P()),
                    out_specs=P(axis),
                    check_vma=False,
                )
            )
        return cache[(samples, strat_spp)]

    def render(scene, sampler, key, spp: int, stratify: bool = True,
               sobol: bool = False) -> jnp.ndarray:
        from minipath_tpu.render.stratify import render_seed

        seed = render_seed(key)
        acc = None
        done = 0
        chunk_id = 0
        while done < spp:
            n = min(samples_per_packet, spp - done)
            part = chunk_fn(
                n, (-spp if sobol else spp) if stratify else None
            )(
                scene, sampler, jax.random.fold_in(key, chunk_id),
                jnp.int32(done), seed,
            )
            acc = part if acc is None else acc + part
            done += n
            chunk_id += 1
        img = unpack_frame(acc[:B], width, height, (hc, wc), px_block)
        return img / spp

    return render
