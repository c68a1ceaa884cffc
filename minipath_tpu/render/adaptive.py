"""Adaptive sampling: spend the sample budget where the variance is.

A small pilot pass estimates per-packet noise; the remaining budget is
allocated across pixel-block packets proportional to the pilot's standard
deviation (the classic optimal allocation: minimizing the frame's total
variance under a fixed sample budget puts ``n_b`` proportional to
``sigma_b``).

Unbiasedness without wasting the pilot: the final pixel value combines
the pilot mean ``m1`` and the adaptive-round mean ``m2`` with FIXED
convex weights ``w1 = pilot/spp, w2 = 1 - w1`` (the budgeted shares, not
the realized counts). The adaptive rounds' samples are fresh, so
``E[m2 | allocation] = mu`` for ANY data-dependent allocation, and fixed
weights keep ``E[w1 m1 + w2 m2] = mu`` exactly — the correlation between
allocation and pilot values never enters (count-proportional weighting,
the thing naive adaptive samplers do, is what creates the classic bias).
The price is slightly suboptimal weighting on packets whose realized
count differs a lot from the budget share; the win is that no samples
are discarded, so on spatially-uniform-noise scenes adaptive degrades
to uniform sampling instead of paying the pilot as pure overhead.

TPU shape: allocation happens at PACKET granularity, and rendering rounds
reuse one compiled program — packets are laid out in allocation order via
explicit block ids (``gen_rays9_blocks(block_ids=...)``) and each round
traces only the live prefix (the kernel's whole-packet early exit), so a
round with 10% of packets costs ~10% of a frame in-kernel. No dynamic
shapes, one compile for any allocation.

Beyond the reference (which renders a fixed spp everywhere —
``worker.rs:51-65``); the north-star extension's equal-quality cost
drops wherever noise is concentrated (glass, caustic spots, penumbras).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.parallel.mesh import gen_rays9_blocks, unpack_frame
from minipath_tpu.render.wavefront import _pt_trace
from minipath_tpu.scene.materials import Environment

__all__ = ["render_frame_pt_adaptive"]


@partial(
    jax.jit,
    static_argnames=(
        "tracer", "wc", "block_count", "px_block", "samples", "bounces",
        "compaction", "shadow_tracer", "shadow_rr", "nee_max_depth",
        "rr_start", "with_sumsq", "stratify",
    ),
)
def _chunk_blocks(
    tracer_state,
    materials,
    env,
    sampler,
    key,
    block_ids,
    live_rays,
    lights,
    *,
    tracer,
    wc: int,
    block_count: int,
    px_block,
    samples: int,
    bounces: int,
    compaction: bool,
    shadow_tracer=None,
    shadow_rr: bool = True,
    nee_max_depth: int | None = None,
    rr_start: int = 3,
    with_sumsq: bool = False,
    stratify: bool = True,
):
    """One adaptive round: ``samples`` spp for the first ``live_rays`` rays
    of the packets listed in ``block_ids`` (allocation order)."""
    from minipath_tpu.render.stratify import render_seed

    # Each adaptive round tiles a complete per-chunk stratum window, so a
    # per-chunk pairing seed is correct (and averages pairings across
    # rounds — render/stratify.py).
    seed = render_seed(key)
    rays9 = gen_rays9_blocks(
        sampler, key, jnp.int32(0),
        block_count=block_count, wc=wc, px_block=px_block, samples=samples,
        strat_spp=samples if stratify else None,
        strat_seed=seed,
        block_ids=block_ids,
    )
    return _pt_trace(
        tracer_state, materials, env, rays9, key,
        tracer=tracer, samples=samples, bounces=bounces,
        compaction=compaction, lights=lights, shadow_tracer=shadow_tracer,
        shadow_rr=shadow_rr, nee_max_depth=nee_max_depth, rr_start=rr_start,
        strat_spp=samples if stratify else None, strat_seed=seed,
        live_rays=live_rays, with_sumsq=with_sumsq,
    )


def render_frame_pt_adaptive(
    tracer,
    tracer_state,
    materials,
    sampler,
    key,
    *,
    width: int,
    height: int,
    spp: int,
    bounces: int = 6,
    env: Environment | None = None,
    px_block=(16, 16),
    samples_per_packet: int = 8,
    pilot_spp: int = 2,
    compaction: bool = True,
    lights=None,
    shadow_tracer=None,
    shadow_rr: bool = True,
    nee_max_depth: int | None = None,
    rr_start: int = 3,
    stratify: bool = True,
    return_spp_map: bool = False,
):
    """Adaptively sampled path-traced frame, ``(H, W, 4)`` mean RGB+alpha.

    ``spp`` is the per-pixel budget ON AVERAGE (pilot included); noisy
    packets receive more, smooth ones less (never below one
    ``samples_per_packet`` chunk). With ``return_spp_map=True`` also
    returns the per-pixel sample count image ``(H, W)`` (diagnostics).
    """
    if env is None:
        env = Environment.sky()
    if (lights is None) != (shadow_tracer is None):
        raise ValueError("NEE needs both lights= and shadow_tracer=")
    if spp < pilot_spp + samples_per_packet:
        raise ValueError(
            f"spp={spp} must cover the pilot ({pilot_spp}) plus at least "
            f"one chunk ({samples_per_packet})"
        )
    bh, bw = px_block
    bp = bh * bw
    hc, wc = -(-height // bh), -(-width // bw)
    B = hc * wc

    kw = dict(
        tracer=tracer, wc=wc, block_count=B, px_block=px_block,
        bounces=bounces, compaction=compaction,
        shadow_tracer=shadow_tracer, shadow_rr=shadow_rr,
        nee_max_depth=nee_max_depth, rr_start=rr_start, stratify=stratify,
    )
    ident = jnp.arange(B, dtype=jnp.int32)
    all_rays = jnp.int32(B * bp * pilot_spp)

    # Pilot: estimates sigma per packet (and contributes to the image via
    # the fixed-weight combination — see the module docstring).
    psum, psumsq = _chunk_blocks(
        tracer_state, materials, env, sampler,
        jax.random.fold_in(key, 0), ident, all_rays, lights,
        samples=pilot_spp, with_sumsq=True, **kw,
    )
    from minipath_tpu.utils import LUMA_WEIGHTS

    lum = jnp.einsum("bpc,c->bp", psum, jnp.asarray(LUMA_WEIGHTS))
    var_px = (psumsq - lum * lum / pilot_spp) / max(pilot_spp - 1, 1)
    # Optimal allocation for the FRAME's MSE: minimizing
    # sum_b (sum_px var_px) / n_b under a fixed budget puts
    # n_b proportional to sqrt(packet total variance) — the L2 norm of the
    # per-pixel sigmas, NOT their mean. The distinction matters exactly
    # when noise concentrates within a packet (a few hot pixels in a
    # mostly-smooth block): L1 under-weights those packets.
    sigma_b = np.asarray(
        jnp.sqrt(jnp.mean(jnp.maximum(var_px, 0.0), axis=1))
    )  # (B,)

    # Integer chunk allocation, proportional to sigma with a 1-chunk floor,
    # by largest remainder — sums exactly to the budget.
    total_chunks = max(
        int(round((spp - pilot_spp) * B / samples_per_packet)), B
    )
    w_pos = sigma_b + 1e-12
    quota = w_pos / w_pos.sum() * (total_chunks - B) + 1.0  # floor of 1
    c_b = np.floor(quota).astype(np.int64)
    rem = total_chunks - int(c_b.sum())
    if rem > 0:
        top = np.argsort(-(quota - c_b))[:rem]
        c_b[top] += 1

    order = np.argsort(-c_b, kind="stable").astype(np.int32)  # needy first
    c_sorted = c_b[order]
    order_dev = jnp.asarray(order)

    acc = jnp.zeros((B, bp, 3), jnp.float32)
    counts = np.zeros((B,), np.int64)
    rounds = int(c_sorted.max())
    for r in range(rounds):
        n_r = int((c_sorted > r).sum())
        part = _chunk_blocks(
            tracer_state, materials, env, sampler,
            jax.random.fold_in(key, 1 + r), order_dev,
            jnp.int32(n_r * bp * samples_per_packet), lights,
            samples=samples_per_packet, **kw,
        )
        acc = acc.at[order_dev[:n_r]].add(part[:n_r])
        counts[order[:n_r]] += samples_per_packet

    # Fixed-weight convex combination of the pilot mean and the
    # adaptive-round mean (budgeted shares — unbiased for any allocation).
    w1 = pilot_spp / spp
    m1 = psum / pilot_spp
    m2 = acc / jnp.asarray(counts, jnp.float32)[:, None, None]
    mean = w1 * m1 + (1.0 - w1) * m2
    rgba = jnp.concatenate([mean, jnp.ones_like(mean[..., :1])], -1)
    img = unpack_frame(rgba, width, height, (hc, wc), px_block)
    if return_spp_map:
        per_packet = jnp.asarray(counts + pilot_spp, jnp.float32)
        spp_img = unpack_frame(
            jnp.broadcast_to(per_packet[:, None, None], (B, bp, 4)),
            width, height, (hc, wc), px_block,
        )[..., 0]
        return img, spp_img
    return img
