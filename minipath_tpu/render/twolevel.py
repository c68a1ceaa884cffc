"""Two-level binned BVH traversal — breaking the deep-bounce union bound.

The lean PT kernel traces rays in lockstep packets: every packet pays the
UNION of its rays' traversals (``pallas_kernels.py`` section comment). For
primary rays the union is tiny; for deep-bounce wavefronts even the best
sort keys leave ~320 node visits + ~1160 leaf tests per 2048-ray packet
(tools/sweep_pt6.py), because a packet's rays want *different subtrees*.

This module splits traversal in two phases so packets stop paying for
subtrees only a minority of their lanes need:

1. **Broad phase (dense XLA):** slab-test every live ray against the
   ``T ~ 64`` top-level "treelet" boxes (the BVH frontier at a fixed
   depth). This is a dense ``(N, T)`` vector op — no kernel, no gathers —
   and yields each ray's treelets sorted near-to-far by entry distance.
2. **Narrow phase (Pallas, per-packet roots):** rays are re-bucketed *by
   treelet* (then direction octant, then origin Morton cell), packets are
   formed bucket-aligned, and each packet traverses ONLY its treelet via
   the kernel's per-packet ``roots=`` argument. Every lane in the packet
   wants that subtree, so the union is the treelet-local working set.

Rays visit their treelets near-to-far in successive rounds and retire as
soon as their best hit is closer than the next treelet's entry distance
(the packet-level analog of the reference's per-ray stack prune,
``/root/reference/src/scene/triangle_bvh/ray_bvh_intersection.rs:40-44``).
Rays wanting more treelets than the round budget (or more than ``K``) fall
back to a final global-root pass — exact, just unamortized.

The result is bit-equivalent to a single-root trace: every (ray, subtree)
intersection is either tested in some round or provably occluded.

**Measured verdict (tools/sweep_pt11.py, one v5e, atrium 250k tris, real
bounce-1..4 ray sets): a DEAD END on this hardware.** Parity is exact, but
every configuration loses to the flat sorted wavefront: L2 (61 treelets)
runs 2.5-3.4x slower, L3 (297 treelets) 5-7x slower, at every bounce depth
(e.g. bounce 3: flat 933 ms / 3.2 live-Mrays/s vs L2r1 2375 ms, L3r1
5518 ms). Two reasons: (a) the XLA-side re-binning — broad phase + one
argsort + aligned scatter/gathers per round over the 4.15M-ray wavefront —
costs more than a whole flat trace; (b) treelet-confined packets still pay
the union *within* the treelet, and with ~17k rays per treelet per round
the direction spread inside a treelet covers most of it anyway. The module
stays: it is the tested reference user of the kernel's per-packet
``roots=`` feature, and the honest record of why the flat sorted wavefront
is the production path (see the PT tuning map in pallas_kernels.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.scene.bvh import links as L
from minipath_tpu.scene.bvh.build import BvhArrays


class Treelets(NamedTuple):
    """Top-level BVH frontier: ``T`` subtree roots with their world boxes.

    ``links[t]`` is the encoded node link of treelet ``t``'s root;
    ``root_link`` is the whole tree's root (the fallback bucket)."""

    links: jnp.ndarray  # (T,) i32 encoded links
    box_min: jnp.ndarray  # (T, 3) f32
    box_max: jnp.ndarray  # (T, 3) f32
    root_link: jnp.ndarray  # () i32


def build_treelets(arrays: BvhArrays, levels: int = 2) -> Treelets:
    """Host-side walk of the top ``levels`` of the BVH.

    Inner links expand into their children; leaf links met above the cut
    stay as their own (tiny) treelets. ``levels=2`` on an 8-ary tree gives
    up to 64 treelets.
    """
    links = np.asarray(arrays.node_child_links)
    bmin = np.asarray(arrays.node_child_box_min)
    bmax = np.asarray(arrays.node_child_box_max)
    root = int(np.asarray(arrays.root))
    frontier = [(root, np.asarray(arrays.bbox_min), np.asarray(arrays.bbox_max))]
    for _ in range(levels):
        nxt = []
        for link, lo, hi in frontier:
            if L.is_inner(link):
                idx = L.decode_index(link)
                for c in range(L.INNER_NODE_CHILDREN):
                    cl = int(links[idx, c])
                    if cl != L.NULL_LINK:
                        nxt.append((cl, bmin[idx, c], bmax[idx, c]))
            else:
                nxt.append((link, lo, hi))
        frontier = nxt
    return Treelets(
        links=jnp.asarray([f[0] for f in frontier], jnp.int32),
        box_min=jnp.asarray(np.stack([f[1] for f in frontier]), jnp.float32),
        box_max=jnp.asarray(np.stack([f[2] for f in frontier]), jnp.float32),
        root_link=jnp.asarray(root, jnp.int32),
    )


def _broad_chunk(box_min, box_max, origin, inv, live_mask):
    """Slab entry distances of every ray against one treelet chunk:
    returns ``(entry, hit)`` with shape ``(N, Tc)`` — per-axis accumulation
    so nothing wider than ``(N, Tc)`` materializes."""
    t_entry = jnp.zeros((origin.shape[0], box_min.shape[0]), jnp.float32)
    t_exit = jnp.full_like(t_entry, jnp.inf)
    for ax in range(3):
        t0 = (box_min[None, :, ax] - origin[:, ax, None]) * inv[:, ax, None]
        t1 = (box_max[None, :, ax] - origin[:, ax, None]) * inv[:, ax, None]
        t_entry = jnp.maximum(t_entry, jnp.minimum(t0, t1))
        t_exit = jnp.minimum(t_exit, jnp.maximum(t0, t1))
    hit = (t_entry <= t_exit) & live_mask[:, None]
    return jnp.where(hit, t_entry, jnp.inf), hit


def broad_phase(tl: Treelets, origin, direction, inv_direction, live_mask, K: int):
    """Dense ray-vs-treelet slab test; returns each ray's ``K`` nearest
    treelets. ``(tid, entry, valid, overflow)``: ``tid`` ``(N, K)`` treelet
    ids ordered by entry distance, ``entry`` their entry-t (+inf on dead
    slots), ``valid`` the slot mask, ``overflow`` rays intersecting more
    than ``K`` treelets (they must fall back to a global-root trace).

    Treelets are processed in chunks of 64 with a running top-K merge so
    HBM never holds more than an ``(N, 64 + K)`` buffer (a flat ``(N, T)``
    pass at T=512 on a 4M-ray wavefront would need ~8 GB)."""
    BIG = jnp.float32(1e30)
    inv = jnp.clip(inv_direction, -BIG, BIG)  # NaN-free like the kernels
    T = int(tl.box_min.shape[0])
    CHUNK = 64
    best_entry = None
    best_tid = None
    count = jnp.zeros((origin.shape[0],), jnp.int32)
    for c0 in range(0, T, CHUNK):
        c1 = min(T, c0 + CHUNK)
        entry, hit = _broad_chunk(
            tl.box_min[c0:c1], tl.box_max[c0:c1], origin, inv, live_mask
        )
        count = count + jnp.sum(hit.astype(jnp.int32), axis=-1)
        tid = jnp.arange(c0, c1, dtype=jnp.int32)[None, :] + jnp.zeros_like(
            entry, jnp.int32
        )
        if best_entry is not None:
            entry = jnp.concatenate([best_entry, entry], axis=1)
            tid = jnp.concatenate([best_tid, tid], axis=1)
        k = min(K, entry.shape[1])
        neg, pos = jax.lax.top_k(-entry, k)
        best_entry = -neg
        best_tid = jnp.take_along_axis(tid, pos, axis=1)
    if best_entry.shape[1] < K:  # fewer treelets than K slots
        pad = K - best_entry.shape[1]
        best_entry = jnp.pad(best_entry, ((0, 0), (0, pad)), constant_values=np.inf)
        best_tid = jnp.pad(best_tid, ((0, 0), (0, pad)))
    valid = jnp.isfinite(best_entry)
    overflow = count > K
    return best_tid, best_entry, valid, overflow


def _octant(d):
    return (
        (d[:, 0] > 0).astype(jnp.int32) * 4
        + (d[:, 1] > 0).astype(jnp.int32) * 2
        + (d[:, 2] > 0).astype(jnp.int32)
    )


def _morton12(o, live):
    safe = jnp.where(live[:, None], o, 0.0)
    lo = jnp.min(jnp.where(live[:, None], safe, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(live[:, None], safe, -jnp.inf), axis=0)
    scale = 16.0 / jnp.maximum(hi - lo, 1e-6)
    cell = jnp.clip((safe - lo) * scale, 0, 15).astype(jnp.int32)
    out = jnp.zeros_like(cell[:, 0])
    for b in range(4):
        for ax in range(3):
            out = out | (((cell[:, ax] >> b) & 1) << (3 * b + (2 - ax)))
    return out


class _RoundPlan(NamedTuple):
    """Bucket-aligned packet assignment for one narrow-phase round."""

    ray_slot: jnp.ndarray  # (C,) i32 ray index per capacity lane, N = parked
    roots: jnp.ndarray  # (C // P,) i32 per-packet root link (NULL = dead)
    live_packets: jnp.ndarray  # () i32


def _plan_round(tid, need, origin, direction, links_table, *, n_buckets: int,
                packet_size: int):
    """Assign rays needing this round to bucket-aligned packet lanes.

    Buckets are treelet ids (0..n_buckets-1); rays sort by (need DESC,
    bucket, direction octant, origin Morton cell); each bucket's run is
    padded to whole packets so a packet never spans two roots."""
    N = tid.shape[0]
    P = packet_size
    key = (
        (tid << 15) | (_octant(direction) << 12) | _morton12(origin, need)
    )
    key = jnp.where(need, key, jnp.int32(1 << 29))
    order = jnp.argsort(key)
    tid_s = tid[order]
    need_s = need[order]
    counts = jax.ops.segment_sum(
        need.astype(jnp.int32), jnp.where(need, tid, 0), num_segments=n_buckets
    )
    aligned = -(-counts // P) * P
    starts = jnp.cumsum(counts) - counts
    astarts = jnp.cumsum(aligned) - aligned
    total_aligned = jnp.sum(aligned)
    # Worst case: every bucket's run padded to a whole packet.
    C = (-(-N // P) + n_buckets) * P  # static capacity
    rank = jnp.arange(N, dtype=jnp.int32) - starts[tid_s]
    dest = jnp.where(need_s, astarts[tid_s] + rank, C)
    ray_slot = jnp.full((C,), N, jnp.int32).at[dest].set(order, mode="drop")
    # Per-packet roots: the bucket whose aligned run covers the packet.
    pstart = jnp.arange(C // P, dtype=jnp.int32) * P
    bucket = jnp.searchsorted(astarts + aligned, pstart, side="right")
    bucket = jnp.clip(bucket, 0, n_buckets - 1)
    roots = jnp.where(
        pstart < total_aligned, links_table[bucket], jnp.int32(L.NULL_LINK)
    )
    return _RoundPlan(
        ray_slot=ray_slot, roots=roots, live_packets=total_aligned // P
    )


def _gather_rays(plan: _RoundPlan, origin, direction, inv_direction):
    """Capacity-lane ray arrays; parked lanes miss at any root."""
    slot = jnp.minimum(plan.ray_slot, origin.shape[0] - 1)
    parked = (plan.ray_slot >= origin.shape[0])[:, None]
    o = jnp.where(parked, 1e9, origin[slot])
    d = jnp.where(parked, 1.0, direction[slot])
    inv = jnp.where(parked, 1.0, inv_direction[slot])
    return o, d, inv


def _rays_to_r9(o, d, inv, packet_size):
    C = o.shape[0]
    B = C // packet_size
    r9 = jnp.concatenate([o, d, inv], axis=-1)
    r9 = jnp.swapaxes(r9.reshape(B, packet_size, 9), 1, 2)
    return r9.reshape(B, 9, packet_size // 128, 128)


def make_pt_tracer_twolevel(
    scene,
    treelets: Treelets,
    *,
    stack_size: int,
    packet_size: int = 2048,
    K: int = 8,
    rounds: int = 2,
    interpret: bool = False,
):
    """Two-level tracer with the ``make_pt_tracer`` contract.

    ``tracer(state, origin, direction, inv_direction, live)`` — ``live``
    may be a live-ray count (dead suffix, as the compaction loop passes) or
    a full bool mask; internally rays are rebucketed per round anyway, so
    callers can skip their own coherence sort entirely.

    ``rounds`` treelet-rooted rounds run near-to-far; rays needing more
    treelets (or > ``K``) finish in one exact global-root pass.
    """
    from minipath_tpu.render.pallas_kernels import (
        KernelHits,
        trace_packets_pallas_pt,
    )

    assert packet_size % 128 == 0
    T = int(treelets.links.shape[0])
    links_table = jnp.concatenate(
        [treelets.links, treelets.root_link.reshape(1)]
    )
    n_buckets = T + 1  # bucket T = global root (overflow / leftover rays)

    def tracer(state, origin, direction, inv_direction, live=None):
        N = origin.shape[0]
        if live is None:
            live_mask = jnp.ones((N,), bool)
        elif getattr(live, "dtype", None) == jnp.bool_ or (
            hasattr(live, "dtype") and live.dtype == bool
        ):
            live_mask = live
        else:
            live_mask = jnp.arange(N, dtype=jnp.int32) < jnp.asarray(
                live, jnp.int32
            )
        tid, entry_k, valid, overflow = broad_phase(
            treelets, origin, direction, inv_direction, live_mask, K
        )

        best_t = jnp.full((N,), jnp.inf, jnp.float32)
        best_tri = jnp.full((N,), -1, jnp.int32)
        best_u = jnp.zeros((N,), jnp.float32)
        best_v = jnp.zeros((N,), jnp.float32)

        def run_round(r_tid, need, carry):
            best_t, best_tri, best_u, best_v = carry
            plan = _plan_round(
                r_tid, need, origin, direction, links_table,
                n_buckets=n_buckets, packet_size=packet_size,
            )
            o, d, inv = _gather_rays(plan, origin, direction, inv_direction)
            ph = trace_packets_pallas_pt(
                state,
                _rays_to_r9(o, d, inv, packet_size),
                stack_size=stack_size,
                interpret=interpret,
                live_packets=plan.live_packets,
                roots=plan.roots,
            )
            C = o.shape[0]
            t_c = ph.t.reshape(C)
            tri_c = ph.tri.reshape(C)
            u_c = ph.u.reshape(C)
            v_c = ph.v.reshape(C)
            rs = plan.ray_slot  # N = parked (dropped by scatter)
            t_r = jnp.full((N,), jnp.inf, jnp.float32).at[rs].set(
                jnp.where(tri_c >= 0, t_c, jnp.inf), mode="drop"
            )
            tri_r = jnp.full((N,), -1, jnp.int32).at[rs].set(tri_c, mode="drop")
            u_r = jnp.zeros((N,), jnp.float32).at[rs].set(u_c, mode="drop")
            v_r = jnp.zeros((N,), jnp.float32).at[rs].set(v_c, mode="drop")
            win = t_r < best_t
            return (
                jnp.where(win, t_r, best_t),
                jnp.where(win, tri_r, best_tri),
                jnp.where(win, u_r, best_u),
                jnp.where(win, v_r, best_v),
            )

        carry = (best_t, best_tri, best_u, best_v)
        done_after = jnp.zeros((N,), bool)
        for r in range(rounds):
            # A ray still needs round r if the slot exists, it isn't an
            # overflow ray, and its best hit isn't already closer than the
            # treelet's entry (front-to-back early out).
            need = valid[:, r] & ~overflow & (carry[0] >= entry_k[:, r])
            carry = run_round(tid[:, r], need, carry)
        # Leftovers: overflow rays and rays with unvisited slots beyond the
        # round budget that are not yet provably occluded.
        leftover = overflow & live_mask
        if rounds < K:
            leftover = leftover | (
                valid[:, rounds] & (carry[0] >= entry_k[:, rounds])
            )
        r_tid = jnp.full((N,), T, jnp.int32)  # global-root bucket
        carry = jax.lax.cond(
            jnp.any(leftover),
            lambda c: run_round(r_tid, leftover, c),
            lambda c: c,
            carry,
        )
        best_t, best_tri, best_u, best_v = carry

        # Shading gather — identical to make_pt_tracer's epilogue.
        from minipath_tpu.render.wavefront import shade_from_flat

        normal, material, tex = shade_from_flat(
            state.shade_flat, best_tri, best_u, best_v
        )
        return KernelHits(
            t=jnp.where(best_tri >= 0, best_t, jnp.inf),
            tri=best_tri,
            normal=normal,
            material=material,
            texture_coords=tex,
        )

    tracer.accepts_mask = True
    return tracer, scene
