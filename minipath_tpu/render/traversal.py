"""BVH traversal: vectorized packet traversal (the TPU-first hot path).

Design. The reference traverses per-ray with an explicit stack and 8-wide
SIMD tests (``/root/reference/src/scene/triangle_bvh/ray_bvh_intersection.rs``).
A literal port would need per-lane gathers — poison on a lockstep vector
machine. Instead, *packets* of coherent rays (e.g. a 16x16 pixel block)
traverse the tree together: every packet keeps ONE scalar stack, so node and
triangle fetches are scalar-indexed, and each step performs dense
``(P rays x 8 children)`` slab tests or ``(P rays x 8 triangles)``
Möller–Trumbore tests — exactly the shape the VPU wants. A packet visits the
union of nodes any of its rays needs.

Improvements over the reference kept deliberately:
* children are pushed far-first (sorted by packet-min entry distance) so the
  nearest child pops first, tightening ``best_t`` early — the reference
  pushes in lane order (``ray_bvh_intersection.rs:158-162``);
* popped entries are pruned when their entry distance exceeds every ray's
  current best (reference prunes per-ray, ``ray_bvh_intersection.rs:40-44``).

Leaf links encode (first packet, packet count<=7); popping a leaf intersects
one 8-triangle packet and pushes a continuation link for the remainder, so
every step costs the same.

This module is pure ``jax.numpy`` (runs via XLA on any backend); the Pallas
kernel in ``pallas_kernels.py`` implements the same algorithm with the scene
resident in VMEM.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from minipath_tpu.geometry.aabb import slab_test
from minipath_tpu.geometry.ray import Rays
from minipath_tpu.geometry.triangle import (
    barycentric_interpolate,
    moller_trumbore,
    triangle_geometric_normal,
)
from minipath_tpu.render.hit import HitRecords
from minipath_tpu.scene.bvh import links as L
from minipath_tpu.scene.bvh.build import BvhArrays

_NULL = L.NULL_LINK


class TraceResult(NamedTuple):
    """Raw closest-hit result: ``tri`` is the padded global triangle index
    (packet*8 + lane) or -1 for a miss; ``t`` is the hit distance."""

    t: jnp.ndarray  # (B, P) f32
    tri: jnp.ndarray  # (B, P) i32
    steps: jnp.ndarray  # () i32 — traversal iterations (profiling)
    # () i32 — stack pushes dropped because the stack was full. Non-zero
    # means intersections may have been missed; size the stack with
    # BuildResult.recommended_stack_size to guarantee zero.
    overflow: jnp.ndarray | None = None


class _State(NamedTuple):
    sp: jnp.ndarray
    stack_links: jnp.ndarray
    stack_tmin: jnp.ndarray
    best_t: jnp.ndarray
    best_tri: jnp.ndarray
    steps: jnp.ndarray
    overflow: jnp.ndarray


def trace_packets(
    bvh: BvhArrays, rays: Rays, t_max=jnp.inf, stack_size: int = 64
) -> TraceResult:
    """Closest-hit trace of ray packets against the BVH.

    ``rays`` fields are ``(B, P, 3)``: B packets of P rays each. Rays within
    a packet should be coherent (same pixel tile) for efficiency; results are
    exact regardless of coherence.
    """
    B, P = rays.origin.shape[:2]
    S = stack_size
    barange = jnp.arange(B)

    root = jnp.asarray(bvh.root, jnp.int32)
    stack_links = jnp.full((B, S), _NULL, jnp.int32).at[:, 0].set(root)
    stack_tmin = jnp.full((B, S), -jnp.inf, jnp.float32)
    sp = jnp.where(root == _NULL, 0, 1) * jnp.ones((B,), jnp.int32)
    best_t = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (B, P))
    best_tri = jnp.full((B, P), -1, jnp.int32)

    def cond(s: _State):
        return jnp.any(s.sp > 0)

    def body(s: _State) -> _State:
        sp, stack_links, stack_tmin, best_t, best_tri, steps, overflow = s
        active = sp > 0
        top = jnp.maximum(sp - 1, 0)
        link = jnp.where(active, stack_links[barange, top], _NULL)
        t_entry = stack_tmin[barange, top]
        sp = sp - active.astype(jnp.int32)

        # Prune entries that cannot beat any ray's best hit.
        valid = active & (link != _NULL) & (t_entry <= jnp.max(best_t, axis=1))
        leaf = valid & ((link & L.COUNT_MASK) != 0)
        inner = valid & ((link & L.COUNT_MASK) == 0)
        idx = jnp.maximum(link >> L.COUNT_BITS, 0)
        inner_idx = jnp.where(inner, idx, 0)
        leaf_idx = jnp.where(leaf, idx, 0)

        # ---- inner nodes: all P rays vs 8 child boxes -----------------------
        cbmin = bvh.node_child_box_min[inner_idx]  # (B, 8, 3)
        cbmax = bvh.node_child_box_max[inner_idx]
        clinks = bvh.node_child_links[inner_idx]  # (B, 8)
        t1, t2 = slab_test(
            cbmin[:, None],  # (B, 1, 8, 3)
            cbmax[:, None],
            rays.origin[:, :, None],  # (B, P, 1, 3)
            rays.inv_direction[:, :, None],
            best_t[:, :, None],
        )  # (B, P, 8)
        ray_hit = t1 <= t2
        child_any = ray_hit.any(axis=1) & (clinks != _NULL) & inner[:, None]
        child_tmin = jnp.min(jnp.where(ray_hit, t1, jnp.inf), axis=1)  # (B, 8)

        # Push far-first so the nearest child is popped first.
        order = jnp.argsort(-jnp.where(child_any, child_tmin, -jnp.inf), axis=1)
        sorted_links = jnp.take_along_axis(clinks, order, 1)
        sorted_any = jnp.take_along_axis(child_any, order, 1)
        sorted_tmin = jnp.take_along_axis(child_tmin, order, 1)
        offs = jnp.cumsum(sorted_any.astype(jnp.int32), axis=1) - sorted_any
        write_pos = jnp.where(sorted_any, sp[:, None] + offs, S)  # S drops
        overflow = overflow + jnp.sum(
            sorted_any & (write_pos >= S), dtype=jnp.int32
        )
        stack_links = stack_links.at[barange[:, None], write_pos].set(
            sorted_links, mode="drop"
        )
        stack_tmin = stack_tmin.at[barange[:, None], write_pos].set(
            sorted_tmin, mode="drop"
        )
        sp = jnp.minimum(sp + jnp.sum(sorted_any, axis=1, dtype=jnp.int32), S)

        # ---- leaves: all P rays vs one 8-triangle packet ---------------------
        tris = bvh.tri_packets[leaf_idx]  # (B, 8, 3, 3)
        mask, t, _u, _v = moller_trumbore(
            tris[:, None, :, 0],  # (B, 1, 8, 3)
            tris[:, None, :, 1],
            tris[:, None, :, 2],
            rays.origin[:, :, None],
            rays.direction[:, :, None],
        )  # (B, P, 8)
        tvalid = mask & (t >= 0.0) & (t < best_t[:, :, None]) & leaf[:, None, None]
        tcand = jnp.where(tvalid, t, jnp.inf)
        lane = jnp.argmin(tcand, axis=-1)  # (B, P)
        t_new = jnp.take_along_axis(tcand, lane[..., None], -1)[..., 0]
        upd = t_new < best_t
        best_t = jnp.where(upd, t_new, best_t)
        best_tri = jnp.where(
            upd, leaf_idx[:, None] * L.LEAF_NODE_PACKET_SIZE + lane, best_tri
        )

        # Continuation for multi-packet leaves.
        count = link & L.COUNT_MASK
        cont = leaf & (count > 1)
        cont_link = ((leaf_idx + 1) << L.COUNT_BITS) | jnp.maximum(count - 1, 1)
        cpos = jnp.where(cont, sp, S)
        overflow = overflow + jnp.sum(cont & (cpos >= S), dtype=jnp.int32)
        stack_links = stack_links.at[barange, cpos].set(cont_link, mode="drop")
        stack_tmin = stack_tmin.at[barange, cpos].set(t_entry, mode="drop")
        sp = sp + (cont & (cpos < S)).astype(jnp.int32)

        return _State(
            sp, stack_links, stack_tmin, best_t, best_tri, steps + 1, overflow
        )

    init = _State(
        sp, stack_links, stack_tmin, best_t, best_tri, jnp.int32(0), jnp.int32(0)
    )
    final = jax.lax.while_loop(cond, body, init)
    miss = final.best_tri < 0
    return TraceResult(
        t=jnp.where(miss, jnp.inf, final.best_t),
        tri=final.best_tri,
        steps=final.steps,
        overflow=final.overflow,
    )


def finalize_hits(bvh: BvhArrays, rays: Rays, result: TraceResult) -> HitRecords:
    """Compute shading data for closest hits.

    Reproduces the reference hit finalization
    (``ray_bvh_intersection.rs:66-95``): smooth normals via barycentric
    interpolation of vertex normals unless the triangle is flat-shaded, and
    interpolated texture coordinates. Barycentrics are recomputed here from
    the winning triangle (one gather) instead of carried through traversal.
    """
    hit = result.tri >= 0
    safe_tri = jnp.maximum(result.tri, 0)
    packet = safe_tri >> 3
    lane = safe_tri & 7
    verts = bvh.tri_packets[packet, lane]  # (..., 3, 3)
    v0, v1, v2 = verts[..., 0, :], verts[..., 1, :], verts[..., 2, :]
    _, _, u, v = moller_trumbore(v0, v1, v2, rays.origin, rays.direction)
    u = jnp.where(hit, u, 0.0)
    v = jnp.where(hit, v, 0.0)

    vidx = bvh.tri_vidx[safe_tri]  # (..., 3)
    n = bvh.vert_normal[vidx]  # (..., 3, 3)
    smooth = barycentric_interpolate(u, v, n[..., 0, :], n[..., 1, :], n[..., 2, :])
    geom = triangle_geometric_normal(v0, v1, v2)
    flat = bvh.tri_flat[safe_tri]
    normal = jnp.where(flat[..., None], geom, smooth)
    norm = jnp.sqrt(jnp.sum(normal * normal, axis=-1, keepdims=True))
    normal = normal / jnp.where(norm > 0, norm, 1.0)

    uvs = bvh.vert_uv[vidx]
    texture_coords = barycentric_interpolate(
        u, v, uvs[..., 0, :], uvs[..., 1, :], uvs[..., 2, :]
    )
    t = jnp.where(hit, result.t, jnp.inf)
    point = rays.origin + rays.direction * jnp.where(hit, result.t, 0.0)[..., None]
    return HitRecords(
        hit=hit,
        t=t,
        point=point,
        normal=normal,
        material=bvh.tri_material[safe_tri],
        texture_coords=texture_coords,
    )


def intersect_bvh(
    bvh: BvhArrays, rays: Rays, t_max=jnp.inf, stack_size: int = 64
) -> HitRecords:
    """Trace + finalize in one call (the ``Object::intersect`` equivalent)."""
    result = trace_packets(bvh, rays, t_max=t_max, stack_size=stack_size)
    return finalize_hits(bvh, rays, result)


def trace_brute_force(tri_packets: jnp.ndarray, rays: Rays, t_max=jnp.inf) -> TraceResult:
    """Oracle: closest hit by testing every triangle against every ray.

    ``tri_packets`` is the BVH packet array ``(M, 8, 3, 3)`` (padding
    triangles are degenerate and never hit). Used by tests as ground truth.
    """
    flat = tri_packets.reshape(-1, 3, 3)  # (M*8, 3, 3)
    o = rays.origin[..., None, :]  # (..., 1, 3)
    d = rays.direction[..., None, :]
    mask, t, _u, _v = moller_trumbore(flat[..., 0, :], flat[..., 1, :], flat[..., 2, :], o, d)
    valid = mask & (t >= 0.0) & (t < t_max)
    tcand = jnp.where(valid, t, jnp.inf)
    tri = jnp.argmin(tcand, axis=-1).astype(jnp.int32)
    best = jnp.take_along_axis(tcand, tri[..., None], -1)[..., 0]
    miss = ~jnp.isfinite(best)
    return TraceResult(
        t=best, tri=jnp.where(miss, -1, tri), steps=jnp.int32(0)
    )
