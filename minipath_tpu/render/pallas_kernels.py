"""Pallas TPU packet-traversal kernel — the hot path.

Why a kernel: the pure-XLA traversal in ``traversal.py`` runs every packet in
one lockstep batch, so (a) all packets pay the worst packet's step count and
(b) node/triangle fetches become giant XLA gathers from HBM. Here the grid
iterates over packets: each program owns ONE packet, keeps its traversal
stack in SMEM scalars, and fetches node/triangle records with *scalar*
dynamic indices from VMEM-resident scene arrays (the whole quantity of scene
data — ~11 MB f32 for a 250k-triangle scene — fits in VMEM and is pinned
there by constant index maps). Box and triangle tests are dense ``(P,)``
vector ops on the VPU over the packet's rays.

Same algorithm and results as ``traversal.trace_packets`` (same link
encoding, same leaf-continuation scheme, same conservative slab/MT
semantics); the oracle tests compare the two paths exactly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minipath_tpu.geometry.ray import Rays
from minipath_tpu.scene.bvh import links as L
from minipath_tpu.scene.bvh.build import BvhArrays

_NULL = L.NULL_LINK

# VMEM window the kernels may use for scene arrays + blocks; must match the
# CompilerParams passed to every pallas_call below.
VMEM_BUDGET = 100 * 1024 * 1024

# Batcher sorting network on 8 inputs (19 comparators). Both kernels order
# children by DESCENDING packet-entry distance so the nearest child pops
# first — front-to-back traversal tightens best_t early (the reference
# pushes in lane order, ray_bvh_intersection.rs:158).
_BATCHER_PAIRS = (
    (0, 1), (2, 3), (4, 5), (6, 7),
    (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6), (0, 4), (3, 7),
    (1, 5), (2, 6), (1, 4), (3, 6),
    (2, 4), (3, 5), (3, 4),
)


def _sort_children_desc(keys, payloads):
    """Sort per-child scalar ``keys`` (list of 8) descending, applying the
    same permutation to every list in ``payloads``. In-place on the lists."""
    for (a, b) in _BATCHER_PAIRS:
        swap = keys[a] < keys[b]
        rows = [keys] + payloads
        for r in rows:
            ra = jnp.where(swap, r[b], r[a])
            rb = jnp.where(swap, r[a], r[b])
            r[a], r[b] = ra, rb


class KernelHits(NamedTuple):
    """Kernel trace output (everything an integrator needs, no gathers)."""

    t: jnp.ndarray  # (B, P) f32, t_max where miss
    tri: jnp.ndarray  # (B, P) i32, -1 on miss
    normal: jnp.ndarray  # (B, P, 3) f32 shading normal (zeros on miss)
    material: jnp.ndarray  # (B, P) i32
    # (B,) i32 count of dropped stack pushes (0 = results exact; >0 = the
    # traversal stack overflowed and intersections may be missing). The
    # reference's growable StackCache (ray_bvh_intersection.rs:19-23) can't
    # exist in fixed SMEM, so overflow is surfaced instead of corrupting.
    overflow: jnp.ndarray | None = None
    # (B,) i32 profiling counters: inner-node visits and 8-triangle leaf
    # packet tests per ray packet (the traversal's two cost units).
    inner_visits: jnp.ndarray | None = None
    leaf_tests: jnp.ndarray | None = None
    # (B, P, 3) f32 interpolated texture coordinates at the best hit
    # (ray_bvh_intersection.rs:87-93); populated by the lean-kernel tracers
    # (make_pt_tracer / twolevel), None from the in-kernel-shading paths.
    texture_coords: jnp.ndarray | None = None


class PallasScene(NamedTuple):
    """Scene arrays laid out for the kernel (derived from BvhArrays).

    Rows are kept 2-D with a flat record in the last (lane) dimension —
    Mosaic pads the last dim to 128 lanes, so a (M, 8, 9) layout would pad
    to (M, 8, 128) and blow VMEM by 14x.
    """

    node_box: jnp.ndarray  # (N, 48) f32: per child c, [c*6:c*6+6] = cmin, cmax
    node_links: jnp.ndarray  # (N, 8) i32
    # (M, 80) f32: per lane l, [l*9:l*9+9] = v0, e1, e2; [72+l] = material id
    # as a float. Material ids ride in the same row because Mosaic pads every
    # row to 128 lanes — a separate (M, 8) array would cost a full extra
    # padded window (+50% VMEM) for 8 ints.
    tri_data: jnp.ndarray
    tri_shade: jnp.ndarray  # (M, 72) f32: per lane l, vertex normals n0,n1,n2
    root: jnp.ndarray  # (1, 1) i32

    def vmem_bytes(self) -> int:
        """Estimated kernel VMEM window (rows pad to 128 lanes)."""

        def padded(a):
            return a.shape[0] * 128 * 4

        return (
            padded(self.node_box)
            + padded(self.node_links)
            + padded(self.tri_data)
            + padded(self.tri_shade)
        )


def prepare_scene(bvh: BvhArrays) -> PallasScene:
    """Derive kernel arrays. ``tri_shade`` holds the three vertex normals per
    triangle lane; flat-shaded triangles (zero vertex normals, see
    ``building.rs:199`` semantics) get their geometric normal replicated into
    all three slots so the in-kernel barycentric interpolation needs no
    per-triangle flag."""
    node_box = jnp.concatenate(
        [bvh.node_child_box_min, bvh.node_child_box_max], axis=-1
    )  # (N, 8, 6)
    v0 = bvh.tri_packets[:, :, 0, :]
    e1 = bvh.tri_packets[:, :, 1, :] - v0
    e2 = bvh.tri_packets[:, :, 2, :] - v0
    tri_data = jnp.concatenate([v0, e1, e2], axis=-1)  # (M, 8, 9)
    node_box = node_box.reshape(node_box.shape[0], 48)
    tri_data = tri_data.reshape(tri_data.shape[0], 72)

    # Per-lane shading normals (see docstring).
    M = bvh.tri_packets.shape[0]
    vidx = bvh.tri_vidx.reshape(M, 8, 3)
    vnorm = bvh.vert_normal[vidx]  # (M, 8, 3, 3)
    geom = jnp.cross(e1, e2)  # (M, 8, 3) unnormalized; interp normalizes
    flat = bvh.tri_flat.reshape(M, 8)
    vnorm = jnp.where(flat[..., None, None], geom[:, :, None, :], vnorm)
    tri_shade = vnorm.reshape(M, 72)

    mat_f32 = bvh.tri_material.reshape(M, 8).astype(jnp.float32)
    tri_data = jnp.concatenate([tri_data.astype(jnp.float32), mat_f32], axis=-1)

    root = jnp.asarray(bvh.root, jnp.int32).reshape(1, 1)
    scene = PallasScene(
        node_box=node_box.astype(jnp.float32),
        node_links=bvh.node_child_links.astype(jnp.int32),
        tri_data=tri_data,
        tri_shade=tri_shade.astype(jnp.float32),
        root=root,
    )
    if scene.vmem_bytes() > VMEM_BUDGET:
        raise ValueError(
            f"scene needs ~{scene.vmem_bytes()/1e6:.0f} MB of VMEM, over the "
            f"kernel budget ({VMEM_BUDGET/1e6:.0f} MB) for the f32 layout. Use the "
            "16-bit quantized layout (prepare_scene_quantized — half the "
            "footprint; TriangleBvh.pallas_scene falls back to it "
            "automatically) or the portable XLA engine (backend='xla')."
        )
    return scene


def _traverse_kernel(
    root_ref,  # SMEM (1, 1) i32
    live_ref,  # SMEM (1, 1) i32 — packets with grid index >= this are dead
    node_box_ref,  # VMEM (N, 48) f32
    node_links_ref,  # VMEM (N, 8) i32
    tri_ref,  # VMEM (M, 80) f32 — v0,e1,e2 per lane + material ids [72:80]
    shade_ref,  # VMEM (M, 72) f32 — per-lane vertex normals
    rays_ref,  # VMEM (1, 9, P) f32 — packet block
    t_ref,  # out VMEM (1, P) f32
    tri_out_ref,  # out VMEM (1, P) i32
    nx_ref,  # out VMEM (1, P) f32 — shading normal at best hit (normalized)
    ny_ref,
    nz_ref,
    mat_out_ref,  # out VMEM (1, P) i32 — material id at best hit
    ovf_ref,  # out VMEM (1, 1, LANES) i32 — dropped-push count (lane 0)
    stack_ref,  # SMEM scratch (S,) i32 — encoded node links
    stack_t_ref,  # SMEM scratch (S,) f32 — packet-min entry distance
    *,
    t_max: float,
    stack_size: int,
):
    # Ray fields as (S, 128) vector registers (S*128 = packet size).
    S, LANES = rays_ref.shape[2], rays_ref.shape[3]
    ox = rays_ref[0, 0]
    oy = rays_ref[0, 1]
    oz = rays_ref[0, 2]
    dx = rays_ref[0, 3]
    dy = rays_ref[0, 4]
    dz = rays_ref[0, 5]
    # Clamping 1/d to +-1e30 removes every 0*inf=NaN case from the slab
    # test while keeping the reference's semantics (axis-parallel rays
    # produce +-huge entry/exit values with the correct signs), so the
    # per-child NaN guards (12 vector ops per child, ~1/3 of the slab cost)
    # disappear. The portable XLA engine keeps the literal NaN rule of
    # aabb.rs:254-284; the oracle tests compare the two.
    BIG = jnp.float32(1e30)
    ix = jnp.clip(rays_ref[0, 6], -BIG, BIG)
    iy = jnp.clip(rays_ref[0, 7], -BIG, BIG)
    iz = jnp.clip(rays_ref[0, 8], -BIG, BIG)

    root = root_ref[0, 0]
    stack_ref[0] = root
    stack_t_ref[0] = 0.0
    # Wavefront early-exit: packets past the live prefix (dead rays sorted
    # to the back by compaction) skip traversal entirely and just write
    # miss outputs.
    live = pl.program_id(0) < live_ref[0, 0]

    def cond(carry):
        sp = carry[0]
        return sp > 0

    def body(carry):
        sp, ovf, ivis, ltst, max_best, best_t, best_tri, bnx, bny, bnz, bmat = carry
        link = stack_ref[sp - 1]
        t_entry = stack_t_ref[sp - 1]
        sp = sp - 1
        count = link & L.COUNT_MASK
        idx = link >> L.COUNT_BITS
        is_leaf = count != 0

        def inner_case(args):
            sp, ovf, ivis, ltst, max_best, best_t, best_tri, bnx, bny, bnz, bmat = args
            ivis = ivis + 1
            boxes = node_box_ref[idx]  # (48,)
            clinks = node_links_ref[idx]  # (8,)
            child_links = []
            child_tmin = []
            for c in range(8):
                o = c * 6
                bminx, bminy, bminz = boxes[o + 0], boxes[o + 1], boxes[o + 2]
                bmaxx, bmaxy, bmaxz = boxes[o + 3], boxes[o + 4], boxes[o + 5]
                # Slab test; NaN-free by construction (inv clamped above).
                tx0 = (bminx - ox) * ix
                tx1 = (bmaxx - ox) * ix
                ty0 = (bminy - oy) * iy
                ty1 = (bmaxy - oy) * iy
                tz0 = (bminz - oz) * iz
                tz1 = (bmaxz - oz) * iz
                t1 = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), 0.0),
                    jnp.maximum(jnp.minimum(ty0, ty1), jnp.minimum(tz0, tz1)),
                )
                t2 = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), best_t),
                    jnp.minimum(jnp.maximum(ty0, ty1), jnp.maximum(tz0, tz1)),
                )
                clink = clinks[c]
                hit = t1 <= t2
                tmin = jnp.min(jnp.where(hit, t1, jnp.inf))
                # tmin == +inf iff no ray hit — reuse the min-reduce instead
                # of a second any() reduction over the packet.
                push = (tmin < jnp.inf) & (clink != _NULL)
                # Dead lanes sort to the front (far-first push order) and
                # are skipped by the NULL guard at push time.
                child_links.append(jnp.where(push, clink, _NULL))
                child_tmin.append(jnp.where(push, tmin, jnp.inf))

            _sort_children_desc(child_tmin, [child_links])

            for c in range(8):
                clink = child_links[c]
                push = clink != _NULL
                # Bounded push: an undersized stack drops the entry and
                # counts it (visible on KernelHits.overflow) instead of
                # writing past the SMEM scratch buffer.
                fits = sp < stack_size
                ok = push & fits

                @pl.when(ok)
                def _():
                    stack_ref[sp] = clink
                    stack_t_ref[sp] = child_tmin[c]

                sp = sp + ok.astype(jnp.int32)
                ovf = ovf + (push & ~fits).astype(jnp.int32)
            return sp, ovf, ivis, ltst, max_best, best_t, best_tri, bnx, bny, bnz, bmat

        def leaf_case(args):
            sp, ovf, ivis, ltst, max_best, best_t, best_tri, bnx, bny, bnz, bmat = args
            ltst = ltst + count

            # Process the whole leaf run (count packets of 8 triangles) in
            # one pop: an inner fori over packets replaces the reference's
            # continuation scheme (fewer stack operations per leaf).
            def packet_body(j, pc):
                best_t, best_tri, bnx, bny, bnz, bmat = pc
                pidx = idx + j
                tris = tri_ref[pidx]  # (80,)
                shade = shade_ref[pidx]  # (72,)
                for lane in range(8):
                    o = lane * 9
                    v0x, v0y, v0z = tris[o + 0], tris[o + 1], tris[o + 2]
                    e1x, e1y, e1z = tris[o + 3], tris[o + 4], tris[o + 5]
                    e2x, e2y, e2z = tris[o + 6], tris[o + 7], tris[o + 8]
                    # Möller–Trumbore, two-sided (triangle.rs:187-216).
                    px = dy * e2z - dz * e2y
                    py = dz * e2x - dx * e2z
                    pz = dx * e2y - dy * e2x
                    det = e1x * px + e1y * py + e1z * pz
                    inv_det = 1.0 / det
                    sx = ox - v0x
                    sy = oy - v0y
                    sz = oz - v0z
                    u = inv_det * (sx * px + sy * py + sz * pz)
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    v = inv_det * (dx * qx + dy * qy + dz * qz)
                    t = inv_det * (e2x * qx + e2y * qy + e2z * qz)
                    ok = (
                        (u >= 0.0)
                        & (v >= 0.0)
                        & (u + v <= 1.0)
                        & (t >= 0.0)
                        & (t < best_t)
                    )
                    best_tri = jnp.where(
                        ok, pidx * L.LEAF_NODE_PACKET_SIZE + lane, best_tri
                    )
                    best_t = jnp.where(ok, t, best_t)
                    # In-kernel shading data: interpolate vertex normals with
                    # the hit barycentrics and normalize
                    # (ray_bvh_intersection.rs:76-85). Flat triangles carry
                    # their geometric normal in all three slots.
                    n0x, n0y, n0z = shade[o + 0], shade[o + 1], shade[o + 2]
                    n1x, n1y, n1z = shade[o + 3], shade[o + 4], shade[o + 5]
                    n2x, n2y, n2z = shade[o + 6], shade[o + 7], shade[o + 8]
                    # Delta-form interpolation: the deltas are scalar-side,
                    # saving the vector w = 1-u-v and three vector products.
                    nx = n0x + u * (n1x - n0x) + v * (n2x - n0x)
                    ny = n0y + u * (n1y - n0y) + v * (n2y - n0y)
                    nz = n0z + u * (n1z - n0z) + v * (n2z - n0z)
                    inv_len = jax.lax.rsqrt(
                        jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30)
                    )
                    bnx = jnp.where(ok, nx * inv_len, bnx)
                    bny = jnp.where(ok, ny * inv_len, bny)
                    bnz = jnp.where(ok, nz * inv_len, bnz)
                    bmat = jnp.where(ok, tris[72 + lane].astype(jnp.int32), bmat)
                return best_t, best_tri, bnx, bny, bnz, bmat

            best_t, best_tri, bnx, bny, bnz, bmat = jax.lax.fori_loop(
                0, count, packet_body, (best_t, best_tri, bnx, bny, bnz, bmat)
            )
            max_best = jnp.max(best_t)
            return sp, ovf, ivis, ltst, max_best, best_t, best_tri, bnx, bny, bnz, bmat

        def skip_case(args):
            return args

        # Occlusion prune at pop: if the node's entry distance is beyond
        # every ray's best hit, its subtree cannot contribute
        # (per-ray version: ray_bvh_intersection.rs:40-44).
        live = t_entry <= max_best
        return jax.lax.cond(
            live,
            lambda args: jax.lax.cond(is_leaf, leaf_case, inner_case, args),
            skip_case,
            (sp, ovf, ivis, ltst, max_best, best_t, best_tri, bnx, bny, bnz, bmat),
        )

    best_t0 = jnp.full((S, LANES), t_max, jnp.float32)
    best_tri0 = jnp.full((S, LANES), -1, jnp.int32)
    zeros = jnp.zeros((S, LANES), jnp.float32)
    sp0 = jnp.where((root == _NULL) | ~live, 0, 1).astype(jnp.int32)
    _, ovf, ivis, ltst, _, best_t, best_tri, bnx, bny, bnz, bmat = jax.lax.while_loop(
        cond,
        body,
        (
            sp0,
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(0),
            jnp.float32(t_max),
            best_t0,
            best_tri0,
            zeros,
            zeros,
            zeros,
            jnp.zeros((S, LANES), jnp.int32),
        ),
    )
    t_ref[0] = best_t
    tri_out_ref[0] = best_tri
    nx_ref[0] = bnx
    ny_ref[0] = bny
    nz_ref[0] = bnz
    mat_out_ref[0] = bmat
    # Counters ride spare lanes of the overflow row: lane 0 = overflow,
    # lane 1 = inner visits, lane 2 = leaf-packet tests.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    ovf_ref[0] = jnp.where(lane == 1, ivis, jnp.where(lane == 2, ltst, ovf))


@functools.partial(
    jax.jit, static_argnames=("stack_size", "t_max", "interpret")
)
def trace_packets_pallas(
    scene: PallasScene,
    rays9: jnp.ndarray,  # (B, 9, P) f32: o, d, inv_d rows
    *,
    stack_size: int = 96,
    t_max: float = np.inf,
    interpret: bool = False,
    live_packets=None,  # traced scalar: packets past it skip traversal
):
    """Returns a :class:`KernelHits` with ``(B, P)`` fields.

    ``tri`` is -1 on miss; ``normal`` is the interpolated + normalized
    shading normal at the best hit (zeros on miss); ``material`` is the hit
    triangle's material id.

    ``rays9`` is ``(B, 9, P//128, 128)`` (see :func:`rays_to_rays9`).
    ``live_packets`` (optional, traced) enables the wavefront early-exit:
    grid programs with index >= it write miss outputs without traversing
    (dead rays compacted to the back cost nothing).
    """
    B, _, S, LANES = rays9.shape
    P = S * LANES
    kernel = functools.partial(
        _traverse_kernel, t_max=float(t_max), stack_size=int(stack_size)
    )
    if live_packets is None:
        live_packets = B
    live = jnp.asarray(live_packets, jnp.int32).reshape(1, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # root (1,1)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # live_packets (1,1)
            pl.BlockSpec(
                scene.node_box.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                scene.node_links.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                scene.tri_data.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                scene.tri_shade.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 9, S, LANES), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, S, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ]
        * 6
        + [
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        scratch_shapes=[
            pltpu.SMEM((stack_size,), jnp.int32),
            pltpu.SMEM((stack_size,), jnp.float32),
        ],
    )
    best_t, best_tri, nx, ny, nz, mat, ovf = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            # The whole scene lives in VMEM; the default scoped budget
            # (16 MB) rejects large scenes when this call is embedded in a
            # bigger program (e.g. the multi-bounce path tracer).
            vmem_limit_bytes=VMEM_BUDGET,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, S, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, S, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(
        scene.root,
        live,
        scene.node_box,
        scene.node_links,
        scene.tri_data,
        scene.tri_shade,
        rays9,
    )
    return KernelHits(
        t=best_t.reshape(B, P),
        tri=best_tri.reshape(B, P),
        normal=jnp.stack(
            [nx.reshape(B, P), ny.reshape(B, P), nz.reshape(B, P)], axis=-1
        ),
        material=mat.reshape(B, P),
        overflow=ovf[:, 0, 0],
        inner_visits=ovf[:, 0, 1],
        leaf_tests=ovf[:, 0, 2],
    )


def rays_to_rays9(rays: Rays) -> jnp.ndarray:
    """Pack a Rays pytree with ``(B, P, 3)`` fields into ``(B, 9, P//128, 128)``."""
    stacked = jnp.concatenate(
        [rays.origin, rays.direction, rays.inv_direction], axis=-1
    )  # (B, P, 9)
    B, P = stacked.shape[:2]
    assert P % 128 == 0, f"packet size {P} must be a multiple of 128"
    return jnp.swapaxes(stacked, -1, -2).reshape(B, 9, P // 128, 128)


def intersect_bvh_pallas(
    bvh: BvhArrays,
    scene: PallasScene,
    rays: Rays,
    *,
    stack_size: int = 96,
    t_max: float = np.inf,
    interpret: bool = False,
):
    """Trace via the kernel, then finalize hits with the shared jnp code."""
    from minipath_tpu.render.traversal import TraceResult, finalize_hits

    kh = trace_packets_pallas(
        scene,
        rays_to_rays9(rays),
        stack_size=stack_size,
        t_max=t_max,
        interpret=interpret,
    )
    best_t, best_tri = kh.t, kh.tri
    miss = best_tri < 0
    result = TraceResult(
        t=jnp.where(miss, jnp.inf, best_t),
        tri=best_tri,
        steps=jnp.int32(0),
        overflow=jnp.sum(kh.overflow),
    )
    return finalize_hits(bvh, rays, result)


# ---------------------------------------------------------------------------
# Quantized-scene kernel: u16 boxes/vertices + i8 normals, half the VMEM
# ---------------------------------------------------------------------------

_INV_U16 = np.float32(1.0 / 65535.0)
_INV_127 = np.float32(1.0 / 127.0)


class QuantizedPallasScene(NamedTuple):
    """Packed 16-bit scene (layout: ``scene/bvh/quantize.py`` docstring): one
    128-lane i32 row per node and per triangle packet — half the VMEM of
    :class:`PallasScene`, so roughly twice the on-chip scene capacity.
    Counterpart of the reference's in-traversal compressed storage
    (``compressed_geometry.rs:20-163``): the hot loop reads ONLY quantized
    data and decompresses per visit."""

    node_q: jnp.ndarray  # (N, 32) i32
    tri_q: jnp.ndarray  # (M, 64) i32
    root: jnp.ndarray  # (1, 1) i32
    root_box: jnp.ndarray  # (1, 6) f32

    def vmem_bytes(self) -> int:
        """Kernel VMEM window (rows pad to 128 lanes)."""
        return (self.node_q.shape[0] + self.tri_q.shape[0]) * 128 * 4


class QuantizedHbmScene(NamedTuple):
    """Quantized scene with TRIANGLES LEFT IN HBM — the scalability rung
    past the quantized VMEM budget (~2.4M tris). Nodes stay VMEM-resident
    (they are ~5% of the footprint); leaf visits DMA their packet rows into
    a VMEM scratch via async copies. This is how the build keeps the
    reference's render-anything-in-RAM property (``building.rs``) on a
    machine whose fast memory is a 128 MB scratchpad."""

    node_q: jnp.ndarray  # (N, 32) i32 — VMEM-resident
    tri_q: jnp.ndarray  # (M + LEAF_DMA_ROWS, 64) i32 — HBM-resident
    root: jnp.ndarray  # (1, 1) i32
    root_box: jnp.ndarray  # (1, 6) f32

    def vmem_bytes(self) -> int:
        """Kernel VMEM window — nodes only (+ the tiny leaf scratch)."""
        return self.node_q.shape[0] * 128 * 4 + LEAF_DMA_ROWS * 128 * 4


# Leaf DMA transfer size in rows: the link format caps a leaf run at 7
# packets (links.MAX_COUNT); every leaf copy moves this many rows so the
# copy shape stays static (tri_q is padded by the same amount). 8 rather
# than 7 keeps the copy aligned to the (8, 128) i32 tile — Mosaic rejects
# unaligned DMA slices ("Slice shape along dimension 1 must be aligned to
# tiling (128)"), which is also why the HBM variant pads tri rows from 64
# to 128 words.
LEAF_DMA_ROWS = 8


def prepare_scene_quantized(bvh: BvhArrays, *, hbm_tris: bool = False):
    """Hierarchically quantize BvhArrays into the kernel layout.

    ``hbm_tris=True`` returns a :class:`QuantizedHbmScene` whose triangle
    rows stay in HBM (no VMEM budget on triangles; only the node table
    must fit on-chip)."""
    from minipath_tpu.scene.bvh.quantize import build_quantized_scene

    qs = build_quantized_scene(bvh)
    if hbm_tris:
        tri_q = jnp.asarray(qs.tri_q)
        # Pad rows to a full 128-word tile (DMA slice alignment) and append
        # LEAF_DMA_ROWS overrun rows so the static-size leaf copy never
        # runs off the end.
        tri_q = jnp.pad(
            tri_q,
            ((0, LEAF_DMA_ROWS), (0, 128 - tri_q.shape[1])),
        )
        scene = QuantizedHbmScene(
            node_q=jnp.asarray(qs.node_q),
            tri_q=tri_q,
            root=jnp.asarray(qs.root),
            root_box=jnp.asarray(qs.root_box),
        )
        if scene.vmem_bytes() > VMEM_BUDGET:
            raise ValueError(
                f"node table needs ~{scene.vmem_bytes()/1e6:.0f} MB of VMEM, "
                f"over the kernel budget ({VMEM_BUDGET/1e6:.0f} MB) even with "
                "HBM-resident triangles. Use the portable XLA engine."
            )
        return scene
    scene = QuantizedPallasScene(
        node_q=jnp.asarray(qs.node_q),
        tri_q=jnp.asarray(qs.tri_q),
        root=jnp.asarray(qs.root),
        root_box=jnp.asarray(qs.root_box),
    )
    if scene.vmem_bytes() > VMEM_BUDGET:
        raise ValueError(
            f"quantized scene needs ~{scene.vmem_bytes()/1e6:.0f} MB of VMEM, "
            f"over the kernel budget ({VMEM_BUDGET/1e6:.0f} MB); the scene is "
            "too large even for quantized VMEM-resident traversal (which "
            "carries ~2x the f32 layout's triangles). Use the HBM-streamed "
            "layout (prepare_scene_quantized(..., hbm_tris=True) — "
            "TriangleBvh.pallas_scene falls back to it automatically) or "
            "the portable XLA engine (backend='xla')."
        )
    return scene


def _traverse_kernel_q(
    root_ref,  # SMEM (1, 1) i32
    live_ref,  # SMEM (1, 1) i32 — packets with grid index >= this are dead
    root_box_ref,  # SMEM (1, 6) f32
    node_ref,  # VMEM (N, 32) i32 — packed u16 child boxes + links
    tri_ref,  # VMEM (M, 64) i32 — packed u16 verts + u16 mats + i8 normals
    rays_ref,  # VMEM (1, 9, S, 128) f32
    *rest,  # outputs (mode-dependent, see below) then SMEM/DMA scratch
    t_max: float,
    stack_size: int,
    tri_in_hbm: bool = False,
    lean: bool = False,
    anyhit: bool = False,
):
    """Quantized-scene traversal; node/triangle records are decompressed
    in-kernel (``ray_bvh_intersection.rs:104-163``).

    Stack discipline (round 5): every entry is ``link + the entry's own
    DECOMPRESSED box`` (7 words). The box is a free push payload — the
    slab test already decompressed all 8 children — and it is exactly
    what the pop needs: an inner node's box is its children's
    dequantization frame, a leaf's box is its triangles'. The original
    design carried the reference's ``StackCache`` shape instead (link +
    quantized words + parent frame + entry distance, 11 words,
    ``ray_bvh_intersection.rs:19-23``) and paid a per-pop decompress
    chain plus EIGHT per-child vector->scalar min-reductions per inner
    visit for entry-distance ordering; ISOLATE_QPT.json measured that
    design at 1.93x the f32 kernel's time per packet-visit on the same
    scene. This version adopts the f32 PT kernel's measured scheme
    (octant-projection child ordering from box scalars, 4 packed
    sum-reduces for the 8 push decisions, no pop re-prune — the slab
    test prunes against live best_t), leaving dequantization arithmetic
    as the only structural extra over f32.

    With ``tri_in_hbm`` the triangle array lives in HBM and each leaf
    visit async-copies its packet rows into the VMEM scratch first — the
    price is one DMA latency per leaf visit; the win is that VMEM holds
    only the node table, so scene size is bounded by HBM.

    Modes (outputs in ``rest``, before the stack scratch refs):

    * default: full in-kernel shading — ``t, tri, nx, ny, nz, mat, ovf``
      (the primary-ray renderer's contract).
    * ``lean=True``: the PT contract of :func:`_traverse_kernel_pt` —
      ``t, tri, u, v, diag`` (diag lanes 0/1/2 = overflow / inner visits /
      leaf tests); normal/material interpolation is skipped and the
      winner's barycentrics ride out for an HBM ``shade_from_flat`` gather.
      This is what makes the quantized (and HBM-streamed) layouts
      first-class path-tracing citizens past the f32 VMEM budget — the
      reference renders any scene that fits RAM through one full-featured
      path (``ray_bvh_intersection.rs:26-96``).
    * ``anyhit=True`` (requires ``lean``): occlusion mode — a lane's first
      hit poisons its ``best_t`` to -1 (fails every later slab/MT test)
      and a leaf whose packet has every lane finished drops the stack
      wholesale. Only ``tri >= 0`` is meaningful in the outputs."""
    if lean:
        (t_ref, tri_out_ref, u_ref, v_ref, diag_ref,
         stack_ref, stack_box_ref, *dma_scratch) = rest
    else:
        assert not anyhit, "anyhit requires lean mode"
        (t_ref, tri_out_ref, nx_ref, ny_ref, nz_ref, mat_out_ref, ovf_ref,
         stack_ref, stack_box_ref, *dma_scratch) = rest
    S, LANES = rays_ref.shape[2], rays_ref.shape[3]
    ox = rays_ref[0, 0]
    oy = rays_ref[0, 1]
    oz = rays_ref[0, 2]
    dx = rays_ref[0, 3]
    dy = rays_ref[0, 4]
    dz = rays_ref[0, 5]
    # NaN-free slab tests: see the matching comment in _traverse_kernel.
    BIG = jnp.float32(1e30)
    ix = jnp.clip(rays_ref[0, 6], -BIG, BIG)
    iy = jnp.clip(rays_ref[0, 7], -BIG, BIG)
    iz = jnp.clip(rays_ref[0, 8], -BIG, BIG)

    def u16lo(w):
        return (w & 0xFFFF).astype(jnp.float32)

    def u16hi(w):
        return ((w >> 16) & 0xFFFF).astype(jnp.float32)

    # Packet direction octant signs from lane 0 (see _traverse_kernel_pt:
    # compaction sorts rays by octant, so lane 0 is representative; a
    # minority lane only degrades traversal order, never correctness).
    one = jnp.float32(1.0)
    sgx = jnp.where(rays_ref[0, 3, 0, 0] > 0.0, one, -one)
    sgy = jnp.where(rays_ref[0, 4, 0, 0] > 0.0, one, -one)
    sgz = jnp.where(rays_ref[0, 5, 0, 0] > 0.0, one, -one)

    root = root_ref[0, 0]
    stack_ref[0] = root
    # The root entry's box is the scene box itself (the builder quantizes
    # the root's children against exactly this frame — quantize.root_frame).
    for k in range(6):
        stack_box_ref[0, k] = root_box_ref[0, k]
    # Wavefront early-exit (see _traverse_kernel).
    live = pl.program_id(0) < live_ref[0, 0]

    def cond(carry):
        return carry["sp"] > 0

    def body(carry):
        sp = carry["sp"]
        link = stack_ref[sp - 1]
        # The entry's own box, decompressed at push time: an inner node's
        # children and a leaf's triangles both dequantize against it.
        bminx = stack_box_ref[sp - 1, 0]
        bminy = stack_box_ref[sp - 1, 1]
        bminz = stack_box_ref[sp - 1, 2]
        bmaxx = stack_box_ref[sp - 1, 3]
        bmaxy = stack_box_ref[sp - 1, 4]
        bmaxz = stack_box_ref[sp - 1, 5]
        carry = dict(carry, sp=sp - 1)

        count = link & L.COUNT_MASK
        idx = link >> L.COUNT_BITS
        is_leaf = count != 0

        def inner_case(args):
            sp, ovf, best_t = args["sp"], args["ovf"], args["t"]
            row = node_ref[idx]  # (32,) i32
            msx = (bmaxx - bminx) * _INV_U16
            msy = (bmaxy - bminy) * _INV_U16
            msz = (bmaxz - bminz) * _INV_U16
            # Push decisions via 4 packed sum-reduces (two children per
            # 16-bit field; counts <= S*128 < 65536) and far-first ordering
            # by the scalar octant projection of each child's box center —
            # the f32 PT kernel's measured scheme (see its dead-end log:
            # entry-distance min-reduces were 8 vector->scalar syncs).
            packed = [jnp.zeros((S, LANES), jnp.int32) for _ in range(4)]
            child_keys = []
            child_links = []
            cb = [[] for _ in range(6)]  # decompressed child boxes
            for c in range(8):
                cw0 = row[3 * c]
                cw1 = row[3 * c + 1]
                cw2 = row[3 * c + 2]
                cminx = bminx + u16lo(cw0) * msx
                cminy = bminy + u16hi(cw0) * msy
                cminz = bminz + u16lo(cw1) * msz
                cmaxx = bminx + u16hi(cw1) * msx
                cmaxy = bminy + u16lo(cw2) * msy
                cmaxz = bminz + u16hi(cw2) * msz
                # Slab test; NaN-free by construction (inv clamped above).
                tx0 = (cminx - ox) * ix
                tx1 = (cmaxx - ox) * ix
                ty0 = (cminy - oy) * iy
                ty1 = (cmaxy - oy) * iy
                tz0 = (cminz - oz) * iz
                tz1 = (cmaxz - oz) * iz
                t1 = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), 0.0),
                    jnp.maximum(jnp.minimum(ty0, ty1), jnp.minimum(tz0, tz1)),
                )
                t2 = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), best_t),
                    jnp.minimum(jnp.maximum(ty0, ty1), jnp.maximum(tz0, tz1)),
                )
                hit = (t1 <= t2).astype(jnp.int32)
                packed[c // 2] = packed[c // 2] + (
                    hit if c % 2 == 0 else hit << 16
                )
                child_keys.append(
                    sgx * (cminx + cmaxx)
                    + sgy * (cminy + cmaxy)
                    + sgz * (cminz + cmaxz)
                )
                child_links.append(row[24 + c])
                for k, v in enumerate((cminx, cminy, cminz,
                                       cmaxx, cmaxy, cmaxz)):
                    cb[k].append(v)
            NEG = jnp.float32(-jnp.inf)
            for j in range(4):
                tot = jnp.sum(packed[j])
                lo_any = (tot & 0xFFFF) > 0
                hi_any = (tot >> 16) > 0
                c0, c1 = 2 * j, 2 * j + 1
                child_keys[c0] = jnp.where(
                    lo_any & (child_links[c0] != _NULL), child_keys[c0], NEG
                )
                child_keys[c1] = jnp.where(
                    hi_any & (child_links[c1] != _NULL), child_keys[c1], NEG
                )

            # Descending: pushed children form a far-first prefix, so the
            # nearest child pops first.
            _sort_children_desc(child_keys, [child_links] + cb)

            for c in range(8):
                push = child_keys[c] != NEG
                fits = sp < stack_size
                ok = push & fits

                @pl.when(ok)
                def _():
                    stack_ref[sp] = child_links[c]
                    for k in range(6):
                        stack_box_ref[sp, k] = cb[k][c]

                sp = sp + ok.astype(jnp.int32)
                ovf = ovf + (push & ~fits).astype(jnp.int32)
            out = dict(args, sp=sp, ovf=ovf)
            if lean:
                out["ivis"] = args["ivis"] + 1
            return out

        def leaf_case(args):
            sp, best_t, best_tri = args["sp"], args["t"], args["tri"]
            # The leaf's triangles are quantized against the leaf's own
            # decompressed box (RelativeTriangle8, :147-163).
            lsx = (bmaxx - bminx) * _INV_U16
            lsy = (bmaxy - bminy) * _INV_U16
            lsz = (bmaxz - bminz) * _INV_U16

            if tri_in_hbm:
                # Pull the leaf's packet rows down from HBM (tri_q is
                # padded by LEAF_DMA_ROWS so the static-size copy never
                # runs off the end).
                tri_scratch, dma_sem = dma_scratch
                cp = pltpu.make_async_copy(
                    tri_ref.at[pl.ds(idx, LEAF_DMA_ROWS)], tri_scratch, dma_sem
                )
                cp.start()
                cp.wait()

            def packet_body(j, pc):
                best_t, best_tri = pc["t"], pc["tri"]
                if lean:
                    bu, bv = pc["u"], pc["v"]
                else:
                    bnx, bny, bnz, bmat = pc["nx"], pc["ny"], pc["nz"], pc["mat"]
                pidx = idx + j
                row = tri_scratch[j] if tri_in_hbm else tri_ref[pidx]  # (64,) i32

                def coord(u):  # u: static flat u16 index (0..71)
                    w = row[u >> 1]
                    return u16lo(w) if (u & 1) == 0 else u16hi(w)

                def ncomp(bi):  # bi: static flat i8 index (0..71)
                    w = row[40 + (bi >> 2)]
                    sh = 8 * (bi & 3)
                    return ((w << (24 - sh)) >> 24).astype(jnp.float32) * _INV_127

                for lane in range(8):
                    b = lane * 9
                    v0x = bminx + coord(b + 0) * lsx
                    v0y = bminy + coord(b + 1) * lsy
                    v0z = bminz + coord(b + 2) * lsz
                    e1x = bminx + coord(b + 3) * lsx - v0x
                    e1y = bminy + coord(b + 4) * lsy - v0y
                    e1z = bminz + coord(b + 5) * lsz - v0z
                    e2x = bminx + coord(b + 6) * lsx - v0x
                    e2y = bminy + coord(b + 7) * lsy - v0y
                    e2z = bminz + coord(b + 8) * lsz - v0z
                    # Möller–Trumbore, two-sided (triangle.rs:187-216).
                    px = dy * e2z - dz * e2y
                    py = dz * e2x - dx * e2z
                    pz = dx * e2y - dy * e2x
                    det = e1x * px + e1y * py + e1z * pz
                    inv_det = 1.0 / det
                    sx = ox - v0x
                    sy = oy - v0y
                    sz = oz - v0z
                    u = inv_det * (sx * px + sy * py + sz * pz)
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    v = inv_det * (dx * qx + dy * qy + dz * qz)
                    t = inv_det * (e2x * qx + e2y * qy + e2z * qz)
                    ok = (
                        (u >= 0.0)
                        & (v >= 0.0)
                        & (u + v <= 1.0)
                        & (t >= 0.0)
                        & (t < best_t)
                    )
                    best_tri = jnp.where(
                        ok, pidx * L.LEAF_NODE_PACKET_SIZE + lane, best_tri
                    )
                    best_t = jnp.where(ok, t, best_t)
                    if lean:
                        # PT contract: barycentrics only; shading is one
                        # HBM row gather outside the kernel
                        # (shade_from_flat), matching _traverse_kernel_pt.
                        bu = jnp.where(ok, u, bu)
                        bv = jnp.where(ok, v, bv)
                        continue
                    # i8 shading normals, interpolated + normalized
                    # (ray_bvh_intersection.rs:76-85).
                    n0x, n0y, n0z = ncomp(b + 0), ncomp(b + 1), ncomp(b + 2)
                    n1x, n1y, n1z = ncomp(b + 3), ncomp(b + 4), ncomp(b + 5)
                    n2x, n2y, n2z = ncomp(b + 6), ncomp(b + 7), ncomp(b + 8)
                    # Delta-form interpolation (see _traverse_kernel).
                    nx = n0x + u * (n1x - n0x) + v * (n2x - n0x)
                    ny = n0y + u * (n1y - n0y) + v * (n2y - n0y)
                    nz = n0z + u * (n1z - n0z) + v * (n2z - n0z)
                    inv_len = jax.lax.rsqrt(
                        jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30)
                    )
                    bnx = jnp.where(ok, nx * inv_len, bnx)
                    bny = jnp.where(ok, ny * inv_len, bny)
                    bnz = jnp.where(ok, nz * inv_len, bnz)
                    mw = row[36 + (lane >> 1)]
                    mat_val = (mw >> (16 * (lane & 1))) & 0xFFFF
                    bmat = jnp.where(ok, mat_val, bmat)
                if anyhit:
                    # Occlusion mode (see _traverse_kernel_pt.leaf_visit):
                    # a finished lane's poisoned best_t fails every later
                    # slab (t1 >= 0 > t2) and MT (t < best_t) test.
                    best_t = jnp.where(best_tri >= 0, jnp.float32(-1.0), best_t)
                out = {"t": best_t, "tri": best_tri}
                if lean:
                    out["u"], out["v"] = bu, bv
                else:
                    out.update(nx=bnx, ny=bny, nz=bnz, mat=bmat)
                return out

            pc0 = {k: args[k] for k in
                   (("t", "tri", "u", "v") if lean
                    else ("t", "tri", "nx", "ny", "nz", "mat"))}
            pc = jax.lax.fori_loop(0, count, packet_body, pc0)
            out = dict(args, **pc)
            if anyhit:
                # Whole-packet retire: once every lane has an occluder the
                # remaining stack can only re-test finished lanes.
                out["sp"] = jnp.where(jnp.min(pc["tri"]) >= 0, 0, sp)
            if lean:
                out["ltst"] = args["ltst"] + count
            return out

        return jax.lax.cond(is_leaf, leaf_case, inner_case, carry)

    zeros = jnp.zeros((S, LANES), jnp.float32)
    sp0 = jnp.where((root == _NULL) | ~live, 0, 1).astype(jnp.int32)
    carry0 = {
        "sp": sp0,
        "ovf": jnp.int32(0),
        "t": jnp.full((S, LANES), t_max, jnp.float32),
        "tri": jnp.full((S, LANES), -1, jnp.int32),
    }
    if lean:
        carry0.update(
            ivis=jnp.int32(0), ltst=jnp.int32(0), u=zeros, v=zeros
        )
    else:
        carry0.update(
            nx=zeros, ny=zeros, nz=zeros,
            mat=jnp.zeros((S, LANES), jnp.int32),
        )
    fin = jax.lax.while_loop(cond, body, carry0)
    t_ref[0] = fin["t"]
    tri_out_ref[0] = fin["tri"]
    if lean:
        u_ref[0] = fin["u"]
        v_ref[0] = fin["v"]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        diag_ref[0] = jnp.where(
            lane == 1, fin["ivis"], jnp.where(lane == 2, fin["ltst"], fin["ovf"])
        )
    else:
        nx_ref[0] = fin["nx"]
        ny_ref[0] = fin["ny"]
        nz_ref[0] = fin["nz"]
        mat_out_ref[0] = fin["mat"]
        ovf_ref[0] = jnp.full((1, LANES), fin["ovf"], jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "stack_size", "t_max", "interpret", "hbm_tris", "lean", "anyhit",
    ),
)
def trace_packets_pallas_q(
    scene,
    rays9: jnp.ndarray,  # (B, 9, P//128, 128) f32
    *,
    stack_size: int = 96,
    t_max: float = np.inf,
    interpret: bool = False,
    live_packets=None,  # traced scalar: packets past it skip traversal
    hbm_tris: bool = False,
    lean: bool = False,
    anyhit: bool = False,
):
    """Quantized-scene variant of :func:`trace_packets_pallas`; same
    :class:`KernelHits` contract (results differ from the f32 path only by
    quantization error: t within ~box/65535, normals within i8 precision).

    ``hbm_tris=True`` (scene: :class:`QuantizedHbmScene`) leaves triangle
    rows in HBM and DMAs each visited leaf into VMEM scratch — the
    unbounded-scene mode.

    ``lean=True`` switches to the PT contract of
    :func:`trace_packets_pallas_pt` — returns :class:`PTHits` (t, tri, u, v
    plus diagnostics) with shading deferred to an HBM gather; ``anyhit=True``
    (requires ``lean``) is occlusion mode with first-hit lane retire and
    whole-packet early exit. Together these make path tracing (incl. NEE
    shadow rays and kernel-path texcoords) first-class on scenes past the
    f32 VMEM budget, at any size the HBM holds."""
    B, _, S, LANES = rays9.shape
    P = S * LANES
    if anyhit and not lean:
        raise ValueError("anyhit=True requires lean=True")
    kernel = functools.partial(
        _traverse_kernel_q,
        t_max=float(t_max),
        stack_size=int(stack_size),
        tri_in_hbm=bool(hbm_tris),
        lean=bool(lean),
        anyhit=bool(anyhit),
    )
    if live_packets is None:
        live_packets = B
    live = jnp.asarray(live_packets, jnp.int32).reshape(1, 1)
    tri_space = pl.ANY if hbm_tris else pltpu.VMEM
    scratch = [
        pltpu.SMEM((stack_size,), jnp.int32),  # links
        pltpu.SMEM((stack_size, 6), jnp.float32),  # decompressed boxes
    ]
    if hbm_tris:
        scratch += [
            pltpu.VMEM((LEAF_DMA_ROWS, scene.tri_q.shape[1]), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # root (1, 1)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # live_packets (1, 1)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # root_box (1, 6)
        pl.BlockSpec(
            scene.node_q.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(memory_space=tri_space)
        if hbm_tris
        else pl.BlockSpec(
            scene.tri_q.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, 9, S, LANES), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    if lean:
        out_specs = [
            pl.BlockSpec((1, S, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ] * 4 + [
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ]
        out_shape = [
            jax.ShapeDtypeStruct((B, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, S, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, LANES), jnp.int32),
        ]
    else:
        out_specs = [
            pl.BlockSpec((1, S, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ] * 6 + [
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ]
        out_shape = [
            jax.ShapeDtypeStruct((B, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, S, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, S, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, LANES), jnp.int32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(
        scene.root,
        live,
        scene.root_box,
        scene.node_q,
        scene.tri_q,
        rays9,
    )
    if lean:
        best_t, best_tri, u, v, diag = outs
        return PTHits(
            t=best_t.reshape(B, P),
            tri=best_tri.reshape(B, P),
            u=u.reshape(B, P),
            v=v.reshape(B, P),
            overflow=diag[:, 0, 0],
            inner_visits=diag[:, 0, 1],
            leaf_tests=diag[:, 0, 2],
        )
    best_t, best_tri, nx, ny, nz, mat, ovf = outs
    return KernelHits(
        t=best_t.reshape(B, P),
        tri=best_tri.reshape(B, P),
        normal=jnp.stack(
            [nx.reshape(B, P), ny.reshape(B, P), nz.reshape(B, P)], axis=-1
        ),
        material=mat.reshape(B, P),
        overflow=ovf[:, 0, 0],
    )


# ---------------------------------------------------------------------------
# Lean path-tracing kernel: closest hit only (t, tri, u, v), shading deferred
# ---------------------------------------------------------------------------
#
# The wavefront integrator's cost profile is inverted from the primary-ray
# renderer: compacted bounce packets visit ~25x more nodes and ~100x more
# leaf packets than coherent primary packets (tools/sweep_pt6.py: ~320
# visits + ~1160 leaf tests per 2048-ray packet vs 14 + 10). Measured cost
# fits ~1.2us per inner visit and ~0.58us per 8-triangle leaf test, so this
# kernel strips everything amortizable out of the per-visit loop:
#
# * leaf tests do Moller-Trumbore only — no normal interpolation, no
#   material: the winner's (u, v) ride out and shading data is ONE 48-byte
#   gather per ray on the XLA side (make_pt_tracer);
# * child traversal order is scalar geometry, not a vector reduction: the
#   far-first sort key is the projection of each child box center onto the
#   packet's direction octant (compaction sorts rays by octant, so one
#   scalar octant per packet is representative), computed from box scalars
#   the slab test already loaded — replacing the 8 per-child min-reduces
#   that fed the sorting network;
# * push decisions use 4 packed sum-reduces (two children per 16-bit field)
#   instead of 8 min-reduces, and the stack holds links only (no entry
#   distance, no pop re-prune: the slab test already prunes against the
#   live best_t vector at test time).
#
# Measured dead ends (kept as flags so future tuning doesn't re-explore
# blindly; all numbers on sorted bounce-3 atrium rays, 2048-ray packets):
# * sort_children=False (skip the 19-stage scalar sorting network): visits
#   +60%, leaf tests +91%, 1.7x SLOWER — near-first ordering is
#   load-bearing (tools/sweep_pt8.py).
# * pop2=True (process two stack entries per iteration in straight-line
#   code, hoping Mosaic co-schedules one entry's scalar sort/push with the
#   other's vector slab/MT): +4% work inflation, net wash (847 vs 838 ms)
#   — the kernel is vector-bound enough that there's no scalar slack to
#   hide.
# * packet_size 1024/4096: 2048 wins (tools/sweep_pt7.py); leaf_max 8/16:
#   24 wins (tools/sweep_pt9.py).
# * two-level binned traversal (render/twolevel.py, tools/sweep_pt11.py):
#   broad-phase treelet binning + per-packet roots; exact parity but
#   2.5-7x SLOWER than the flat sorted wavefront at every bounce depth —
#   the per-round XLA re-binning (sort + aligned scatter over the 4.15M
#   wavefront) costs more than a whole flat trace, and treelet-interior
#   unions stay large. Kept as the per-packet-roots reference user.
# * per-row leaf AABB pre-test (row box in tri_data[80:86], lax.cond
#   around the 8-lane MT body): wavefront 4.25 -> 5.16 s, megakernel
#   19.2 -> 25.3 s — rows subdivide an already-passed leaf box too
#   coarsely (count <= 3), so the skip rate never pays for the per-row
#   slab + cond. Reverted.
# * SBVH spatial splits (build_bvh(spatial_splits=True),
#   tools/sweep_sbvh.py): deep bounces ~3% faster at +8% refs/VMEM and
#   ~600x build time — tighter leaf boxes barely dent the packet's
#   direction-spread union. Kept opt-in for coherent-ray workloads.
# * seeded traversal (seed= on trace_packets_pallas_pt,
#   tools/sweep_pt14.py): pre-loading every lane's best-hit from K
#   rep-rays' leaf rows reduces visits ~0.1% at ANY coverage (the seeds
#   duplicate what near-first ordering finds in the first few pops), and
#   even ORACLE seeds (the true closest hits) only cut visits 17-20% /
#   time 20-27% (bounce-1..4: 919->732, 891->716, 837->681, 767->631 ms).
#   That oracle ceiling is the sharpest evidence that deep-bounce
#   throughput is union-bound: a 2048-lane packet must visit the union
#   of its lanes' MINIMAL traversals, and that union is already ~80% of
#   what the kernel visits today. Remaining wins must trace fewer rays
#   (roulette, compaction) — not traverse smarter. The seed= hook stays:
#   it is exact (tested) and the right primitive for future anyhit reuse.
# * packed_or=True (bit-pack all 8 children's hit bits into ONE word,
#   sublane OR-fold + log2(LANES) roll-ORs, a single vector->scalar read
#   per visit instead of four; tools/sweep_pt18.py): 22% SLOWER (1027 vs
#   839 ms on bounce-3, 100% tri agreement) — the 7 cross-lane roll-OR
#   steps cost more VPU time than the 3 extra packed sums save in scalar
#   sync. The visit is not dominated by the vector->scalar handoff.
# * bf16 slab test (tools/microbench_vpu_bf16.py): the VPU retires a
#   register-resident bf16 min/max/mul chain at 0.62x the f32 rate
#   (1738 vs 2804 Gop/s — bf16 is a storage format; the ALU unpacks it),
#   so a conservative bf16 box layout would make traversal SLOWER, not
#   2x cheaper. Halving box bytes only pays on the memory side, which
#   the u16 quantized layout already covers at higher density.


class PTScene(NamedTuple):
    """Scene layout for the lean PT kernel."""

    node_box: jnp.ndarray  # (N, 48) f32 — as PallasScene
    node_links: jnp.ndarray  # (N, 8) i32 — as PallasScene
    tri_data: jnp.ndarray  # (M, 80) f32 — as PallasScene (materials unused)
    root: jnp.ndarray  # (1, 1) i32
    # (M*8, 20) f16 HBM-side shading table: n0, n1, n2 (9), material (1),
    # uv0, uv1, uv2 (9), pad (1) — gathered per winning triangle OUTSIDE
    # the kernel (not a kernel input) as one row gather per ray (see
    # shade_from_flat for the measured layout trade). Texture coordinates
    # interpolate with the kernel barycentrics exactly like the
    # reference's hit finalization (ray_bvh_intersection.rs:87-93).
    shade_flat: jnp.ndarray

    def vmem_bytes(self) -> int:
        """Kernel VMEM window (rows pad to 128 lanes; shade_flat stays in
        HBM and is excluded)."""
        return (
            self.node_box.shape[0] * 2 + self.tri_data.shape[0]
        ) * 128 * 4


class PTHits(NamedTuple):
    """Lean kernel trace output."""

    t: jnp.ndarray  # (B, P) f32, t_max where miss
    tri: jnp.ndarray  # (B, P) i32, -1 on miss
    u: jnp.ndarray  # (B, P) f32 barycentrics at the best hit
    v: jnp.ndarray
    overflow: jnp.ndarray  # (B,) i32
    inner_visits: jnp.ndarray  # (B,) i32
    leaf_tests: jnp.ndarray  # (B,) i32


def build_shade_flat(bvh: BvhArrays) -> jnp.ndarray:
    """The (M*8, 20) f16 HBM-side shading table shared by every lean PT
    layout: per triangle lane, n0 n1 n2 (9), material (1), uv0 uv1 uv2 (9),
    pad (1). Flat-shaded triangles get their geometric normal replicated
    into all three slots (``building.rs:199`` semantics); texcoords
    interpolate with the kernel barycentrics exactly like the reference's
    hit finalization (``ray_bvh_intersection.rs:87-93``).

    f16 storage halves the per-bounce row-gather bytes — measured 151 ->
    66 ms per 4.15M-ray gather on the TPU (the gather is byte-bound;
    round-5 microbench), worth ~9 s on the 112 s headline frame. The
    normals are normalized HERE so f16's narrow range can't underflow a
    tiny cross product to zero (shade_from_flat re-normalizes the f32
    interpolant as before); uv in [0, ~1] and material ids < 2048 are
    exact in f16."""
    M = bvh.tri_packets.shape[0]
    v0 = jnp.asarray(bvh.tri_packets[:, :, 0, :])
    e1 = jnp.asarray(bvh.tri_packets[:, :, 1, :]) - v0
    e2 = jnp.asarray(bvh.tri_packets[:, :, 2, :]) - v0
    vidx = jnp.asarray(bvh.tri_vidx).reshape(M, 8, 3)
    vnorm = jnp.asarray(bvh.vert_normal)[vidx]  # (M, 8, 3, 3)
    geom = jnp.cross(e1, e2)
    flat = jnp.asarray(bvh.tri_flat).reshape(M, 8)
    vnorm = jnp.where(flat[..., None, None], geom[:, :, None, :], vnorm)
    # Normalize per stored normal (NOT deferred to shade time): the rows
    # are stored f16, whose min normal (~6e-5) would flush a small-area
    # cross product to zero and NaN the shade-time normalize.
    vnorm = vnorm / jnp.maximum(
        jnp.linalg.norm(vnorm, axis=-1, keepdims=True), 1e-20
    )
    shade = vnorm.reshape(M * 8, 9)
    mat_i = jnp.asarray(bvh.tri_material).reshape(M * 8, 1)
    if int(jnp.max(mat_i)) >= 2048:
        raise ValueError("material ids must stay < 2048 for exact f16 rows")
    mat = mat_i.astype(jnp.float32)
    uvs = (
        jnp.asarray(bvh.vert_uv)[vidx.reshape(M * 8, 3)]
        .reshape(M * 8, 9)
        .astype(jnp.float32)
    )
    return jnp.concatenate(
        [shade, mat, uvs, jnp.zeros((M * 8, 1), jnp.float32)], axis=-1
    ).astype(jnp.float16)  # (M*8, 20) — see shade_from_flat for the trade


def prepare_scene_pt(bvh: BvhArrays) -> PTScene:
    """Derive the lean PT layout from BvhArrays (shares the PallasScene
    node/triangle encodings; adds the flat shading table)."""
    base = prepare_scene(bvh)
    return PTScene(
        node_box=base.node_box,
        node_links=base.node_links,
        tri_data=base.tri_data,
        root=base.root,
        shade_flat=build_shade_flat(bvh),
    )


class QPTScene(NamedTuple):
    """Lean PT layout over the 16-bit quantized traversal arrays — the
    scalability rungs of :class:`PTScene`. ``tri_q.shape[1] == 128`` marks
    the HBM-resident triangle variant (rows padded to a full tile, see
    :class:`QuantizedHbmScene`); 64 means VMEM-resident. ``shade_flat``
    stays in HBM either way (one row gather per ray, zero VMEM cost), so
    the full PT feature set (NEE shadow anyhit, texcoords) survives to any
    scene size the HBM holds — the reference's render-anything-in-RAM
    property (``building.rs:28-83``) carried to the path tracer."""

    node_q: jnp.ndarray  # (N, 32) i32
    tri_q: jnp.ndarray  # (M, 64) i32 VMEM-resident, or (M+8, 128) HBM
    root: jnp.ndarray  # (1, 1) i32
    root_box: jnp.ndarray  # (1, 6) f32
    shade_flat: jnp.ndarray  # (M*8, 20) f16, HBM-side

    @property
    def hbm_tris(self) -> bool:
        return self.tri_q.shape[1] == 128

    def vmem_bytes(self) -> int:
        if self.hbm_tris:
            return self.node_q.shape[0] * 128 * 4 + LEAF_DMA_ROWS * 128 * 4
        return (self.node_q.shape[0] + self.tri_q.shape[0]) * 128 * 4


def prepare_scene_qpt(bvh: BvhArrays, *, hbm_tris: bool = False) -> QPTScene:
    """Quantized lean-PT scene: the :func:`prepare_scene_quantized` traversal
    arrays plus the HBM shading table of :func:`build_shade_flat`."""
    q = prepare_scene_quantized(bvh, hbm_tris=hbm_tris)
    return QPTScene(
        node_q=q.node_q,
        tri_q=q.tri_q,
        root=q.root,
        root_box=q.root_box,
        shade_flat=build_shade_flat(bvh),
    )


def _traverse_kernel_pt(
    roots_ref,  # SMEM (B,) i32 scalar-prefetch — per-packet traversal roots
    live_ref,  # SMEM (1, 1) i32
    node_box_ref,  # VMEM (N, 48) f32
    node_links_ref,  # VMEM (N, 8) i32
    tri_ref,  # VMEM (M, 80) f32
    rays_ref,  # VMEM (1, 9, S, 128) f32
    *rest,  # [seed_t, seed_tri, seed_u, seed_v when seeded] then outputs:
    #   t_ref (1, S, 128) f32, tri_out_ref (1, S, 128) i32,
    #   u_ref / v_ref (1, S, 128) f32,
    #   diag_ref (1, 1, LANES) i32 (lane 0 ovf, 1 visits, 2 leaf tests),
    #   stack_ref SMEM scratch (S,) i32 — links only
    t_max: float,
    stack_size: int,
    sort_children: bool = True,
    pop2: bool = False,
    anyhit: bool = False,
    seeded: bool = False,
    packed_or: bool = False,
):
    if seeded:
        (seed_t_ref, seed_tri_ref, seed_u_ref, seed_v_ref,
         t_ref, tri_out_ref, u_ref, v_ref, diag_ref, stack_ref) = rest
    else:
        t_ref, tri_out_ref, u_ref, v_ref, diag_ref, stack_ref = rest
    S, LANES = rays_ref.shape[2], rays_ref.shape[3]
    ox = rays_ref[0, 0]
    oy = rays_ref[0, 1]
    oz = rays_ref[0, 2]
    dx = rays_ref[0, 3]
    dy = rays_ref[0, 4]
    dz = rays_ref[0, 5]
    BIG = jnp.float32(1e30)
    ix = jnp.clip(rays_ref[0, 6], -BIG, BIG)
    iy = jnp.clip(rays_ref[0, 7], -BIG, BIG)
    iz = jnp.clip(rays_ref[0, 8], -BIG, BIG)

    # Packet direction octant signs from lane 0 (compaction sorts rays by
    # octant, so lane 0 is representative; a minority lane only degrades
    # traversal order, never correctness). Children are ordered by the
    # projection of their box center onto this octant direction.
    one = jnp.float32(1.0)
    sgx = jnp.where(rays_ref[0, 3, 0, 0] > 0.0, one, -one)
    sgy = jnp.where(rays_ref[0, 4, 0, 0] > 0.0, one, -one)
    sgz = jnp.where(rays_ref[0, 5, 0, 0] > 0.0, one, -one)

    root = roots_ref[pl.program_id(0)]
    stack_ref[0] = root
    live = pl.program_id(0) < live_ref[0, 0]

    def cond(carry):
        return carry[0] > 0

    def inner_visit(sp, ovf, best_t, idx, gate):
        """Slab-test node ``idx``'s 8 children against ``best_t`` and push
        the survivors far-first. ``gate`` (scalar bool) masks all effects
        (used by the pop-2 body when the second stack entry is absent)."""
        boxes = node_box_ref[idx]  # (48,)
        clinks = node_links_ref[idx]  # (8,)
        # Per-lane hit bits for all 8 children. Two reduction strategies:
        # packed_or=False: 4 packed sums (counts <= S*128 < 65536 fit a
        #   16-bit field) -> 4 full reductions + 4 vector->scalar reads.
        # packed_or=True: all 8 children ride one bit-packed word; a
        #   sublane OR-fold + log2(LANES) roll-OR steps leave the full
        #   8-bit any-mask in every element, so the scalar core does ONE
        #   vector->scalar read per visit instead of four (that sync is
        #   serialized with the push logic and dominates the visit).
        packed = [jnp.zeros((S, LANES), jnp.int32) for _ in range(4)]
        orword = jnp.zeros((S, LANES), jnp.int32)
        child_keys = []
        child_links = []
        for c in range(8):
            o = c * 6
            bminx, bminy, bminz = boxes[o + 0], boxes[o + 1], boxes[o + 2]
            bmaxx, bmaxy, bmaxz = boxes[o + 3], boxes[o + 4], boxes[o + 5]
            tx0 = (bminx - ox) * ix
            tx1 = (bmaxx - ox) * ix
            ty0 = (bminy - oy) * iy
            ty1 = (bmaxy - oy) * iy
            tz0 = (bminz - oz) * iz
            tz1 = (bmaxz - oz) * iz
            t1 = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), 0.0),
                jnp.maximum(jnp.minimum(ty0, ty1), jnp.minimum(tz0, tz1)),
            )
            t2 = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), best_t),
                jnp.minimum(jnp.maximum(ty0, ty1), jnp.maximum(tz0, tz1)),
            )
            hit = (t1 <= t2).astype(jnp.int32)
            if packed_or:
                orword = orword | (hit << c)
            else:
                packed[c // 2] = packed[c // 2] + (
                    hit if c % 2 == 0 else hit << 16
                )
            # Far-first sort key: center projection onto the octant
            # direction (scalar geometry, no vector reduce).
            child_keys.append(
                sgx * (bminx + bmaxx)
                + sgy * (bminy + bmaxy)
                + sgz * (bminz + bmaxz)
            )
            child_links.append(clinks[c])
        NEG = jnp.float32(-jnp.inf)
        if packed_or:
            r = orword
            n = S
            while n > 1:  # sublane OR-fold: (S,L) -> (1,L)
                r = r[: n // 2] | r[n // 2 : n]
                n //= 2
            sh = LANES // 2
            while sh >= 1:  # cross-lane OR: every element ends all-ORed
                r = r | pltpu.roll(r, sh, 1)
                sh //= 2
            word = r[0, 0]  # the visit's single vector->scalar sync
            for c in range(8):
                any_c = ((word >> c) & 1) > 0
                child_keys[c] = jnp.where(
                    any_c & (child_links[c] != _NULL), child_keys[c], NEG
                )
        else:
            for j in range(4):
                tot = jnp.sum(packed[j])
                lo_any = (tot & 0xFFFF) > 0
                hi_any = (tot >> 16) > 0
                c0, c1 = 2 * j, 2 * j + 1
                child_keys[c0] = jnp.where(
                    lo_any & (child_links[c0] != _NULL), child_keys[c0], NEG
                )
                child_keys[c1] = jnp.where(
                    hi_any & (child_links[c1] != _NULL), child_keys[c1], NEG
                )

        # Descending sort: pushed children (finite keys) form a prefix,
        # farthest first, so the nearest child pops first.
        if sort_children:
            _sort_children_desc(child_keys, [child_links])

        for k in range(8):
            push = (child_keys[k] != NEG) & gate
            fits = sp < stack_size
            ok = push & fits

            @pl.when(ok)
            def _():
                stack_ref[sp] = child_links[k]

            sp = sp + ok.astype(jnp.int32)
            ovf = ovf + (push & ~fits).astype(jnp.int32)
        return sp, ovf

    def leaf_visit(idx, count, best_t, best_tri, bu, bv):
        """MT-test ``count`` 8-triangle packets starting at ``idx``; returns
        the (t, tri, u, v) best-hit state merged with the given baseline."""

        def packet_body(j, pc):
            best_t, best_tri, bu, bv = pc
            pidx = idx + j
            tris = tri_ref[pidx]  # (80,)
            for lane in range(8):
                o = lane * 9
                v0x, v0y, v0z = tris[o + 0], tris[o + 1], tris[o + 2]
                e1x, e1y, e1z = tris[o + 3], tris[o + 4], tris[o + 5]
                e2x, e2y, e2z = tris[o + 6], tris[o + 7], tris[o + 8]
                # Möller–Trumbore, two-sided (triangle.rs:187-216).
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = 1.0 / det
                sx = ox - v0x
                sy = oy - v0y
                sz = oz - v0z
                u = inv_det * (sx * px + sy * py + sz * pz)
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                v = inv_det * (dx * qx + dy * qy + dz * qz)
                t = inv_det * (e2x * qx + e2y * qy + e2z * qz)
                ok = (
                    (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t >= 0.0)
                    & (t < best_t)
                )
                best_tri = jnp.where(
                    ok, pidx * L.LEAF_NODE_PACKET_SIZE + lane, best_tri
                )
                best_t = jnp.where(ok, t, best_t)
                bu = jnp.where(ok, u, bu)
                bv = jnp.where(ok, v, bv)
            if anyhit:
                # Occlusion mode: any hit finishes the lane. best_t = -1
                # fails every later slab test (t1 >= 0 > t2) and MT
                # (t < best_t), so finished lanes stop contributing to the
                # packet's traversal union. t/u/v outputs are then
                # meaningless; `tri` marks a (not necessarily closest) hit.
                best_t = jnp.where(
                    best_tri >= 0, jnp.float32(-1.0), best_t
                )
            return best_t, best_tri, bu, bv

        return jax.lax.fori_loop(
            0, count, packet_body, (best_t, best_tri, bu, bv)
        )

    def body(carry):
        sp, ovf, ivis, ltst, best_t, best_tri, bu, bv = carry
        link = stack_ref[sp - 1]
        sp = sp - 1
        count = link & L.COUNT_MASK
        idx = link >> L.COUNT_BITS
        is_leaf = count != 0

        def inner_case(args):
            sp, ovf, ivis, ltst, best_t, best_tri, bu, bv = args
            sp, ovf = inner_visit(sp, ovf, best_t, idx, jnp.bool_(True))
            return sp, ovf, ivis + 1, ltst, best_t, best_tri, bu, bv

        def leaf_case(args):
            sp, ovf, ivis, ltst, best_t, best_tri, bu, bv = args
            best_t, best_tri, bu, bv = leaf_visit(
                idx, count, best_t, best_tri, bu, bv
            )
            if anyhit:
                # Occlusion packets retire wholesale: once every lane has a
                # hit, the remaining stack can only re-test finished lanes
                # (poisoned best_t fails every slab), so drop it.
                all_done = jnp.min(best_tri) >= 0
                sp = jnp.where(all_done, 0, sp)
            return sp, ovf, ivis, ltst + count, best_t, best_tri, bu, bv

        return jax.lax.cond(
            is_leaf,
            leaf_case,
            inner_case,
            (sp, ovf, ivis, ltst, best_t, best_tri, bu, bv),
        )

    def body2(carry):
        # Pop-2 body: process the two top stack entries per iteration in
        # straight-line code so Mosaic can co-schedule one entry's scalar
        # sort/push chain with the other's vector slab/MT work (the scalar
        # and vector units otherwise serialize per visit). Entry 1 is the
        # nearer (top) entry; entry 2's tests don't see entry 1's best_t
        # tightening within the iteration, which only costs extra work,
        # never correctness.
        sp, ovf, ivis, ltst, best_t, best_tri, bu, bv = carry
        link1 = stack_ref[sp - 1]
        has2 = sp >= 2
        # When only one entry exists, alias entry 2 to entry 1 (same
        # leaf/inner branch gets taken; all entry-2 effects are gated).
        link2 = jnp.where(has2, stack_ref[jnp.maximum(sp - 2, 0)], link1)
        sp = sp - 1 - has2.astype(jnp.int32)
        h2i = has2.astype(jnp.int32)
        cnt1 = link1 & L.COUNT_MASK
        idx1 = link1 >> L.COUNT_BITS
        cnt2 = link2 & L.COUNT_MASK
        idx2 = link2 >> L.COUNT_BITS
        leaf1 = cnt1 != 0
        leaf2 = cnt2 != 0

        def II(args):
            sp, ovf, ivis, ltst, bt, btr, bu, bv = args
            # Far entry pushes first so entry 1's nearest child ends on top.
            sp, ovf = inner_visit(sp, ovf, bt, idx2, has2)
            sp, ovf = inner_visit(sp, ovf, bt, idx1, jnp.bool_(True))
            return sp, ovf, ivis + 1 + h2i, ltst, bt, btr, bu, bv

        def LL(args):
            sp, ovf, ivis, ltst, bt, btr, bu, bv = args
            t1, r1, u1, v1 = leaf_visit(idx1, cnt1, bt, btr, bu, bv)
            t2, r2, u2, v2 = leaf_visit(idx2, cnt2, bt, btr, bu, bv)
            w2 = has2 & (t2 < t1)
            bt = jnp.where(w2, t2, t1)
            btr = jnp.where(w2, r2, r1)
            bu = jnp.where(w2, u2, u1)
            bv = jnp.where(w2, v2, v1)
            return sp, ovf, ivis, ltst + cnt1 + h2i * cnt2, bt, btr, bu, bv

        def IL(args):
            sp, ovf, ivis, ltst, bt, btr, bu, bv = args
            sp, ovf = inner_visit(sp, ovf, bt, idx1, jnp.bool_(True))
            t2, r2, u2, v2 = leaf_visit(idx2, cnt2, bt, btr, bu, bv)
            w2 = has2 & (t2 < bt)
            bt = jnp.where(w2, t2, bt)
            btr = jnp.where(w2, r2, btr)
            bu = jnp.where(w2, u2, bu)
            bv = jnp.where(w2, v2, bv)
            return sp, ovf, ivis + 1, ltst + h2i * cnt2, bt, btr, bu, bv

        def LI(args):
            sp, ovf, ivis, ltst, bt, btr, bu, bv = args
            sp, ovf = inner_visit(sp, ovf, bt, idx2, has2)
            bt, btr, bu, bv = leaf_visit(idx1, cnt1, bt, btr, bu, bv)
            return sp, ovf, ivis + h2i, ltst + cnt1, bt, btr, bu, bv

        return jax.lax.cond(
            leaf1,
            lambda a: jax.lax.cond(leaf2, LL, LI, a),
            lambda a: jax.lax.cond(leaf2, IL, II, a),
            (sp, ovf, ivis, ltst, best_t, best_tri, bu, bv),
        )

    zeros = jnp.zeros((S, LANES), jnp.float32)
    if seeded:
        # Each lane starts from a caller-provided TRUE intersection of its
        # own ray (or a miss: t >= t_max, tri = -1). The closest hit is
        # unique, so the result equals an unseeded trace (up to tie order
        # at exactly-equal t) — but every lane prunes from step one
        # instead of only after near-first ordering finds its first hit.
        best_t0 = jnp.minimum(seed_t_ref[0], t_max)
        best_tri0 = seed_tri_ref[0]
        bu0 = seed_u_ref[0]
        bv0 = seed_v_ref[0]
    else:
        best_t0 = jnp.full((S, LANES), t_max, jnp.float32)
        best_tri0 = jnp.full((S, LANES), -1, jnp.int32)
        bu0 = bv0 = zeros
    sp0 = jnp.where((root == _NULL) | ~live, 0, 1).astype(jnp.int32)
    _, ovf, ivis, ltst, best_t, best_tri, bu, bv = jax.lax.while_loop(
        cond,
        body2 if pop2 else body,
        (sp0, jnp.int32(0), jnp.int32(0), jnp.int32(0), best_t0, best_tri0, bu0, bv0),
    )
    t_ref[0] = best_t
    tri_out_ref[0] = best_tri
    u_ref[0] = bu
    v_ref[0] = bv
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    diag_ref[0] = jnp.where(lane == 1, ivis, jnp.where(lane == 2, ltst, ovf))


@functools.partial(
    jax.jit,
    static_argnames=(
        "stack_size", "t_max", "interpret", "sort_children", "pop2",
        "anyhit", "packed_or",
    ),
)
def trace_packets_pallas_pt(
    scene: PTScene,
    rays9: jnp.ndarray,  # (B, 9, P//128, 128) f32
    *,
    stack_size: int = 96,
    t_max: float = np.inf,
    interpret: bool = False,
    live_packets=None,
    sort_children: bool = True,
    pop2: bool = False,
    anyhit: bool = False,
    roots=None,
    seed=None,
    packed_or: bool = False,
):
    """Lean closest-hit trace (see the section comment above). Returns
    :class:`PTHits` with ``(B, P)`` fields; shading is the caller's job.
    With ``anyhit=True`` only ``tri >= 0`` (occlusion) is meaningful and
    lanes retire on their first hit under ``t_max``.

    ``roots`` (optional ``(B,)`` i32 of encoded node links) gives every
    packet its OWN traversal root — the enabler for two-level binned
    traversal, where a broad phase buckets rays by subtree ("treelet") and
    each packet descends only the subtree all of its rays want. A NULL root
    makes the packet write miss outputs without traversing. Results for a
    packet are exactly a root-limited traversal: anything outside the
    packet's subtree is invisible to it (the caller owns cross-treelet
    min-combining).

    ``seed`` (optional ``(t, tri, u, v)`` of ``(B, P)`` arrays) pre-loads
    every lane's best-hit record before traversal. Each seed must be a
    TRUE intersection of its own ray (or a miss: ``t >= t_max``,
    ``tri = -1``); the trace then returns the same closest hit as an
    unseeded run (up to tie order at exactly-equal ``t``) while pruning
    everything beyond the seed from the first slab test."""
    B, _, S, LANES = rays9.shape
    P = S * LANES
    kernel = functools.partial(
        _traverse_kernel_pt,
        t_max=float(t_max),
        stack_size=int(stack_size),
        sort_children=sort_children,
        pop2=pop2,
        anyhit=anyhit,
        seeded=seed is not None,
        packed_or=packed_or,
    )
    if live_packets is None:
        live_packets = B
    live = jnp.asarray(live_packets, jnp.int32).reshape(1, 1)
    if roots is None:
        root_arg = jnp.broadcast_to(scene.root.reshape(()), (B,)).astype(jnp.int32)
    else:
        root_arg = jnp.asarray(roots, jnp.int32).reshape(B)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        # Per-packet roots ride the scalar-prefetch slot: Mosaic gives the
        # kernel the whole (B,) SMEM array, indexed by program_id (a
        # blocked (1,1) SMEM spec does not lower on TPU).
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # live_packets
            pl.BlockSpec(
                scene.node_box.shape, lambda i, r: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                scene.node_links.shape, lambda i, r: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                scene.tri_data.shape, lambda i, r: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 9, S, LANES), lambda i, r: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ]
        + (
            [
                pl.BlockSpec(
                    (1, S, LANES), lambda i, r: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ]
            * 4
            if seed is not None
            else []
        ),
        out_specs=[
            pl.BlockSpec(
                (1, S, LANES), lambda i, r: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ]
        * 4
        + [
            pl.BlockSpec(
                (1, 1, LANES), lambda i, r: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        scratch_shapes=[
            pltpu.SMEM((stack_size,), jnp.int32),
        ],
    )
    best_t, best_tri, u, v, diag = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET),
        out_shape=[
            jax.ShapeDtypeStruct((B, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, S, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(
        root_arg,
        live,
        scene.node_box,
        scene.node_links,
        scene.tri_data,
        rays9,
        *(
            (
                seed[0].reshape(B, S, LANES).astype(jnp.float32),
                seed[1].reshape(B, S, LANES).astype(jnp.int32),
                seed[2].reshape(B, S, LANES).astype(jnp.float32),
                seed[3].reshape(B, S, LANES).astype(jnp.float32),
            )
            if seed is not None
            else ()
        ),
    )
    return PTHits(
        t=best_t.reshape(B, P),
        tri=best_tri.reshape(B, P),
        u=u.reshape(B, P),
        v=v.reshape(B, P),
        overflow=diag[:, 0, 0],
        inner_visits=diag[:, 0, 1],
        leaf_tests=diag[:, 0, 2],
    )


def trace_scene(scene, rays9, *, stack_size: int, t_max: float = np.inf, interpret: bool = False, live_packets=None):
    """Dispatch a packet trace to the f32, quantized, or HBM-streamed
    kernel by scene type."""
    kwargs = dict(
        stack_size=stack_size,
        t_max=t_max,
        interpret=interpret,
        live_packets=live_packets,
    )
    if isinstance(scene, QuantizedHbmScene):
        return trace_packets_pallas_q(scene, rays9, hbm_tris=True, **kwargs)
    if isinstance(scene, QuantizedPallasScene):
        return trace_packets_pallas_q(scene, rays9, **kwargs)
    return trace_packets_pallas(scene, rays9, **kwargs)
