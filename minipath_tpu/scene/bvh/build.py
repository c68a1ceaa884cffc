"""Host-side 8-ary SAH BVH builder producing flat device arrays.

Capability counterpart of ``/root/reference/src/scene/triangle_bvh/building.rs``
(8-ary nodes, <=56-triangle leaves packed into 8-wide packets with degenerate
padding), but built the array way instead of translating the reference's
binned agglomerative merge: each inner node partitions its triangles into up
to 8 children by recursive binned-SAH binary splits (the standard "collapse a
binary BVH into a wide node" scheme), fully vectorized in NumPy.

Output is a :class:`BuildResult` whose :meth:`BuildResult.as_device` yields a
:class:`BvhArrays` pytree of flat ``jax.numpy`` tensors suited to
scalar-indexed packet traversal on TPU:

* per-node child boxes ``(N, 8, 3)`` min/max and child links ``(N, 8)``
* triangle packets ``(M, 8, 3, 3)`` world-space f32 vertices
* per-(padded)-triangle shading data + unified vertex normal/uv arrays.

Unlike the reference there is no lossy box-compression chain here — nodes
store exact f32 world-space child boxes (the 16-bit quantized storage of
``compressed_geometry.rs`` is an optional follow-up layered on this layout).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import numpy as np

from minipath_tpu.scene.bvh import links as L
from minipath_tpu.scene.obj_loader import MeshData
from minipath_tpu.utils.stats import Stats

_SAH_BINS = 16


class BvhArrays(NamedTuple):
    """Flat device-resident BVH (a jittable pytree).

    ``root`` is an encoded link scalar; see ``minipath_tpu.scene.bvh.links``.
    """

    node_child_box_min: "np.ndarray"  # (N, 8, 3) f32
    node_child_box_max: "np.ndarray"  # (N, 8, 3) f32
    node_child_links: "np.ndarray"  # (N, 8) i32
    tri_packets: "np.ndarray"  # (M, 8, 3, 3) f32, padding triangles all-zero
    tri_vidx: "np.ndarray"  # (M*8, 3) i32
    tri_flat: "np.ndarray"  # (M*8,) bool
    tri_material: "np.ndarray"  # (M*8,) i32
    vert_normal: "np.ndarray"  # (V, 3) f32
    vert_uv: "np.ndarray"  # (V, 3) f32
    root: "np.ndarray"  # () i32 encoded link
    bbox_min: "np.ndarray"  # (3,) f32
    bbox_max: "np.ndarray"  # (3,) f32


@dataclass
class BuildResult:
    """Builder output: NumPy arrays plus build statistics."""

    arrays: BvhArrays
    triangle_count: int
    vertex_count: int
    max_depth: int
    leaf_depth: Stats = field(default_factory=Stats)
    inner_fill: Stats = field(default_factory=Stats)  # children per inner node
    leaf_fill: Stats = field(default_factory=Stats)  # triangles per leaf

    @property
    def recommended_stack_size(self) -> int:
        # Provable worst case: the root contributes 1 entry and every
        # inner-node pop on the DFS path nets at most +7 (pop 1, push <= 8),
        # with at most ``max_depth`` inner levels above any leaf; leaf
        # continuations net 0 (pop 1, push 1). Bound = 7 * max_depth + 1,
        # plus 8 headroom (the kernel also guards pushes and reports
        # overflow, so an undersized stack degrades loudly, not silently).
        return 7 * self.max_depth + 9

    def as_device(self) -> BvhArrays:
        import jax.numpy as jnp

        return BvhArrays(*(jnp.asarray(a) for a in self.arrays))


def compute_tree_stats(arrays: BvhArrays):
    """Post-walk BVH health statistics from the flat arrays alone.

    Returns ``(max_depth, leaf_depth, inner_fill, leaf_fill)`` with the same
    meaning as the reference's recursive walk
    (``/root/reference/src/scene/triangle_bvh/printing.rs:11-70``): leaf
    depth distribution, children per inner node, non-padding triangles per
    leaf. Used to fill statistics for builders that don't track them inline
    (the native C++ builder).
    """
    leaf_depth, inner_fill, leaf_fill = Stats(), Stats(), Stats()
    root = int(arrays.root)
    if root == L.NULL_LINK:
        return 0, leaf_depth, inner_fill, leaf_fill

    links_arr = np.asarray(arrays.node_child_links)
    tp = np.asarray(arrays.tri_packets)
    real_lane = tp.reshape(tp.shape[0], 8, 9).any(axis=2)  # non-padding lanes
    lane_csum = np.concatenate(
        [[0], np.cumsum(real_lane.sum(axis=1, dtype=np.int64))]
    )

    max_depth = 0
    frontier = np.array([root], np.int64)  # encoded links at current depth
    depth = 0
    while frontier.size:
        counts = frontier & L.COUNT_MASK
        idxs = frontier >> L.COUNT_BITS
        is_leaf = counts != 0
        if is_leaf.any():
            first = idxs[is_leaf]
            cnt = counts[is_leaf]
            fills = lane_csum[first + cnt] - lane_csum[first]
            leaf_fill.add_samples(fills)
            leaf_depth.add_samples(np.full(first.shape, depth))
            max_depth = depth
        inner_idx = idxs[~is_leaf]
        if inner_idx.size:
            children = links_arr[inner_idx]  # (k, 8)
            valid = children != L.NULL_LINK
            inner_fill.add_samples(valid.sum(axis=1))
            frontier = children[valid].astype(np.int64)
        else:
            frontier = np.empty(0, np.int64)
        depth += 1
    return max_depth, leaf_depth, inner_fill, leaf_fill


def _surface_area(bmin: np.ndarray, bmax: np.ndarray) -> np.ndarray:
    s = np.maximum(bmax - bmin, 0.0)
    return 2.0 * (s[..., 0] * (s[..., 1] + s[..., 2]) + s[..., 1] * s[..., 2])


class _Builder:
    def __init__(self, mesh: MeshData, materials: np.ndarray, leaf_max: int = L.LEAF_NODE_MAX_TRIANGLES):
        self.mesh = mesh
        self.materials = materials
        assert 1 <= leaf_max <= L.LEAF_NODE_MAX_TRIANGLES
        self.leaf_max = leaf_max
        tv = mesh.positions[mesh.triangles].astype(np.float32)  # (T,3,3)
        self.tri_verts = tv
        self.tri_min = tv.min(axis=1)
        self.tri_max = tv.max(axis=1)
        self.centroids = tv.mean(axis=1)

        self.node_box_min: list = []
        self.node_box_max: list = []
        self.node_links: list = []
        self.packet_tris: list = []  # (8,3,3) arrays
        self.packet_vidx: list = []  # (8,3) arrays
        self.packet_flat: list = []  # (8,) arrays
        self.packet_material: list = []  # (8,) arrays

        self.max_depth = 0
        self.leaf_depth = Stats()
        self.inner_fill = Stats()
        self.leaf_fill = Stats()

    # -- leaves ---------------------------------------------------------------

    def build_leaf(self, idx: np.ndarray, depth: int) -> int:
        n = len(idx)
        assert 1 <= n <= self.leaf_max
        packet_count = -(-n // L.LEAF_NODE_PACKET_SIZE)
        first = len(self.packet_tris)

        verts = np.zeros((packet_count * 8, 3, 3), np.float32)
        verts[:n] = self.tri_verts[idx]
        vidx = np.zeros((packet_count * 8, 3), np.int32)
        vidx[:n] = self.mesh.triangles[idx]
        flat = np.zeros(packet_count * 8, bool)
        if self.mesh.normals.size:
            norms = self.mesh.normals[self.mesh.triangles[idx]]  # (n,3,3)
            flat[:n] = (np.sum(norms * norms, axis=-1) == 0.0).any(axis=-1)
        else:
            flat[:n] = True
        mat = np.zeros(packet_count * 8, np.int32)
        mat[:n] = self.materials[idx]

        for p in range(packet_count):
            s = slice(p * 8, (p + 1) * 8)
            self.packet_tris.append(verts[s])
            self.packet_vidx.append(vidx[s])
            self.packet_flat.append(flat[s])
            self.packet_material.append(mat[s])

        self.max_depth = max(self.max_depth, depth)
        self.leaf_depth.add_sample(depth)
        self.leaf_fill.add_sample(n)
        return L.new_leaf(first, packet_count)

    # -- splitting --------------------------------------------------------------

    def _binary_split(self, idx: np.ndarray):
        """Binned-SAH binary split; None if all centroids coincide."""
        c = self.centroids[idx]
        cmin, cmax = c.min(axis=0), c.max(axis=0)
        extent = cmax - cmin
        if not np.any(extent > 0):
            return None

        best = None  # (cost, axis, bins, split_bin)
        for axis in range(3):
            if extent[axis] <= 0:
                continue
            scale = _SAH_BINS / extent[axis]
            b = np.minimum(
                ((c[:, axis] - cmin[axis]) * scale).astype(np.int64), _SAH_BINS - 1
            )
            counts = np.bincount(b, minlength=_SAH_BINS)
            bmin = np.full((_SAH_BINS, 3), np.inf, np.float32)
            bmax = np.full((_SAH_BINS, 3), -np.inf, np.float32)
            np.minimum.at(bmin, b, self.tri_min[idx])
            np.maximum.at(bmax, b, self.tri_max[idx])

            # Prefix/suffix sweeps.
            pmin = np.minimum.accumulate(bmin, axis=0)
            pmax = np.maximum.accumulate(bmax, axis=0)
            smin = np.minimum.accumulate(bmin[::-1], axis=0)[::-1]
            smax = np.maximum.accumulate(bmax[::-1], axis=0)[::-1]
            pcnt = np.cumsum(counts)
            scnt = np.cumsum(counts[::-1])[::-1]

            # Split after bin i (left = bins 0..i, right = bins i+1..).
            left_sa = _surface_area(pmin[:-1], pmax[:-1])
            right_sa = _surface_area(smin[1:], smax[1:])
            cost = np.where(
                (pcnt[:-1] > 0) & (scnt[1:] > 0),
                left_sa * pcnt[:-1] + right_sa * scnt[1:],
                np.inf,
            )
            i = int(np.argmin(cost))
            if np.isfinite(cost[i]) and (best is None or cost[i] < best[0]):
                best = (float(cost[i]), axis, b, i)

        if best is None:
            return None
        _, _, b, i = best
        mask = b <= i
        return idx[mask], idx[~mask]

    def _split8(self, idx: np.ndarray) -> list:
        """Partition into 2..8 child groups."""
        groups = [idx]
        unsplittable: set = set()
        while len(groups) < L.INNER_NODE_CHILDREN:
            # Mandatory: groups over the leaf limit. Otherwise, prefer the
            # costliest (area x count) group with more than one packet.
            cand, cand_priority = None, -np.inf
            for gi, g in enumerate(groups):
                if gi in unsplittable or len(g) <= L.LEAF_NODE_PACKET_SIZE:
                    continue
                bmin = self.tri_min[g].min(axis=0)
                bmax = self.tri_max[g].max(axis=0)
                pri = _surface_area(bmin, bmax) * len(g)
                if len(g) > self.leaf_max:
                    pri += np.inf
                if pri > cand_priority:
                    cand, cand_priority = gi, pri
            if cand is None:
                break
            split = self._binary_split(groups[cand])
            if split is None:
                unsplittable.add(cand)
                continue
            left, right = split
            groups[cand] = left
            groups.append(right)

        if len(groups) == 1:
            # All centroids coincide but the group exceeds the leaf limit:
            # round-robin into 8 (terminates since each part shrinks 8x).
            groups = [idx[k :: L.INNER_NODE_CHILDREN] for k in range(L.INNER_NODE_CHILDREN)]
            groups = [g for g in groups if len(g)]
        return groups

    # -- nodes ---------------------------------------------------------------

    def build_recursive(self, idx: np.ndarray, depth: int) -> int:
        if len(idx) <= self.leaf_max:
            return self.build_leaf(idx, depth)

        groups = self._split8(idx)
        node_id = len(self.node_links)
        self.node_box_min.append(np.zeros((8, 3), np.float32))
        self.node_box_max.append(np.zeros((8, 3), np.float32))
        self.node_links.append(np.full(8, L.NULL_LINK, np.int32))

        for i, g in enumerate(groups):
            self.node_box_min[node_id][i] = self.tri_min[g].min(axis=0)
            self.node_box_max[node_id][i] = self.tri_max[g].max(axis=0)
            link = self.build_recursive(g, depth + 1)
            self.node_links[node_id][i] = link

        self.inner_fill.add_sample(len(groups))
        return L.new_inner(node_id)


def build_bvh(
    mesh: MeshData,
    materials: np.ndarray | None = None,
    leaf_max: int = L.LEAF_NODE_MAX_TRIANGLES,
) -> BuildResult:
    """Build the BVH over a mesh. ``materials`` is optional per-triangle
    int32 material ids (defaults to 0, matching ``building.rs:201``);
    ``leaf_max`` tunes the leaf size (<= 56)."""
    T = mesh.triangle_count
    if materials is None:
        materials = np.zeros(T, np.int32)
    materials = np.asarray(materials, np.int32)
    assert materials.shape == (T,)

    import sys

    builder = _Builder(mesh, materials, leaf_max=leaf_max)
    if T:
        used = mesh.positions[np.unique(mesh.triangles)]
        bbox_min = used.min(axis=0).astype(np.float32)
        bbox_max = used.max(axis=0).astype(np.float32)
        sys.setrecursionlimit(max(sys.getrecursionlimit(), 10000))
        root = builder.build_recursive(np.arange(T, dtype=np.int64), depth=0)
    else:
        bbox_min = np.zeros(3, np.float32)
        bbox_max = np.zeros(3, np.float32)
        root = L.NULL_LINK

    # Never leave zero-size arrays: keep one dummy element so device gathers
    # (which are clamped/masked anyway) stay in bounds.
    def _stack(items, dummy):
        return np.stack(items) if items else dummy[None]

    node_box_min = _stack(builder.node_box_min, np.zeros((8, 3), np.float32))
    node_box_max = _stack(builder.node_box_max, np.zeros((8, 3), np.float32))
    node_links = _stack(builder.node_links, np.full(8, L.NULL_LINK, np.int32))
    tri_packets = _stack(builder.packet_tris, np.zeros((8, 3, 3), np.float32))
    tri_vidx = _stack(builder.packet_vidx, np.zeros((8, 3), np.int32)).reshape(-1, 3)
    tri_flat = _stack(builder.packet_flat, np.zeros(8, bool)).reshape(-1)
    tri_material = _stack(builder.packet_material, np.zeros(8, np.int32)).reshape(-1)

    vert_normal = (
        mesh.normals.astype(np.float32)
        if mesh.normals.size
        else np.zeros((1, 3), np.float32)
    )
    vert_uv = (
        mesh.texcoords.astype(np.float32)
        if mesh.texcoords.size
        else np.zeros((1, 3), np.float32)
    )

    arrays = BvhArrays(
        node_child_box_min=node_box_min,
        node_child_box_max=node_box_max,
        node_child_links=node_links,
        tri_packets=tri_packets,
        tri_vidx=tri_vidx,
        tri_flat=tri_flat,
        tri_material=tri_material,
        vert_normal=vert_normal,
        vert_uv=vert_uv,
        root=np.int32(root),
        bbox_min=bbox_min,
        bbox_max=bbox_max,
    )
    return BuildResult(
        arrays=arrays,
        triangle_count=T,
        vertex_count=mesh.vertex_count,
        max_depth=builder.max_depth,
        leaf_depth=builder.leaf_depth,
        inner_fill=builder.inner_fill,
        leaf_fill=builder.leaf_fill,
    )
