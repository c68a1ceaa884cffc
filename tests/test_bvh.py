"""BVH tests: link encoding round-trips, build invariants, and the key
oracle — packet traversal must find exactly the brute-force closest hit.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from minipath_tpu.geometry import make_rays
from minipath_tpu.render.traversal import (
    finalize_hits,
    intersect_bvh,
    trace_brute_force,
    trace_packets,
)
from minipath_tpu.scene.bvh import links as L
from minipath_tpu.scene.bvh.build import build_bvh
from minipath_tpu.scene.procedural import (
    make_cube,
    make_quad,
    make_random_triangles,
    make_uv_sphere,
    merge_meshes,
)
from minipath_tpu.scene.triangle_bvh import TriangleBvh


class TestLinks:
    def test_leaf_roundtrip(self, rng):
        for _ in range(200):
            index = int(rng.integers(0, L.MAX_INDEX + 1))
            count = int(rng.integers(1, L.MAX_COUNT + 1))
            link = L.new_leaf(index, count)
            assert L.is_leaf(link) and not L.is_inner(link) and not L.is_null(link)
            assert L.decode_index(link) == index
            assert L.decode_count(link) == count

    def test_inner_roundtrip(self, rng):
        for _ in range(200):
            index = int(rng.integers(0, L.MAX_INDEX + 1))
            link = L.new_inner(index)
            assert L.is_inner(link) and not L.is_leaf(link) and not L.is_null(link)
            assert L.decode_index(link) == index

    def test_null(self):
        assert L.is_null(L.NULL_LINK)
        assert not L.is_leaf(L.NULL_LINK)
        assert not L.is_inner(L.NULL_LINK)
        # NULL as int32 bit pattern matches the reference's all-ones-high.
        assert np.int32(L.NULL_LINK) == np.array(0xFFFFFFF8, np.uint32).astype(np.int32)

    def test_leaf_invalid_count(self):
        with pytest.raises(AssertionError):
            L.new_leaf(0, 0)
        with pytest.raises(AssertionError):
            L.new_leaf(0, L.MAX_COUNT + 1)
        with pytest.raises(AssertionError):
            L.new_leaf(L.MAX_INDEX + 1, 1)
        with pytest.raises(AssertionError):
            L.new_inner(L.MAX_INDEX + 1)


def _walk(arrays, link, box_min, box_max, visit_leaf, depth=0):
    """Host-side recursive walk checking structural invariants."""
    assert depth < 64
    if L.is_null(link):
        return
    idx = L.decode_index(link)
    if L.is_leaf(link):
        for p in range(idx, idx + L.decode_count(link)):
            visit_leaf(p, box_min, box_max)
        return
    cbmin = arrays.node_child_box_min[idx]
    cbmax = arrays.node_child_box_max[idx]
    clinks = arrays.node_child_links[idx]
    for c in range(8):
        if L.is_null(int(clinks[c])):
            continue
        # Child boxes nest inside the parent box.
        assert (cbmin[c] >= box_min - 1e-5).all(), (depth, c)
        assert (cbmax[c] <= box_max + 1e-5).all(), (depth, c)
        _walk(arrays, int(clinks[c]), cbmin[c], cbmax[c], visit_leaf, depth + 1)


@pytest.mark.parametrize(
    "mesh_fn",
    [
        make_quad,
        make_cube,
        lambda: make_uv_sphere(rings=8, segments=12),
        lambda: make_random_triangles(500, seed=3),
        lambda: make_random_triangles(3000, seed=4),
    ],
)
def test_build_invariants(mesh_fn):
    mesh = mesh_fn()
    result = build_bvh(mesh)
    arrays = result.arrays
    T = mesh.triangle_count

    seen = np.zeros(T, dtype=int)
    tv = mesh.positions[mesh.triangles]  # (T,3,3)

    def visit_leaf(packet, box_min, box_max):
        tris = arrays.tri_packets[packet]  # (8,3,3)
        for lane in range(8):
            t = tris[lane]
            if not t.any():  # padding
                continue
            # Triangle contained in the leaf box.
            assert (t.min(axis=0) >= box_min - 1e-5).all()
            assert (t.max(axis=0) <= box_max + 1e-5).all()
            # Find the original triangle (exact vertex match).
            match = np.all(np.abs(tv - t[None]) < 1e-6, axis=(1, 2))
            assert match.any(), "packed triangle not found in mesh"
            seen[np.argmax(match)] += 1

    _walk(arrays, int(arrays.root), arrays.bbox_min, arrays.bbox_max, visit_leaf)
    # Every triangle appears exactly once (degenerate duplicates aside).
    assert (seen >= 1).all()
    assert seen.sum() == T

    # Leaf fill fits limits.
    assert result.leaf_fill.max <= L.LEAF_NODE_MAX_TRIANGLES
    assert result.max_depth < 40


def test_empty_mesh():
    from minipath_tpu.scene.obj_loader import MeshData

    result = build_bvh(MeshData())
    assert L.is_null(int(result.arrays.root))
    rays = make_rays(np.zeros((1, 4, 3), np.float32), np.ones((1, 4, 3), np.float32))
    res = trace_packets(result.as_device(), rays, stack_size=8)
    assert (np.asarray(res.tri) == -1).all()


class TestTraversalOracle:
    """Packet traversal must agree exactly with brute force."""

    def _random_rays(self, rng, B, P, extent=12.0):
        origin = rng.uniform(-extent, extent, (B, P, 3)).astype(np.float32)
        direction = rng.normal(size=(B, P, 3)).astype(np.float32)
        return make_rays(origin, direction)

    def _check(self, mesh, rays, stack_size=64):
        bvh = build_bvh(mesh).as_device()
        got = trace_packets(bvh, rays, stack_size=stack_size)
        want = trace_brute_force(bvh.tri_packets, rays)
        got_t, want_t = np.asarray(got.t), np.asarray(want.t)
        got_tri, want_tri = np.asarray(got.tri), np.asarray(want.tri)
        hit_match = (got_tri >= 0) == (want_tri >= 0)
        assert hit_match.all(), f"{(~hit_match).sum()} hit/miss mismatches"
        hits = want_tri >= 0
        np.testing.assert_allclose(got_t[hits], want_t[hits], rtol=1e-5, atol=1e-6)
        # The same triangle (up to exact t-ties between adjacent triangles).
        tri_same = got_tri == want_tri
        with np.errstate(invalid="ignore"):
            t_tie = np.abs(got_t - want_t) <= 1e-6 + 1e-5 * np.abs(want_t)
        assert (tri_same | t_tie)[hits].all()

    def test_random_soup_random_rays(self, rng):
        mesh = make_random_triangles(2000, seed=11)
        self._check(mesh, self._random_rays(rng, 8, 64))

    def test_sphere_coherent_rays(self, rng):
        mesh = make_uv_sphere(rings=12, segments=20)
        # Coherent packet: slightly perturbed directions through the sphere.
        origin = np.tile(np.array([0, 0, -5], np.float32), (4, 128, 1))
        direction = np.array([0, 0, 1], np.float32) + 0.1 * rng.normal(
            size=(4, 128, 3)
        ).astype(np.float32)
        self._check(mesh, make_rays(origin, direction))

    def test_cube_axis_rays(self):
        mesh = make_cube(2.0)
        # Axis-aligned rays including exact edge/corner grazes.
        xs = np.linspace(-1.0, 1.0, 16, dtype=np.float32)
        ys = np.linspace(-1.0, 1.0, 16, dtype=np.float32)
        gx, gy = np.meshgrid(xs, ys)
        origin = np.stack(
            [gx.ravel(), gy.ravel(), np.full(gx.size, -5, np.float32)], axis=-1
        )[None]
        direction = np.tile(np.array([0, 0, 1], np.float32), (1, gx.size, 1))
        self._check(mesh, make_rays(origin, direction))

    def test_merged_scene(self, rng):
        mesh = merge_meshes(
            [
                make_cube(4.0, center=(0, -3, 0)),
                make_uv_sphere(1.0, center=(2, 0, 0), rings=10, segments=14),
                make_random_triangles(800, seed=5, extent=6.0),
            ]
        )
        self._check(mesh, self._random_rays(rng, 8, 64, extent=8.0))

    def test_t_max_shadow_rays(self, rng):
        mesh = make_random_triangles(1000, seed=9)
        rays = self._random_rays(rng, 4, 64)
        bvh = build_bvh(mesh).as_device()
        got = trace_packets(bvh, rays, t_max=5.0, stack_size=64)
        want = trace_brute_force(bvh.tri_packets, rays, t_max=5.0)
        assert ((np.asarray(got.tri) >= 0) == (np.asarray(want.tri) >= 0)).all()
        hits = np.asarray(want.tri) >= 0
        np.testing.assert_allclose(
            np.asarray(got.t)[hits], np.asarray(want.t)[hits], rtol=1e-5
        )


class TestFinalize:
    def test_smooth_normals_on_sphere(self, rng):
        mesh = make_uv_sphere(rings=24, segments=48)
        bvh_obj = TriangleBvh.build(mesh)
        n = 256
        direction = rng.normal(size=(1, n, 3)).astype(np.float32)
        origin = np.tile(np.array([0, 0, 0], np.float32), (1, n, 1))
        # Rays from inside the sphere: all must hit, normal ~ radial.
        rays = make_rays(origin, direction)
        hits = bvh_obj.intersect(rays)
        assert np.asarray(hits.hit).all()
        p = np.asarray(hits.point)[0]
        nrm = np.asarray(hits.normal)[0]
        radial = p / np.linalg.norm(p, axis=-1, keepdims=True)
        # Smooth-interpolated normals: close to analytic radial direction.
        dots = np.abs((nrm * radial).sum(-1))
        assert dots.min() > 0.99
        # Normals normalized.
        np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-4)

    def test_flat_normals_on_quad(self):
        mesh = make_quad(2.0)  # zero normals -> flat shading
        bvh_obj = TriangleBvh.build(mesh)
        origin = np.array([[[0.3, 0.2, -4.0]]], np.float32)
        rays = make_rays(origin, np.array([[[0.0, 0.0, 1.0]]], np.float32))
        hits = bvh_obj.intersect(rays)
        assert bool(np.asarray(hits.hit)[0, 0])
        n = np.asarray(hits.normal)[0, 0]
        assert abs(abs(n[2]) - 1.0) < 1e-5
        assert float(np.asarray(hits.t)[0, 0]) == pytest.approx(4.0, abs=1e-4)

    def test_miss_records(self):
        mesh = make_quad(1.0)
        bvh_obj = TriangleBvh.build(mesh)
        origin = np.array([[[5.0, 5.0, -4.0]]], np.float32)
        rays = make_rays(origin, np.array([[[0.0, 0.0, -1.0]]], np.float32))
        hits = bvh_obj.intersect(rays)
        assert not bool(np.asarray(hits.hit)[0, 0])
        assert np.isinf(np.asarray(hits.t)[0, 0])
