"""Spatial-split (SBVH) builder: clipped references must never change hit
results, duplicated emitters must collapse to one light, and the quantized
layout must refuse trees whose leaf boxes no longer cover their triangles.

The reference has no spatial splits (building.rs is object-split only);
this is a tree-quality extension, so the contract under test is pure
equivalence: same rays, same closest hits, on trees that merely visit
fewer nodes."""

import numpy as np
import pytest

from minipath_tpu.geometry.ray import make_rays
from minipath_tpu.render.traversal import trace_brute_force, trace_packets
from minipath_tpu.scene.bvh.build import build_bvh
from minipath_tpu.scene.obj_loader import MeshData
from minipath_tpu.scene.procedural import make_random_triangles, merge_meshes


def make_floor(half: float = 12.0, y: float = -1.0) -> MeshData:
    """Two huge floor triangles — guaranteed to straddle any split plane
    through a scene sitting on them."""
    pos = np.array(
        [
            [-half, y, -half],
            [half, y, -half],
            [half, y, half],
            [-half, y, half],
        ],
        np.float32,
    )
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return MeshData(triangles=tris, positions=pos, normals=np.zeros((4, 3), np.float32))


@pytest.fixture(scope="module")
def split_scene():
    """Random soup over a huge floor: large triangles force real spatial
    splits (duplicated references) while the soup gives hit coverage."""
    mesh = merge_meshes([make_random_triangles(1500, seed=5), make_floor()])
    res_obj = build_bvh(mesh, leaf_max=24)
    res_sp = build_bvh(mesh, leaf_max=24, spatial_splits=True)
    return mesh, res_obj, res_sp


def test_spatial_splits_duplicate_references(split_scene):
    mesh, res_obj, res_sp = split_scene
    assert int(res_obj.leaf_fill.total) == mesh.triangle_count
    # The floor MUST have been split — duplicated references exist but stay
    # within the builder's duplication budget.
    assert int(res_sp.leaf_fill.total) > mesh.triangle_count
    assert int(res_sp.leaf_fill.total) <= int(1.6 * mesh.triangle_count) + 8


def test_spatial_splits_hit_equivalence(split_scene):
    """Same rays, same closest hits (id-level vs the object tree, t-level
    vs brute force) — duplicated references are the same world triangle."""
    _, res_obj, res_sp = split_scene
    o, s = res_obj.as_device(), res_sp.as_device()
    rng = np.random.default_rng(11)
    origin = rng.uniform(-8, 8, (8, 64, 3)).astype(np.float32)
    direction = rng.normal(size=(8, 64, 3)).astype(np.float32)
    rays = make_rays(origin, direction)
    a = trace_packets(o, rays, stack_size=res_obj.recommended_stack_size)
    b = trace_packets(s, rays, stack_size=res_sp.recommended_stack_size)
    assert ((np.asarray(a.tri) >= 0) == (np.asarray(b.tri) >= 0)).all()
    hits = np.asarray(a.tri) >= 0
    np.testing.assert_allclose(
        np.asarray(a.t)[hits], np.asarray(b.t)[hits], rtol=1e-5, atol=1e-6
    )
    w = trace_brute_force(s.tri_packets, rays)
    assert ((np.asarray(b.tri) >= 0) == (np.asarray(w.tri) >= 0)).all()


def test_spatial_splits_shrink_node_area(split_scene):
    """The point of SBVH: the sum of child-box surface areas (the SAH mass
    traversal actually pays) must not grow."""
    _, res_obj, res_sp = split_scene

    def child_area(arrays):
        lo = np.asarray(arrays.node_child_box_min, np.float64)
        hi = np.asarray(arrays.node_child_box_max, np.float64)
        valid = np.asarray(arrays.node_child_links) != -8  # NULL_LINK
        s = np.maximum(hi - lo, 0.0)
        area = 2.0 * (
            s[..., 0] * (s[..., 1] + s[..., 2]) + s[..., 1] * s[..., 2]
        )
        return float(area[valid].sum())

    assert child_area(res_sp.arrays) < child_area(res_obj.arrays)


def test_quantized_layout_rejects_spatial_splits(split_scene):
    """Leaf vertices escape their clipped quantization frames; clamping
    them would corrupt geometry, so preparation must fail loudly."""
    from minipath_tpu.render.pallas_kernels import prepare_scene_quantized

    _, _, res_sp = split_scene
    with pytest.raises(ValueError, match="spatial splits"):
        prepare_scene_quantized(res_sp.arrays)


def test_light_table_dedupes_duplicate_emissive_lanes():
    """A spatially-split BVH references one emissive triangle from several
    leaves; the light table must expose ONE light per physical emitter and
    map every duplicate lane to it (else NEE samples the panel twice while
    hit_light_pdf reports a single copy's pdf — biased MIS)."""
    from minipath_tpu.scene.materials import (
        build_light_table,
        emissive,
        lambertian,
        material_table,
    )

    table = material_table([lambertian((0.5, 0.5, 0.5)), emissive((5.0, 5.0, 5.0))])
    tri = np.array(
        [[0.0, 2.0, 0.0], [1.0, 2.0, 0.0], [0.0, 2.0, 1.0]], np.float32
    )
    other = tri + np.array([3.0, 0.0, 0.0], np.float32)
    packets = np.zeros((1, 8, 3, 3), np.float32)
    packets[0, 0] = tri
    packets[0, 1] = other
    packets[0, 2] = tri  # duplicate reference of lane 0's emitter
    mats = np.zeros(8, np.int32)
    mats[:3] = 1
    lights = build_light_table(packets, mats, table)
    assert lights.v0.shape[0] == 2  # two physical emitters, not three
    tl = np.asarray(lights.tri_light)
    assert tl[0] == tl[2] != -1  # duplicates share one light id
    assert tl[1] != tl[0] and tl[1] != -1
    # pmf sums to 1 over the deduped lights.
    np.testing.assert_allclose(float(np.asarray(lights.pmf).sum()), 1.0, rtol=1e-6)
