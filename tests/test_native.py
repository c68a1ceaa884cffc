"""Native (C++) loader/builder parity tests against the Python reference."""

import numpy as np
import pytest

from minipath_tpu.geometry import make_rays
from minipath_tpu.render.traversal import trace_brute_force, trace_packets
from minipath_tpu.scene.bvh import native
from minipath_tpu.scene.bvh.build import build_bvh
from minipath_tpu.scene.obj_loader import load_obj
from minipath_tpu.scene.procedural import make_random_triangles, make_uv_sphere

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native toolchain unavailable"
)


def test_obj_loader_parity(tmp_path):
    text = (
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vn 0 0 1\nvn 0 0 -1\n"
        "vt 0.5 0.25\n"
        "f 1/1/1 2/1/1 3/1/1\n"
        "f 2/1/1 4/1/2 3/1/1\n"
        "f 1 2 4 3\n"  # quad, fan-triangulated, no vt/vn
    )
    p = tmp_path / "m.obj"
    p.write_text(text)
    a = load_obj(p)
    b = native.load_obj_native(p)
    assert a.triangle_count == b.triangle_count
    assert a.vertex_count == b.vertex_count
    np.testing.assert_array_equal(a.triangles, b.triangles)
    np.testing.assert_allclose(a.positions, b.positions, atol=1e-7)
    np.testing.assert_allclose(a.normals, b.normals, atol=1e-6)
    np.testing.assert_allclose(a.texcoords, b.texcoords, atol=1e-7)


def test_obj_loader_teapot_parity():
    import os

    path = "/root/reference/data/teapot.obj"
    if not os.path.exists(path):
        pytest.skip("teapot not available")
    a = load_obj(path)
    b = native.load_obj_native(path)
    assert a.triangle_count == b.triangle_count == 2256
    np.testing.assert_array_equal(a.triangles, b.triangles)
    np.testing.assert_allclose(a.positions, b.positions, atol=1e-6)
    np.testing.assert_allclose(a.normals, b.normals, atol=1e-6)


def test_native_build_traversal_oracle(rng):
    mesh = make_random_triangles(1500, seed=77)
    res = native.build_bvh_native(mesh)
    bvh = res.as_device()
    origin = rng.uniform(-12, 12, (4, 64, 3)).astype(np.float32)
    direction = rng.normal(size=(4, 64, 3)).astype(np.float32)
    rays = make_rays(origin, direction)
    got = trace_packets(bvh, rays, stack_size=res.recommended_stack_size)
    want = trace_brute_force(bvh.tri_packets, rays)
    assert ((np.asarray(got.tri) >= 0) == (np.asarray(want.tri) >= 0)).all()
    hits = np.asarray(want.tri) >= 0
    np.testing.assert_allclose(
        np.asarray(got.t)[hits], np.asarray(want.t)[hits], rtol=1e-5, atol=1e-6
    )


def test_native_matches_python_hits(rng):
    """Trees may differ structurally; closest-hit results must agree."""
    mesh = make_uv_sphere(rings=14, segments=22)
    res_c = native.build_bvh_native(mesh)
    res_py = build_bvh(mesh)
    bvh_c, bvh_py = res_c.as_device(), res_py.as_device()
    origin = rng.uniform(-3, 3, (4, 64, 3)).astype(np.float32)
    direction = rng.normal(size=(4, 64, 3)).astype(np.float32)
    rays = make_rays(origin, direction)
    a = trace_packets(bvh_c, rays, stack_size=res_c.recommended_stack_size)
    b = trace_packets(bvh_py, rays, stack_size=res_py.recommended_stack_size)
    assert ((np.asarray(a.tri) >= 0) == (np.asarray(b.tri) >= 0)).all()
    hits = np.asarray(b.tri) >= 0
    np.testing.assert_allclose(
        np.asarray(a.t)[hits], np.asarray(b.t)[hits], rtol=1e-5, atol=1e-6
    )


def test_native_shading_data(rng):
    mesh = make_uv_sphere(rings=10, segments=16)
    res = native.build_bvh_native(mesh)
    arrays = res.arrays
    # Flat flags: smooth sphere -> all real triangles smooth; padding zeros.
    M = arrays.tri_packets.shape[0]
    real = arrays.tri_packets.reshape(M * 8, 9).any(axis=1)
    assert not arrays.tri_flat[real].any()
    # vidx within range.
    assert arrays.tri_vidx.max() < mesh.vertex_count


def test_native_statistics_populated(rng):
    """Native builds must report real tree health stats (printing.rs:11-70
    parity), recovered by post-walking the arrays."""
    mesh = make_random_triangles(800, seed=42)
    res = native.build_bvh_native(mesh)
    assert res.leaf_fill.count > 0
    assert int(res.leaf_fill.total) == mesh.triangle_count
    assert res.leaf_depth.count == res.leaf_fill.count
    assert int(res.leaf_depth.max) == res.max_depth
    assert res.inner_fill.count > 0
    assert 1 <= res.inner_fill.min and res.inner_fill.max <= 8


def test_tree_stats_match_python_builder(rng):
    """compute_tree_stats post-walk agrees with the Python builder's
    inline-tracked statistics."""
    from minipath_tpu.scene.bvh.build import compute_tree_stats

    mesh = make_random_triangles(1000, seed=43)
    res = build_bvh(mesh)
    depth, leaf_depth, inner_fill, leaf_fill = compute_tree_stats(res.arrays)
    assert depth == res.max_depth
    for got, want in [
        (leaf_depth, res.leaf_depth),
        (inner_fill, res.inner_fill),
        (leaf_fill, res.leaf_fill),
    ]:
        assert got.count == want.count
        assert got.min == want.min
        assert got.max == want.max
        assert got.total == want.total
