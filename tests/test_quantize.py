"""Quantized-geometry tests: round-trip bounds and conservative round-out
(mirrors the reference property tests, compressed_geometry.rs:190-200)."""

import numpy as np

from minipath_tpu.geometry import make_rays
from minipath_tpu.render.traversal import trace_brute_force
from minipath_tpu.scene.bvh.build import build_bvh
from minipath_tpu.scene.bvh.quantize import (
    compress_child_boxes,
    compress_normals_i8,
    compress_tri_packets,
    compress_unit,
    decompress_child_boxes,
    decompress_normals_i8,
    decompress_tri_packets,
    decompress_unit,
)
from minipath_tpu.scene.procedural import make_random_triangles, make_uv_sphere


def test_unit_roundtrip_error_bound(rng):
    x = rng.uniform(0, 1, 10000).astype(np.float32)
    u = compress_unit(x, "round")
    y = decompress_unit(u)
    # Reference bound: |error| <= 0.5/65535 (compressed_geometry.rs:190-200).
    assert np.abs(x - y).max() <= 0.5 / 65535 + 1e-9


def test_unit_rounding_modes():
    x = np.array([0.25, 0.5, 0.75], np.float32) / 65535 * 65535  # arbitrary
    lo = decompress_unit(compress_unit(x, "floor"))
    hi = decompress_unit(compress_unit(x, "ceil"))
    assert (lo <= x + 1e-9).all()
    assert (hi >= x - 1e-9).all()


def test_tri_packet_roundtrip(rng):
    mesh = make_random_triangles(500, seed=13)
    arrays = build_bvh(mesh).arrays
    qp = compress_tri_packets(arrays.tri_packets)
    out = decompress_tri_packets(qp)
    # Per-axis error bound: half a quantization step of the packet box.
    M = arrays.tri_packets.shape[0]
    step = qp.box_size / 65535.0  # (M, 3)
    err = np.abs(out - arrays.tri_packets)  # (M, 8, 3, 3)
    bound = np.broadcast_to(step[:, None, None, :] * 0.5 + 1e-6, err.shape)
    real = arrays.tri_packets.reshape(M, 8, 9).any(axis=2)  # padding excluded
    assert (err[real] <= bound[real]).all()
    # Padding lanes stay degenerate (all vertices identical).
    real = arrays.tri_packets.reshape(M, 8, 9).any(axis=2)
    pad = out[~real]
    if pad.size:
        assert (pad == pad[:, :1, :]).all()


def test_quantized_tris_hit_close_to_original(rng):
    mesh = make_uv_sphere(rings=12, segments=20)
    arrays = build_bvh(mesh).arrays
    qp = compress_tri_packets(arrays.tri_packets)
    out = decompress_tri_packets(qp)
    origin = np.tile(np.array([0, 0, -4], np.float32), (1, 128, 1))
    direction = np.array([0, 0, 1], np.float32) + 0.2 * rng.normal(size=(1, 128, 3)).astype(np.float32)
    rays = make_rays(origin, direction)
    import jax.numpy as jnp

    a = trace_brute_force(jnp.asarray(arrays.tri_packets), rays)
    b = trace_brute_force(jnp.asarray(out), rays)
    hits = np.asarray(a.tri) >= 0
    # Quantization moves hit distances by at most ~the quantization step.
    agree = (np.asarray(b.tri) >= 0) == hits
    assert agree.mean() > 0.98  # grazing rays may flip
    both = hits & (np.asarray(b.tri) >= 0)
    np.testing.assert_allclose(
        np.asarray(a.t)[both], np.asarray(b.t)[both], atol=1e-3, rtol=1e-3
    )


def test_child_boxes_round_out_conservative(rng):
    mesh = make_random_triangles(2000, seed=17)
    arrays = build_bvh(mesh).arrays
    valid = arrays.node_child_links != -8
    qb = compress_child_boxes(
        arrays.node_child_box_min, arrays.node_child_box_max, valid
    )
    lo, hi = decompress_child_boxes(qb)
    # Decompressed boxes CONTAIN the originals (floor/ceil round-out).
    assert (lo[valid] <= arrays.node_child_box_min[valid] + 1e-5).all()
    assert (hi[valid] >= arrays.node_child_box_max[valid] - 1e-5).all()
    # And are not absurdly larger than one quantization step.
    step = qb.box_size[:, None, :]
    assert (arrays.node_child_box_min[valid] - lo[valid] <= (step * (1.5 / 65535) + 1e-5).repeat(8, 1)[valid]).all()


def test_normal_compression(rng):
    n = rng.normal(size=(1000, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    q = compress_normals_i8(n)
    out = decompress_normals_i8(q)
    dots = (out * n).sum(1) / np.linalg.norm(out, axis=1)
    assert dots.min() > 0.9995  # < ~2 degrees of error


def test_bit_iter():
    from minipath_tpu.utils import bit_iter

    assert list(bit_iter(0)) == []
    assert list(bit_iter(0b1)) == [0]
    assert list(bit_iter(0b10110001)) == [0, 4, 5, 7]
    assert list(bit_iter(1 << 63)) == [63]


# ---------------------------------------------------------------------------
# Hierarchical scene quantization + the quantized Pallas kernel
# ---------------------------------------------------------------------------


def _random_scene(n=900, seed=11):
    from minipath_tpu.scene.bvh.build import build_bvh
    from minipath_tpu.scene.procedural import make_random_triangles

    return build_bvh(make_random_triangles(n, seed=seed))


def test_hierarchical_containment_invariant():
    """The f32-decompressed child boxes must contain the exact child boxes
    (building.rs:135-156 conservative chain), and decompressed vertices must
    lie inside their decompressed leaf frame."""
    from minipath_tpu.scene.bvh import links as L
    from minipath_tpu.scene.bvh.quantize import build_quantized_scene, decompress_scene

    res = _random_scene()
    arrays = res.arrays
    qs = build_quantized_scene(arrays)
    dmin, dmax, dverts, leaf_box = decompress_scene(qs)

    valid = arrays.node_child_links != L.NULL_LINK
    exact_min = arrays.node_child_box_min
    exact_max = arrays.node_child_box_max
    # containment up to a couple of f32 ulps at frame boundaries
    tol = (dmax - dmin) * 1e-5 + 1e-7
    assert (dmin[valid] <= exact_min[valid] + tol[valid]).all()
    assert (dmax[valid] >= exact_max[valid] - tol[valid]).all()

    # decompressed verts inside the leaf frame, and close to the originals
    M = dverts.shape[0]
    v = dverts.reshape(M, 24, 3)
    lb_min, lb_max = leaf_box[:, None, 0:3], leaf_box[:, None, 3:6]
    eps = (lb_max - lb_min) * 1e-5 + 1e-7
    assert (v >= lb_min - eps).all() and (v <= lb_max + eps).all()
    # Real lanes: decompressed verts within ~1 quantization step of exact.
    # Padding lanes (all-zero world verts) clamp into the frame but must
    # stay DEGENERATE (all three verts identical -> MT miss, the reference's
    # zero-lane invariant, compressed_geometry.rs:53,112).
    real = arrays.tri_packets.reshape(M, 8, 9).any(axis=2)  # (M, 8)
    step = (lb_max - lb_min) / 65535.0
    err = np.abs(v - arrays.tri_packets.reshape(M, 24, 3)).reshape(M, 8, 3, 3)
    step3 = np.broadcast_to(step, (M, 24, 3)).reshape(M, 8, 3, 3)
    assert (err[real] <= step3[real] * 1.5 + 1e-6).all()
    pad_verts = dverts[~real]  # (k, 3, 3)
    assert (pad_verts == pad_verts[:, :1]).all()


def test_quantized_kernel_matches_decompressed_oracle(rng):
    """The quantized kernel must agree exactly with brute force over the
    DECOMPRESSED triangles (same f32 decompression, same MT math)."""
    import jax.numpy as jnp

    from minipath_tpu.geometry import make_rays
    from minipath_tpu.render.pallas_kernels import (
        prepare_scene_quantized,
        rays_to_rays9,
        trace_packets_pallas_q,
    )
    from minipath_tpu.render.traversal import trace_brute_force
    from minipath_tpu.scene.bvh.quantize import build_quantized_scene, decompress_scene

    res = _random_scene(700, seed=13)
    scene = prepare_scene_quantized(res.arrays)
    _, _, dverts, _ = decompress_scene(build_quantized_scene(res.arrays))

    origin = rng.uniform(-12, 12, (3, 128, 3)).astype(np.float32)
    direction = rng.normal(size=(3, 128, 3)).astype(np.float32)
    rays = make_rays(origin, direction)
    kh = trace_packets_pallas_q(
        scene,
        rays_to_rays9(rays),
        stack_size=res.recommended_stack_size,
        interpret=True,
    )
    want = trace_brute_force(jnp.asarray(dverts), rays)
    got_tri, want_tri = np.asarray(kh.tri), np.asarray(want.tri)
    assert ((got_tri >= 0) == (want_tri >= 0)).all()
    hits = want_tri >= 0
    np.testing.assert_allclose(
        np.asarray(kh.t)[hits], np.asarray(want.t)[hits], rtol=1e-5, atol=1e-6
    )
    assert np.asarray(kh.overflow).sum() == 0


def test_quantized_kernel_parity_with_f32_kernel(rng):
    """Hit decisions and distances agree with the f32 kernel up to
    quantization tolerance; shading normals within i8 precision."""
    from minipath_tpu.geometry import make_rays
    from minipath_tpu.render.pallas_kernels import (
        prepare_scene,
        prepare_scene_quantized,
        rays_to_rays9,
        trace_packets_pallas,
        trace_packets_pallas_q,
    )
    from minipath_tpu.scene.bvh.build import build_bvh
    from minipath_tpu.scene.procedural import make_uv_sphere

    res = build_bvh(make_uv_sphere(1.0, rings=14, segments=22))
    stack = res.recommended_stack_size
    bvh = res.as_device()
    origin = np.tile(np.array([0, 0, -4], np.float32), (2, 128, 1))
    direction = np.array([0, 0, 1], np.float32) + 0.25 * rng.normal(
        size=(2, 128, 3)
    ).astype(np.float32)
    rays = make_rays(origin, direction)
    r9 = rays_to_rays9(rays)
    a = trace_packets_pallas(prepare_scene(bvh), r9, stack_size=stack, interpret=True)
    b = trace_packets_pallas_q(
        prepare_scene_quantized(res.arrays), r9, stack_size=stack, interpret=True
    )
    hit_a = np.asarray(a.tri) >= 0
    hit_b = np.asarray(b.tri) >= 0
    # Quantization may flip decisions only at silhouette-grazing rays.
    assert (hit_a == hit_b).mean() > 0.99
    both = hit_a & hit_b
    # t within quantization tolerance (leaf boxes ~0.5 units on this sphere).
    np.testing.assert_allclose(
        np.asarray(a.t)[both], np.asarray(b.t)[both], atol=2e-3, rtol=1e-3
    )
    # normals within i8 precision after interpolation/normalization
    na, nb = np.asarray(a.normal)[both], np.asarray(b.normal)[both]
    assert np.abs(na - nb).max() < 0.04
    # materials identical where both hit the same triangle
    same = both & (np.asarray(a.tri) == np.asarray(b.tri))
    np.testing.assert_array_equal(
        np.asarray(a.material)[same], np.asarray(b.material)[same]
    )


def test_quantized_scene_halves_vmem():
    from minipath_tpu.render.pallas_kernels import (
        prepare_scene,
        prepare_scene_quantized,
    )

    res = _random_scene(2000, seed=17)
    f32 = prepare_scene(res.as_device())
    q = prepare_scene_quantized(res.arrays)
    assert q.vmem_bytes() <= f32.vmem_bytes() // 2 + 128 * 4


def test_quantized_empty_scene():
    from minipath_tpu.geometry import make_rays
    from minipath_tpu.render.pallas_kernels import (
        prepare_scene_quantized,
        rays_to_rays9,
        trace_packets_pallas_q,
    )
    from minipath_tpu.scene.bvh.build import build_bvh
    from minipath_tpu.scene.obj_loader import MeshData

    scene = prepare_scene_quantized(build_bvh(MeshData()).arrays)
    rays = make_rays(
        np.zeros((1, 128, 3), np.float32), np.ones((1, 128, 3), np.float32)
    )
    kh = trace_packets_pallas_q(
        scene, rays_to_rays9(rays), stack_size=8, interpret=True
    )
    assert (np.asarray(kh.tri) == -1).all()


def test_quantized_materials_roundtrip(rng):
    from minipath_tpu.scene.bvh.build import build_bvh
    from minipath_tpu.scene.bvh.quantize import build_quantized_scene
    from minipath_tpu.scene.procedural import make_random_triangles

    mesh = make_random_triangles(300, seed=3)
    mats = rng.integers(0, 50000, mesh.triangle_count).astype(np.int32)
    res = build_bvh(mesh, materials=mats)
    qs = build_quantized_scene(res.arrays)
    M = qs.tri_q.shape[0]
    w = qs.tri_q[:, 36:40].astype(np.int64) & 0xFFFFFFFF
    got = np.zeros((M, 8), np.int64)
    got[:, 0::2] = w & 0xFFFF
    got[:, 1::2] = (w >> 16) & 0xFFFF
    np.testing.assert_array_equal(
        got.reshape(-1), np.asarray(res.arrays.tri_material, np.int64)
    )


def test_pallas_scene_auto_fallback(monkeypatch):
    """TriangleBvh.pallas_scene falls back to the quantized layout when the
    f32 layout exceeds the kernel VMEM budget."""
    import importlib

    pk = importlib.import_module("minipath_tpu.render.pallas_kernels")
    from minipath_tpu.scene.procedural import make_random_triangles
    from minipath_tpu.scene.triangle_bvh import TriangleBvh

    obj = TriangleBvh.build(make_random_triangles(2000, seed=1))
    f32_bytes = pk.prepare_scene(obj.arrays).vmem_bytes()
    obj2 = TriangleBvh.build(make_random_triangles(2000, seed=1))
    # Budget below the f32 footprint but above the quantized one.
    monkeypatch.setattr(pk, "VMEM_BUDGET", f32_bytes - 1)
    scene = obj2.pallas_scene
    assert isinstance(scene, pk.QuantizedPallasScene)
    assert scene.vmem_bytes() <= f32_bytes - 1


def test_hbm_streamed_kernel_matches_vmem_quantized(rng):
    """The HBM-streamed leaf-DMA kernel must return bit-identical results
    to the VMEM-resident quantized kernel (same decompression arithmetic,
    only the triangle rows' residence differs)."""
    import jax.numpy as jnp

    from minipath_tpu.render.pallas_kernels import (
        LEAF_DMA_ROWS,
        prepare_scene_quantized,
        trace_packets_pallas_q,
    )

    mesh = make_uv_sphere(1.0, rings=12, segments=24)
    res = build_bvh(mesh)
    q = prepare_scene_quantized(res.arrays)
    qh = prepare_scene_quantized(res.arrays, hbm_tris=True)
    assert qh.tri_q.shape[0] == q.tri_q.shape[0] + LEAF_DMA_ROWS
    assert qh.vmem_bytes() < q.vmem_bytes()

    n = 512
    o = jnp.asarray(rng.uniform(-3, 3, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    inv = jnp.where(d == 0, jnp.inf, 1.0 / d)
    r9 = jnp.concatenate([o, d, inv], -1)
    r9 = jnp.swapaxes(r9.reshape(2, 256, 9), 1, 2).reshape(2, 9, 2, 128)
    stack = res.recommended_stack_size
    a = trace_packets_pallas_q(q, r9, stack_size=stack, interpret=True)
    b = trace_packets_pallas_q(
        qh, r9, stack_size=stack, interpret=True, hbm_tris=True
    )
    assert (np.asarray(a.tri) >= 0).sum() > 0
    np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(a.normal), np.asarray(b.normal), rtol=1e-6
    )
