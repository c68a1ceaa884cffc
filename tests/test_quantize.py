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
