"""Sharded rendering tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from minipath_tpu.camera import Camera
from minipath_tpu.parallel.mesh import (
    frame_pixel_packets,
    make_device_mesh,
    render_frame_sum,
    render_frame_sum_sharded,
    unpack_frame,
)
from minipath_tpu.scene.procedural import make_uv_sphere
from minipath_tpu.scene.triangle_bvh import TriangleBvh


@pytest.fixture(scope="module")
def scene():
    obj = TriangleBvh.build(make_uv_sphere(1.0, rings=16, segments=32))
    camera = Camera().look_at((0, 0, 4), (0, 0, 0)).f_number(16.0)
    return obj, camera


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_frame_packets_roundtrip():
    w, h = 100, 70  # not packet-aligned
    pixels, counts = frame_pixel_packets(w, h)
    pix = np.asarray(pixels)
    # Each on-screen pixel appears exactly once after unpack.
    vals = np.concatenate([pix, np.zeros(pix.shape[:-1] + (2,), np.float32)], -1)
    img = np.asarray(unpack_frame(vals, w, h, counts))
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    np.testing.assert_array_equal(img[..., 0], gx)
    np.testing.assert_array_equal(img[..., 1], gy)


def test_padding_to_device_count():
    pixels, _ = frame_pixel_packets(100, 70, pad_packets_to=8)
    assert pixels.shape[0] % 8 == 0


def test_sharded_matches_single_device(scene):
    obj, camera = scene
    w = h = 64
    spp = 4
    sampler = camera.build_sampler((w, h))
    key = jax.random.key(7)
    stack = obj.recommended_stack_size

    single = np.asarray(
        render_frame_sum(
            obj.arrays, sampler, key, width=w, height=h, spp=spp, stack_size=stack
        )
    )
    mesh = make_device_mesh(8)
    sharded = np.asarray(
        render_frame_sum_sharded(
            obj.arrays, sampler, key, mesh,
            width=w, height=h, spp=spp, stack_size=stack,
        )
    )
    assert sharded.shape == single.shape
    # Different RNG fold per shard => compare Monte Carlo means, and hit
    # coverage must agree except at silhouette pixels.
    assert abs(single[..., 3].mean() - sharded[..., 3].mean()) < 0.05 * spp
    solid = (single[..., 3] == spp) & (sharded[..., 3] == spp)
    assert solid.mean() > 0.2
    np.testing.assert_allclose(
        single[..., 0][solid], sharded[..., 0][solid], rtol=0.15, atol=0.05 * spp
    )


def test_graft_entry_single_chip():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert np.isfinite(np.asarray(out)).all()


def test_graft_entry_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
