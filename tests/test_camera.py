"""Camera tests: semantic oracles from the reference
(``/root/reference/src/camera.rs:200-247``) plus thin-lens focus behavior.
"""

import numpy as np
import jax
import pytest

from minipath_tpu.camera import Camera, sample_rays


def _ray_dir(sampler, pixel, key_int=0):
    rays = sample_rays(sampler, np.array([pixel], np.float32), jax.random.key(key_int))
    return np.asarray(rays.direction)[0]


class TestCameraFrame:
    def test_left_right_up_down(self):
        # X right, Y away (forward), Z up — matches camera.rs:200-226.
        sampler = (
            Camera()
            .look_direction((0, 0, 0), (0, 1, 0), (0, 0, 1))
            .focus_distance(2.0)
            .build_sampler((800, 600))
        )
        center = _ray_dir(sampler, (400, 300))
        left = _ray_dir(sampler, (0, 300))
        right = _ray_dir(sampler, (799, 300))
        up = _ray_dir(sampler, (400, 0))
        down = _ray_dir(sampler, (400, 599))
        assert abs(center[0]) < 1e-2
        assert abs(center[2]) < 1e-2
        assert left[0] < center[0]
        assert right[0] > center[0]
        assert up[2] > center[2]
        assert down[2] < center[2]

    def test_relative_translation(self):
        camera = Camera().look_direction((0, 0, 0), (0, 1, 0), (0, 0, 1)).focus_distance(2.0)
        m = np.eye(4)
        m[:3, 3] = [1.0, 2.0, 3.0]
        translated = camera.transformed(m)
        center, _, _, _ = translated.center_forward_up_right()
        np.testing.assert_allclose(center, [1, 2, 3], atol=1e-6)

    def test_look_at_sets_focus(self):
        camera = Camera().look_at((0, 2, 10), (0, 1.5, 0))
        assert camera.focus_distance_m == pytest.approx(np.sqrt(0.25 + 100.0))
        _, forward, _, _ = camera.center_forward_up_right()
        expected = np.array([0, -0.5, -10.0])
        np.testing.assert_allclose(forward, expected / np.linalg.norm(expected), atol=1e-6)

    def test_default_camera(self):
        cam = Camera()
        assert cam.focus_distance_m == np.inf
        assert cam.sensor_size == ("height", 24e-3)
        assert cam.focal_length == 50e-3
        assert cam.f_number_value == 9.0
        sampler = cam.build_sampler((100, 100))
        # Focus at infinity => lens_weight == 0 (no depth of field shift).
        assert float(sampler.lens_weight) == 0.0
        assert float(sampler.lens_radius) == pytest.approx(50e-3 / 18.0)

    def test_builders_are_immutable(self):
        a = Camera()
        b = a.f_number(4.8)
        assert a.f_number_value == 9.0 and b.f_number_value == 4.8
        c = b.sensor_width(36e-3)
        assert c.sensor_size == ("width", 36e-3)


class TestThinLens:
    def test_rays_converge_at_focus_plane(self):
        # All rays through one pixel meet (approximately) at the focus plane.
        cam = (
            Camera()
            .look_direction((0, 0, 0), (0, 0, -1), (0, 1, 0))
            .focus_distance(5.0)
            .f_number(1.4)  # big aperture: strong DOF
        )
        sampler = cam.build_sampler((101, 101))
        keys = jax.random.split(jax.random.key(1), 64)
        pts = []
        for k in keys:
            rays = sample_rays(sampler, np.array([[50.0, 50.0]], np.float32), k)
            o = np.asarray(rays.origin)[0]
            d = np.asarray(rays.direction)[0]
            # Intersect with plane z = -5.
            t = (-5.0 - o[2]) / d[2]
            pts.append(o + t * d)
        pts = np.stack(pts)
        spread = pts.std(axis=0)
        # Sub-pixel spread at the focus plane (pixel jitter only).
        pixel_world = float(sampler.pixel_scale) * 5.0 / 50e-3
        assert spread[0] < pixel_world
        assert spread[1] < pixel_world

    def test_lens_origin_spread_matches_aperture(self):
        cam = Camera().look_direction((0, 0, 0), (0, 0, -1), (0, 1, 0)).f_number(2.0).focus_distance(3.0)
        sampler = cam.build_sampler((64, 64))
        keys = jax.random.split(jax.random.key(2), 256)
        origins = np.stack(
            [
                np.asarray(
                    sample_rays(sampler, np.array([[32.0, 32.0]], np.float32), k).origin
                )[0]
                for k in keys
            ]
        )
        radius = np.linalg.norm(origins[:, :2], axis=1)
        lens_radius = 50e-3 / 4.0
        assert radius.max() <= lens_radius + 1e-6
        assert radius.max() > 0.8 * lens_radius  # actually fills the disc

    def test_reproducible(self):
        sampler = Camera().look_direction((0, 0, 0), (0, 0, -1), (0, 1, 0)).build_sampler((8, 8))
        key = jax.random.key(42)
        pix = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
        a = sample_rays(sampler, pix, key)
        b = sample_rays(sampler, pix, key)
        np.testing.assert_array_equal(np.asarray(a.origin), np.asarray(b.origin))
        np.testing.assert_array_equal(np.asarray(a.direction), np.asarray(b.direction))
