"""Edge-avoiding à-trous denoiser: shift correctness and end-to-end gain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minipath_tpu.render.denoise import _shifted, atrous_denoise, render_aux


class TestShifted:
    def test_translation_and_edge_clamp(self):
        img = jnp.arange(12.0).reshape(3, 4)
        s = np.asarray(_shifted(img, 1, 0))  # content moves down
        np.testing.assert_array_equal(s[1:], np.asarray(img)[:2])
        np.testing.assert_array_equal(s[0], np.asarray(img)[0])  # clamped
        s = np.asarray(_shifted(img, 0, -2))  # content moves left
        np.testing.assert_array_equal(s[:, :2], np.asarray(img)[:, 2:])
        np.testing.assert_array_equal(s[:, 2], np.asarray(img)[:, 3])

    def test_channels_preserved(self):
        img = jnp.ones((4, 4, 3))
        assert _shifted(img, 2, 2).shape == (4, 4, 3)


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def scene(self):
        from minipath_tpu.camera import Camera
        from minipath_tpu.render.wavefront import make_xla_tracer
        from minipath_tpu.scene.materials import (
            Environment,
            lambertian,
            material_table,
            metal,
        )
        from minipath_tpu.scene.procedural import (
            make_quad,
            make_uv_sphere,
            merge_meshes,
        )
        from minipath_tpu.scene.triangle_bvh import TriangleBvh

        sph = make_uv_sphere(1.0, rings=12, segments=20)
        sph.positions[:, 1] += 1.0
        floor = make_quad(30.0)
        p = floor.positions.copy()
        floor.positions = np.stack([p[:, 0], p[:, 2], p[:, 1]], axis=-1)
        mesh = merge_meshes([sph, floor])
        mats = np.concatenate([
            np.zeros(len(sph.triangles), np.int32),
            np.ones(len(floor.triangles), np.int32),
        ])
        table = material_table([
            metal((0.9, 0.7, 0.4), fuzz=0.3),
            lambertian((0.5, 0.55, 0.6)),
        ])
        obj = TriangleBvh.build(mesh, materials=mats)
        cam = Camera().look_at((0, 2.2, 6), (0, 1.0, 0)).f_number(32.0)
        sampler = cam.build_sampler((64, 64))
        tracer, tstate = make_xla_tracer(
            obj.arrays, stack_size=obj.recommended_stack_size, packet_size=256
        )
        return tracer, tstate, table, sampler, Environment.sky()

    def _frame(self, scene, spp, seed=0):
        from minipath_tpu.render.wavefront import render_frame_pt

        tracer, tstate, table, sampler, env = scene
        return np.asarray(render_frame_pt(
            tracer, tstate, table, sampler, jax.random.key(seed),
            width=64, height=64, spp=spp, bounces=3, env=env,
            px_block=(16, 16), samples_per_packet=min(8, spp),
        ))[..., :3]

    def test_denoise_reduces_error(self, scene):
        tracer, tstate, table, sampler, env = scene
        ref = self._frame(scene, 96, seed=7)
        noisy = self._frame(scene, 4, seed=0)
        n_img, z_img = render_aux(
            tracer, tstate, sampler, jax.random.key(1),
            width=64, height=64, px_block=(16, 16),
        )
        den = np.asarray(atrous_denoise(
            jnp.asarray(noisy), n_img, z_img
        ))
        assert np.isfinite(den).all()
        e_noisy = np.sqrt(np.mean((noisy - ref) ** 2))
        e_den = np.sqrt(np.mean((den - ref) ** 2))
        # The denoiser must clearly beat the raw 4-spp frame.
        assert e_den < 0.6 * e_noisy, (e_den, e_noisy)
        # Biased smoothing, but the global mean must not drift.
        np.testing.assert_allclose(den.mean(), noisy.mean(), rtol=0.05)

    def test_variance_guided(self, scene):
        # Variance guidance makes the filter SAFE at any spp: the color
        # tolerance scales with the pixel's measured noise, so converged
        # pixels approach the identity. Checks both regimes: a clear win
        # at 4 spp, and — the property the fixed-sigma filter lacks
        # (measured: it REGRESSES a 32-spp frame) — no harm at 32 spp.
        from minipath_tpu.render.wavefront import render_frame_pt

        tracer, tstate, table, sampler, env = scene
        ref = self._frame(scene, 96, seed=7)
        n_img, z_img = render_aux(
            tracer, tstate, sampler, jax.random.key(1),
            width=64, height=64, px_block=(16, 16),
        )

        def run(spp, spp_chunk):
            noisy, var = render_frame_pt(
                tracer, tstate, table, sampler, jax.random.key(0),
                width=64, height=64, spp=spp, bounces=3, env=env,
                px_block=(16, 16), samples_per_packet=spp_chunk,
                return_variance=True,
            )
            noisy, var = np.asarray(noisy)[..., :3], np.asarray(var)
            assert var.shape == (64, 64) and (var >= 0).all()
            den = np.asarray(atrous_denoise(
                jnp.asarray(noisy), n_img, z_img, jnp.asarray(var)
            ))
            e_noisy = np.sqrt(np.mean((noisy - ref) ** 2))
            e_den = np.sqrt(np.mean((den - ref) ** 2))
            return e_noisy, e_den, noisy, den

        e_noisy4, e_den4, noisy4, den4 = run(4, 4)
        assert e_den4 < 0.65 * e_noisy4, (e_den4, e_noisy4)
        np.testing.assert_allclose(den4.mean(), noisy4.mean(), rtol=0.05)
        e_noisy32, e_den32, _, _ = run(32, 8)
        assert e_den32 < e_noisy32, (e_den32, e_noisy32)

    def test_aux_buffers(self, scene):
        tracer, tstate, table, sampler, env = scene
        n_img, z_img = render_aux(
            tracer, tstate, sampler, jax.random.key(1),
            width=64, height=64, px_block=(16, 16),
        )
        assert n_img.shape == (64, 64, 3) and z_img.shape == (64, 64)
        hit = np.asarray(jnp.any(n_img != 0, axis=-1))
        assert 0.05 < hit.mean() < 1.0  # sphere + floor cover part of frame
        lens = np.linalg.norm(np.asarray(n_img)[hit], axis=-1)
        np.testing.assert_allclose(lens, 1.0, atol=1e-3)
