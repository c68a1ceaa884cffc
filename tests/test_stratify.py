"""Stratified-sampling layer: tiling invariants and variance reduction.

The unbiasedness of per-pixel jittered strata rests on one property: over
a pixel's ``spp`` samples, every stratum of the partition is drawn exactly
once (``render/stratify.py``). These tests check that tiling property
directly for the 1-D and 2-D helpers, and that the integrator-level wiring
(film/BSDF/light dimensions in the wavefront path tracer) preserves the
estimator mean while reducing per-pixel variance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minipath_tpu.render.stratify import grid_factor, strat1d, strat2d


class TestGridFactor:
    def test_exact_products(self):
        for spp in (1, 2, 3, 4, 6, 8, 9, 12, 16, 17, 64, 100):
            gx, gy = grid_factor(spp)
            assert gx * gy == spp
            assert gx >= gy >= 1

    def test_square_when_possible(self):
        assert grid_factor(16) == (4, 4)
        assert grid_factor(8) == (4, 2)
        assert grid_factor(64) == (8, 8)


class TestTiling:
    @pytest.mark.parametrize("spp", [1, 4, 8, 16, 7])
    def test_strat1d_tiles_unit_interval(self, spp):
        # For ANY fixed pixel, the spp samples land in spp distinct strata
        # — the partition is exactly tiled, which is what makes the pixel
        # mean unbiased.
        pids = jnp.arange(23, dtype=jnp.int32)
        s = jnp.arange(spp, dtype=jnp.int32)
        u = jax.random.uniform(jax.random.key(0), (spp, pids.shape[0]))
        vals = strat1d(u, s[:, None], pids[None, :], spp, salt=5)
        assert float(jnp.min(vals)) >= 0.0 and float(jnp.max(vals)) < 1.0
        strata = np.asarray(jnp.floor(vals * spp).astype(jnp.int32))
        for col in strata.T:  # per pixel
            assert sorted(col.tolist()) == list(range(spp))

    @pytest.mark.parametrize("spp", [4, 8, 16, 9])
    def test_strat2d_tiles_unit_square(self, spp):
        gx, gy = grid_factor(spp)
        pids = jnp.arange(17, dtype=jnp.int32)
        s = jnp.arange(spp, dtype=jnp.int32)
        k1, k2 = jax.random.split(jax.random.key(1))
        u1 = jax.random.uniform(k1, (spp, pids.shape[0]))
        u2 = jax.random.uniform(k2, (spp, pids.shape[0]))
        v1, v2 = strat2d(u1, u2, s[:, None], pids[None, :], spp, salt=9)
        cells = np.asarray(
            jnp.floor(v1 * gx).astype(jnp.int32) * gy
            + jnp.floor(v2 * gy).astype(jnp.int32)
        )
        for col in cells.T:
            assert sorted(col.tolist()) == list(range(spp))

    def test_pairing_randomizes_with_seed(self):
        # Cross-dimension stratum pairings form a cyclic diagonal per
        # pixel; with a FIXED pairing the estimator of a non-separable
        # integrand is biased (spp=2, f=xy -> 5/16 or 3/16 vs true 4/16).
        # Mixing a per-render seed into pid (the render_seed contract)
        # must (a) change the pairing across seeds and (b) make the
        # seed-averaged estimate converge to the true mean.
        spp = 2
        pid0 = jnp.int32(12345)
        rng = np.random.default_rng(0)
        estimates = []
        for seed in range(200):
            pid = pid0 ^ jnp.int32(seed * 0x9E3779B9 & 0x7FFFFFFF)
            s = jnp.arange(spp, dtype=jnp.int32)
            u1 = jnp.asarray(rng.random(spp), jnp.float32)
            u2 = jnp.asarray(rng.random(spp), jnp.float32)
            x = strat1d(u1, s, pid, spp, salt=1)
            y = strat1d(u2, s, pid, spp, salt=2)
            estimates.append(float(jnp.mean(x * y)))
        mean = np.mean(estimates)
        # Both diagonals occur across seeds (pairing actually varies)...
        assert np.std(estimates) > 0.02
        # ...and their average is the unbiased product mean.
        np.testing.assert_allclose(mean, 0.25, atol=0.01)

    def test_shift_varies_by_pixel_and_salt(self):
        # The hashed cyclic shift must decorrelate pixels and dimensions:
        # the stratum sample 0 lands in should not be constant.
        pids = jnp.arange(256, dtype=jnp.int32)
        s0 = jnp.zeros_like(pids)
        u = jnp.full(pids.shape, 0.5)
        a = np.asarray(jnp.floor(strat1d(u, s0, pids, 8, salt=1) * 8))
        b = np.asarray(jnp.floor(strat1d(u, s0, pids, 8, salt=2) * 8))
        assert len(np.unique(a)) == 8  # every shift value occurs
        assert (a != b).mean() > 0.5  # salts decorrelate dimensions


class TestIntegratorWiring:
    @pytest.fixture(scope="class")
    def setup(self):
        from minipath_tpu.camera import Camera
        from minipath_tpu.render.wavefront import make_xla_tracer
        from minipath_tpu.scene.materials import (
            Environment,
            lambertian,
            material_table,
        )
        from minipath_tpu.scene.procedural import make_uv_sphere
        from minipath_tpu.scene.triangle_bvh import TriangleBvh

        obj = TriangleBvh.build(make_uv_sphere(1.0, rings=10, segments=16))
        table = material_table([lambertian((0.6, 0.5, 0.4))])
        env = Environment.sky()
        cam = Camera().look_at((0, 0, 4), (0, 0, 0)).f_number(32.0)
        sampler = cam.build_sampler((16, 16))
        tracer, tstate = make_xla_tracer(
            obj.arrays, stack_size=obj.recommended_stack_size, packet_size=256
        )
        return tracer, tstate, table, sampler, env

    def _render(self, setup, key, stratify, spp=16):
        from minipath_tpu.render.wavefront import render_frame_pt

        tracer, tstate, table, sampler, env = setup
        return np.asarray(
            render_frame_pt(
                tracer, tstate, table, sampler, key,
                width=16, height=16, spp=spp, bounces=3, env=env,
                px_block=(16, 16), samples_per_packet=8,
                stratify=stratify,
            )
        )[..., :3]

    def test_mean_invariant(self, setup):
        # Stratification must not move the estimator mean (same marginals,
        # only the within-pixel correlation changes).
        a = np.mean([
            self._render(setup, jax.random.key(i), False).mean()
            for i in range(4)
        ])
        b = np.mean([
            self._render(setup, jax.random.key(i), True).mean()
            for i in range(4)
        ])
        np.testing.assert_allclose(a, b, rtol=0.03)

    def test_cross_pass_window(self, setup):
        # The progressive-accumulator contract: N spp-1 passes with
        # strat_total=N and offsets 0..N-1 tile the same strata as one
        # spp=N render — the accumulated mean must agree with the
        # single-call estimator (GUI viewport wiring).
        from minipath_tpu.render.wavefront import render_frame_pt

        tracer, tstate, table, sampler, env = setup
        kw = dict(
            width=16, height=16, bounces=3, env=env,
            px_block=(16, 16), samples_per_packet=8,
        )
        one = np.mean([
            np.asarray(render_frame_pt(
                tracer, tstate, table, sampler, jax.random.key(40 + r),
                spp=8, **kw,
            ))[..., :3]
            for r in range(2)
        ], axis=0)
        kw1 = dict(kw, samples_per_packet=1)
        passes = np.mean([
            np.asarray(render_frame_pt(
                tracer, tstate, table, sampler, jax.random.key(60 + i),
                spp=1, strat_total=8, strat_offset=i % 8, **kw1,
            ))[..., :3]
            for i in range(16)
        ], axis=0)
        np.testing.assert_allclose(one.mean(), passes.mean(), rtol=0.04)

    def test_variance_reduced(self, setup):
        # Per-pixel estimator variance (measured across seeds) must drop —
        # the point of stratifying. The margin is loose; typical reduction
        # on this scene is >1.5x.
        iid = np.stack([
            self._render(setup, jax.random.key(10 + i), False)
            for i in range(6)
        ])
        st = np.stack([
            self._render(setup, jax.random.key(10 + i), True)
            for i in range(6)
        ])
        v_iid = iid.var(axis=0).mean()
        v_st = st.var(axis=0).mean()
        assert v_st < v_iid * 0.9, (v_st, v_iid)
