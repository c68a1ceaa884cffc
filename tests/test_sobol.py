"""Owen-scrambled Sobol sampling layer (render/stratify.py, spp < 0 mode).

The correctness anchors, mirroring the reference's property-test style for
its sampling code (``/root/reference/src/camera.rs:200-226`` semantic
oracles):

* net structure — the first 2^m scrambled Sobol points must keep the
  (0, m)-net property (every dyadic elementary interval holds exactly one
  point); hash-based Owen scrambling only permutes WITHIN the nesting, so
  a failure here means broken direction numbers or a non-nested hash;
* exact-uniform marginals over pixel ids (the unbiasedness input);
* decorrelation across pixels and dimension salts;
* integrator wiring — `render_frame_pt(sobol=True)` keeps the estimator
  mean and does not increase variance vs iid.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minipath_tpu.render.stratify import sobol1d, sobol2d, strat1d, strat2d


class TestNetStructure:
    @pytest.mark.parametrize("spp", [4, 8, 16, 64])
    def test_dim0_tiles_dyadic_strata(self, spp):
        # For any fixed pixel/salt, the first spp samples land in spp
        # DISTINCT dyadic strata — stratification comes for free with the
        # radical inverse and survives a (correct) Owen scramble.
        s = jnp.arange(spp, dtype=jnp.int32)
        for pid in (0, 7, 123456):
            v = np.asarray(sobol1d(s, jnp.full((spp,), pid, jnp.int32), 3))
            assert v.min() >= 0.0 and v.max() < 1.0
            assert sorted(np.floor(v * spp).astype(int)) == list(range(spp))

    @pytest.mark.parametrize("spp", [4, 16, 64])
    def test_pair_is_0m_net(self, spp):
        # The 2-D pair of the first 2^m points is a (0, m)-net in base 2:
        # the square grid with spp cells holds exactly one point per cell,
        # and so does EVERY dyadic rectangle of area 1/spp.
        m = int(np.log2(spp))
        s = jnp.arange(spp, dtype=jnp.int32)
        pid = jnp.full((spp,), 42, jnp.int32)
        x, y = (np.asarray(a) for a in sobol2d(s, pid, 5))
        for kx in range(m + 1):
            ky = m - kx
            cells = (np.floor(x * (1 << kx)).astype(int) << ky) + np.floor(
                y * (1 << ky)
            ).astype(int)
            assert sorted(cells) == list(range(spp)), (kx, ky)

    def test_deterministic(self):
        s = jnp.arange(16, dtype=jnp.int32)
        pid = jnp.full((16,), 9, jnp.int32)
        a = np.asarray(sobol1d(s, pid, 2))
        b = np.asarray(sobol1d(s, pid, 2))
        np.testing.assert_array_equal(a, b)


class TestScrambleStatistics:
    def test_marginal_uniform_over_pixels(self):
        # Fixed sample index, many pixels: the scrambled value's histogram
        # must be flat (each sample is marginally uniform — the
        # unbiasedness requirement).
        pids = jnp.arange(4096, dtype=jnp.int32)
        s0 = jnp.zeros_like(pids)
        v = np.asarray(sobol1d(s0, pids, 1))
        hist, _ = np.histogram(v, bins=16, range=(0.0, 1.0))
        # 4096 draws over 16 bins: expect 256 +- ~16; allow 5 sigma.
        assert hist.min() > 256 - 80 and hist.max() < 256 + 80, hist

    def test_pixels_and_salts_decorrelate(self):
        s = jnp.zeros((256,), jnp.int32)
        pids = jnp.arange(256, dtype=jnp.int32)
        a = np.asarray(sobol1d(s, pids, 1))
        b = np.asarray(sobol1d(s, pids, 2))
        assert len(np.unique(np.floor(a * 16))) == 16
        assert (np.floor(a * 16) != np.floor(b * 16)).mean() > 0.5

    def test_negative_spp_dispatch(self):
        # strat1d/strat2d with spp < 0 must route to the Sobol path and
        # ignore the incoming uniforms.
        spp = 16
        s = jnp.arange(spp, dtype=jnp.int32)
        pid = jnp.full((spp,), 3, jnp.int32)
        u = jnp.full((spp,), 0.123, jnp.float32)
        v = np.asarray(strat1d(u, s, pid, -spp, salt=4))
        np.testing.assert_array_equal(v, np.asarray(sobol1d(s, pid, 4)))
        x, y = strat2d(u, u, s, pid, -spp, salt=6)
        xx, yy = sobol2d(s, pid, 6)
        np.testing.assert_array_equal(np.asarray(x), np.asarray(xx))
        np.testing.assert_array_equal(np.asarray(y), np.asarray(yy))


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

    def _render(self, setup, key, *, stratify=True, sobol=False, spp=16):
        from minipath_tpu.render.wavefront import render_frame_pt

        tracer, tstate, table, sampler, env = setup
        return np.asarray(
            render_frame_pt(
                tracer, tstate, table, sampler, key,
                width=16, height=16, spp=spp, bounces=3, env=env,
                px_block=(16, 16), samples_per_packet=8,
                stratify=stratify, sobol=sobol,
            )
        )[..., :3]

    def test_mean_invariant(self, setup):
        iid = np.mean([
            self._render(setup, jax.random.key(i), stratify=False).mean()
            for i in range(4)
        ])
        sob = np.mean([
            self._render(setup, jax.random.key(i), sobol=True).mean()
            for i in range(4)
        ])
        np.testing.assert_allclose(iid, sob, rtol=0.03)

    def test_variance_not_worse_than_iid(self, setup):
        iid = np.stack([
            self._render(setup, jax.random.key(10 + i), stratify=False)
            for i in range(6)
        ])
        sob = np.stack([
            self._render(setup, jax.random.key(10 + i), sobol=True)
            for i in range(6)
        ])
        assert sob.var(axis=0).mean() < iid.var(axis=0).mean() * 0.9

    def test_requires_stratify(self, setup):
        with pytest.raises(ValueError, match="sobol"):
            self._render(setup, jax.random.key(0), stratify=False, sobol=True)
