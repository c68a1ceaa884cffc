"""Geometry kernel tests: slab test and Möller–Trumbore.

Port of the reference test strategy (SURVEY.md §4): randomized geometric
postconditions for the intersection kernels plus named edge cases
(axis-parallel rays, degenerate slabs, grazing corners), checked against
scalar NumPy oracles.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from minipath_tpu.geometry import make_rays, moller_trumbore, slab_test
from minipath_tpu.geometry.ray import advance_by, point_at


def np_ray(origin, direction):
    return make_rays(np.asarray(origin, np.float32), np.asarray(direction, np.float32))


class TestRay:
    def test_direction_normalized(self):
        r = np_ray([0, 0, 0], [3, 4, 0])
        np.testing.assert_allclose(np.asarray(r.direction), [0.6, 0.8, 0.0], atol=1e-6)

    def test_inv_direction_zero_becomes_inf(self):
        r = np_ray([0, 0, 0], [1, 0, -0.0])
        inv = np.asarray(r.inv_direction)
        assert inv[0] == 1.0
        assert inv[1] == np.inf and inv[2] == np.inf

    def test_point_at_and_advance(self):
        r = np_ray([1, 2, 3], [0, 0, 2])
        np.testing.assert_allclose(np.asarray(point_at(r, 5.0)), [1, 2, 8], atol=1e-6)
        r2 = advance_by(r, 2.0)
        np.testing.assert_allclose(np.asarray(r2.origin), [1, 2, 5], atol=1e-6)


class TestSlab:
    def box(self):
        return jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0])

    def hit(self, origin, direction, t_clip=jnp.inf):
        bmin, bmax = self.box()
        r = np_ray(origin, direction)
        t1, t2 = slab_test(bmin, bmax, r.origin, r.inv_direction, t_clip)
        return float(t1), float(t2)

    def test_head_on_hit(self):
        t1, t2 = self.hit([0, 0, -5], [0, 0, 1])
        assert t1 == pytest.approx(4.0, abs=1e-5)
        assert t2 == pytest.approx(6.0, abs=1e-5)

    def test_miss(self):
        t1, t2 = self.hit([0, 5, -5], [0, 0, 1])
        assert t1 > t2

    def test_origin_inside(self):
        t1, t2 = self.hit([0, 0, 0], [0, 0, 1])
        assert t1 == 0.0
        assert t2 == pytest.approx(1.0, abs=1e-5)

    def test_behind_ray(self):
        t1, t2 = self.hit([0, 0, 5], [0, 0, 1])
        assert t1 > t2  # box fully behind: t2 negative < t1 clamped to 0

    def test_axis_parallel_on_boundary(self):
        # Ray sliding exactly on the x=-1 face plane: NaN-safe slab handling.
        t1, t2 = self.hit([-1, 0, -5], [0, 0, 1])
        assert t1 <= t2  # grazing counts as hit like the reference NaN rule

    def test_axis_parallel_outside(self):
        t1, t2 = self.hit([-2, 0, -5], [0, 0, 1])
        assert t1 > t2

    def test_max_t_clips(self):
        t1, t2 = self.hit([0, 0, -5], [0, 0, 1], t_clip=2.0)
        assert t1 > t2  # entry at 4 > clip 2

    def test_degenerate_box_on_ray(self):
        # Zero-thickness box through which the ray passes.
        bmin = jnp.array([0.0, -1.0, -1.0])
        bmax = jnp.array([0.0, 1.0, 1.0])
        r = np_ray([0.0, 0.0, -5.0], [0, 0, 1])
        t1, t2 = slab_test(bmin, bmax, r.origin, r.inv_direction, jnp.inf)
        # origin.x == 0 == slab: 0 * inf -> NaN -> (-inf, +inf): hit.
        assert float(t1) <= float(t2)

    def test_random_postconditions(self, rng):
        # If t1 <= t2, the entry point lies on the box surface (or origin is
        # inside); mirrors the reference's matrix test postconditions
        # (aabb.rs:374-411).
        n = 2000
        bmin_np = rng.uniform(-2, 0, (n, 3)).astype(np.float32)
        bmax_np = bmin_np + rng.uniform(0.1, 2, (n, 3)).astype(np.float32)
        origin = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
        direction = rng.normal(size=(n, 3)).astype(np.float32)
        r = make_rays(origin, direction)
        t1, t2 = slab_test(jnp.asarray(bmin_np), jnp.asarray(bmax_np), r.origin, r.inv_direction, jnp.inf)
        t1, t2 = np.asarray(t1), np.asarray(t2)
        hit = t1 <= t2
        o, d = np.asarray(r.origin), np.asarray(r.direction)
        entry = o + d * t1[:, None]
        eps = 1e-3
        inside_box = ((entry >= bmin_np - eps) & (entry <= bmax_np + eps)).all(axis=1)
        assert inside_box[hit].all()
        # Brute-force oracle: sample points along the ray, check none inside
        # the box for misses.
        ts = np.linspace(0, 20, 200, dtype=np.float32)
        pts = o[:, None, :] + d[:, None, :] * ts[None, :, None]
        inside = (
            (pts > bmin_np[:, None] + eps) & (pts < bmax_np[:, None] - eps)
        ).all(axis=2).any(axis=1)
        assert not inside[~hit].any()


class TestMollerTrumbore:
    def test_simple_hit(self):
        v0 = jnp.array([0.0, 0.0, 0.0])
        v1 = jnp.array([1.0, 0.0, 0.0])
        v2 = jnp.array([0.0, 1.0, 0.0])
        r = np_ray([0.2, 0.2, -3.0], [0, 0, 1])
        mask, t, u, v = moller_trumbore(v0, v1, v2, r.origin, r.direction)
        assert bool(mask)
        assert float(t) == pytest.approx(3.0, abs=1e-5)
        assert float(u) == pytest.approx(0.2, abs=1e-5)
        assert float(v) == pytest.approx(0.2, abs=1e-5)

    def test_two_sided(self):
        v0 = jnp.array([0.0, 0.0, 0.0])
        v1 = jnp.array([1.0, 0.0, 0.0])
        v2 = jnp.array([0.0, 1.0, 0.0])
        r = np_ray([0.2, 0.2, 3.0], [0, 0, -1])  # from the back side
        mask, t, _, _ = moller_trumbore(v0, v1, v2, r.origin, r.direction)
        assert bool(mask)
        assert float(t) == pytest.approx(3.0, abs=1e-5)

    def test_miss_outside(self):
        v0 = jnp.array([0.0, 0.0, 0.0])
        v1 = jnp.array([1.0, 0.0, 0.0])
        v2 = jnp.array([0.0, 1.0, 0.0])
        r = np_ray([0.9, 0.9, -3.0], [0, 0, 1])  # u+v > 1
        mask, _, _, _ = moller_trumbore(v0, v1, v2, r.origin, r.direction)
        assert not bool(mask)

    def test_degenerate_triangle_is_miss(self):
        z = jnp.zeros(3)
        r = np_ray([0.0, 0.0, -3.0], [0, 0, 1])
        mask, _, _, _ = moller_trumbore(z, z, z, r.origin, r.direction)
        assert not bool(mask)

    def test_parallel_ray_is_miss(self):
        v0 = jnp.array([0.0, 0.0, 0.0])
        v1 = jnp.array([1.0, 0.0, 0.0])
        v2 = jnp.array([0.0, 1.0, 0.0])
        r = np_ray([0.0, 0.0, 1.0], [1, 0, 0])  # parallel to plane, offset
        mask, _, _, _ = moller_trumbore(v0, v1, v2, r.origin, r.direction)
        assert not bool(mask)

    def test_random_barycentric_roundtrip(self, rng):
        # Construct hit points from barycentrics, verify recovered (u, v, t).
        n = 500
        v0 = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        v1 = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        v2 = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        u = rng.uniform(0.05, 0.9, n).astype(np.float32)
        v = (rng.uniform(0.05, 0.9, n) * (1 - u)).astype(np.float32)
        target = v0 * (1 - u - v)[:, None] + v1 * u[:, None] + v2 * v[:, None]
        origin = target + np.array([0, 0, 5], np.float32)
        r = make_rays(origin, target - origin)
        mask, t, uu, vv = moller_trumbore(
            jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2), r.origin, r.direction
        )
        mask, t, uu, vv = map(np.asarray, (mask, t, uu, vv))
        # Nearly-degenerate random triangles can fail; demand the vast majority.
        assert mask.mean() > 0.99
        np.testing.assert_allclose(uu[mask], u[mask], atol=2e-2)
        np.testing.assert_allclose(vv[mask], v[mask], atol=2e-2)
        np.testing.assert_allclose(t[mask], 5.0, atol=2e-2)
