"""Path-tracer tests: analytic zero-variance setups give exact expectations.

Uses interpret-mode Pallas on CPU, tiny frames.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from minipath_tpu.camera import Camera
from minipath_tpu.render.wavefront import make_xla_tracer, render_frame_pt, scatter
from minipath_tpu.scene.materials import (
    Environment,
    dielectric,
    emissive,
    lambertian,
    material_table,
    metal,
)
from minipath_tpu.scene.obj_loader import MeshData
from minipath_tpu.scene.procedural import make_quad
from minipath_tpu.scene.triangle_bvh import TriangleBvh


_FLOOR_OBJ = None


def _floor_scene(mat):
    """A big quad at y=0 with normal +y (flat shaded).

    The geometry (and its all-zeros material-id array) is identical for
    every caller — only the material TABLE differs, and the table is a
    runtime operand, not a jit-static one. Sharing one module-level
    TriangleBvh therefore shares one tracer closure across tests, so
    every test at the same (spp, bounces) config reuses the same
    compiled _pt_chunk instead of recompiling it per test — the single
    biggest cost of a cold-cache suite run (TESTS_COLD.json)."""
    global _FLOOR_OBJ
    if _FLOOR_OBJ is None:
        mesh = make_quad(100.0)
        # quad is in z-plane; rotate to be the y=0 floor.
        pos = mesh.positions.copy()
        mesh.positions = np.stack([pos[:, 0], pos[:, 2], pos[:, 1]], axis=-1)
        _FLOOR_OBJ = TriangleBvh.build(
            mesh, materials=np.zeros(mesh.triangle_count, np.int32)
        )
    return _FLOOR_OBJ, material_table([mat])


def _down_camera():
    # Looking straight down at the floor from above.
    return Camera().look_direction((0, 5, 0), (0, -1, 0), (0, 0, 1))


def _tracer(obj):
    if not hasattr(obj, "_test_tracer"):
        obj._test_tracer = make_xla_tracer(
            obj.arrays, stack_size=obj.recommended_stack_size, packet_size=256
        )
    return obj._test_tracer


def _render(obj, table, camera, env, spp=4, bounces=4, w=16, h=16):
    sampler = camera.build_sampler((w, h))
    tracer, tracer_state = _tracer(obj)
    img = render_frame_pt(
        tracer,
        tracer_state,
        table,
        sampler,
        jax.random.key(0),
        width=w,
        height=h,
        spp=spp,
        bounces=bounces,
        env=env,
        px_block=(16, 16),
        samples_per_packet=spp,
    )
    return np.asarray(img)


class TestAnalytic:
    def test_all_miss_is_env(self):
        obj = TriangleBvh.build(MeshData())
        table = material_table([lambertian((0.5, 0.5, 0.5))])
        env = Environment.uniform((0.3, 0.6, 0.9))
        cam = Camera().look_direction((0, 0, 0), (0, 1, 0), (0, 0, 1))
        img = _render(obj, table, cam, env, spp=2, bounces=2)
        np.testing.assert_allclose(img[..., :3], np.broadcast_to([0.3, 0.6, 0.9], img[..., :3].shape), atol=1e-5)

    def test_emissive_surface_exact(self):
        obj, table = _floor_scene(emissive((2.0, 1.0, 0.5)))
        env = Environment.none()
        img = _render(obj, table, _down_camera(), env, spp=2, bounces=3)
        np.testing.assert_allclose(img[..., :3], np.broadcast_to([2.0, 1.0, 0.5], img[..., :3].shape), atol=1e-5)

    def test_lambertian_under_uniform_env_zero_variance(self):
        # Cosine-sampled Lambertian under a uniform environment: every path
        # contributes exactly albedo * env -> zero-variance estimator.
        albedo = (0.8, 0.6, 0.4)
        envc = (1.0, 1.0, 1.0)
        obj, table = _floor_scene(lambertian(albedo))
        img = _render(obj, table, _down_camera(), Environment.uniform(envc), spp=2, bounces=3)
        np.testing.assert_allclose(img[..., :3], np.broadcast_to(albedo, img[..., :3].shape), atol=1e-4)

    def test_mirror_reflects_zenith(self):
        obj, table = _floor_scene(metal((1.0, 1.0, 1.0), fuzz=0.0))
        env = Environment(
            horizon=jnp.asarray([1.0, 0.0, 0.0]), zenith=jnp.asarray([0.0, 0.0, 1.0])
        )
        img = _render(obj, table, _down_camera(), env, spp=2, bounces=3)
        # Down ray reflects straight up -> env(+y) = zenith.
        center = img[8, 8, :3]
        np.testing.assert_allclose(center, [0.0, 0.0, 1.0], atol=2e-2)

    def test_glass_pane_mostly_transmits(self):
        obj, table = _floor_scene(dielectric(1.5))
        env = Environment(
            horizon=jnp.asarray([1.0, 1.0, 1.0]), zenith=jnp.asarray([0.0, 0.0, 0.0])
        )
        # Looking straight down through glass: transmitted rays continue to
        # the horizon-down env value env(-y) = horizon... with Schlick ~4%
        # reflectance sending rays to zenith (0).
        img = _render(obj, table, _down_camera(), env, spp=16, bounces=4)
        mean = img[..., :3].mean(axis=(0, 1))
        assert 0.85 < mean[0] <= 1.0

    def test_compaction_matches_megakernel_mean(self):
        obj, table = _floor_scene(lambertian((0.5, 0.5, 0.5)))
        env = Environment.sky()
        cam = _down_camera()
        sampler = cam.build_sampler((16, 16))
        kw = dict(
            width=16, height=16, spp=8, bounces=4, env=env,
            px_block=(16, 16), samples_per_packet=8,
        )
        tr, tr_state = _tracer(obj)
        a = np.asarray(
            render_frame_pt(tr, tr_state, table, sampler, jax.random.key(1), compaction=True, **kw)
        )
        b = np.asarray(
            render_frame_pt(tr, tr_state, table, sampler, jax.random.key(2), compaction=False, **kw)
        )
        np.testing.assert_allclose(
            a[..., :3].mean(), b[..., :3].mean(), rtol=0.05
        )

    def test_rr_start_mean_invariant(self):
        # Path Russian roulette is unbiased at ANY start bounce: killing a
        # ray with probability 1-p and reweighting survivors by 1/p leaves
        # the estimator mean unchanged (E[1{u<p}/p] = 1). rr_start=1 kills
        # half the bounce-1 rays of this albedo-0.5 floor, so agreement
        # here exercises the reweighting, not just the kill mask.
        obj, table = _floor_scene(lambertian((0.5, 0.5, 0.5)))
        env = Environment.sky()
        sampler = _down_camera().build_sampler((16, 16))
        kw = dict(
            width=16, height=16, spp=64, bounces=4, env=env,
            px_block=(16, 16), samples_per_packet=8,
        )
        tr, tr_state = _tracer(obj)
        means = [
            np.asarray(
                render_frame_pt(
                    tr, tr_state, table, sampler, jax.random.key(3),
                    rr_start=rr, **kw,
                )
            )[..., :3].mean()
            for rr in (3, 1)
        ]
        np.testing.assert_allclose(means[0], means[1], rtol=0.05)

    def test_rr_floor_and_tail_cutoff(self):
        """rr_floor changes the kill pattern but not the mean (survivors
        are reweighted by 1/p — unbiased at any floor); min_live_frac only
        REMOVES radiance (it drops the tail's remaining contribution —
        biased low by construction); defaults stay bit-identical when
        passed explicitly.

        The scene must keep paths alive across bounces for the levers to
        have anything to act on (a lone floor plane retires every path at
        bounce 1): an open-box interior — rays bounce between five diffuse
        faces and escape through the missing +z face to the sky."""
        from minipath_tpu.scene.procedural import make_cube
        from minipath_tpu.scene.triangle_bvh import TriangleBvh

        mesh = make_cube(4.0)
        keep = ~(mesh.positions[mesh.triangles][:, :, 2] > 1.9).all(axis=1)
        mesh.triangles = mesh.triangles[keep]
        obj = TriangleBvh.build(
            mesh, materials=np.zeros(mesh.triangle_count, np.int32)
        )
        table = material_table([lambertian((0.6, 0.6, 0.6))])
        sampler = (
            Camera().look_direction((0, 0, 0), (0, 0, -1), (0, 1, 0))
            .build_sampler((16, 16))
        )
        kw = dict(
            width=16, height=16, spp=32, bounces=6, env=Environment.sky(),
            px_block=(16, 16), samples_per_packet=8, rr_start=1,
        )
        tr, tr_state = _tracer(obj)
        a = np.asarray(render_frame_pt(
            tr, tr_state, table, sampler, jax.random.key(5), **kw))
        a2 = np.asarray(render_frame_pt(
            tr, tr_state, table, sampler, jax.random.key(5),
            rr_floor=0.05, min_live_frac=None, **kw))
        np.testing.assert_array_equal(a, a2)
        b = np.asarray(render_frame_pt(
            tr, tr_state, table, sampler, jax.random.key(5),
            rr_floor=0.9, **kw))
        assert not np.array_equal(a, b)
        np.testing.assert_allclose(
            a[..., :3].mean(), b[..., :3].mean(), rtol=0.05
        )
        c = np.asarray(render_frame_pt(
            tr, tr_state, table, sampler, jax.random.key(5),
            min_live_frac=0.25, **kw))
        assert (c[..., :3] <= a[..., :3] + 1e-6).all()
        removed = 1.0 - c[..., :3].mean() / a[..., :3].mean()
        # The cut really fired, and the removal is the tail's share — on
        # this enclosed multi-bounce box that is a sizeable chunk (~23%),
        # which is exactly why the lever is opt-in and documented biased.
        assert 0.0 < removed < 0.4, removed


class TestScatter:
    def test_lambertian_hemisphere(self, rng):
        table = material_table([lambertian((0.7, 0.7, 0.7))])
        n = 512
        d = jnp.tile(jnp.asarray([0.0, -1.0, 0.0]), (n, 1))
        nrm = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (n, 1))
        mid = jnp.zeros(n, jnp.int32)
        nd, att, emit, term = scatter(table, jax.random.key(0), d, nrm, mid)
        nd = np.asarray(nd)
        assert (nd[:, 1] > 0).all()  # scattered into the upper hemisphere
        np.testing.assert_allclose(np.linalg.norm(nd, axis=1), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(att), np.full_like(np.asarray(att), 0.7), atol=1e-6)
        assert not np.asarray(term).any()
        assert (np.asarray(emit) == 0).all()

    def test_metal_mirror_exact(self):
        table = material_table([metal((0.9, 0.9, 0.9), fuzz=0.0)])
        d = jnp.asarray([[0.7071, -0.7071, 0.0]])
        nrm = jnp.asarray([[0.0, 1.0, 0.0]])
        nd, _, _, term = scatter(table, jax.random.key(0), d, nrm, jnp.zeros(1, jnp.int32))
        np.testing.assert_allclose(
            np.asarray(nd)[0], [0.7071, 0.7071, 0.0], atol=1e-4
        )
        assert not bool(np.asarray(term)[0])

    def test_emissive_terminates(self):
        table = material_table([emissive((3.0, 2.0, 1.0))])
        d = jnp.asarray([[0.0, -1.0, 0.0]])
        nrm = jnp.asarray([[0.0, 1.0, 0.0]])
        _, att, emit, term = scatter(table, jax.random.key(0), d, nrm, jnp.zeros(1, jnp.int32))
        assert bool(np.asarray(term)[0])
        np.testing.assert_allclose(np.asarray(emit)[0], [3.0, 2.0, 1.0])
        np.testing.assert_allclose(np.asarray(att)[0], np.zeros(3))

    def test_dielectric_straight_through(self):
        table = material_table([dielectric(1.5)])
        # Normal incidence: mostly refracts straight through.
        d = jnp.tile(jnp.asarray([0.0, -1.0, 0.0]), (256, 1))
        nrm = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (256, 1))
        nd, att, _, term = scatter(table, jax.random.key(3), d, nrm, jnp.zeros(256, jnp.int32))
        nd = np.asarray(nd)
        through = (nd[:, 1] < -0.999).mean()
        reflected = (nd[:, 1] > 0.999).mean()
        assert through > 0.9  # Schlick at normal incidence ~4%
        assert abs(through + reflected - 1.0) < 1e-6
        np.testing.assert_allclose(np.asarray(att), np.ones_like(np.asarray(att)))
        assert not np.asarray(term).any()


def test_pallas_tracer_pads_ragged_ray_counts(rng):
    """A ray stream that isn't a whole number of packets is padded (and the
    padding sliced away) instead of raising mid-render."""
    from minipath_tpu.render.pallas_kernels import prepare_scene
    from minipath_tpu.render.wavefront import make_pallas_tracer

    obj, _ = _floor_scene(lambertian((0.5, 0.5, 0.5)))
    tracer, state = make_pallas_tracer(
        prepare_scene(obj.arrays),
        stack_size=obj.recommended_stack_size,
        packet_size=256,
        interpret=True,
    )
    xtracer, xstate = make_xla_tracer(
        obj.arrays, stack_size=obj.recommended_stack_size, packet_size=100
    )
    n = 300  # not a multiple of 256
    origin = np.tile(np.array([0, 5, 0], np.float32), (n, 1))
    origin += rng.uniform(-1, 1, (n, 3)).astype(np.float32) * [1, 0, 1]
    direction = np.tile(np.array([0, -1, 0], np.float32), (n, 1))
    with np.errstate(divide="ignore"):
        inv = np.where(direction == 0, np.inf, 1.0 / direction).astype(np.float32)
    got = tracer(state, jnp.asarray(origin), jnp.asarray(direction), jnp.asarray(inv))
    want = xtracer(xstate, jnp.asarray(origin), jnp.asarray(direction), jnp.asarray(inv))
    assert got.t.shape == (n,)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(want.tri))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(want.t), rtol=1e-5)


def _floor_and_panel_scene(panel_size=20.0, panel_y=8.0, strength=2.0):
    """Lambertian floor (mat 0) + emissive panel ABOVE the test camera
    (mat 1) — cameras look down from y=5, so they see lit floor, not panel."""
    from minipath_tpu.scene.procedural import merge_meshes

    floor = make_quad(100.0)
    pos = floor.positions.copy()
    floor.positions = np.stack([pos[:, 0], pos[:, 2], pos[:, 1]], axis=-1)
    panel = make_quad(panel_size)
    ppos = panel.positions.copy()
    panel.positions = np.stack(
        [ppos[:, 0], np.full_like(ppos[:, 2], panel_y), ppos[:, 1]], axis=-1
    )
    mesh = merge_meshes([floor, panel])
    mats = np.zeros(mesh.triangle_count, np.int32)
    mats[floor.triangle_count:] = 1
    obj = TriangleBvh.build(mesh, materials=mats)
    table = material_table(
        [lambertian((0.6, 0.6, 0.6)), emissive((1.0, 1.0, 1.0), strength)]
    )
    return obj, table


def _nee_bits(obj, table):
    from minipath_tpu.render.wavefront import make_xla_shadow_tracer
    from minipath_tpu.scene.materials import build_light_table

    arrays = obj.host_arrays
    lights = build_light_table(arrays.tri_packets, arrays.tri_material, table)
    shadow, _ = make_xla_shadow_tracer(
        obj.arrays, stack_size=obj.recommended_stack_size, packet_size=256
    )
    return lights, shadow


class TestNee:
    def test_light_table(self):
        from minipath_tpu.scene.materials import build_light_table, sample_lights

        obj, table = _floor_and_panel_scene()
        arrays = obj.host_arrays
        lights = build_light_table(arrays.tri_packets, arrays.tri_material, table)
        assert lights is not None
        assert lights.v0.shape[0] == 2  # panel = 2 triangles
        np.testing.assert_allclose(float(lights.pmf.sum()), 1.0, rtol=1e-6)
        np.testing.assert_allclose(
            np.abs(np.asarray(lights.normal)[:, 1]), 1.0, atol=1e-6
        )
        # Mapping: every light id round-trips through tri_light.
        tl = np.asarray(lights.tri_light)
        assert (np.sort(tl[tl >= 0]) == np.arange(2)).all()
        # Sampled points lie on the panel plane, inside its extent.
        x = jnp.asarray(np.tile([0.0, 0.0, 0.0], (64, 1)), jnp.float32)
        y, wi, pdf, em, cos_y, _li = sample_lights(lights, jax.random.key(0), x)
        y = np.asarray(y)
        np.testing.assert_allclose(y[:, 1], 8.0, atol=1e-5)
        assert (np.abs(y[:, [0, 2]]) <= 10.0 + 1e-4).all()
        assert (np.asarray(pdf) > 0).all()
        # No scene with no emitters -> None.
        obj2, table2 = _floor_scene(lambertian((0.5, 0.5, 0.5)))
        a2 = obj2.host_arrays
        assert build_light_table(a2.tri_packets, a2.tri_material, table2) is None

    def test_shadow_tracer(self):
        from minipath_tpu.render.wavefront import make_xla_shadow_tracer

        obj, _ = _floor_and_panel_scene()
        shadow, _ = make_xla_shadow_tracer(
            obj.arrays, stack_size=obj.recommended_stack_size, packet_size=128
        )
        n = 128
        o = np.tile(np.array([0, 1, 0], np.float32), (n, 1))
        # First half: segments up to the panel (unoccluded). Second half:
        # segments that pass through the floor to y=-1 (occluded).
        seg = np.tile(np.array([0, 3, 0], np.float32), (n, 1))
        seg[n // 2:] = [0, -2, 0]
        occ = np.asarray(shadow(obj.arrays, jnp.asarray(o), jnp.asarray(seg)))
        assert not occ[: n // 2].any()
        assert occ[n // 2:].all()
        # Segment that stops just short of the floor is unoccluded.
        seg2 = np.tile(np.array([0, -0.9, 0], np.float32), (n, 1))
        occ2 = np.asarray(shadow(obj.arrays, jnp.asarray(o), jnp.asarray(seg2)))
        assert not occ2.any()

    def test_nee_mean_matches_bsdf_only(self):
        # NEE + MIS is unbiased: same estimator mean as pure BSDF sampling,
        # within Monte Carlo noise. Black environment isolates the panel.
        obj, table = _floor_and_panel_scene()
        lights, shadow = _nee_bits(obj, table)
        cam = _down_camera()
        env = Environment.none()
        sampler = cam.build_sampler((16, 16))
        tr, tr_state = _tracer(obj)
        kw = dict(
            width=16, height=16, bounces=3, env=env,
            px_block=(16, 16),
        )
        a = np.asarray(render_frame_pt(
            tr, tr_state, table, sampler, jax.random.key(1),
            spp=96, samples_per_packet=32, **kw,
        ))
        b = np.asarray(render_frame_pt(
            tr, tr_state, table, sampler, jax.random.key(2),
            spp=96, samples_per_packet=32,
            lights=lights, shadow_tracer=shadow, **kw,
        ))
        assert b[..., :3].mean() > 0.05  # light actually contributes
        np.testing.assert_allclose(
            a[..., :3].mean(), b[..., :3].mean(), rtol=0.12
        )

    def test_nee_depth_cap_is_unbiased(self):
        # Capping NEE to the first vertex hands full BSDF weight to deeper
        # emitter hits (prev_pdf = 0 past the cap) — the estimator mean
        # must match uncapped NEE within Monte Carlo noise.
        obj, table = _floor_and_panel_scene()
        lights, shadow = _nee_bits(obj, table)
        sampler = _down_camera().build_sampler((16, 16))
        tr, tr_state = _tracer(obj)
        kw = dict(
            width=16, height=16, bounces=3, env=Environment.none(),
            px_block=(16, 16), spp=96, samples_per_packet=32,
            lights=lights, shadow_tracer=shadow,
        )
        full = np.asarray(render_frame_pt(
            tr, tr_state, table, sampler, jax.random.key(3), **kw,
        ))
        capped = np.asarray(render_frame_pt(
            tr, tr_state, table, sampler, jax.random.key(4),
            nee_max_depth=1, **kw,
        ))
        assert full[..., :3].mean() > 0.05
        np.testing.assert_allclose(
            full[..., :3].mean(), capped[..., :3].mean(), rtol=0.12
        )

    def test_shadow_sort_modes_agree(self):
        # The shadow_sort knob only reorders the occlusion batch (and
        # "fromlight" traces each segment reversed) — the estimator is
        # unchanged, so all modes must produce the same image for the
        # same key. A blocker quad between floor and panel makes real
        # occlusion part of what must agree.
        from minipath_tpu.scene.procedural import merge_meshes

        floor = make_quad(100.0)
        pos = floor.positions.copy()
        floor.positions = np.stack([pos[:, 0], pos[:, 2], pos[:, 1]], axis=-1)
        panel = make_quad(20.0)
        ppos = panel.positions.copy()
        panel.positions = np.stack(
            [ppos[:, 0], np.full_like(ppos[:, 2], 8.0), ppos[:, 1]], axis=-1
        )
        blocker = make_quad(4.0)
        bpos = blocker.positions.copy()
        blocker.positions = np.stack(
            [bpos[:, 0] + 2.0, np.full_like(bpos[:, 2], 4.0), bpos[:, 1]],
            axis=-1,
        )
        mesh = merge_meshes([floor, blocker, panel])
        mats = np.zeros(mesh.triangle_count, np.int32)
        mats[floor.triangle_count + blocker.triangle_count:] = 1
        obj = TriangleBvh.build(mesh, materials=mats)
        table = material_table(
            [lambertian((0.6, 0.6, 0.6)), emissive((1.0, 1.0, 1.0), 2.0)]
        )
        lights, shadow = _nee_bits(obj, table)
        # The blocker really occludes: straight-up segments from under it
        # are blocked, segments from open floor are not.
        n = 256  # the tracer's packet size
        o = np.tile(np.array([2.0, 0.1, 0.0], np.float32), (n, 1))
        o[n // 2:] = [-20.0, 0.1, 0.0]
        seg = np.tile(np.array([0.0, 7.8, 0.0], np.float32), (n, 1))
        occ = np.asarray(shadow(obj.arrays, jnp.asarray(o), jnp.asarray(seg)))
        assert occ[: n // 2].all() and not occ[n // 2:].any()

        sampler = _down_camera().build_sampler((16, 16))
        tr, tr_state = _tracer(obj)
        kw = dict(
            width=16, height=16, spp=8, bounces=2, env=Environment.none(),
            px_block=(16, 16), samples_per_packet=8,
            lights=lights, shadow_tracer=shadow,
        )
        imgs = {
            mode: np.asarray(render_frame_pt(
                tr, tr_state, table, sampler, jax.random.key(7),
                shadow_sort=mode, **kw,
            ))
            for mode in ("pos", "dir", "light", "fromlight")
        }
        assert imgs["pos"][..., :3].mean() > 0.01
        for mode in ("dir", "light", "fromlight"):
            np.testing.assert_allclose(
                imgs[mode], imgs["pos"], atol=1e-5,
                err_msg=f"shadow_sort={mode} diverged from pos",
            )

    def test_nee_reduces_variance(self):
        # With a SMALL light, BSDF sampling rarely finds it; NEE turns the
        # same mean into a far lower-variance estimate.
        obj, table = _floor_and_panel_scene(panel_size=2.0, strength=20.0)
        lights, shadow = _nee_bits(obj, table)
        cam = _down_camera()
        env = Environment.none()
        sampler = cam.build_sampler((8, 8))
        tr, tr_state = _tracer(obj)
        kw = dict(
            width=8, height=8, spp=4, bounces=2, env=env,
            px_block=(8, 8), samples_per_packet=4,
        )

        def frames(**extra):
            return np.stack([
                np.asarray(render_frame_pt(
                    tr, tr_state, table, sampler, jax.random.key(100 + i), **kw, **extra
                ))[..., :3]
                for i in range(6)
            ])

        fb = frames()
        fn = frames(lights=lights, shadow_tracer=shadow)
        var_b = fb.var(axis=0).mean()
        var_n = fn.var(axis=0).mean()
        assert var_n < var_b * 0.5, (var_n, var_b)


def test_pallas_shadow_tracer_anyhit_matches_closest(rng):
    """The anyhit occlusion kernel must report exactly the same occluded
    set as a closest-hit trace with the same t_max."""
    from minipath_tpu.render.pallas_kernels import (
        prepare_scene_pt,
        trace_packets_pallas_pt,
    )
    from minipath_tpu.render.wavefront import make_pt_shadow_tracer

    obj, _ = _floor_and_panel_scene()
    sp = prepare_scene_pt(obj.host_arrays)
    shadow, _ = make_pt_shadow_tracer(
        sp, stack_size=obj.recommended_stack_size, packet_size=128,
        interpret=True,
    )
    n = 128
    o = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.5, 7.5, n)
    tgt = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    tgt[:, 1] = rng.uniform(-2.0, 9.5, n)
    seg = tgt - o
    occ = np.asarray(shadow(sp, jnp.asarray(o), jnp.asarray(seg)))
    # Oracle: closest-hit with the same segment parameterization.
    inv = np.where(seg == 0, np.inf, 1.0 / seg).astype(np.float32)
    r9 = jnp.asarray(np.concatenate([o, seg, inv], -1)).reshape(1, n, 9)
    r9 = jnp.swapaxes(r9, 1, 2).reshape(1, 9, 1, 128)
    ph = trace_packets_pallas_pt(
        sp, r9, stack_size=obj.recommended_stack_size,
        t_max=1.0 - 1e-5, interpret=True,
    )
    want = np.asarray(ph.tri).reshape(n) >= 0
    np.testing.assert_array_equal(occ, want)
    assert occ.any() and not occ.all()  # both classes exercised
    # Occlusion is order-independent: the unsorted-children anyhit kernel
    # (no near-first push network — a measured perf knob, sweep_shadow.py)
    # must report the identical occluded set.
    shadow_u, _ = make_pt_shadow_tracer(
        sp, stack_size=obj.recommended_stack_size, packet_size=128,
        interpret=True, sort_children=False,
    )
    occ_u = np.asarray(shadow_u(sp, jnp.asarray(o), jnp.asarray(seg)))
    np.testing.assert_array_equal(occ_u, want)


def test_q_shadow_tracer_matches_xla(rng):
    """Quantized ANYHIT occlusion (make_pt_shadow_tracer dispatching to the
    lean quantized kernel) agrees with the XLA shadow tracer away from the
    quantization tolerance band — NEE shadow rays on over-VMEM scenes no
    longer pay a closest-hit trace."""
    from minipath_tpu.render.pallas_kernels import prepare_scene_qpt
    from minipath_tpu.render.wavefront import (
        make_pt_shadow_tracer,
        make_xla_shadow_tracer,
    )

    obj, _ = _floor_and_panel_scene()
    qscene = prepare_scene_qpt(obj.host_arrays)
    qshadow, _ = make_pt_shadow_tracer(
        qscene, stack_size=obj.recommended_stack_size, packet_size=128,
        interpret=True,
    )
    xshadow, _ = make_xla_shadow_tracer(
        obj.arrays, stack_size=obj.recommended_stack_size, packet_size=128
    )
    n = 128
    o = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.5, 7.0, n)
    tgt = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    # Targets well clear of surfaces (floor y=0, panel y=8) so quantized
    # boxes can't flip the classification.
    tgt[:, 1] = np.where(rng.uniform(size=n) < 0.5, -2.0, 7.0)
    seg = tgt - o
    qo = np.asarray(qshadow(qscene, jnp.asarray(o), jnp.asarray(seg)))
    xo = np.asarray(xshadow(obj.arrays, jnp.asarray(o), jnp.asarray(seg)))
    np.testing.assert_array_equal(qo, xo)
    assert qo.any() and not qo.all()


def _metal_floor_and_panel_scene(fuzz, panel_size=20.0, strength=2.0):
    """Fuzzy-METAL floor (mat 0) + emissive panel above (mat 1)."""
    from minipath_tpu.scene.procedural import merge_meshes

    floor = make_quad(100.0)
    pos = floor.positions.copy()
    floor.positions = np.stack([pos[:, 0], pos[:, 2], pos[:, 1]], axis=-1)
    panel = make_quad(panel_size)
    ppos = panel.positions.copy()
    panel.positions = np.stack(
        [ppos[:, 0], np.full_like(ppos[:, 2], 8.0), ppos[:, 1]], axis=-1
    )
    mesh = merge_meshes([floor, panel])
    mats = np.zeros(mesh.triangle_count, np.int32)
    mats[floor.triangle_count:] = 1
    obj = TriangleBvh.build(mesh, materials=mats)
    table = material_table(
        [metal((0.9, 0.9, 0.9), fuzz), emissive((1.0, 1.0, 1.0), strength)]
    )
    return obj, table


class TestGlossyNee:
    """NEE over the glossy (Phong-lobe) metal BSDF — mean parity and
    variance reduction (the 'masked BSDF sampling' north star extended to
    rough metal instead of treating it as specular)."""

    def test_glossy_pdf_normalized(self):
        # The lobe pdf must integrate to 1 over the sphere: uniform-sphere
        # Monte Carlo of phong_pdf.
        from minipath_tpu.render.wavefront import phong_exponent, phong_pdf

        rng = np.random.default_rng(5)
        d = rng.normal(size=(200_000, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        cos_a = d[:, 2]  # lobe axis = +z
        for fuzz in (0.2, 0.5, 1.0):
            n = float(phong_exponent(jnp.float32(fuzz)))
            pdf = np.asarray(phong_pdf(jnp.float32(n), jnp.asarray(cos_a, jnp.float32)))
            integral = pdf.mean() * 4.0 * np.pi
            np.testing.assert_allclose(integral, 1.0, rtol=0.05)

    def test_scatter_reports_lobe_pdf(self):
        # scatter_full's pdf for a glossy lane equals phong_pdf at the
        # sampled direction's lobe angle (the MIS contract).
        from minipath_tpu.render.wavefront import (
            phong_exponent,
            phong_pdf,
            scatter_full,
        )

        table = material_table([metal((0.8, 0.8, 0.8), 0.4)])
        n = 256
        direction = jnp.asarray(
            np.tile(np.array([0.0, -1.0, 0.0], np.float32), (n, 1))
        )
        normal = jnp.asarray(np.tile(np.array([0.0, 1.0, 0.0], np.float32), (n, 1)))
        mat = jnp.zeros((n,), jnp.int32)
        nd, att, em, term, pdf, diffuse = scatter_full(
            table, jax.random.key(3), direction, normal, mat
        )
        refl = np.array([0.0, 1.0, 0.0], np.float32)
        cos_a = np.clip(np.asarray(nd) @ refl, -1, 1)
        n_exp = float(phong_exponent(jnp.float32(0.4)))
        want = np.asarray(phong_pdf(jnp.float32(n_exp), jnp.asarray(cos_a)))
        np.testing.assert_allclose(np.asarray(pdf), want, rtol=1e-3, atol=1e-6)
        assert not np.asarray(diffuse).any()

    def test_glossy_nee_mean_matches_bsdf_only(self):
        obj, table = _metal_floor_and_panel_scene(fuzz=0.5)
        lights, shadow = _nee_bits(obj, table)
        cam = _down_camera()
        env = Environment.none()
        sampler = cam.build_sampler((16, 16))
        tr, tr_state = _tracer(obj)
        kw = dict(width=16, height=16, bounces=3, env=env, px_block=(16, 16))
        a = np.asarray(render_frame_pt(
            tr, tr_state, table, sampler, jax.random.key(1),
            spp=96, samples_per_packet=32, **kw,
        ))
        b = np.asarray(render_frame_pt(
            tr, tr_state, table, sampler, jax.random.key(2),
            spp=96, samples_per_packet=32,
            lights=lights, shadow_tracer=shadow, **kw,
        ))
        assert b[..., :3].mean() > 0.05
        np.testing.assert_allclose(
            a[..., :3].mean(), b[..., :3].mean(), rtol=0.12
        )

    def test_glossy_nee_reduces_variance(self):
        # Rough metal + small light: the lobe rarely finds the panel by
        # sampling; NEE must cut variance markedly at equal mean.
        obj, table = _metal_floor_and_panel_scene(
            fuzz=0.8, panel_size=2.0, strength=20.0
        )
        lights, shadow = _nee_bits(obj, table)
        cam = _down_camera()
        env = Environment.none()
        sampler = cam.build_sampler((8, 8))
        tr, tr_state = _tracer(obj)
        kw = dict(
            width=8, height=8, spp=4, bounces=2, env=env,
            px_block=(8, 8), samples_per_packet=4,
        )

        def frames(**extra):
            return np.stack([
                np.asarray(render_frame_pt(
                    tr, tr_state, table, sampler, jax.random.key(200 + i),
                    **kw, **extra,
                ))[..., :3]
                for i in range(6)
            ])

        fb = frames()
        fn = frames(lights=lights, shadow_tracer=shadow)
        var_b = fb.var(axis=0).mean()
        var_n = fn.var(axis=0).mean()
        assert var_n < var_b * 0.6, (var_n, var_b)


def test_mis_pdfs_are_consistent():
    """The two halves of the MIS power heuristic must see the SAME light
    pdf for the same transport path: hit_light_pdf (BSDF side, from tri id
    + direction + distance) equals sample_lights' pdf_solid (NEE side) for
    the sampled point, so the pair of weights sums to 1."""
    from minipath_tpu.scene.materials import (
        build_light_table,
        hit_light_pdf,
        sample_lights,
    )

    obj, table = _floor_and_panel_scene()
    arrays = obj.host_arrays
    lights = build_light_table(arrays.tri_packets, arrays.tri_material, table)
    x = jnp.asarray(
        np.random.default_rng(3).uniform(-4, 4, (64, 3)).astype(np.float32)
        * [1, 0, 1]
    )
    y, wi, pdf_nee, em, cos_y, _li = sample_lights(lights, jax.random.key(2), x)
    dist = jnp.sqrt(jnp.sum((y - x) ** 2, axis=-1))
    # Identify the light triangle each sampled point belongs to via its
    # padded-global id. tri_light maps global -> light; invert it.
    tl = np.asarray(lights.tri_light)
    light_to_tri = {li: gi for gi, li in enumerate(tl) if li >= 0}
    # Recover each sample's light id from its plane/extent (all panel tris
    # share the plane) by checking both candidates' pdf against pdf_nee.
    ok = np.zeros(64, bool)
    pn = np.asarray(pdf_nee)
    for li, gi in light_to_tri.items():
        tri = jnp.full((64,), gi, jnp.int32)
        pb = np.asarray(hit_light_pdf(lights, tri, wi, dist))
        # Within each sample, ONE of the lights must reproduce pdf_nee
        # exactly (up to fp noise) scaled by its own pmf/area.
        ok |= np.isclose(pb, pn, rtol=2e-4)
    assert ok.all()
    # And the power-heuristic weights built from equal pdfs sum to 1.
    pdf_b = jnp.maximum(jnp.sum(wi * jnp.asarray([0, 1, 0], jnp.float32), -1), 0) / np.pi
    w_nee = pn**2 / (pn**2 + np.asarray(pdf_b) ** 2)
    w_b = np.asarray(pdf_b) ** 2 / (pn**2 + np.asarray(pdf_b) ** 2)
    np.testing.assert_allclose(w_nee + w_b, 1.0, rtol=1e-5)


def test_pt_render_is_seed_deterministic():
    """Counter-based RNG: same key -> bit-identical frame; different key ->
    different frame (the reproducibility the reference's OS-seeded SmallRng
    cannot give, worker.rs:25)."""
    obj, table = _floor_scene(lambertian((0.5, 0.5, 0.5)))
    env = Environment.sky()
    cam = _down_camera()
    a = _render(obj, table, cam, env, spp=2, bounces=2)
    b = _render(obj, table, cam, env, spp=2, bounces=2)
    np.testing.assert_array_equal(a, b)
    sampler = cam.build_sampler((16, 16))
    tracer, tstate = _tracer(obj)
    c = np.asarray(render_frame_pt(
        tracer, tstate, table, sampler, jax.random.key(7),
        width=16, height=16, spp=2, bounces=2, env=env,
        px_block=(16, 16), samples_per_packet=2,
    ))
    assert np.abs(a - c).max() > 0


def test_firefly_clamp_caps_samples():
    # clamp= caps each sample's radiance before averaging: with a clamp
    # below the scene's radiance ceiling the mean must drop below the
    # unclamped mean, and no pixel may exceed the clamp value.
    obj, table = _floor_scene(lambertian((0.7, 0.7, 0.7)))
    sampler = _down_camera().build_sampler((16, 16))
    tr, tr_state = _tracer(obj)
    kw = dict(
        width=16, height=16, spp=8, bounces=2, env=Environment.sky(),
        px_block=(16, 16), samples_per_packet=8,
    )
    a = np.asarray(render_frame_pt(
        tr, tr_state, table, sampler, jax.random.key(5), **kw,
    ))[..., :3]
    b = np.asarray(render_frame_pt(
        tr, tr_state, table, sampler, jax.random.key(5), clamp=0.25, **kw,
    ))[..., :3]
    assert b.max() <= 0.25 + 1e-6
    assert b.mean() < a.mean()
