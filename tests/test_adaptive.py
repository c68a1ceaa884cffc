"""Adaptive sampler: budget accounting, estimator mean, allocation shape."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minipath_tpu.render.adaptive import render_frame_pt_adaptive


@pytest.fixture(scope="module")
def scene():
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
        metal((0.9, 0.7, 0.4), fuzz=0.4),  # noisy glossy ball
        lambertian((0.5, 0.55, 0.6)),
    ])
    obj = TriangleBvh.build(mesh, materials=mats)
    cam = Camera().look_at((0, 2.2, 6), (0, 1.0, 0)).f_number(32.0)
    sampler = cam.build_sampler((64, 48))
    tracer, tstate = make_xla_tracer(
        obj.arrays, stack_size=obj.recommended_stack_size, packet_size=256
    )
    return tracer, tstate, table, sampler, Environment.sky()


def test_mean_matches_uniform(scene):
    # The adaptive estimator is unbiased (pilot excluded from the image):
    # its mean must agree with the uniform fixed-spp renderer.
    from minipath_tpu.render.wavefront import render_frame_pt

    tracer, tstate, table, sampler, env = scene
    kw = dict(width=64, height=48, bounces=3, env=env, px_block=(16, 16))
    a = np.mean([
        np.asarray(render_frame_pt(
            tracer, tstate, table, sampler, jax.random.key(i),
            spp=16, samples_per_packet=8, **kw,
        ))[..., :3]
        for i in range(2)
    ], axis=0)
    b = np.mean([
        np.asarray(render_frame_pt_adaptive(
            tracer, tstate, table, sampler, jax.random.key(10 + i),
            spp=18, pilot_spp=2, samples_per_packet=8, **kw,
        ))[..., :3]
        for i in range(2)
    ], axis=0)
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.04)


def test_budget_and_allocation(scene):
    tracer, tstate, table, sampler, env = scene
    img, spp_map = render_frame_pt_adaptive(
        tracer, tstate, table, sampler, jax.random.key(3),
        width=64, height=48, spp=26, bounces=3, env=env,
        px_block=(16, 16), pilot_spp=2, samples_per_packet=8,
        return_spp_map=True,
    )
    img, spp_map = np.asarray(img), np.asarray(spp_map)
    assert np.isfinite(img).all() and img.shape == (48, 64, 4)
    # Every pixel got the pilot + at least one real chunk.
    assert spp_map.min() >= 2 + 8
    # The budget is respected on average (up to chunk quantization).
    assert abs(spp_map.mean() - 26) <= 8
    # The allocation is actually non-uniform on this scene (noisy glossy
    # sphere vs flat sky): someone got more than the floor.
    assert spp_map.max() > spp_map.min()


def test_adaptive_with_nee(scene):
    # NEE composes with adaptive rounds (lights + shadow tracer thread
    # through every chunk); mean agrees with the uniform NEE render.
    import numpy as np

    from minipath_tpu.render.wavefront import (
        make_xla_shadow_tracer,
        render_frame_pt,
    )
    from minipath_tpu.scene.materials import (
        Environment,
        build_light_table,
        emissive,
        lambertian,
        material_table,
    )
    from minipath_tpu.scene.procedural import make_quad, merge_meshes
    from minipath_tpu.scene.triangle_bvh import TriangleBvh
    from minipath_tpu.camera import Camera

    floor = make_quad(40.0)
    p = floor.positions.copy()
    floor.positions = np.stack([p[:, 0], p[:, 2], p[:, 1]], axis=-1)
    panel = make_quad(6.0)
    pp = panel.positions.copy()
    panel.positions = np.stack(
        [pp[:, 0], np.full_like(pp[:, 2], 8.0), pp[:, 1]], axis=-1
    )
    mesh = merge_meshes([floor, panel])
    mats = np.concatenate([
        np.zeros(len(floor.triangles), np.int32),
        np.ones(len(panel.triangles), np.int32),
    ])
    table = material_table([
        lambertian((0.6, 0.6, 0.6)), emissive((6.0, 6.0, 6.0)),
    ])
    obj = TriangleBvh.build(mesh, materials=mats)
    lights = build_light_table(
        obj.host_arrays.tri_packets, obj.host_arrays.tri_material, table
    )
    shadow, _ = make_xla_shadow_tracer(
        obj.arrays, stack_size=obj.recommended_stack_size, packet_size=256
    )
    from minipath_tpu.render.wavefront import make_xla_tracer

    tracer, tstate = make_xla_tracer(
        obj.arrays, stack_size=obj.recommended_stack_size, packet_size=256
    )
    cam = Camera().look_at((0, 6, 14), (0, 0, 0)).f_number(32.0)
    sampler = cam.build_sampler((32, 32))
    env = Environment.uniform((0.0, 0.0, 0.0))
    kw = dict(
        width=32, height=32, bounces=3, env=env, px_block=(16, 16),
        lights=lights, shadow_tracer=shadow,
    )
    a = np.asarray(render_frame_pt(
        tracer, tstate, table, sampler, jax.random.key(0),
        spp=16, samples_per_packet=8, **kw,
    ))[..., :3]
    b = np.asarray(render_frame_pt_adaptive(
        tracer, tstate, table, sampler, jax.random.key(1),
        spp=18, pilot_spp=2, samples_per_packet=8, **kw,
    ))[..., :3]
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.06)
    # The NEE depth cap threads through the adaptive rounds too (unbiased
    # at any K, so the mean must agree within MC noise).
    c = np.asarray(render_frame_pt_adaptive(
        tracer, tstate, table, sampler, jax.random.key(2),
        spp=18, pilot_spp=2, samples_per_packet=8, nee_max_depth=1, **kw,
    ))[..., :3]
    np.testing.assert_allclose(a.mean(), c.mean(), rtol=0.06)


def test_budget_too_small_raises(scene):
    tracer, tstate, table, sampler, env = scene
    with pytest.raises(ValueError):
        render_frame_pt_adaptive(
            tracer, tstate, table, sampler, jax.random.key(0),
            width=64, height=48, spp=4, bounces=3, env=env,
            pilot_spp=2, samples_per_packet=8,
        )
