"""Multi-device test bodies, run in a clean subprocess (see conftest note).

Invoked as ``python tests/parallel_impl.py <case>`` with the axon site
stripped from PYTHONPATH and an 8-device virtual CPU mesh forced. Exits 0 on
success; any exception is fatal and surfaces through the wrapper test.
"""

import sys


def case_devices():
    import jax

    assert len(jax.devices()) >= 8, jax.devices()


def case_sharded_matches_single():
    import numpy as np
    import jax

    from minipath_tpu.camera import Camera
    from minipath_tpu.parallel.mesh import (
        make_device_mesh,
        render_frame_sum,
        render_frame_sum_sharded,
    )
    from minipath_tpu.scene.procedural import make_uv_sphere
    from minipath_tpu.scene.triangle_bvh import TriangleBvh

    obj = TriangleBvh.build(make_uv_sphere(1.0, rings=16, segments=32))
    camera = Camera().look_at((0, 0, 4), (0, 0, 0)).f_number(16.0)
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
    # Different RNG folds per shard => compare Monte Carlo means; hit
    # coverage must agree except at silhouette pixels.
    assert abs(single[..., 3].mean() - sharded[..., 3].mean()) < 0.05 * spp
    solid = (single[..., 3] == spp) & (sharded[..., 3] == spp)
    assert solid.mean() > 0.2
    # MC noise at low spp: demand near-universal agreement, not universal.
    a, b = single[..., 0][solid], sharded[..., 0][solid]
    close = np.abs(a - b) <= 0.05 * spp + 0.15 * np.abs(b)
    assert close.mean() > 0.99, f"only {close.mean():.3%} of solid pixels agree"


def case_sharded_pallas_frame():
    """The PRODUCTION (Pallas-kernel) frame renderer sharded over 8 devices
    matches the single-device render (interpret-mode kernel on CPU), for
    both the f32 and the quantized scene layouts."""
    import numpy as np
    import jax

    from minipath_tpu.camera import Camera
    from minipath_tpu.parallel.mesh import make_device_mesh
    from minipath_tpu.render.frame import (
        make_frame_renderer_sharded,
        render_frame_pallas,
    )
    from minipath_tpu.render.pallas_kernels import (
        prepare_scene,
        prepare_scene_quantized,
    )
    from minipath_tpu.scene.procedural import make_uv_sphere
    from minipath_tpu.scene.triangle_bvh import TriangleBvh

    obj = TriangleBvh.build(make_uv_sphere(1.0, rings=12, segments=20))
    camera = Camera().look_at((0, 0, 4), (0, 0, 0)).f_number(16.0)
    w = h = 48
    spp = 4
    sampler = camera.build_sampler((w, h))
    key = jax.random.key(3)
    stack = obj.recommended_stack_size
    mesh = make_device_mesh(8)

    for scene in [prepare_scene(obj.arrays), prepare_scene_quantized(obj.host_arrays)]:
        single = np.asarray(
            render_frame_pallas(
                obj.arrays, sampler, key,
                width=w, height=h, spp=spp, stack_size=stack,
                px_block=(16, 16), samples_per_packet=spp,
                scene=scene, interpret=True,
            )
        )
        renderer = make_frame_renderer_sharded(
            mesh, width=w, height=h, stack_size=stack,
            px_block=(16, 16), samples_per_packet=spp, interpret=True,
        )
        sharded = np.asarray(renderer(scene, sampler, key, spp))
        assert sharded.shape == single.shape == (h, w, 4)
        assert np.isfinite(sharded).all()
        # Different RNG folds per shard => compare Monte Carlo statistics.
        assert abs(single[..., 3].mean() - sharded[..., 3].mean()) < 0.05
        solid = (single[..., 3] == 1.0) & (sharded[..., 3] == 1.0)
        assert solid.mean() > 0.2
        a, b = single[..., 0][solid], sharded[..., 0][solid]
        close = np.abs(a - b) <= 0.06 + 0.15 * np.abs(b)
        assert close.mean() > 0.99, f"only {close.mean():.3%} agree"


def case_machinery_mesh_identical():
    """render(..., mesh=...) must produce a BIT-IDENTICAL image to the
    single-device render (per-tile keys come from global tile indices)."""
    import numpy as np
    import jax

    from minipath_tpu.camera import Camera
    from minipath_tpu.parallel.mesh import make_device_mesh
    from minipath_tpu.render.machinery import RenderSettings, render
    from minipath_tpu.scene import Scene
    from minipath_tpu.scene.procedural import make_uv_sphere
    from minipath_tpu.scene.triangle_bvh import TriangleBvh

    obj = TriangleBvh.build(make_uv_sphere(1.0, rings=12, segments=20))
    camera = Camera().look_at((0, 0, 4), (0, 0, 0)).f_number(16.0)
    settings = RenderSettings(tile_size=32, sample_count=2, resolution=(96, 64))
    import numpy.random as npr

    p1 = render(Scene(obj), camera, settings, seed=5, backend="xla",
                tile_rng=npr.default_rng(0))
    p1.wait()
    mesh = make_device_mesh(8)
    p2 = render(Scene(obj), camera, settings, seed=5, backend="xla",
                tile_rng=npr.default_rng(0), mesh=mesh)
    p2.wait()
    np.testing.assert_array_equal(p1.image(), p2.image())


def case_sharded_pt():
    """The wavefront path tracer sharded over 8 devices matches the
    single-device render (XLA tracer on the CPU mesh; estimator means)."""
    import numpy as np
    import jax

    from minipath_tpu.camera import Camera
    from minipath_tpu.parallel.mesh import make_device_mesh
    from minipath_tpu.render.wavefront import (
        make_pt_renderer_sharded,
        make_xla_tracer,
        render_frame_pt,
    )
    from minipath_tpu.scene.materials import (
        Environment,
        lambertian,
        material_table,
    )
    from minipath_tpu.scene.procedural import make_uv_sphere
    from minipath_tpu.scene.triangle_bvh import TriangleBvh

    obj = TriangleBvh.build(make_uv_sphere(1.0, rings=10, segments=16))
    table = material_table([lambertian((0.6, 0.5, 0.4))])
    env = Environment.uniform((0.7, 0.8, 1.0))
    camera = Camera().look_at((0, 0, 4), (0, 0, 0)).f_number(32.0)
    w = h = 32
    spp = 8
    sampler = camera.build_sampler((w, h))
    key = jax.random.key(9)
    tracer, tstate = make_xla_tracer(
        obj.arrays, stack_size=obj.recommended_stack_size, packet_size=256
    )
    single = np.asarray(
        render_frame_pt(
            tracer, tstate, table, sampler, key,
            width=w, height=h, spp=spp, bounces=3, env=env,
            px_block=(16, 16), samples_per_packet=spp,
        )
    )
    mesh = make_device_mesh(8)
    renderer = make_pt_renderer_sharded(
        mesh, tracer, width=w, height=h, px_block=(16, 16),
        samples_per_packet=spp, bounces=3,
    )
    sharded = np.asarray(renderer(tstate, table, sampler, key, spp, env=env))
    assert sharded.shape == single.shape == (h, w, 4)
    assert np.isfinite(sharded).all()
    # Decorrelated RNG across shards: compare Monte Carlo means per channel.
    for c in range(3):
        a, b = single[..., c].mean(), sharded[..., c].mean()
        assert abs(a - b) < 0.05, (c, a, b)
    # Per-pixel agreement within MC noise for most pixels.
    err = np.abs(single[..., :3] - sharded[..., :3])
    assert (err < 0.25).mean() > 0.97, float((err < 0.25).mean())


def case_sharded_pt_nee():
    """Sharded NEE (lights replicated through shard_map, device-local
    shadow rays) matches the single-device NEE render."""
    import numpy as np
    import jax

    from minipath_tpu.camera import Camera
    from minipath_tpu.parallel.mesh import make_device_mesh
    from minipath_tpu.render.wavefront import (
        make_pt_renderer_sharded,
        make_xla_shadow_tracer,
        make_xla_tracer,
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

    floor = make_quad(40.0)
    pos = floor.positions.copy()
    floor.positions = np.stack([pos[:, 0], pos[:, 2], pos[:, 1]], axis=-1)
    panel = make_quad(6.0)
    ppos = panel.positions.copy()
    panel.positions = np.stack(
        [ppos[:, 0], np.full_like(ppos[:, 2], 8.0), ppos[:, 1]], axis=-1
    )
    mesh_data = merge_meshes([floor, panel])
    mats = np.zeros(mesh_data.triangle_count, np.int32)
    mats[floor.triangle_count:] = 1
    obj = TriangleBvh.build(mesh_data, materials=mats)
    table = material_table(
        [lambertian((0.6, 0.6, 0.6)), emissive((1.0, 1.0, 1.0), 3.0)]
    )
    env = Environment.none()
    camera = Camera().look_direction((0, 5, 0), (0, -1, 0), (0, 0, 1))
    w = h = 32
    spp = 8
    sampler = camera.build_sampler((w, h))
    key = jax.random.key(5)
    tracer, tstate = make_xla_tracer(
        obj.arrays, stack_size=obj.recommended_stack_size, packet_size=256
    )
    shadow, _ = make_xla_shadow_tracer(
        obj.arrays, stack_size=obj.recommended_stack_size, packet_size=256
    )
    arrays = obj.host_arrays
    lights = build_light_table(arrays.tri_packets, arrays.tri_material, table)
    assert lights is not None
    single = np.asarray(
        render_frame_pt(
            tracer, tstate, table, sampler, key,
            width=w, height=h, spp=spp, bounces=3, env=env,
            px_block=(16, 16), samples_per_packet=spp,
            lights=lights, shadow_tracer=shadow,
        )
    )
    mesh = make_device_mesh(8)
    renderer = make_pt_renderer_sharded(
        mesh, tracer, width=w, height=h, px_block=(16, 16),
        samples_per_packet=spp, bounces=3,
        lights=lights, shadow_tracer=shadow,
    )
    sharded = np.asarray(renderer(tstate, table, sampler, key, spp, env=env))
    assert sharded.shape == single.shape == (h, w, 4)
    assert np.isfinite(sharded).all()
    assert single[..., :3].mean() > 0.02  # the panel lights the floor
    for c in range(3):
        a, b = single[..., c].mean(), sharded[..., c].mean()
        assert abs(a - b) < 0.05, (c, a, b)
    err = np.abs(single[..., :3] - sharded[..., :3])
    assert (err < 0.25).mean() > 0.97, float((err < 0.25).mean())


def case_graft_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def main():
    case = sys.argv[1]
    fn = globals()[f"case_{case}"]
    fn()
    print(f"case_{case}: OK")


if __name__ == "__main__":
    main()
