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
