"""Pallas kernel tests (interpret mode on CPU): exact agreement with the
pure-XLA packet traversal and the brute-force oracle."""

import numpy as np
import jax
import pytest

from minipath_tpu.geometry import make_rays
from minipath_tpu.render.pallas_kernels import (
    intersect_bvh_pallas,
    prepare_scene,
    rays_to_rays9,
    trace_packets_pallas,
)
from minipath_tpu.render.traversal import trace_brute_force, trace_packets
from minipath_tpu.scene.bvh.build import build_bvh
from minipath_tpu.scene.procedural import (
    make_cube,
    make_random_triangles,
    make_uv_sphere,
    merge_meshes,
)


def _check_against_brute(mesh, rays, stack_size=64):
    bvh = build_bvh(mesh).as_device()
    scene = prepare_scene(bvh)
    kh = trace_packets_pallas(
        scene, rays_to_rays9(rays), stack_size=stack_size, interpret=True
    )
    got_t, got_tri = kh.t, kh.tri
    want = trace_brute_force(bvh.tri_packets, rays)
    got_t, got_tri = np.asarray(got_t), np.asarray(got_tri)
    want_t, want_tri = np.asarray(want.t), np.asarray(want.tri)
    assert ((got_tri >= 0) == (want_tri >= 0)).all()
    hits = want_tri >= 0
    np.testing.assert_allclose(got_t[hits], want_t[hits], rtol=1e-5, atol=1e-6)
    with np.errstate(invalid="ignore"):
        tie = np.abs(got_t - want_t) <= 1e-6 + 1e-5 * np.abs(want_t)
    assert ((got_tri == want_tri) | tie)[hits].all()


def test_pallas_matches_oracle_random(rng):
    mesh = make_random_triangles(1200, seed=21)
    origin = rng.uniform(-12, 12, (4, 128, 3)).astype(np.float32)
    direction = rng.normal(size=(4, 128, 3)).astype(np.float32)
    _check_against_brute(mesh, make_rays(origin, direction))


def test_pallas_matches_oracle_coherent(rng):
    mesh = merge_meshes(
        [make_cube(3.0), make_uv_sphere(1.0, center=(2, 0, 0), rings=10, segments=14)]
    )
    origin = np.tile(np.array([0, 0, -6], np.float32), (2, 128, 1))
    direction = np.array([0, 0, 1], np.float32) + 0.15 * rng.normal(
        size=(2, 128, 3)
    ).astype(np.float32)
    _check_against_brute(mesh, make_rays(origin, direction))


def test_pallas_matches_xla_traversal(rng):
    mesh = make_random_triangles(800, seed=31)
    bvh = build_bvh(mesh).as_device()
    scene = prepare_scene(bvh)
    origin = rng.uniform(-12, 12, (3, 128, 3)).astype(np.float32)
    direction = rng.normal(size=(3, 128, 3)).astype(np.float32)
    rays = make_rays(origin, direction)
    kh = trace_packets_pallas(
        scene, rays_to_rays9(rays), stack_size=64, interpret=True
    )
    p_t, p_tri = kh.t, kh.tri
    x = trace_packets(bvh, rays, stack_size=64)
    hits = np.asarray(x.tri) >= 0
    assert ((np.asarray(p_tri) >= 0) == hits).all()
    np.testing.assert_allclose(
        np.asarray(p_t)[hits], np.asarray(x.t)[hits], rtol=1e-5, atol=1e-6
    )


def test_pallas_finalize_path(rng):
    mesh = make_uv_sphere(rings=12, segments=20)
    from minipath_tpu.scene.triangle_bvh import TriangleBvh

    obj = TriangleBvh.build(mesh)
    scene = prepare_scene(obj.arrays)
    n = 128
    origin = np.tile(np.array([0, 0, -4], np.float32), (1, n, 1))
    direction = np.array([0, 0, 1], np.float32) + 0.2 * rng.normal(size=(1, n, 3)).astype(np.float32)
    rays = make_rays(origin, direction)
    hp = intersect_bvh_pallas(obj.arrays, scene, rays, stack_size=48, interpret=True)
    hx = obj.intersect(rays)
    np.testing.assert_array_equal(np.asarray(hp.hit), np.asarray(hx.hit))
    m = np.asarray(hx.hit)
    np.testing.assert_allclose(
        np.asarray(hp.normal)[m], np.asarray(hx.normal)[m], atol=1e-5
    )


def test_pallas_empty_root():
    from minipath_tpu.scene.obj_loader import MeshData

    bvh = build_bvh(MeshData()).as_device()
    scene = prepare_scene(bvh)
    rays = make_rays(
        np.zeros((1, 128, 3), np.float32), np.ones((1, 128, 3), np.float32)
    )
    kh = trace_packets_pallas(
        scene, rays_to_rays9(rays), stack_size=8, interpret=True
    )
    assert (np.asarray(kh.tri) == -1).all()


def test_pallas_stack_overflow_fails_loudly(rng):
    """An undersized traversal stack must report overflow, not silently
    corrupt SMEM (reference analog: growable StackCache,
    ray_bvh_intersection.rs:19-23)."""
    mesh = make_random_triangles(1200, seed=5)
    res = build_bvh(mesh)
    bvh = res.as_device()
    scene = prepare_scene(bvh)
    origin = rng.uniform(-12, 12, (2, 128, 3)).astype(np.float32)
    direction = rng.normal(size=(2, 128, 3)).astype(np.float32)
    rays = make_rays(origin, direction)
    r9 = rays_to_rays9(rays)

    tiny = trace_packets_pallas(scene, r9, stack_size=2, interpret=True)
    assert np.asarray(tiny.overflow).sum() > 0

    full = trace_packets_pallas(
        scene, r9, stack_size=res.recommended_stack_size, interpret=True
    )
    assert np.asarray(full.overflow).sum() == 0
    # With the recommended stack the results match the oracle.
    want = trace_brute_force(bvh.tri_packets, rays)
    assert (
        (np.asarray(full.tri) >= 0) == (np.asarray(want.tri) >= 0)
    ).all()


def test_xla_traversal_overflow_counter(rng):
    mesh = make_random_triangles(900, seed=6)
    res = build_bvh(mesh)
    bvh = res.as_device()
    origin = rng.uniform(-12, 12, (2, 64, 3)).astype(np.float32)
    direction = rng.normal(size=(2, 64, 3)).astype(np.float32)
    rays = make_rays(origin, direction)
    tiny = trace_packets(bvh, rays, stack_size=2)
    assert int(tiny.overflow) > 0
    full = trace_packets(bvh, rays, stack_size=res.recommended_stack_size)
    assert int(full.overflow) == 0


def test_recommended_stack_bound():
    mesh = make_random_triangles(3000, seed=9)
    res = build_bvh(mesh)
    assert res.recommended_stack_size >= 7 * res.max_depth + 1


def test_pallas_in_kernel_shading_matches_finalize(rng):
    """The kernel's |d.n| must equal shade via finalize_hits (smooth + flat)."""
    from minipath_tpu.scene.procedural import make_quad
    from minipath_tpu.render.integrator import shade_normal_dot

    for mesh in [make_uv_sphere(rings=10, segments=16), make_quad(2.0)]:
        bvh = build_bvh(mesh).as_device()
        scene = prepare_scene(bvh)
        origin = np.tile(np.array([0, 0, -4], np.float32), (1, 128, 1))
        direction = np.array([0, 0, 1], np.float32) + 0.3 * rng.normal(
            size=(1, 128, 3)
        ).astype(np.float32)
        rays = make_rays(origin, direction)
        kh = trace_packets_pallas(
            scene, rays_to_rays9(rays), stack_size=48, interpret=True
        )
        dot = np.abs(np.sum(np.asarray(rays.direction) * np.asarray(kh.normal), axis=-1))
        tri = kh.tri
        from minipath_tpu.render.traversal import intersect_bvh

        hits = intersect_bvh(bvh, rays, stack_size=48)
        want = shade_normal_dot(rays, hits)[..., 0]
        got = dot * (np.asarray(tri) >= 0)
        np.testing.assert_allclose(got, np.asarray(want), atol=2e-5)


def test_live_prefix_early_exit(rng):
    """With live_packets=k, packets [0,k) produce normal results and packets
    [k,B) report misses without traversing (the wavefront dead-suffix skip)."""
    mesh = make_random_triangles(600, seed=8)
    res = build_bvh(mesh)
    bvh = res.as_device()
    scene = prepare_scene(bvh)
    origin = rng.uniform(-12, 12, (4, 128, 3)).astype(np.float32)
    direction = rng.normal(size=(4, 128, 3)).astype(np.float32)
    r9 = rays_to_rays9(make_rays(origin, direction))
    full = trace_packets_pallas(
        scene, r9, stack_size=res.recommended_stack_size, interpret=True
    )
    part = trace_packets_pallas(
        scene,
        r9,
        stack_size=res.recommended_stack_size,
        interpret=True,
        live_packets=np.int32(2),
    )
    np.testing.assert_array_equal(np.asarray(part.tri)[:2], np.asarray(full.tri)[:2])
    np.testing.assert_array_equal(np.asarray(part.t)[:2], np.asarray(full.t)[:2])
    assert (np.asarray(part.tri)[2:] == -1).all()


def test_pt_kernel_matches_oracle(rng):
    """The lean PT kernel (octant-order traversal, no in-kernel shading)
    must find the same closest hits as the brute-force oracle."""
    from minipath_tpu.render.pallas_kernels import (
        prepare_scene_pt,
        trace_packets_pallas_pt,
    )

    mesh = make_random_triangles(1000, seed=41)
    res = build_bvh(mesh)
    bvh = res.as_device()
    sp = prepare_scene_pt(res.arrays)
    origin = rng.uniform(-12, 12, (3, 128, 3)).astype(np.float32)
    direction = rng.normal(size=(3, 128, 3)).astype(np.float32)
    rays = make_rays(origin, direction)
    ph = trace_packets_pallas_pt(
        sp, rays_to_rays9(rays), stack_size=res.recommended_stack_size,
        interpret=True,
    )
    want = trace_brute_force(bvh.tri_packets, rays)
    got_tri, want_tri = np.asarray(ph.tri), np.asarray(want.tri)
    assert ((got_tri >= 0) == (want_tri >= 0)).all()
    hits = want_tri >= 0
    np.testing.assert_allclose(
        np.asarray(ph.t)[hits], np.asarray(want.t)[hits], rtol=1e-5, atol=1e-6
    )
    assert np.asarray(ph.overflow).sum() == 0
    # The pop-2 body (two stack entries per iteration, straight-line) must
    # find the same hit distances; tri ids may differ only on exact-t ties.
    p2 = trace_packets_pallas_pt(
        sp, rays_to_rays9(rays), stack_size=res.recommended_stack_size,
        interpret=True, pop2=True,
    )
    np.testing.assert_allclose(
        np.asarray(p2.t)[hits], np.asarray(want.t)[hits], rtol=1e-5, atol=1e-6
    )
    assert ((np.asarray(p2.tri) >= 0) == (want_tri >= 0)).all()
    # Undersized stack reports overflow instead of corrupting.
    tiny = trace_packets_pallas_pt(
        sp, rays_to_rays9(rays), stack_size=2, interpret=True
    )
    assert np.asarray(tiny.overflow).sum() > 0


def test_pt_kernel_seeded_matches_unseeded(rng):
    """Seeded traversal (pre-loaded TRUE per-lane hits) must return the
    same closest hits as an unseeded trace while doing no more work —
    whether seeds are perfect, partial, or all-miss."""
    import jax.numpy as jnp

    from minipath_tpu.render.pallas_kernels import (
        prepare_scene_pt,
        trace_packets_pallas_pt,
    )

    mesh = make_random_triangles(1000, seed=47)
    res = build_bvh(mesh)
    sp = prepare_scene_pt(res.arrays)
    origin = rng.uniform(-12, 12, (3, 128, 3)).astype(np.float32)
    direction = rng.normal(size=(3, 128, 3)).astype(np.float32)
    r9 = rays_to_rays9(make_rays(origin, direction))
    ss = res.recommended_stack_size
    base = trace_packets_pallas_pt(sp, r9, stack_size=ss, interpret=True)

    def check(seed):
        got = trace_packets_pallas_pt(
            sp, r9, stack_size=ss, interpret=True, seed=seed
        )
        np.testing.assert_allclose(
            np.asarray(got.t), np.asarray(base.t), rtol=1e-6, atol=1e-7
        )
        assert (np.asarray(got.tri) == np.asarray(base.tri)).all()
        return got

    # Perfect seeds: identical result, no more traversal work and strictly
    # fewer leaf tests (the scene is shallow, so inner visits may tie).
    got = check((base.t, base.tri, base.u, base.v))
    assert (
        np.asarray(got.inner_visits).sum()
        <= np.asarray(base.inner_visits).sum()
    )
    assert np.asarray(got.leaf_tests).sum() < np.asarray(base.leaf_tests).sum()
    # Partial seeds (every other lane a miss) stay exact.
    t = np.asarray(base.t).copy()
    tri = np.asarray(base.tri).copy()
    u = np.asarray(base.u).copy()
    v = np.asarray(base.v).copy()
    t[:, 1::2], tri[:, 1::2], u[:, 1::2], v[:, 1::2] = np.inf, -1, 0.0, 0.0
    check(tuple(map(jnp.asarray, (t, tri, u, v))))
    # All-miss seeds degenerate to the unseeded trace, same work.
    none = (
        jnp.full_like(base.t, jnp.inf),
        jnp.full_like(base.tri, -1),
        jnp.zeros_like(base.u),
        jnp.zeros_like(base.v),
    )
    got = check(none)
    assert (
        np.asarray(got.inner_visits).sum()
        == np.asarray(base.inner_visits).sum()
    )


def test_pt_tracer_matches_full_tracer(rng):
    """make_pt_tracer's gathered+interpolated normals and materials must
    match the full kernel's in-kernel shading on the same rays."""
    import jax.numpy as jnp

    from minipath_tpu.render.pallas_kernels import prepare_scene_pt
    from minipath_tpu.render.wavefront import make_pallas_tracer, make_pt_tracer

    mesh = make_uv_sphere(rings=10, segments=16)
    from minipath_tpu.scene.triangle_bvh import TriangleBvh

    obj = TriangleBvh.build(mesh)
    scene = prepare_scene(obj.arrays)
    sp = prepare_scene_pt(obj.host_arrays)
    stack = obj.recommended_stack_size
    n = 256
    o = np.tile(np.array([0, 0, -4], np.float32), (n, 1))
    d = np.array([0, 0, 1], np.float32) + 0.25 * rng.normal(size=(n, 3)).astype(
        np.float32
    )
    inv = np.where(d == 0, np.inf, 1.0 / d).astype(np.float32)
    full_tr, full_st = make_pallas_tracer(
        scene, stack_size=stack, packet_size=256, interpret=True
    )
    lean_tr, lean_st = make_pt_tracer(
        sp, stack_size=stack, packet_size=256, interpret=True
    )
    a = full_tr(full_st, jnp.asarray(o), jnp.asarray(d), jnp.asarray(inv))
    b = lean_tr(lean_st, jnp.asarray(o), jnp.asarray(d), jnp.asarray(inv))
    np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
    m = np.asarray(a.tri) >= 0
    np.testing.assert_allclose(
        np.asarray(a.t)[m], np.asarray(b.t)[m], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.normal)[m], np.asarray(b.normal)[m], atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(a.material)[m], np.asarray(b.material)[m]
    )


def test_compact_preserves_state_and_sorts_dead_last(rng):
    from minipath_tpu.render.wavefront import _PathState, _compact
    import jax.numpy as jnp

    n = 1000
    o = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    inv = np.where(d == 0, np.inf, 1.0 / d).astype(np.float32)
    state = _PathState(
        origin=jnp.asarray(o),
        direction=jnp.asarray(d),
        inv_direction=jnp.asarray(inv),
        throughput=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        radiance=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        pixel=jnp.arange(n, dtype=jnp.int32),
        active=jnp.asarray(rng.uniform(size=n) < 0.6),
    )
    out = _compact(state)
    perm = np.asarray(out.pixel)  # pixel was identity -> the permutation
    assert sorted(perm.tolist()) == list(range(n))  # a real permutation
    for field in ("origin", "direction", "inv_direction", "throughput", "radiance"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, field)),
            np.asarray(getattr(state, field))[perm],
            rtol=1e-6,
        )
    act = np.asarray(out.active)
    live = int(act.sum())
    assert act[:live].all() and not act[live:].any()  # dead is a suffix
