"""Two-level binned traversal: exact parity with the flat tracer.

The two-level tracer (``render/twolevel.py``) must return bit-identical
hits to a single-root trace — rays visit their treelets near-to-far and
anything skipped is provably occluded (the packet-level generalization of
the per-ray prune in
``/root/reference/src/scene/triangle_bvh/ray_bvh_intersection.rs:40-44``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def sphere_scene():
    from minipath_tpu.render.pallas_kernels import prepare_scene_pt
    from minipath_tpu.scene.procedural import make_uv_sphere
    from minipath_tpu.scene.triangle_bvh import TriangleBvh

    bvh = TriangleBvh.build(make_uv_sphere(1.0, rings=16, segments=32))
    res = bvh.build_result
    return res, prepare_scene_pt(res.as_device())


def _random_rays(rng, n):
    o = jnp.asarray(rng.uniform(-3, 3, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    inv = jnp.where(d == 0, jnp.inf, 1.0 / d)
    return o, d, inv


def test_treelet_extraction_covers_tree(sphere_scene):
    """Treelet links partition the frontier: every leaf is reachable from
    exactly one treelet, and treelet boxes sit inside the root box."""
    from minipath_tpu.render.twolevel import build_treelets
    from minipath_tpu.scene.bvh import links as L

    res, _ = sphere_scene
    tl = build_treelets(res.arrays, levels=2)
    links = np.asarray(tl.links)
    assert links.size >= 1
    assert not np.any(links == L.NULL_LINK)
    bmin = np.asarray(tl.box_min)
    bmax = np.asarray(tl.box_max)
    assert np.all(bmin <= bmax)
    root_min = np.asarray(res.arrays.bbox_min)
    root_max = np.asarray(res.arrays.bbox_max)
    eps = 1e-4 * (1 + np.abs(root_max - root_min))
    assert np.all(bmin >= root_min - eps)
    assert np.all(bmax <= root_max + eps)

    # Count triangles reachable from the treelet frontier == whole tree.
    node_links = np.asarray(res.arrays.node_child_links)

    def count(link):
        if link == L.NULL_LINK:
            return 0
        if L.is_leaf(link):
            return int(L.decode_count(link)) * 8
        return sum(count(int(c)) for c in node_links[L.decode_index(link)])

    total = count(int(np.asarray(res.arrays.root)))
    via_treelets = sum(count(int(l)) for l in links)
    assert via_treelets == total


@pytest.mark.parametrize("rounds", [1, 2, 3])
def test_twolevel_matches_flat(sphere_scene, rng, rounds):
    from minipath_tpu.render.twolevel import build_treelets, make_pt_tracer_twolevel
    from minipath_tpu.render.wavefront import make_pt_tracer

    res, scene = sphere_scene
    stack = res.recommended_stack_size
    tl = build_treelets(res.arrays, levels=2)
    o, d, inv = _random_rays(rng, 768)
    active = jnp.asarray(rng.uniform(size=768) < 0.8)

    flat, fs = make_pt_tracer(scene, stack_size=stack, packet_size=256, interpret=True)
    two, ts = make_pt_tracer_twolevel(
        scene, tl, stack_size=stack, packet_size=256, K=8, rounds=rounds,
        interpret=True,
    )
    kf = flat(fs, o, d, inv)
    kt = two(ts, o, d, inv, active)
    a = np.asarray(active)
    tri_f = np.asarray(kf.tri)[a]
    tri_t = np.asarray(kt.tri)[a]
    assert np.array_equal(tri_f, tri_t)
    both = tri_f >= 0
    assert both.any()
    np.testing.assert_allclose(
        np.asarray(kt.t)[a][both], np.asarray(kf.t)[a][both], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(kt.normal)[a][both],
        np.asarray(kf.normal)[a][both],
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(kt.texture_coords)[a][both],
        np.asarray(kf.texture_coords)[a][both],
        rtol=1e-4,
        atol=1e-5,
    )


def test_twolevel_live_count_contract(sphere_scene, rng):
    """Passing a live-ray COUNT (dead suffix) must match passing the
    equivalent mask — the compaction loop uses the count form."""
    from minipath_tpu.render.twolevel import build_treelets, make_pt_tracer_twolevel

    res, scene = sphere_scene
    tl = build_treelets(res.arrays, levels=2)
    o, d, inv = _random_rays(rng, 512)
    live = 300
    mask = jnp.arange(512) < live
    two, ts = make_pt_tracer_twolevel(
        scene, tl, stack_size=res.recommended_stack_size, packet_size=256,
        interpret=True,
    )
    by_count = two(ts, o, d, inv, jnp.int32(live))
    by_mask = two(ts, o, d, inv, mask)
    np.testing.assert_array_equal(
        np.asarray(by_count.tri)[:live], np.asarray(by_mask.tri)[:live]
    )
