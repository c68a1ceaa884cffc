"""Quantized lean-PT kernel tests: the path tracer past the f32 VMEM budget.

The reference renders any scene that fits RAM through ONE full-featured
traversal (``ray_bvh_intersection.rs:26-96``, texcoord finalization
``:87-93``). These tests pin the same property onto the TPU build's
scalability rungs: the 16-bit quantized kernel (and its HBM-streamed
variant) must offer the full PT contract — closest-hit (t, tri, u, v),
anyhit occlusion with whole-packet retire, and shading/texcoords via the
HBM ``shade_flat`` gather — with results matching the VMEM/f32 engines up
to quantization tolerance.

Interpret-mode Pallas on CPU, tiny scenes.
"""

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.render.pallas_kernels import (
    prepare_scene_qpt,
    prepare_scene_quantized,
    rays_to_rays9,
    trace_packets_pallas_q,
)
from minipath_tpu.scene.bvh.build import build_bvh
from minipath_tpu.scene.procedural import make_uv_sphere


def _sphere_build():
    mesh = make_uv_sphere(1.0, rings=12, segments=20)
    # The generator leaves texcoords zeroed; synthesize spherical UVs so
    # the texcoord pipeline has real data to interpolate.
    p = mesh.positions
    mesh.texcoords = np.stack(
        [
            (np.arctan2(p[:, 2], p[:, 0]) / (2 * np.pi)) % 1.0,
            np.arccos(np.clip(p[:, 1], -1, 1)) / np.pi,
            np.zeros(len(p), np.float32),
        ],
        axis=-1,
    ).astype(np.float32)
    return build_bvh(mesh)


def _sphere_rays(rng, B=2):
    from minipath_tpu.geometry import make_rays

    origin = np.tile(np.array([0, 0, -4], np.float32), (B, 128, 1))
    direction = np.array([0, 0, 1], np.float32) + 0.25 * rng.normal(
        size=(B, 128, 3)
    ).astype(np.float32)
    return make_rays(origin, direction)


def test_lean_q_matches_full_q(rng):
    """lean=True must find the identical winning triangle and distance as
    the legacy full-shading quantized kernel (same decompression, same MT
    math, same traversal order) — only the outputs differ."""
    res = _sphere_build()
    q = prepare_scene_quantized(res.arrays)
    qpt = prepare_scene_qpt(res.arrays)
    rays = _sphere_rays(rng)
    r9 = rays_to_rays9(rays)
    stack = res.recommended_stack_size
    full = trace_packets_pallas_q(q, r9, stack_size=stack, interpret=True)
    lean = trace_packets_pallas_q(
        qpt, r9, stack_size=stack, interpret=True, lean=True
    )
    np.testing.assert_array_equal(np.asarray(full.tri), np.asarray(lean.tri))
    np.testing.assert_allclose(
        np.asarray(full.t), np.asarray(lean.t), rtol=1e-6
    )
    hits = np.asarray(lean.tri) >= 0
    assert hits.sum() > 50
    u, v = np.asarray(lean.u), np.asarray(lean.v)
    assert (u[hits] >= 0).all() and (v[hits] >= 0).all()
    assert (u[hits] + v[hits] <= 1 + 1e-6).all()
    # Diagnostics populated (the PT cost counters).
    assert np.asarray(lean.inner_visits).sum() > 0
    assert np.asarray(lean.leaf_tests).sum() > 0
    assert np.asarray(lean.overflow).sum() == 0


def test_lean_q_shade_matches_full_q_normals(rng):
    """shade_from_flat over the lean kernel's (tri, u, v) reproduces the
    legacy kernel's in-kernel interpolated normals (up to i8 quantization
    of the stored normals) and materials exactly — the texcoord-capable
    deferred-shading path works on quantized scenes."""
    from minipath_tpu.render.wavefront import shade_from_flat

    res = _sphere_build()
    q = prepare_scene_quantized(res.arrays)
    qpt = prepare_scene_qpt(res.arrays)
    rays = _sphere_rays(rng)
    r9 = rays_to_rays9(rays)
    stack = res.recommended_stack_size
    full = trace_packets_pallas_q(q, r9, stack_size=stack, interpret=True)
    lean = trace_packets_pallas_q(
        qpt, r9, stack_size=stack, interpret=True, lean=True
    )
    B, P = np.asarray(lean.tri).shape
    normal, material, tex = shade_from_flat(
        qpt.shade_flat,
        lean.tri.reshape(B * P),
        lean.u.reshape(B * P),
        lean.v.reshape(B * P),
    )
    hits = np.asarray(lean.tri).reshape(-1) >= 0
    n_lean = np.asarray(normal)[hits]
    n_full = np.asarray(full.normal).reshape(B * P, 3)[hits]
    # The lean path interpolates exact f32 vertex normals; the legacy
    # kernel interpolates i8-quantized ones — agreement within i8 error.
    assert np.abs(n_lean - n_full).max() < 0.04
    np.testing.assert_array_equal(
        np.asarray(material)[hits],
        np.asarray(full.material).reshape(-1)[hits],
    )
    # UV-sphere texcoords: in range, and varying across the surface.
    t = np.asarray(tex)[hits]
    assert t[:, 0].min() >= -1e-6 and t[:, 0].max() <= 1 + 1e-6
    assert t.std(axis=0).max() > 0.01


def test_lean_q_hbm_bit_identical(rng):
    """HBM-streamed lean trace == VMEM-resident lean trace, bit for bit
    (only the triangle rows' residence differs) — the 5M-tri rung offers
    the full PT contract."""
    res = _sphere_build()
    qpt = prepare_scene_qpt(res.arrays)
    qpth = prepare_scene_qpt(res.arrays, hbm_tris=True)
    assert not qpt.hbm_tris and qpth.hbm_tris
    rays = _sphere_rays(rng)
    r9 = rays_to_rays9(rays)
    stack = res.recommended_stack_size
    a = trace_packets_pallas_q(
        qpt, r9, stack_size=stack, interpret=True, lean=True
    )
    b = trace_packets_pallas_q(
        qpth, r9, stack_size=stack, interpret=True, lean=True, hbm_tris=True
    )
    np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(np.asarray(a.u), np.asarray(b.u))
    np.testing.assert_array_equal(np.asarray(a.v), np.asarray(b.v))


def test_qpt_anyhit_matches_closest(rng):
    """Quantized anyhit occlusion must report exactly the occluded set a
    closest-hit lean trace finds with the same t_max (and exercise the
    whole-packet retire without changing the answer)."""
    res = _sphere_build()
    qpt = prepare_scene_qpt(res.arrays)
    stack = res.recommended_stack_size
    n = 256
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    seg = tgt - o
    inv = np.where(seg == 0, np.inf, 1.0 / seg).astype(np.float32)
    r9 = jnp.asarray(np.concatenate([o, seg, inv], -1)).reshape(2, 128, 9)
    r9 = jnp.swapaxes(r9, 1, 2).reshape(2, 9, 1, 128)
    t_max = 1.0 - 1e-5
    closest = trace_packets_pallas_q(
        qpt, r9, stack_size=stack, interpret=True, lean=True, t_max=t_max
    )
    any_ = trace_packets_pallas_q(
        qpt, r9, stack_size=stack, interpret=True, lean=True, anyhit=True,
        t_max=t_max,
    )
    want = np.asarray(closest.tri) >= 0
    got = np.asarray(any_.tri) >= 0
    np.testing.assert_array_equal(got, want)
    assert want.any() and not want.all()


def test_make_pt_tracer_dispatches_qpt(rng):
    """make_pt_tracer over a QPTScene returns the full KernelHits contract
    (normal, material, texture_coords) and agrees with the f32 lean tracer
    up to quantization tolerance — one factory, any scene size."""
    from minipath_tpu.render.pallas_kernels import prepare_scene_pt
    from minipath_tpu.render.wavefront import make_pt_tracer

    res = _sphere_build()
    stack = res.recommended_stack_size
    f32 = prepare_scene_pt(res.as_device())
    qpt = prepare_scene_qpt(res.arrays)
    tr_f, _ = make_pt_tracer(f32, stack_size=stack, packet_size=128,
                             interpret=True)
    tr_q, _ = make_pt_tracer(qpt, stack_size=stack, packet_size=128,
                             interpret=True)
    rays = _sphere_rays(rng, B=1)
    o = jnp.asarray(np.asarray(rays.origin).reshape(128, 3))
    d = jnp.asarray(np.asarray(rays.direction).reshape(128, 3))
    iv = jnp.asarray(np.asarray(rays.inv_direction).reshape(128, 3))
    a = tr_f(f32, o, d, iv)
    b = tr_q(qpt, o, d, iv)
    ha, hb = np.asarray(a.tri) >= 0, np.asarray(b.tri) >= 0
    assert (ha == hb).mean() > 0.99  # grazing rays may flip
    both = ha & hb
    np.testing.assert_allclose(
        np.asarray(a.t)[both], np.asarray(b.t)[both], atol=2e-3, rtol=1e-3
    )
    # Quantization legitimately flips the winner between edge-adjacent
    # triangles at nearly-equal t; compare shading only where ids agree
    # (the pattern of test_quantized_kernel_parity_with_f32_kernel).
    same = both & (np.asarray(a.tri) == np.asarray(b.tri))
    assert same.sum() > 10
    np.testing.assert_allclose(
        np.asarray(a.normal)[same], np.asarray(b.normal)[same], atol=1e-2
    )
    np.testing.assert_array_equal(
        np.asarray(a.material)[same], np.asarray(b.material)[same]
    )
    assert b.texture_coords is not None
    np.testing.assert_allclose(
        np.asarray(a.texture_coords)[same],
        np.asarray(b.texture_coords)[same],
        atol=1e-2,
    )


def test_pt_nee_render_parity_quantized():
    """Full render_frame_pt with NEE through the quantized lean tracer +
    quantized anyhit shadow tracer matches the XLA-engine render in the
    mean — PT + NEE works end to end on the over-VMEM scene path (the
    round-3 gap: big-scene NEE paid closest-hit shadow rays and lost
    texcoords)."""
    from tests.test_wavefront import (
        _down_camera,
        _floor_and_panel_scene,
        _nee_bits,
    )
    from minipath_tpu.render.wavefront import (
        make_pt_shadow_tracer,
        make_pt_tracer,
        make_xla_tracer,
        render_frame_pt,
    )
    from minipath_tpu.scene.materials import Environment

    obj, table = _floor_and_panel_scene()
    lights, xla_shadow = _nee_bits(obj, table)
    qpt = prepare_scene_qpt(obj.host_arrays)
    stack = obj.recommended_stack_size
    tr_q, _ = make_pt_tracer(qpt, stack_size=stack, packet_size=128,
                             interpret=True)
    sh_q, _ = make_pt_shadow_tracer(qpt, stack_size=stack, packet_size=128,
                                    interpret=True)
    tr_x, xs = make_xla_tracer(obj.arrays, stack_size=stack, packet_size=256)
    kw = dict(
        width=16, height=16, spp=8, bounces=2, env=Environment.none(),
        px_block=(16, 16), samples_per_packet=8, lights=lights,
    )
    img_q = np.asarray(render_frame_pt(
        tr_q, qpt, table, _down_camera().build_sampler((16, 16)),
        jax.random.key(3), shadow_tracer=sh_q, **kw,
    ))[..., :3]
    img_x = np.asarray(render_frame_pt(
        tr_x, xs, table, _down_camera().build_sampler((16, 16)),
        jax.random.key(3), shadow_tracer=xla_shadow, **kw,
    ))[..., :3]
    assert img_q.mean() > 0.01
    # Same RNG stream; geometry differs only by quantization, so the two
    # renders agree in the mean well inside MC noise.
    assert abs(img_q.mean() - img_x.mean()) < 0.05 * max(img_x.mean(), 1e-6)
