#!/usr/bin/env python
"""Unbounded-scene demo: HBM-streamed traversal past every VMEM ceiling.

Builds a procedural atrium too large even for the 16-bit quantized
VMEM-resident layout (> ~2.4M triangles), shows both on-chip layouts
refuse it, renders it through the HBM-streamed kernel (triangles stay in
HBM; each visited leaf is DMA'd into VMEM scratch — QuantizedHbmScene),
and compares against the portable XLA engine on the same scene. This is
the reference's render-anything-in-RAM property (``building.rs``) on TPU.

Writes BENCH_huge.json at the repo root and a JSON line to stdout.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/demo_hugescene.py [n_tris]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".bench_cache")
W, H, SPP = 1920, 1080, 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(n_tris):
    """Build (or load from cache) the huge atrium WITH the standard bench
    material assignment (atrium_materials: emissive ceiling panels light the
    closed interior — an all-Lambertian version renders correctly black
    under an outside-only sky env, which is useless as a PT demo)."""
    from minipath_tpu.scene.bvh.build import BvhArrays, BuildResult
    from minipath_tpu.scene.procedural import atrium_materials, make_atrium

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"atrium_huge_{n_tris}_mats.npz")
    if os.path.exists(path):
        data = np.load(path)
        arrays = BvhArrays(**{f: data[f] for f in BvhArrays._fields})
        return BuildResult(
            arrays=arrays,
            triangle_count=int(data["meta_tris"]),
            vertex_count=int(data["meta_verts"]),
            max_depth=int(data["meta_depth"]),
        )
    t0 = time.time()
    mesh = make_atrium(n_tris)
    log(f"mesh: {mesh.triangle_count} tris in {time.time()-t0:.1f}s")
    from minipath_tpu.scene.bvh import native
    from minipath_tpu.scene.bvh.build import build_bvh

    mats, _ = atrium_materials(mesh)
    t0 = time.time()
    if native.is_available():
        result = native.build_bvh_native(mesh, materials=mats, leaf_max=56)
    else:
        result = build_bvh(mesh, materials=mats, leaf_max=56)
    log(f"bvh: depth={result.max_depth} in {time.time()-t0:.1f}s")
    np.savez_compressed(
        path, **result.arrays._asdict(),
        meta_tris=result.triangle_count, meta_verts=result.vertex_count,
        meta_depth=result.max_depth,
    )
    return result


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    import jax
    import jax.numpy as jnp

    from minipath_tpu.camera import Camera
    from minipath_tpu.render.frame import render_frame_pallas
    from minipath_tpu.parallel.mesh import gen_frame_rays9
    from minipath_tpu.render.pallas_kernels import (
        prepare_scene,
        prepare_scene_quantized,
    )

    result = build(n_tris)
    log(f"triangles: {result.triangle_count}")

    # Both on-chip layouts must refuse a scene this size...
    refused = {}
    for name, fn in (
        ("f32", lambda: prepare_scene(result.as_device())),
        ("quantized_vmem", lambda: prepare_scene_quantized(result.arrays)),
    ):
        try:
            fn()
            refused[name] = False
            log(f"{name} layout unexpectedly fits (scene too small for demo)")
        except ValueError:
            refused[name] = True
            log(f"{name} layout refuses (as designed)")

    # ...while the HBM-streamed layout carries it.
    t0 = time.time()
    scene = prepare_scene_quantized(result.arrays, hbm_tris=True)
    log(
        f"hbm-streamed in {time.time()-t0:.1f}s: nodes "
        f"{scene.vmem_bytes()/1e6:.1f} MB VMEM, tris "
        f"{scene.tri_q.shape[0]*128*4/1e6:.0f} MB HBM"
    )

    camera = (
        Camera()
        .look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
        .f_number(8.0)
        .sensor_width(36e-3)
    )
    sampler = camera.build_sampler((W, H))
    key = jax.random.key(0)
    stack = result.recommended_stack_size
    bvh_dev = result.as_device()

    def frame(k):
        return render_frame_pallas(
            bvh_dev, sampler, k, width=W, height=H, spp=SPP,
            stack_size=stack, samples_per_packet=16, scene=scene,
        )

    def sync(img):
        return float(np.asarray(jnp.mean((img[..., 3] > 0).astype(jnp.float32))))

    t0 = time.time()
    cov = sync(frame(key))
    log(f"warmup: {time.time()-t0:.1f}s coverage={cov:.1%}")
    times = []
    for i in range(3):
        t0 = time.time()
        cov = sync(frame(jax.random.fold_in(key, i + 1)))
        times.append(time.time() - t0)
        log(f"frame {i}: {times[-1]:.2f}s")
    best = min(times)
    mrays = W * H * SPP / best / 1e6

    # XLA-engine comparison on a SMALL ray batch (a whole frame through the
    # portable engine at this scene size takes minutes; per-ray rate is
    # flat in batch size for the lockstep engine).
    from minipath_tpu.render.frame import rays9_to_rays
    from minipath_tpu.render.traversal import trace_packets

    r9, _ = gen_frame_rays9(
        sampler, key, width=W, height=16, px_block=(16, 16), samples=4
    )
    rays = rays9_to_rays(r9)
    n_small = r9.shape[0] * r9.shape[2] * r9.shape[3]
    res = trace_packets(bvh_dev, rays, stack_size=stack)
    _ = float(np.asarray(jnp.sum(res.t)))  # warm
    t0 = time.time()
    res = trace_packets(bvh_dev, rays, stack_size=stack)
    _ = float(np.asarray(jnp.sum(res.t)))
    xla_rate = n_small / (time.time() - t0) / 1e6
    log(f"xla engine: {xla_rate:.1f} Mrays/s on {n_small} rays")

    out = {
        "metric": f"hugescene_{result.triangle_count}tris_1080p_{SPP}spp",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "seconds_per_frame": round(best, 3),
        "coverage": round(cov, 4),
        "f32_refused": refused["f32"],
        "quantized_vmem_refused": refused["quantized_vmem"],
        "node_vmem_mb": round(scene.vmem_bytes() / 1e6, 1),
        "tri_hbm_mb": round(scene.tri_q.shape[0] * 128 * 4 / 1e6, 1),
        "xla_engine_mrays_per_s": round(xla_rate, 2),
        "hbm_vs_xla": round(mrays / max(xla_rate, 1e-9), 1),
    }

    # A PATH-TRACED frame on the same HBM-streamed scene (the round-3 gap:
    # the 5M-tri rung had never run a path-traced frame). QPTScene = the
    # same traversal arrays + HBM shade table; the lean anyhit/uv kernel
    # carries the full PT contract at this size.
    try:
        from minipath_tpu.render.pallas_kernels import prepare_scene_qpt
        from minipath_tpu.render.wavefront import make_pt_tracer, render_frame_pt
        from minipath_tpu.scene.materials import Environment, material_table
        from minipath_tpu.scene.procedural import atrium_materials, make_atrium

        qpt = prepare_scene_qpt(result.arrays, hbm_tris=True)
        # Same material dict list the bench atrium uses (the ids are baked
        # into the cached arrays' tri_material); a tiny mesh recovers it.
        _, dicts = atrium_materials(make_atrium(1_000))
        table = material_table(dicts)
        tracer, tstate = make_pt_tracer(qpt, stack_size=stack, packet_size=2048)
        PW, PH, PSPP, PB = 960, 540, 4, 4
        psampler = camera.build_sampler((PW, PH))

        def pt_frame(k):
            img = render_frame_pt(
                tracer, tstate, table, psampler, k,
                width=PW, height=PH, spp=PSPP, bounces=PB,
                env=Environment.sky(), samples_per_packet=PSPP,
                compaction=True,
            )
            return float(np.asarray(jnp.mean(img[..., :3])))

        t0 = time.time()
        mean_rgb = pt_frame(key)
        log(f"pt warmup: {time.time()-t0:.1f}s mean={mean_rgb:.4f}")
        t0 = time.time()
        mean_rgb = pt_frame(jax.random.fold_in(key, 99))
        pt_s = time.time() - t0
        out["pt_frame"] = {
            "workload": f"{PW}x{PH} @ {PSPP}spp, {PB} bounces, "
            "quantized lean kernel (HBM tris)",
            "seconds": round(pt_s, 3),
            "mpaths_per_s": round(PW * PH * PSPP / pt_s / 1e6, 3),
            "mean_rgb": round(mean_rgb, 5),
        }
        log(f"pt frame: {pt_s:.2f}s ({out['pt_frame']['mpaths_per_s']} Mpaths/s)")
    except Exception as e:
        out["pt_frame"] = {"error": repr(e)[:500]}
        log(f"pt frame failed: {e!r}")
    with open(os.path.join(REPO, "BENCH_huge.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
