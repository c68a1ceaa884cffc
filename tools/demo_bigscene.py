#!/usr/bin/env python
"""Oversized-scene demo: the quantized layout lifts the VMEM triangle ceiling.

Builds a procedural atrium beyond the f32 layout's VMEM budget, shows the
f32 path refuses it, renders it through the quantized Pallas kernel on TPU,
and reports Mrays/s. Writes a BENCH-style JSON line to stdout.

Usage: PYTHONPATH=/root/repo python tools/demo_bigscene.py [n_tris]
"""

import json
import os
import sys
import time

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache")
W, H, SPP = 1920, 1080, 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(n_tris):
    from minipath_tpu.scene.bvh.build import BvhArrays, BuildResult
    from minipath_tpu.scene.procedural import make_atrium

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"atrium_big_{n_tris}.npz")
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

    t0 = time.time()
    # Densest packing (leaf_max=56, the format limit) maximizes on-chip
    # capacity for the ceiling demo.
    if native.is_available():
        result = native.build_bvh_native(mesh, leaf_max=56)
    else:
        result = build_bvh(mesh, leaf_max=56)
    log(f"bvh: depth={result.max_depth} in {time.time()-t0:.1f}s")
    np.savez_compressed(
        path, **result.arrays._asdict(),
        meta_tris=result.triangle_count, meta_verts=result.vertex_count,
        meta_depth=result.max_depth,
    )
    return result


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    import jax
    import jax.numpy as jnp

    from minipath_tpu.camera import Camera
    from minipath_tpu.render.frame import render_frame_pallas
    from minipath_tpu.render.pallas_kernels import (
        prepare_scene,
        prepare_scene_quantized,
    )

    result = build(n_tris)
    log(f"triangles: {result.triangle_count}")

    # The f32 layout must refuse a scene this size...
    try:
        prepare_scene(result.as_device())
        f32_fits = True
        log("f32 layout unexpectedly fits (scene too small for the demo)")
    except ValueError as e:
        f32_fits = False
        log(f"f32 layout refuses: {e}")

    # ...while the quantized layout carries it.
    t0 = time.time()
    scene = prepare_scene_quantized(result.arrays)
    log(f"quantized in {time.time()-t0:.1f}s: {scene.vmem_bytes()/1e6:.1f} MB VMEM")

    camera = (
        Camera()
        .look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
        .f_number(8.0)
        .sensor_width(36e-3)
    )
    sampler = camera.build_sampler((W, H))
    key = jax.random.key(0)
    stack = result.recommended_stack_size

    def frame(k):
        return render_frame_pallas(
            result.as_device(), sampler, k, width=W, height=H, spp=SPP,
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
    log(f"{W}x{H}@{SPP}spp: {best:.2f}s  {mrays:.1f} Mrays/s  coverage {cov:.1%}")
    print(json.dumps({
        "metric": f"bigscene_{result.triangle_count}tris_1080p_{SPP}spp",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "f32_layout_fits": f32_fits,
        "quantized_vmem_mb": round(scene.vmem_bytes() / 1e6, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
