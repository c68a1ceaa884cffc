#!/usr/bin/env python
"""Benchmark driver: Mrays/s on the Sponza-class scene, 1080p @ 64 spp.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the ratio against the BASELINE.md target of 100 Mrays/s
sustained (the reference publishes no numbers of its own — see BASELINE.md).

The Sponza asset itself is not in the reference snapshot (empty submodule),
so the workload is the procedural atrium stand-in from
``minipath_tpu.scene.procedural.make_atrium`` (~250k triangles, colonnade +
props, BVH-heavy) rendered with the parity integrator (1 primary ray per
sample, matching the reference's ray accounting).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

WIDTH, HEIGHT, SPP = 1920, 1080, 64
TARGET_MRAYS = 100.0
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_scene():
    from minipath_tpu.scene.bvh.build import BvhArrays, BuildResult
    from minipath_tpu.scene.procedural import make_atrium
    from minipath_tpu.scene.bvh.build import build_bvh

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, "atrium_250k_v4.npz")
    if os.path.exists(path):
        log("loading cached atrium BVH")
        data = np.load(path)
        arrays = BvhArrays(**{f: data[f] for f in BvhArrays._fields})
        result = BuildResult(
            arrays=arrays,
            triangle_count=int(data["meta_tris"]),
            vertex_count=int(data["meta_verts"]),
            max_depth=int(data["meta_depth"]),
        )
        return result

    log("building atrium scene...")
    t0 = time.time()
    mesh = make_atrium(250_000)
    log(f"  mesh: {mesh.triangle_count} tris in {time.time()-t0:.1f}s")
    t0 = time.time()
    # leaf_max=24 traces ~11% faster than the format-limit 56 on this scene
    # (tools/perf_leaf.py sweep).
    from minipath_tpu.scene.bvh import native

    if native.is_available():
        result = native.build_bvh_native(mesh, leaf_max=24)
        kind = "native"
    else:
        result = build_bvh(mesh, leaf_max=24)
        kind = "python"
    log(f"  bvh ({kind}): depth={result.max_depth} in {time.time()-t0:.1f}s")
    np.savez_compressed(
        path,
        **result.arrays._asdict(),
        meta_tris=result.triangle_count,
        meta_verts=result.vertex_count,
        meta_depth=result.max_depth,
    )
    return result


def main() -> int:
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")

    from minipath_tpu.camera import Camera
    from minipath_tpu.render.frame import render_frame_pallas
    from minipath_tpu.render.pallas_kernels import prepare_scene

    result = build_scene()
    bvh = result.as_device()
    scene = prepare_scene(bvh)
    stack = result.recommended_stack_size

    # Camera inside the atrium looking down the colonnade.
    camera = (
        Camera()
        .look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
        .f_number(8.0)
        .sensor_width(36e-3)
    )
    sampler = camera.build_sampler((WIDTH, HEIGHT))
    key = jax.random.key(0)

    def frame(k):
        return render_frame_pallas(
            bvh,
            sampler,
            k,
            width=WIDTH,
            height=HEIGHT,
            spp=SPP,
            stack_size=stack,
            samples_per_packet=32,
            scene=scene,
        )

    def sync(img):
        # Materialize a scalar on the host: under the axon tunnel,
        # block_until_ready alone does not synchronize with execution.
        return float(np.asarray(jnp.mean((img[..., 3] > 0).astype(jnp.float32))))

    log("compiling + warmup...")
    t0 = time.time()
    coverage = sync(frame(key))
    log(f"  warmup frame: {time.time()-t0:.1f}s")

    # Timed runs.
    times = []
    for i in range(3):
        t0 = time.time()
        coverage = sync(frame(jax.random.fold_in(key, 100 + i)))
        times.append(time.time() - t0)
        log(f"  frame {i}: {times[-1]:.2f}s")

    best = min(times)
    rays = WIDTH * HEIGHT * SPP
    mrays = rays / best / 1e6
    log(f"frame {WIDTH}x{HEIGHT}@{SPP}spp: {best:.2f}s  {mrays:.1f} Mrays/s  "
        f"coverage {coverage:.1%}")

    print(
        json.dumps(
            {
                "metric": "atrium_1080p_64spp_throughput",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / TARGET_MRAYS, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
