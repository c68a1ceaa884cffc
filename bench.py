#!/usr/bin/env python
"""Benchmark driver: Mrays/s on the Sponza-class scene, 1080p @ 64 spp.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the ratio against the BASELINE.md target of 100 Mrays/s
sustained (the reference publishes no numbers of its own — see BASELINE.md).

Workload: the Sponza asset itself is not in the reference snapshot (empty
submodule), so the scene is the procedural atrium stand-in (~250k triangles,
colonnade + props, BVH-heavy) — but loaded through the REAL asset pipeline:
the mesh is written to a Wavefront OBJ once and every run goes through
``TriangleBvh.with_obj`` (native C++ loader + builder), then renders with
the parity integrator (1 primary ray per sample, the reference's ray
accounting).

Protocol (criterion-style, ``/root/reference/benches/render_teapot.rs:42-46``):
a compiled-kernel smoke test (fail fast on Mosaic regressions), one cold
frame (compile + warmup, reported separately), then N timed frames with
mean/min/max/stddev. The headline value uses the mean. Side measurements
(quantized-layout kernel, cold time) land in BENCH_extra.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

WIDTH, HEIGHT, SPP = 1920, 1080, 64
TIMED_FRAMES = 10
TARGET_MRAYS = 100.0
REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_scene():
    """Atrium BVH, built from an OBJ on disk via the public with_obj path."""
    from minipath_tpu.scene.bvh.build import BvhArrays, BuildResult

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, "atrium_obj_250k_v5.npz")
    if os.path.exists(path):
        log("loading cached atrium BVH")
        data = np.load(path)
        arrays = BvhArrays(**{f: data[f] for f in BvhArrays._fields})
        return BuildResult(
            arrays=arrays,
            triangle_count=int(data["meta_tris"]),
            vertex_count=int(data["meta_verts"]),
            max_depth=int(data["meta_depth"]),
        )

    from minipath_tpu.scene.obj_loader import save_obj
    from minipath_tpu.scene.procedural import make_atrium
    from minipath_tpu.scene.triangle_bvh import TriangleBvh

    obj_path = os.path.join(CACHE, "atrium_250k.obj")
    if not os.path.exists(obj_path):
        log("building atrium scene + writing OBJ...")
        t0 = time.time()
        mesh = make_atrium(250_000)
        save_obj(obj_path, mesh)
        log(f"  {mesh.triangle_count} tris -> {obj_path} in {time.time()-t0:.1f}s")

    t0 = time.time()
    # leaf_max=24 traces ~11% faster than the format-limit 56 on this scene
    # (tools/perf_leaf.py sweep).
    bvh = TriangleBvh.with_obj(obj_path, leaf_max=24)
    result = bvh.build_result
    log(
        f"  with_obj: {result.triangle_count} tris, depth={result.max_depth} "
        f"in {time.time()-t0:.1f}s"
    )
    np.savez_compressed(
        path,
        **result.arrays._asdict(),
        meta_tris=result.triangle_count,
        meta_verts=result.vertex_count,
        meta_depth=result.max_depth,
    )
    return result


def build_big_scene(n_tris=600_000):
    """Sponza-scale mesh (>=500k tris), loaded through the OBJ pipeline.

    BASELINE.md names Sponza-class workloads; the Sponza submodule is empty
    in the reference snapshot (and this image has no network), so the
    high-poly atrium stands in — but like the main workload it round-trips
    through a real Wavefront OBJ and ``TriangleBvh.with_obj``.
    """
    from minipath_tpu.scene.bvh.build import BvhArrays, BuildResult

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"atrium_obj_{n_tris}_v1.npz")
    if os.path.exists(path):
        log("loading cached big-atrium BVH")
        data = np.load(path)
        arrays = BvhArrays(**{f: data[f] for f in BvhArrays._fields})
        return BuildResult(
            arrays=arrays,
            triangle_count=int(data["meta_tris"]),
            vertex_count=int(data["meta_verts"]),
            max_depth=int(data["meta_depth"]),
        )

    from minipath_tpu.scene.obj_loader import save_obj
    from minipath_tpu.scene.procedural import make_atrium
    from minipath_tpu.scene.triangle_bvh import TriangleBvh

    obj_path = os.path.join(CACHE, f"atrium_{n_tris}.obj")
    if not os.path.exists(obj_path):
        log(f"building {n_tris}-tri atrium + writing OBJ...")
        t0 = time.time()
        mesh = make_atrium(n_tris)
        save_obj(obj_path, mesh)
        log(f"  {mesh.triangle_count} tris -> {obj_path} in {time.time()-t0:.1f}s")

    t0 = time.time()
    bvh = TriangleBvh.with_obj(obj_path, leaf_max=24)
    result = bvh.build_result
    log(
        f"  with_obj: {result.triangle_count} tris, depth={result.max_depth} "
        f"in {time.time()-t0:.1f}s"
    )
    np.savez_compressed(
        path,
        **result.arrays._asdict(),
        meta_tris=result.triangle_count,
        meta_verts=result.vertex_count,
        meta_depth=result.max_depth,
    )
    return result


def bench_big_scene(sampler, key, sync):
    """Side benchmark: >=500k-tri OBJ-loaded scene (auto layout selection:
    too big for the f32 VMEM budget, so the quantized kernel carries it)."""
    import jax

    from minipath_tpu.render.frame import render_frame_pallas
    from minipath_tpu.render.pallas_kernels import (
        VMEM_BUDGET,
        prepare_scene_quantized,
    )

    result = build_big_scene()
    bvh = result.as_device()
    qscene = prepare_scene_quantized(result.arrays)
    stack = result.recommended_stack_size

    def frame(k):
        return render_frame_pallas(
            bvh, sampler, k,
            width=WIDTH, height=HEIGHT, spp=SPP, stack_size=stack,
            samples_per_packet=32, scene=qscene,
        )

    log("big-scene warmup (compile)...")
    t0 = time.time()
    sync(frame(key))
    log(f"  big-scene cold frame: {time.time()-t0:.1f}s")
    stats = time_frames(frame, sync, key, 3, "big")
    rays = WIDTH * HEIGHT * SPP
    mrays = rays / stats["mean_s"] / 1e6
    log(f"big scene: {stats['mean_s']:.3f}s  {mrays:.1f} Mrays/s")
    return {
        "workload": f"atrium-from-OBJ {result.triangle_count} tris "
        f"(Sponza-scale), {WIDTH}x{HEIGHT} @ {SPP} spp, quantized kernel",
        "triangle_count": result.triangle_count,
        "obj_loaded": True,
        **stats,
        "mrays_per_s": round(mrays, 2),
        "vmem_mb": round(qscene.vmem_bytes() / 1e6, 1),
        "vmem_budget_mb": round(VMEM_BUDGET / 1e6, 1),
    }


def build_pt_scene():
    """Materialized atrium (materials + lights) for the PT side bench,
    cached like the parity scenes."""
    from minipath_tpu.scene.bvh.build import BvhArrays
    from minipath_tpu.scene.materials import MaterialTable

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, "atrium_pt_250k_v1.npz")
    if os.path.exists(path):
        log("loading cached PT atrium BVH")
        data = np.load(path)
        arrays = BvhArrays(**{f: data[f] for f in BvhArrays._fields})
        table = MaterialTable(
            **{f: data[f"mat_{f}"] for f in MaterialTable._fields}
        )
        return arrays, table, int(data["meta_stack"])

    from minipath_tpu.scene.bvh import native
    from minipath_tpu.scene.bvh.build import build_bvh
    from minipath_tpu.scene.materials import material_table
    from minipath_tpu.scene.procedural import atrium_materials, make_atrium

    log("building PT atrium (materials)...")
    mesh = make_atrium(250_000)
    mats, dicts = atrium_materials(mesh)
    table = material_table(dicts)
    if native.is_available():
        res = native.build_bvh_native(mesh, materials=mats, leaf_max=24)
    else:
        res = build_bvh(mesh, materials=mats, leaf_max=24)
    np.savez_compressed(
        path,
        **res.arrays._asdict(),
        **{f"mat_{f}": np.asarray(v) for f, v in table._asdict().items()},
        meta_stack=res.recommended_stack_size,
    )
    return res.arrays, table, res.recommended_stack_size


def bench_pt(sync):
    """Side benchmark: the north-star wavefront path tracer (+NEE), so the
    round-over-round scoring loop sees PT regressions (the r02 gap: the
    driver artifact was parity-only)."""
    import jax
    import jax.numpy as jnp

    from minipath_tpu.camera import Camera
    from minipath_tpu.render.pallas_kernels import prepare_scene_pt
    from minipath_tpu.render.wavefront import (
        make_pt_shadow_tracer,
        make_pt_tracer,
        render_frame_pt,
    )
    from minipath_tpu.scene.materials import Environment, build_light_table

    W2, H2, SPP2, BOUNCES = 960, 540, 8, 5
    arrays, table, stack = build_pt_scene()
    scene = prepare_scene_pt(jax.tree.map(jnp.asarray, arrays))
    tracer, tstate = make_pt_tracer(scene, stack_size=stack, packet_size=2048)
    lights = build_light_table(arrays.tri_packets, arrays.tri_material, table)
    shadow, _ = make_pt_shadow_tracer(scene, stack_size=stack, packet_size=2048)
    cam = (
        Camera()
        .look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
        .f_number(8.0)
        .sensor_width(36e-3)
    )
    sampler = cam.build_sampler((W2, H2))
    key = jax.random.key(0)

    def frame(k, nee, cap=None):
        img = render_frame_pt(
            tracer, tstate, table, sampler, k,
            width=W2, height=H2, spp=SPP2, bounces=BOUNCES,
            env=Environment.sky(), samples_per_packet=SPP2, compaction=True,
            lights=lights if nee else None,
            shadow_tracer=shadow if nee else None,
            nee_max_depth=cap,
        )
        return jnp.mean(img[..., :3])

    paths = W2 * H2 * SPP2
    out = {"workload": f"atrium PT {W2}x{H2} @ {SPP2}spp, {BOUNCES} bounces"}
    # nee_capped: light-sample the first vertex only — the measured
    # Monte-Carlo-efficiency optimum on the atrium's large visible panels
    # (tools/sweep_pt17.py; topology-dependent, see sweep_pt19.py), unbiased.
    for name, nee, cap in (
        ("wavefront", False, None),
        ("nee", True, None),
        ("nee_capped", True, 1),
    ):
        t0 = time.time()
        sync1 = float(np.asarray(frame(key, nee, cap)))
        log(f"  pt {name} warmup (incl compile): {time.time()-t0:.1f}s")
        times = []
        for i in range(3):
            t0 = time.time()
            float(np.asarray(frame(jax.random.fold_in(key, 50 + i), nee, cap)))
            times.append(time.time() - t0)
        arr = np.array(times)
        out[f"{name}_mean_s"] = round(float(arr.mean()), 3)
        out[f"{name}_mpaths_per_s"] = round(paths / arr.mean() / 1e6, 3)
        log(
            f"  pt {name}: {arr.mean():.2f}s "
            f"{out[f'{name}_mpaths_per_s']} Mpaths/s"
        )

    # The BASELINE headline config for the north-star integrator:
    # 1920x1080 @ 64 spp (BASELINE.md "Sponza 1080p/64spp"), wavefront +
    # capped NEE. samples_per_packet=2 keeps each chunk at ~4.15M rays —
    # the measured shade-gather HLO-temp sweet spot (shade_from_flat
    # docstring); 32 chunks accumulate the 64 spp.
    W3, H3, SPP3 = 1920, 1080, 64
    sampler3 = cam.build_sampler((W3, H3))

    def frame_1080(k, nee):
        img = render_frame_pt(
            tracer, tstate, table, sampler3, k,
            width=W3, height=H3, spp=SPP3, bounces=BOUNCES,
            env=Environment.sky(), samples_per_packet=2, compaction=True,
            lights=lights if nee else None,
            shadow_tracer=shadow if nee else None,
            nee_max_depth=1 if nee else None,
        )
        return jnp.mean(img[..., :3])

    paths3 = W3 * H3 * SPP3
    for name, nee, n_timed in (
        ("pt_1080p64_wavefront", False, 1),
        ("pt_1080p64_nee_capped", True, 2),
    ):
        t0 = time.time()
        float(np.asarray(frame_1080(key, nee)))
        log(f"  {name} warmup (incl compile): {time.time()-t0:.1f}s")
        times = []
        for i in range(n_timed):
            t0 = time.time()
            float(np.asarray(frame_1080(jax.random.fold_in(key, 70 + i), nee)))
            times.append(time.time() - t0)
        arr = np.array(times)
        out[f"{name}_s"] = round(float(arr.mean()), 3)
        out[f"{name}_mpaths_per_s"] = round(paths3 / arr.mean() / 1e6, 3)
        log(
            f"  {name}: {arr.mean():.2f}s "
            f"{out[f'{name}_mpaths_per_s']} Mpaths/s"
        )
    return out


def bench_pt_big(sync):
    """PT past the f32 VMEM budget: the Sponza-scale (>=500k tris) scene
    through the quantized lean kernel (QPTScene) — the round-4 capability
    (one full-featured PT path at any scene size, like the reference's
    single traversal ray_bvh_intersection.rs:26-96)."""
    import jax
    import jax.numpy as jnp

    from minipath_tpu.camera import Camera
    from minipath_tpu.render.pallas_kernels import QPTScene, prepare_scene_qpt
    from minipath_tpu.render.wavefront import make_pt_tracer, render_frame_pt
    from minipath_tpu.scene.materials import Environment, lambertian, material_table

    W2, H2, SPP2, BOUNCES = 960, 540, 8, 5
    result = build_big_scene()
    scene = prepare_scene_qpt(result.arrays)
    assert isinstance(scene, QPTScene)
    stack = result.recommended_stack_size
    table = material_table([lambertian((0.73, 0.73, 0.73))])
    tracer, tstate = make_pt_tracer(scene, stack_size=stack, packet_size=2048)
    cam = (
        Camera()
        .look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
        .f_number(8.0)
        .sensor_width(36e-3)
    )
    sampler = cam.build_sampler((W2, H2))
    key = jax.random.key(0)

    def frame(k):
        img = render_frame_pt(
            tracer, tstate, table, sampler, k,
            width=W2, height=H2, spp=SPP2, bounces=BOUNCES,
            env=Environment.sky(), samples_per_packet=SPP2, compaction=True,
        )
        return jnp.mean(img[..., :3])

    t0 = time.time()
    float(np.asarray(frame(key)))
    log(f"  pt big (quantized lean) warmup: {time.time()-t0:.1f}s")
    times = []
    for i in range(2):
        t0 = time.time()
        float(np.asarray(frame(jax.random.fold_in(key, 60 + i))))
        times.append(time.time() - t0)
    arr = np.array(times)
    paths = W2 * H2 * SPP2
    out = {
        "workload": f"big atrium PT (quantized lean kernel) "
        f"{result.triangle_count} tris, {W2}x{H2} @ {SPP2}spp, {BOUNCES} bounces",
        "triangle_count": result.triangle_count,
        "mean_s": round(float(arr.mean()), 3),
        "mpaths_per_s": round(paths / arr.mean() / 1e6, 3),
        "vmem_mb": round(scene.vmem_bytes() / 1e6, 1),
    }
    log(f"  pt big: {arr.mean():.2f}s {out['mpaths_per_s']} Mpaths/s")
    return out


def smoke_test(bvh, scene, sampler, stack):
    """Trace a tiny batch through the COMPILED kernel and compare against the
    portable XLA engine; abort with a diff instead of wasting a full warmup
    frame on a regressed kernel."""
    import jax

    from minipath_tpu.parallel.mesh import gen_frame_rays9
    from minipath_tpu.render.frame import rays9_to_rays
    from minipath_tpu.render.pallas_kernels import trace_scene
    from minipath_tpu.render.traversal import trace_packets

    log("compiled-kernel smoke test...")
    t0 = time.time()
    r9, _ = gen_frame_rays9(
        sampler,
        jax.random.key(42),
        width=128,
        height=16,
        px_block=(16, 16),
        samples=4,
    )
    kh = trace_scene(scene, r9, stack_size=stack)
    got_tri = np.asarray(kh.tri).ravel()
    got_t = np.asarray(kh.t).ravel()
    rays = rays9_to_rays(r9)
    want = trace_packets(bvh, rays, stack_size=stack)
    want_tri = np.asarray(want.tri).ravel()
    want_t = np.asarray(want.t).ravel()
    hit_mismatch = ((got_tri >= 0) != (want_tri >= 0)).mean()
    both = (got_tri >= 0) & (want_tri >= 0)
    # Compare distances (the quantized layout legitimately differs from the
    # f32 oracle by ~box/65535; the f32 layout must agree to float noise).
    t_err = (
        np.abs(got_t[both] - want_t[both]) / np.maximum(np.abs(want_t[both]), 1e-3)
    ).max(initial=0.0)
    if hit_mismatch > 1e-3 or t_err > 1e-2:
        log(
            f"SMOKE TEST FAILED: hit mismatch {hit_mismatch:.2%}, "
            f"max rel t err {t_err:.2e} (compiled kernel vs XLA engine)"
        )
        sys.exit(1)
    log(
        f"  ok in {time.time()-t0:.1f}s (hit mismatch {hit_mismatch:.2%}, "
        f"max rel t err {t_err:.1e})"
    )


def time_frames(frame, sync, key, n, label):
    import jax

    times = []
    for i in range(n):
        t0 = time.time()
        cov = sync(frame(jax.random.fold_in(key, 100 + i)))
        times.append(time.time() - t0)
        log(f"  {label} frame {i}: {times[-1]:.2f}s")
    arr = np.array(times)
    return {
        "mean_s": round(float(arr.mean()), 4),
        "std_s": round(float(arr.std()), 4),
        "min_s": round(float(arr.min()), 4),
        "max_s": round(float(arr.max()), 4),
        "n": n,
        "coverage": round(cov, 4),
    }


def main() -> int:
    import jax
    import jax.numpy as jnp

    from minipath_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    log(f"devices: {jax.devices()}")

    from minipath_tpu.camera import Camera
    from minipath_tpu.render.frame import render_frame_pallas
    from minipath_tpu.render.pallas_kernels import (
        prepare_scene,
        prepare_scene_quantized,
    )

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

    def make_frame(scn):
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
                scene=scn,
            )

        return frame

    def sync(img):
        # Materialize a scalar on the host: under the axon tunnel,
        # block_until_ready alone does not synchronize with execution.
        return float(np.asarray(jnp.mean((img[..., 3] > 0).astype(jnp.float32))))

    smoke_test(bvh, scene, sampler, stack)

    rays = WIDTH * HEIGHT * SPP
    frame = make_frame(scene)
    log("cold frame (compile + warmup)...")
    t0 = time.time()
    sync(frame(key))
    cold_s = time.time() - t0
    log(f"  cold frame: {cold_s:.1f}s")

    stats = time_frames(frame, sync, key, TIMED_FRAMES, "f32")
    mrays = rays / stats["mean_s"] / 1e6
    log(
        f"f32 {WIDTH}x{HEIGHT}@{SPP}spp: {stats['mean_s']:.3f}s +- "
        f"{stats['std_s']:.3f}s  {mrays:.1f} Mrays/s  coverage {stats['coverage']:.1%}"
    )

    # Side measurement: the 16-bit quantized layout (half the VMEM).
    qscene = prepare_scene_quantized(result.arrays)
    qframe = make_frame(qscene)
    sync(qframe(key))  # warmup
    qstats = time_frames(qframe, sync, key, 3, "quantized")
    qmrays = rays / qstats["mean_s"] / 1e6
    log(f"quantized: {qstats['mean_s']:.3f}s  {qmrays:.1f} Mrays/s")

    # Side measurement: Sponza-scale (>=500k tris) OBJ-loaded scene.
    try:
        big = bench_big_scene(sampler, key, sync)
    except Exception as e:  # never let the side bench kill the headline
        log(f"big-scene bench failed: {e!r}")
        big = {"error": repr(e)}

    # Side measurement: the north-star path tracer (wavefront + NEE),
    # including the BASELINE headline config (1080p @ 64 spp).
    try:
        pt = bench_pt(sync)
    except Exception as e:
        log(f"pt bench failed: {e!r}")
        pt = {"error": repr(e)}

    # Side measurement: PT on the Sponza-scale scene via the quantized
    # lean kernel (past the f32 VMEM budget).
    try:
        pt_big = bench_pt_big(sync)
    except Exception as e:
        log(f"pt big bench failed: {e!r}")
        pt_big = {"error": repr(e)}

    extra = {
        "workload": f"atrium-from-OBJ {result.triangle_count} tris, "
        f"{WIDTH}x{HEIGHT} @ {SPP} spp, parity integrator",
        "obj_loaded": True,
        "cold_frame_s": round(cold_s, 2),
        "f32_kernel": {**stats, "mrays_per_s": round(mrays, 2)},
        "quantized_kernel": {**qstats, "mrays_per_s": round(qmrays, 2)},
        "vmem_mb": {
            "f32": round(scene.vmem_bytes() / 1e6, 1),
            "quantized": round(qscene.vmem_bytes() / 1e6, 1),
        },
        "big_scene": big,
        "pt": pt,
        "pt_big_scene": pt_big,
    }
    from minipath_tpu.utils.calibrate import device_health

    # The tunnel TPU's VPU throughput drifts between sessions (measured
    # ~7x on 2026-08-18, same binary; see utils/calibrate.py). The probe
    # makes round-over-round artifact deltas attributable.
    extra["device_health"] = device_health()
    log(f"  device health: {extra['device_health']}")
    with open(os.path.join(REPO, "BENCH_extra.json"), "w") as f:
        json.dump(extra, f, indent=2)
    log("wrote BENCH_extra.json")

    line = {
        "metric": "atrium_obj_1080p_64spp_throughput",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / TARGET_MRAYS, 3),
    }
    # Surface the north-star integrator in the driver line too, including
    # the BASELINE headline config (1080p @ 64 spp).
    for k in (
        "wavefront_mpaths_per_s",
        "nee_mpaths_per_s",
        "nee_capped_mpaths_per_s",
    ):
        if k in pt:
            line[f"pt_{k}"] = pt[k]
    for k in (
        "pt_1080p64_wavefront_s",
        "pt_1080p64_wavefront_mpaths_per_s",
        "pt_1080p64_nee_capped_s",
        "pt_1080p64_nee_capped_mpaths_per_s",
    ):
        if k in pt:
            line[k] = pt[k]
    if "mpaths_per_s" in pt_big:
        line["pt_big_scene_mpaths_per_s"] = pt_big["mpaths_per_s"]
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
