#!/usr/bin/env python
"""Sweep the path-roulette start bounce (rr_start).

The oracle-ceiling measurement (pallas_kernels.py section comment) showed
deep-bounce traversal is within ~20% of its union-bound floor, so the
remaining throughput lever is tracing FEWER rays. Path Russian roulette
from an earlier bounce does exactly that — unbiased (survivors reweighted
by 1/p), but it raises variance, so raw frame time alone can't pick the
default. This sweep measures both sides:

  phase 1 (bench res, 960x540 @ 8spp/5 bounces): wall-clock per frame for
    rr_start in {2, 1} (3 = the shipped baseline, read from BENCH_pt.json),
    wavefront + one NEE point at rr_start=2.
  phase 2 (480x270 @ 8spp): RMSE vs a 256-spp reference for rr_start in
    {3, 2, 1} over 4 frames, plus per-frame time at that res. The decision
    metric is Monte-Carlo efficiency 1/(MSE * time) — invariant to spp at
    fixed rr, so it predicts equal-time quality.

Usage: python tools/sweep_rr.py [--skip-phase1] [--skip-phase2]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.camera import Camera
from minipath_tpu.render.pallas_kernels import prepare_scene_pt
from minipath_tpu.render.wavefront import (
    make_pt_shadow_tracer,
    make_pt_tracer,
    render_frame_pt,
)
from minipath_tpu.scene.bvh import native
from minipath_tpu.scene.bvh.build import build_bvh
from minipath_tpu.scene.materials import (
    Environment,
    build_light_table,
    material_table,
)
from minipath_tpu.scene.procedural import atrium_materials, make_atrium
from minipath_tpu.utils.cache import enable_compile_cache

enable_compile_cache()  # persistent cache: reruns skip minutes of Mosaic compiles

BOUNCES = 5


def build():
    mesh = make_atrium(250_000)
    mats, dicts = atrium_materials(mesh)
    table = material_table(dicts)
    if native.is_available():
        res = native.build_bvh_native(mesh, materials=mats, leaf_max=24)
    else:
        res = build_bvh(mesh, materials=mats, leaf_max=24)
    scene = prepare_scene_pt(res.as_device())
    tracer, tstate = make_pt_tracer(
        scene, stack_size=res.recommended_stack_size, packet_size=2048
    )
    shadow, _ = make_pt_shadow_tracer(
        scene, stack_size=res.recommended_stack_size, packet_size=2048
    )
    lights = build_light_table(
        res.arrays.tri_packets, res.arrays.tri_material, table
    )
    return tracer, tstate, shadow, lights, table


def frame_fn(tracer, tstate, table, W, H, rr, lights=None, shadow=None):
    cam = (
        Camera()
        .look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
        .f_number(8.0)
        .sensor_width(36e-3)
    )
    sampler = cam.build_sampler((W, H))

    def f(k, spp):
        return render_frame_pt(
            tracer, tstate, table, sampler, k,
            width=W, height=H, spp=spp, bounces=BOUNCES,
            env=Environment.sky(), samples_per_packet=8,
            compaction=True, rr_start=rr,
            lights=lights, shadow_tracer=shadow,
        )

    return f


def timed(f, k, spp):
    t0 = time.time()
    img = np.asarray(f(k, spp))  # host transfer = the only real sync (axon)
    return img, time.time() - t0


def main():
    skip1 = "--skip-phase1" in sys.argv
    skip2 = "--skip-phase2" in sys.argv
    tracer, tstate, shadow, lights, table = build()
    key = jax.random.key(0)

    if not skip1:
        print("== phase 1: bench-res timing (960x540 @ 8spp) ==", flush=True)
        for rr in (2, 1):
            f = frame_fn(tracer, tstate, table, 960, 540, rr)
            _, tc = timed(f, key, 8)
            print(f"rr{rr} wf warmup {tc:.1f}s", flush=True)
            ts = [timed(f, jax.random.fold_in(key, 10 + i), 8)[1] for i in range(3)]
            print(
                f"rr{rr} wavefront: {np.mean(ts):.3f}s/frame (+-{np.std(ts):.3f})",
                flush=True,
            )
        fn = frame_fn(tracer, tstate, table, 960, 540, 2, lights, shadow)
        _, tc = timed(fn, key, 8)
        print(f"rr2 nee warmup {tc:.1f}s", flush=True)
        ts = [timed(fn, jax.random.fold_in(key, 20 + i), 8)[1] for i in range(3)]
        print(f"rr2 nee: {np.mean(ts):.3f}s/frame (+-{np.std(ts):.3f})", flush=True)

    if not skip2:
        print("== phase 2: quality (480x270, RMSE vs 256spp ref) ==", flush=True)
        f3 = frame_fn(tracer, tstate, table, 480, 270, 3)
        ref, tr = timed(f3, jax.random.fold_in(key, 999), 256)
        ref = ref[..., :3]
        print(f"reference 256spp rendered in {tr:.1f}s", flush=True)
        for rr in (3, 2, 1):
            f = frame_fn(tracer, tstate, table, 480, 270, rr)
            timed(f, key, 8)  # warm
            mses, ts = [], []
            for i in range(4):
                img, t = timed(f, jax.random.fold_in(key, 30 + i), 8)
                mses.append(float(np.mean((img[..., :3] - ref) ** 2)))
                ts.append(t)
            mse, t = float(np.mean(mses)), float(np.mean(ts))
            print(
                f"rr{rr}: rmse={np.sqrt(mse):.5f} t={t:.3f}s "
                f"efficiency={1.0 / (mse * t):.1f}",
                flush=True,
            )


if __name__ == "__main__":
    sys.exit(main() or 0)
