#!/usr/bin/env python
"""Path-tracer benchmark: wavefront compaction vs masked megakernel.

The BASELINE.json convergence config ("Sponza 1024 spp: wavefront vs naive
masked megakernel") realized on the atrium stand-in with materials: measures
per-frame wall clock for both modes and verifies their estimators agree.

Writes a BENCH-style JSON artifact to BENCH_pt.json at the repo root and
prints it on stdout.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_pt.py [W H spp]
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.camera import Camera
from minipath_tpu.render.pallas_kernels import prepare_scene, prepare_scene_pt
from minipath_tpu.render.wavefront import make_pt_tracer, render_frame_pt
from minipath_tpu.scene.bvh import native
from minipath_tpu.scene.bvh.build import build_bvh
from minipath_tpu.scene.materials import (
    Environment,
    dielectric,
    emissive,
    lambertian,
    material_table,
    metal,
)
from minipath_tpu.scene.procedural import make_atrium
from minipath_tpu.utils.cache import enable_compile_cache

enable_compile_cache()  # persistent cache: reruns skip minutes of Mosaic compiles


def build_scene():
    from minipath_tpu.scene.procedural import atrium_materials

    mesh = make_atrium(250_000)
    mats, dicts = atrium_materials(mesh)
    table = material_table(dicts)
    if native.is_available():
        res = native.build_bvh_native(mesh, materials=mats, leaf_max=24)
    else:
        res = build_bvh(mesh, materials=mats, leaf_max=24)
    return res, table


def main():
    # Defaults match the committed artifact config (metric name below).
    # Larger configs work but mind the wavefront chunk temp: a 16M-ray
    # chunk OOMs compile at ~16 GB HBM (see shade_from_flat) and the
    # megakernel at 1080p/16spp has crashed the TPU worker outright.
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 960
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 540
    SPP = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    BOUNCES = 5

    res, table = build_scene()
    scene = prepare_scene_pt(res.as_device())
    tracer, tracer_state = make_pt_tracer(
        scene, stack_size=res.recommended_stack_size, packet_size=2048
    )
    cam = (
        Camera()
        .look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
        .f_number(8.0)
        .sensor_width(36e-3)
    )
    sampler = cam.build_sampler((W, H))
    key = jax.random.key(0)

    def frame(k, compaction):
        img = render_frame_pt(
            tracer,
            tracer_state,
            table,
            sampler,
            k,
            width=W,
            height=H,
            spp=SPP,
            bounces=BOUNCES,
            env=Environment.sky(),
            samples_per_packet=min(8, SPP),
            compaction=compaction,
        )
        return jnp.mean(img[..., :3], axis=(0, 1))

    results = {}
    for compaction in (True, False):
        name = "wavefront" if compaction else "megakernel"
        t0 = time.time()
        m = np.asarray(frame(key, compaction))
        print(f"{name} warmup (incl compile): {time.time()-t0:.1f}s mean={m}", flush=True)
        times = []
        for i in range(3):
            t0 = time.time()
            m = np.asarray(frame(jax.random.fold_in(key, 10 + i), compaction))
            times.append(time.time() - t0)
        arr = np.array(times)
        paths = W * H * SPP
        results[name] = (arr, m)
        print(
            f"{name}: {arr.mean():.2f}s/frame (+-{arr.std():.2f})  "
            f"{paths/arr.mean()/1e6:.2f} Mpaths/s ({BOUNCES} bounces)  "
            f"mean_rgb={m.round(4)}",
            flush=True,
        )
    # NEE variant: explicit light sampling (the emissive ceiling panels)
    # with MIS — one shadow-ray kernel per bounce on top of the trace.
    from minipath_tpu.render.wavefront import make_pt_shadow_tracer
    from minipath_tpu.scene.materials import build_light_table

    lights = build_light_table(res.arrays.tri_packets, res.arrays.tri_material, table)
    shadow, _ = make_pt_shadow_tracer(
        scene, stack_size=res.recommended_stack_size, packet_size=2048
    )

    def frame_nee(k, cap=None):
        img = render_frame_pt(
            tracer, tracer_state, table, sampler, k,
            width=W, height=H, spp=SPP, bounces=BOUNCES,
            env=Environment.sky(), samples_per_packet=min(8, SPP),
            compaction=True, lights=lights, shadow_tracer=shadow,
            nee_max_depth=cap,
        )
        return jnp.mean(img[..., :3], axis=(0, 1))

    # Uncapped (light-sample every vertex) and the production depth cap:
    # nee_max_depth=1 is the measured Monte-Carlo-efficiency optimum on this
    # scene (tools/sweep_pt17.py: per-pixel variance 6.06e-2 vs uncapped
    # 5.86e-2 while dropping 4 of 5 shadow passes — 1.47x the efficiency).
    NEE_CAP = 1
    for name, cap in (("nee", None), ("nee_capped", NEE_CAP)):
        t0 = time.time()
        m = np.asarray(frame_nee(key, cap))
        print(f"{name} warmup (incl compile): {time.time()-t0:.1f}s mean={m}", flush=True)
        times = []
        for i in range(3):
            t0 = time.time()
            m = np.asarray(frame_nee(jax.random.fold_in(key, 20 + i), cap))
            times.append(time.time() - t0)
        results[name] = (np.array(times), m)
        print(
            f"{name}: {results[name][0].mean():.2f}s/frame  "
            f"{W*H*SPP/results[name][0].mean()/1e6:.2f} Mpaths/s  "
            f"mean_rgb={m.round(4)}",
            flush=True,
        )

    wf, mk = results["wavefront"], results["megakernel"]
    speedup = mk[0].mean() / wf[0].mean()
    delta = float(np.abs(wf[1] - mk[1]).max())
    print(
        f"speedup wavefront vs megakernel: {speedup:.2f}x; "
        f"estimator mean delta: {delta:.4f}"
    )
    paths = W * H * SPP
    out = {
        "metric": f"pt_atrium_{W}x{H}_{SPP}spp_{BOUNCES}bounces",
        "value": round(paths / wf[0].mean() / 1e6, 3),
        "unit": "Mpaths/s",
        "wavefront_mean_s": round(float(wf[0].mean()), 3),
        "wavefront_std_s": round(float(wf[0].std()), 3),
        "megakernel_mean_s": round(float(mk[0].mean()), 3),
        "wavefront_vs_megakernel": round(float(speedup), 2),
        "estimator_mean_delta": round(delta, 5),
        "nee_mean_s": round(float(results["nee"][0].mean()), 3),
        "nee_mpaths_per_s": round(W * H * SPP / results["nee"][0].mean() / 1e6, 3),
        "nee_mean_delta": round(float(np.abs(results["nee"][1] - wf[1]).max()), 5),
        # Both estimators are unbiased for the infinite series; at a fixed
        # bounce budget NEE additionally collects direct light at the FINAL
        # path vertex (a shadow ray is not a bounce), so its mean sits
        # slightly above the BSDF-only truncation. The delta shrinks as the
        # bounce budget grows.
        "nee_note": "delta vs wavefront = extra final-vertex direct light, not bias",
        "nee_capped_depth": NEE_CAP,
        "nee_capped_mean_s": round(float(results["nee_capped"][0].mean()), 3),
        "nee_capped_mpaths_per_s": round(
            W * H * SPP / results["nee_capped"][0].mean() / 1e6, 3
        ),
        "nee_capped_vs_wavefront": round(
            float(results["nee_capped"][0].mean() / wf[0].mean()), 2
        ),
        "nee_capped_note": (
            "production NEE config: light-sample the first vertex only "
            "(unbiased; tools/sweep_pt17.py efficiency sweep)"
        ),
    }
    from minipath_tpu.utils.calibrate import device_health

    out["device_health"] = device_health()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_pt.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main() or 0)
