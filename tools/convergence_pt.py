#!/usr/bin/env python
"""Wavefront-vs-megakernel convergence run (BASELINE.json config #4).

Both integrators sample the identical estimator — the wavefront loop only
reorders rays (compaction sort) and skips dead packets; the megakernel mode
runs the same bounce loop masked, uncompacted. This tool renders an spp
ladder with the wavefront tracer and the top rung with the megakernel,
then records:

* per-rung RMSE against the top wavefront rung (must fall ~1/sqrt(spp)),
* wavefront-vs-megakernel RMSE at the top rung (must sit at the MC noise
  floor measured from two independent wavefront seeds),
* wall-clock per rung and the wavefront/megakernel speed ratio.

Writes CONVERGENCE.json at the repo root.

Usage: PYTHONPATH=/root/repo python tools/convergence_pt.py [W H top_spp]
"""

import json
import os
import sys
import time

import numpy as np
import jax

from minipath_tpu.camera import Camera
from minipath_tpu.render.pallas_kernels import prepare_scene_pt
from minipath_tpu.render.wavefront import make_pt_tracer, render_frame_pt
from minipath_tpu.utils.cache import enable_compile_cache

enable_compile_cache()  # persistent cache: reruns skip minutes of Mosaic compiles

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_pt import build_scene

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a[..., :3], np.float64) -
                                  np.asarray(b[..., :3], np.float64)) ** 2)))


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 480
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 270
    TOP = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    BOUNCES = 5

    res, table = build_scene()
    scene = prepare_scene_pt(res.as_device())
    tracer, tstate = make_pt_tracer(
        scene, stack_size=res.recommended_stack_size, packet_size=2048
    )
    cam = (
        Camera()
        .look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
        .f_number(8.0)
        .sensor_width(36e-3)
    )
    sampler = cam.build_sampler((W, H))

    # Keep each wavefront chunk at ~4.2M rays: a 16M-ray chunk OOMs the
    # shade-gather compile at ~16 GB HBM (tools/bench_pt.py note), so the
    # per-chunk spp shrinks as the resolution grows (8 at 480x270, 2 at
    # 1080p — the same sweet spot bench.py's 1080p config uses).
    spp_chunk = max(1, min(8, 4_200_000 // (W * H)))

    def frame(spp, seed, compaction, stratify=True):
        t0 = time.time()
        img = render_frame_pt(
            tracer, tstate, table, sampler, jax.random.key(seed),
            width=W, height=H, spp=spp, bounces=BOUNCES,
            samples_per_packet=min(spp_chunk, spp), compaction=compaction,
            stratify=stratify,
        )
        img = np.asarray(img)
        return img, time.time() - t0

    ladder = []
    spp = 8
    while spp < TOP:
        ladder.append(spp)
        spp *= 4
    ladder.append(TOP)

    # Warm up compiles BEFORE the ladder so rung timings measure rendering,
    # not the one-off Mosaic/XLA compile of the bounce programs (the r02
    # artifact folded ~3 min of compile into the 8-spp rung).
    print("warmup (compile)...", flush=True)
    _, warm_dt = frame(8, seed=9, compaction=True)
    _, warm_mk = frame(8, seed=9, compaction=False)
    print(f"  warm: wavefront {warm_dt:.1f}s, megakernel {warm_mk:.1f}s", flush=True)

    print(f"wavefront ladder {ladder} at {W}x{H}...", flush=True)
    wf = {}
    times = {}
    for s in ladder:
        img, dt = frame(s, seed=0, compaction=True)
        wf[s], times[s] = img, dt
        print(f"  wavefront {s:5d} spp: {dt:7.1f}s", flush=True)

    ref = wf[TOP]
    rungs = [
        {"spp": s, "rmse_vs_top": rmse(wf[s], ref), "seconds": round(times[s], 2)}
        for s in ladder[:-1]
    ]
    for r in rungs:
        print(f"  rung {r['spp']:5d}: rmse {r['rmse_vs_top']:.5f}", flush=True)

    # Monte Carlo noise floor at the top rung: independent wavefront seed.
    img2, dt2 = frame(TOP, seed=1, compaction=True)
    floor = rmse(img2, ref)
    print(f"  noise floor (independent seed @ {TOP} spp): {floor:.5f}", flush=True)

    print("megakernel top rung...", flush=True)
    mk, mk_dt = frame(TOP, seed=2, compaction=False)
    mk_rmse = rmse(mk, ref)
    print(f"  megakernel {TOP} spp: {mk_dt:.1f}s  rmse {mk_rmse:.5f}", flush=True)

    # Quantify what per-pixel stratification buys at the practical rungs:
    # the iid (reference-style) estimator's RMSE at the same spp, averaged
    # over a few seeds on both sides so the comparison isn't one draw.
    print("iid-vs-stratified rungs...", flush=True)
    strat_gain = []
    for s in ladder[:2]:
        frame(s, seed=0, compaction=True, stratify=False)  # warm iid compile
        r_iid = np.mean(
            [rmse(frame(s, seed=20 + i, compaction=True, stratify=False)[0],
                  ref) for i in range(3)]
        )
        r_st = np.mean(
            [rmse(frame(s, seed=20 + i, compaction=True)[0], ref)
             for i in range(3)]
        )
        strat_gain.append(
            {"spp": s, "rmse_iid": round(float(r_iid), 6),
             "rmse_stratified": round(float(r_st), 6),
             "mse_reduction": round(float((r_iid / r_st) ** 2), 3)}
        )
        print(f"  spp {s}: iid {r_iid:.5f} vs strat {r_st:.5f} "
              f"(MSE x{strat_gain[-1]['mse_reduction']})", flush=True)

    out = {
        "workload": f"atrium PT {W}x{H}, {BOUNCES} bounces, top rung {TOP} spp",
        "rungs": rungs,
        "top_spp": TOP,
        "wavefront_top_s": round(times[TOP], 2),
        "megakernel_top_s": round(mk_dt, 2),
        "wavefront_vs_megakernel_speed": round(mk_dt / times[TOP], 2),
        "noise_floor_rmse": round(floor, 6),
        "megakernel_rmse_vs_wavefront": round(mk_rmse, 6),
        "estimators_agree": bool(mk_rmse < 2.0 * floor),
        "stratified": True,
        "stratification_gain": strat_gain,
    }
    # The default config owns CONVERGENCE.json; other resolutions get their
    # own artifact so the 480x270@1024 record survives a 1080p run.
    name = ("CONVERGENCE.json" if (W, H) == (480, 270)
            else f"CONVERGENCE_{W}x{H}.json")
    with open(os.path.join(REPO, name), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
