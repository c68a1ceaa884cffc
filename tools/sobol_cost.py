#!/usr/bin/env python
"""Equal-cost check for the Owen-scrambled Sobol sampler on the TPU.

QUALITY.json's ``sobol`` section shows Sobol beats jittered strata on MSE
at equal spp (1.10x @ 8spp, 1.03x @ 32spp). This measures the other half
of the default-on decision: what the Sobol dimensions COST per frame on
the real device (the scramble is pure ALU — a few dozen extra vector ops
per sample dimension inside the fused shade phase).

Appends a ``frame_cost`` entry to QUALITY.json's sobol section.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/sobol_cost.py
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
from minipath_tpu.scene.materials import Environment
from minipath_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_pt import build_scene

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
W, H, SPP, BOUNCES = 960, 540, 8, 5


def main():
    res, table = build_scene()
    scene = prepare_scene_pt(res.as_device())
    tracer, tstate = make_pt_tracer(
        scene, stack_size=res.recommended_stack_size, packet_size=2048
    )
    env = Environment.sky()
    cam = (Camera().look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
           .f_number(8.0).sensor_width(36e-3))
    sampler = cam.build_sampler((W, H))
    key = jax.random.key(7)

    def frame(k, sobol):
        img = render_frame_pt(
            tracer, tstate, table, sampler, k,
            width=W, height=H, spp=SPP, bounces=BOUNCES, env=env,
            samples_per_packet=SPP, compaction=True, sobol=sobol,
        )
        return np.asarray(img[..., :3]).mean()

    out = {}
    for name, sobol in (("stratified", False), ("sobol", True)):
        m = frame(key, sobol)  # warm/compile
        ts = []
        for i in range(4):
            t0 = time.time()
            frame(jax.random.fold_in(key, i), sobol)
            ts.append(time.time() - t0)
        out[f"{name}_s_per_frame"] = round(float(np.mean(sorted(ts)[:3])), 3)
        out[f"{name}_frame_mean"] = round(float(m), 5)
        print(name, out[f"{name}_s_per_frame"], "s/frame, mean", m, flush=True)

    out["cost_ratio_sobol_over_stratified"] = round(
        out["sobol_s_per_frame"] / out["stratified_s_per_frame"], 4
    )
    out["workload"] = (
        f"atrium f32-lean PT {W}x{H} @ {SPP}spp, {BOUNCES} bounces, "
        "BSDF-only, packet 2048, warm, best-3-of-4"
    )
    qpath = os.path.join(REPO, "QUALITY.json")
    q = json.load(open(qpath))
    q["sobol"]["frame_cost"] = out
    with open(qpath, "w") as f:
        json.dump(q, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
