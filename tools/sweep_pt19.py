#!/usr/bin/env python
"""NEE depth cap on the SECOND light topology: small occluded emitter.

tools/sweep_pt17.py measured the cap on the atrium, whose emitters are
large ceiling panels directly visible from most first-bounce vertices —
the exact topology where deep light sampling is worthless, so K=1 won
(1.47x efficiency). That single-scene evidence was wired as "the
production config" (round-3 VERDICT weakness #3). This sweep reruns the
identical protocol on :func:`make_tworooms`: a dark camera room lit only
through a doorway by a recessed fixture in the adjacent room, where
first-bounce vertices essentially never see the emitter and transport is
multi-bounce. If K=1 loses here, the cap is topology-dependent and the
scene-neutral default must stay uncapped.

Efficiency = 1/(per-pixel variance across seeds x wall-clock), caps
compared at identical sample budgets (all caps are unbiased — the
estimator mean must agree across rows; that is asserted).

Usage: PYTHONPATH=/root/repo python tools/sweep_pt19.py [caps...]
"""

import json
import os
import sys
import time

import numpy as np
import jax

from minipath_tpu.camera import Camera
from minipath_tpu.render.wavefront import (
    make_pt_shadow_tracer,
    make_pt_tracer,
    render_frame_pt,
)
from minipath_tpu.scene.materials import Environment, build_light_table, material_table
from minipath_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

W, H, SPP, BOUNCES = 960, 540, 8, 7
SEEDS = 6
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_scene():
    from minipath_tpu.scene.bvh import native
    from minipath_tpu.scene.bvh.build import build_bvh
    from minipath_tpu.scene.procedural import make_tworooms, tworooms_materials

    mesh = make_tworooms(150_000)
    mats, dicts = tworooms_materials(mesh)
    table = material_table(dicts)
    if native.is_available():
        res = native.build_bvh_native(mesh, materials=mats, leaf_max=24)
    else:
        res = build_bvh(mesh, materials=mats, leaf_max=24)
    return res, table


def main():
    from minipath_tpu.render.pallas_kernels import prepare_scene_pt

    res, table = build_scene()
    scene = prepare_scene_pt(res.as_device())
    stack = res.recommended_stack_size
    tracer, tstate = make_pt_tracer(scene, stack_size=stack, packet_size=2048)
    shadow, _ = make_pt_shadow_tracer(scene, stack_size=stack, packet_size=2048)
    lights = build_light_table(res.arrays.tri_packets, res.arrays.tri_material, table)
    cam = (Camera().look_at((-10.0, 3.0, 0.0), (0.0, 1.5, 0.0))
           .f_number(8.0).sensor_width(36e-3))
    sampler = cam.build_sampler((W, H))
    key = jax.random.key(0)

    caps = [None if c == "none" else int(c) for c in sys.argv[1:]] or [
        None, 3, 2, 1,
    ]
    rows = []
    for cap in caps:
        def frame(k):
            img = render_frame_pt(
                tracer, tstate, table, sampler, k,
                width=W, height=H, spp=SPP, bounces=BOUNCES,
                env=Environment.none(), samples_per_packet=SPP,
                compaction=True, lights=lights, shadow_tracer=shadow,
                nee_max_depth=cap,
            )
            return np.asarray(img[..., :3])

        t0 = time.time()
        imgs = [frame(key)]
        print(f"cap={cap}: warmup {time.time()-t0:.1f}s", flush=True)
        times = []
        for i in range(SEEDS - 1):
            t0 = time.time()
            imgs.append(frame(jax.random.fold_in(key, 40 + i)))
            times.append(time.time() - t0)
        stack_i = np.stack(imgs)
        mean = float(stack_i.mean())
        var = float(stack_i.var(axis=0).mean())
        t = float(np.mean(times))
        eff = 1.0 / (var * t) if var > 0 else float("inf")
        rows.append((cap, t, mean, var, eff))
        print(
            f"cap={cap}: {t:.3f}s/frame  mean={mean:.4f}  "
            f"var={var:.3e}  eff={eff:.1f}",
            flush=True,
        )

    base = rows[0]
    print("\ncap  time  mean  var  efficiency (vs uncapped)")
    for cap, t, mean, var, eff in rows:
        print(
            f"{str(cap):>4}  {t:6.3f}  {mean:.4f}  {var:.3e}  "
            f"{eff/base[4]:5.2f}x"
        )
    # Unbiasedness across caps: means agree within MC noise of the seed set.
    for cap, t, mean, var, eff in rows[1:]:
        assert abs(mean - base[2]) < 0.05 * max(base[2], 1e-6), (cap, mean, base[2])

    out = {
        "workload": f"tworooms (recessed occluded emitter) {W}x{H} @ {SPP}spp, "
        f"{BOUNCES} bounces, {SEEDS} seeds",
        "rows": [
            {
                "cap": cap,
                "s_per_frame": round(t, 3),
                "mean": round(mean, 5),
                "var": var,
                "efficiency_vs_uncapped": round(eff / base[4], 3),
            }
            for cap, t, mean, var, eff in rows
        ],
    }
    with open(os.path.join(REPO, "SWEEP_NEE_CAP2.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main() or 0)
