#!/usr/bin/env python
"""NEE depth cap: shadow-pass cost vs variance, by Monte-Carlo efficiency.

``nee_max_depth=K`` light-samples only the first K vertices; deeper
emitter hits keep full BSDF weight (prev_pdf = 0), so the estimator stays
unbiased at any K while the per-bounce anyhit pass disappears past the
cap. Deep vertices carry little throughput (and shadow-RR already prunes
them to 35-45%% of lanes), so the variance loss may be far smaller than
the time saved. This measures the full NEE frame (960x540@8spp atrium)
at several caps: wall-clock, estimator mean (must agree), per-pixel
variance across seeds, and efficiency = 1/(variance x time).

Usage: PYTHONPATH=/root/repo python tools/sweep_pt17.py [caps...]
"""

import sys
import time

import numpy as np
import jax

from minipath_tpu.camera import Camera
from minipath_tpu.render.pallas_kernels import prepare_scene_pt
from minipath_tpu.render.wavefront import (
    make_pt_shadow_tracer,
    make_pt_tracer,
    render_frame_pt,
)
from minipath_tpu.scene.materials import Environment, build_light_table
from minipath_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

sys.path.insert(0, "/root/repo/tools")
from bench_pt import build_scene

W, H, SPP, BOUNCES = 960, 540, 8, 5
SEEDS = 6


def main():
    res, table = build_scene()
    scene = prepare_scene_pt(res.as_device())
    stack = res.recommended_stack_size
    tracer, tstate = make_pt_tracer(scene, stack_size=stack, packet_size=2048)
    shadow, _ = make_pt_shadow_tracer(scene, stack_size=stack, packet_size=2048)
    lights = build_light_table(res.arrays.tri_packets, res.arrays.tri_material, table)
    cam = (Camera().look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
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
                env=Environment.sky(), samples_per_packet=SPP,
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


if __name__ == "__main__":
    sys.exit(main() or 0)
