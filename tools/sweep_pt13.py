#!/usr/bin/env python
"""Shadow-ray sort order: direction-major vs position-major.

NEE shadow segments CONVERGE on the scene's lights, unlike bounce rays
which diverge — so the best packet key may invert: direction-major
(current) groups rays aimed at the same light from all over the scene,
position-major groups spatial neighbors whose segments run nearly
parallel. Measures the full NEE frame (960x540@8spp atrium) both ways.
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
from minipath_tpu.scene.materials import Environment, build_light_table

sys.path.insert(0, "/root/repo/tools")
from bench_pt import build_scene

W, H, SPP, BOUNCES = 960, 540, 8, 5


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

    for order in sys.argv[1:] or ("dir", "pos"):
        def frame(k):
            img = render_frame_pt(
                tracer, tstate, table, sampler, k,
                width=W, height=H, spp=SPP, bounces=BOUNCES,
                env=Environment.sky(), samples_per_packet=SPP,
                compaction=True, lights=lights, shadow_tracer=shadow,
                shadow_sort=order,
            )
            return float(np.asarray(jnp.mean(img[..., :3])))

        t0 = time.time()
        m = frame(key)
        print(f"{order}: warmup {time.time()-t0:.1f}s mean={m:.4f}", flush=True)
        times = []
        for i in range(3):
            t0 = time.time()
            frame(jax.random.fold_in(key, 30 + i))
            times.append(time.time() - t0)
        arr = np.array(times)
        print(f"{order}: {arr.mean():.3f}s/frame nee", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
