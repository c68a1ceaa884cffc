#!/usr/bin/env python
"""leaf_max sweep upward: 24 vs 40 vs 56 on the real PT frame.

tools/sweep_pt9.py measured 8/16/24 and picked 24; the upper half of the
format's range was never tried. Deeper leaf runs trade ~1.2us inner visits
for ~0.58us 8-triangle MT rows — on incoherent deep-bounce packets the
balance may sit higher than it does for primaries.
(960x540@8spp atrium, 5 bounces, wavefront tracer.)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.camera import Camera
from minipath_tpu.render.pallas_kernels import prepare_scene_pt
from minipath_tpu.render.wavefront import make_pt_tracer, render_frame_pt
from minipath_tpu.scene.bvh import native
from minipath_tpu.scene.bvh.build import build_bvh
from minipath_tpu.scene.materials import Environment, material_table
from minipath_tpu.scene.procedural import atrium_materials, make_atrium

W, H, SPP, BOUNCES = 960, 540, 8, 5


def main():
    mesh = make_atrium(250_000)
    mats, dicts = atrium_materials(mesh)
    table = material_table(dicts)
    cam = (Camera().look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
           .f_number(8.0).sensor_width(36e-3))
    sampler = cam.build_sampler((W, H))
    key = jax.random.key(0)

    for leaf_max in (24, 40, 56):
        if native.is_available():
            res = native.build_bvh_native(mesh, materials=mats, leaf_max=leaf_max)
        else:
            res = build_bvh(mesh, materials=mats, leaf_max=leaf_max)
        scene = prepare_scene_pt(res.as_device())
        tracer, tstate = make_pt_tracer(
            scene, stack_size=res.recommended_stack_size, packet_size=2048
        )

        def frame(k):
            img = render_frame_pt(
                tracer, tstate, table, sampler, k,
                width=W, height=H, spp=SPP, bounces=BOUNCES,
                env=Environment.sky(), samples_per_packet=SPP, compaction=True,
            )
            return float(np.asarray(jnp.mean(img[..., :3])))

        t0 = time.time()
        m = frame(key)
        print(f"leaf_max={leaf_max}: warmup {time.time()-t0:.1f}s mean={m:.4f}",
              flush=True)
        times = []
        for i in range(3):
            t0 = time.time()
            frame(jax.random.fold_in(key, 10 + i))
            times.append(time.time() - t0)
        arr = np.array(times)
        print(
            f"leaf_max={leaf_max}: {arr.mean():.3f}s/frame "
            f"{W*H*SPP/arr.mean()/1e6:.3f} Mpaths/s",
            flush=True,
        )


if __name__ == "__main__":
    sys.exit(main() or 0)
