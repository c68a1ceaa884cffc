#!/usr/bin/env python
"""Sweep the NEE shadow (anyhit) kernel's knobs on the TPU.

The closest-hit kernel's near-first child ordering is load-bearing
(removing it is 1.7x slower — tools/sweep_pt8.py), but the ANYHIT kernel's
economics differ: a lane retires at its FIRST accepted hit, so ordering
only controls how quickly occluders are found, while the 19-stage scalar
sorting network is pure per-visit overhead either way. Shadow packets are
also a compacted subset of the wavefront (candidate count drops 25-65%
after shadow-RR), so a smaller packet may fit the candidate set with a
tighter union.

Measures the full NEE frame (960x540 @ 8spp / 5 bounces atrium) for
  sort_children x {True, False}  X  shadow packet {2048, 1024}
against the BENCH_pt.json baseline config.

Usage: python tools/sweep_shadow.py
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
from minipath_tpu.scene.bvh import native
from minipath_tpu.scene.bvh.build import build_bvh
from minipath_tpu.scene.materials import (
    Environment,
    build_light_table,
    material_table,
)
from minipath_tpu.scene.procedural import atrium_materials, make_atrium
from minipath_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

W, H, SPP, BOUNCES = 960, 540, 8, 5


def main():
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
    lights = build_light_table(
        res.arrays.tri_packets, res.arrays.tri_material, table
    )
    cam = (
        Camera()
        .look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
        .f_number(8.0)
        .sensor_width(36e-3)
    )
    sampler = cam.build_sampler((W, H))
    key = jax.random.key(0)

    ref_mean = None
    for ps in (2048, 1024):
        for sort in (True, False):
            shadow, _ = make_pt_shadow_tracer(
                scene, stack_size=res.recommended_stack_size,
                packet_size=ps, sort_children=sort,
            )

            def f(k):
                return render_frame_pt(
                    tracer, tstate, table, sampler, k,
                    width=W, height=H, spp=SPP, bounces=BOUNCES,
                    env=Environment.sky(), samples_per_packet=8,
                    compaction=True, lights=lights, shadow_tracer=shadow,
                )

            t0 = time.time()
            img = np.asarray(f(key))
            warm = time.time() - t0
            m = float(img[..., :3].mean())
            if ref_mean is None:
                ref_mean = m
            ts = []
            for i in range(3):
                t0 = time.time()
                np.asarray(f(jax.random.fold_in(key, 10 + i)))
                ts.append(time.time() - t0)
            print(
                f"packet={ps} sort={int(sort)}: "
                f"{np.mean(ts):.3f}s/frame (+-{np.std(ts):.3f}) "
                f"warm {warm:.0f}s mean {m:.5f} "
                f"(d={m - ref_mean:+.5f})",
                flush=True,
            )


if __name__ == "__main__":
    sys.exit(main() or 0)
