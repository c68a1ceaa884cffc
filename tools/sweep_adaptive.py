#!/usr/bin/env python
"""Adaptive vs uniform sampling at equal budget on the TPU.

Renders the atrium PT workload at matched average-spp budgets with the
uniform renderer and the adaptive sampler (pilot excluded, packet-level
sigma allocation), and reports per-frame wall clock plus RMSE against a
high-spp reference — the decision metric is Monte-Carlo efficiency
1/(MSE * time). Also prints the allocation spread (min/mean/max spp).

Usage: python tools/sweep_adaptive.py [--nee]
"""

import sys
import time

import numpy as np
import jax

from minipath_tpu.camera import Camera
from minipath_tpu.render.adaptive import render_frame_pt_adaptive
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

W, H, BOUNCES = 960, 540, 5


def main():
    nee = "--nee" in sys.argv
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
    lights = shadow = None
    if nee:
        lights = build_light_table(
            res.arrays.tri_packets, res.arrays.tri_material, table
        )
        shadow, _ = make_pt_shadow_tracer(
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
    kw = dict(
        width=W, height=H, bounces=BOUNCES, env=Environment.sky(),
        lights=lights, shadow_tracer=shadow,
    )

    def uni(k, spp):
        return np.asarray(render_frame_pt(
            tracer, tstate, table, sampler, k, spp=spp,
            samples_per_packet=8, **kw,
        ))[..., :3].astype(np.float64)

    def ada(k, spp):
        img, m = render_frame_pt_adaptive(
            tracer, tstate, table, sampler, k, spp=spp,
            samples_per_packet=8, pilot_spp=2, return_spp_map=True, **kw,
        )
        return np.asarray(img)[..., :3].astype(np.float64), np.asarray(m)

    print("reference (uniform 128 spp)...", flush=True)
    t0 = time.time()
    ref = uni(jax.random.fold_in(key, 99), 128)
    print(f"  done in {time.time() - t0:.0f}s", flush=True)

    for spp in (10, 18):
        for name, fn in (("uniform", None), ("adaptive", None)):
            errs, ts = [], []
            spp_map = None
            for i in range(3):
                k = jax.random.fold_in(key, 10 * spp + i)
                t0 = time.time()
                if name == "uniform":
                    img = uni(k, spp)
                else:
                    img, spp_map = ada(k, spp)
                ts.append(time.time() - t0)
                errs.append(np.sqrt(np.mean((img - ref) ** 2)))
            mse = float(np.mean(errs)) ** 2
            t = float(np.mean(ts[1:]) if len(ts) > 1 else ts[0])
            extra = ""
            if spp_map is not None:
                extra = (f" spp[min/mean/max]={spp_map.min():.0f}/"
                         f"{spp_map.mean():.1f}/{spp_map.max():.0f}")
            print(
                f"{name} spp={spp}: rmse={np.sqrt(mse):.5f} t={t:.3f}s "
                f"eff={1.0 / (mse * t):.1f}{extra}",
                flush=True,
            )


if __name__ == "__main__":
    sys.exit(main() or 0)
