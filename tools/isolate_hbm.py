#!/usr/bin/env python
"""Measure the per-leaf DMA cost of the HBM-streamed quantized PT rung.

The huge-scene rung (BENCH_huge.json: 0.298 Mpaths/s at 5.0M tris) leaves
triangle rows in HBM and each leaf visit runs `cp.start(); cp.wait()` —
a fully serialized DMA in the traversal loop (_traverse_kernel_q,
pallas_kernels.py, `tri_in_hbm` branch). Before building double-buffering
into the kernel, this tool measures what the DMA actually costs: the SAME
scene, SAME quantized kernel, triangles VMEM-resident vs HBM-streamed.
The only difference between the two programs is the leaf-visit DMA, so

    dma_wait_frac = (t_hbm - t_vmem) / t_hbm

is the exact upper bound on what ANY overlap scheme can recover (perfect
prefetch makes the DMA free; it cannot make the kernel faster than the
VMEM-resident variant).

Runs on the 249k-tri atrium (both layouts fit VMEM) at the BENCH_extra
rung config: kernel-only primary batch + full wavefront PT frames.
Writes ISOLATE_HBM.json. Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/isolate_hbm.py
Match: the "renders anything that fits memory" promise of
/root/reference/src/scene/triangle_bvh/building.rs:28-83 at PT level.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.camera import Camera
from minipath_tpu.parallel.mesh import gen_frame_rays9
from minipath_tpu.render.pallas_kernels import prepare_scene_qpt
from minipath_tpu.render.wavefront import (
    _pack_rays9,
    _trace_pt_any,
    make_pt_tracer,
    render_frame_pt,
)
from minipath_tpu.scene.materials import Environment
from minipath_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_pt import build_scene

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
W, H, SPP, BOUNCES, PKT = 960, 540, 8, 5, 2048


def main():
    res, table = build_scene()
    stack = res.recommended_stack_size
    scenes = {
        "q_vmem": prepare_scene_qpt(res.arrays, hbm_tris=False),
        "q_hbm": prepare_scene_qpt(res.arrays, hbm_tris=True),
    }
    cam = (Camera().look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
           .f_number(8.0).sensor_width(36e-3))
    sampler = cam.build_sampler((W, H))
    key = jax.random.key(0)
    paths = W * H * SPP

    out = {
        "workload": f"SAME 249k-tri atrium, quantized kernel, tris "
        f"VMEM-resident vs HBM-streamed; PT {W}x{H} @ {SPP}spp, "
        f"{BOUNCES} bounces, BSDF-only, packet {PKT}",
        "triangle_count": res.triangle_count,
    }

    # ---- full PT frames, both placements ------------------------------
    for name, scene in scenes.items():
        tracer, tstate = make_pt_tracer(scene, stack_size=stack,
                                        packet_size=PKT)

        def frame(k):
            img = render_frame_pt(
                tracer, tstate, table, sampler, k,
                width=W, height=H, spp=SPP, bounces=BOUNCES,
                env=Environment.sky(), samples_per_packet=SPP,
                compaction=True,
            )
            return jnp.mean(img[..., :3])

        t0 = time.time()
        mean0 = float(np.asarray(frame(key)))
        print(f"{name}: warmup {time.time()-t0:.1f}s mean {mean0:.4f}",
              flush=True)
        times = []
        for i in range(3):
            t0 = time.time()
            float(np.asarray(frame(jax.random.fold_in(key, 30 + i))))
            times.append(time.time() - t0)
        arr = np.array(times)
        out[f"{name}_s_per_frame"] = round(float(arr.mean()), 3)
        out[f"{name}_mpaths_per_s"] = round(paths / arr.mean() / 1e6, 3)
        out[f"{name}_frame_mean"] = round(mean0, 5)
        print(f"{name}: {arr.mean():.3f}s/frame "
              f"({out[f'{name}_mpaths_per_s']} Mpaths/s)", flush=True)

    # ---- kernel-only primary batch, both placements --------------------
    rays9, _ = gen_frame_rays9(
        sampler, jax.random.fold_in(key, 9), width=W, height=H,
        px_block=(16, 16), samples=SPP,
    )
    B0, _, S, LN = rays9.shape
    N = B0 * S * LN
    flat = jnp.swapaxes(rays9.reshape(B0, 9, S * LN), 1, 2).reshape(N, 9)
    o, d, inv = flat[:, 0:3], flat[:, 3:6], flat[:, 6:9]

    def trace_kernel(state, origin, direction, inv_direction):
        r9, _, Np = _pack_rays9(PKT, None, origin, direction, inv_direction)
        ph = _trace_pt_any(state, r9, stack_size=stack, interpret=False,
                           live_packets=None)
        return ph.t, ph.inner_visits, ph.leaf_tests

    trace_j = jax.jit(trace_kernel)
    for name, scene in scenes.items():
        t, iv, lt = trace_j(scene, o, d, inv)  # warm
        float(np.asarray(jnp.sum(t)))
        times = []
        for i in range(3):
            t0 = time.time()
            t, iv, lt = trace_j(scene, o, d, inv)
            float(np.asarray(jnp.sum(t)))
            times.append(time.time() - t0)
        dt = float(np.mean(times))
        visits = int(np.asarray(jnp.sum(iv)))
        tests = int(np.asarray(jnp.sum(lt)))
        out[f"{name}_trace_s"] = round(dt, 4)
        out[f"{name}_leaf_tests"] = tests
        out[f"{name}_inner_visits"] = visits
        print(f"{name} kernel: {dt:.3f}s  visits {visits}  leaf {tests}",
              flush=True)

    dma_s = out["q_hbm_trace_s"] - out["q_vmem_trace_s"]
    out["kernel_dma_wait_s"] = round(dma_s, 4)
    out["kernel_dma_wait_frac_of_hbm"] = round(
        dma_s / out["q_hbm_trace_s"], 4
    )
    out["kernel_dma_us_per_leaf_visit"] = round(
        dma_s / max(out["q_hbm_leaf_tests"], 1) * 1e6, 3
    )
    out["frame_ratio_hbm_over_vmem"] = round(
        out["q_hbm_s_per_frame"] / out["q_vmem_s_per_frame"], 3
    )

    from minipath_tpu.utils.calibrate import device_health

    out["device_health"] = device_health()
    with open(os.path.join(REPO, "ISOLATE_HBM.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
