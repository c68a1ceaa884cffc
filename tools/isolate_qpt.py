#!/usr/bin/env python
"""Isolate the quantized-lean PT kernel's cost from scene-size scaling.

Round-4 record: f32-lean PT on the 249k atrium = 1.162 Mpaths/s vs
quantized-lean PT on the 599k atrium = 0.354 Mpaths/s (BENCH_extra.json)
— a 3.3x gap confounding (a) in-kernel dequantization cost with (b) tree
depth / scene size. Both layouts fit the 249k scene, so this tool runs
BOTH kernels on the SAME scene, same camera/spp/bounces/seed:

* full wavefront PT frames (960x540 @ 8 spp, 5 bounces, BSDF-only — the
  BENCH_extra rung config) -> Mpaths/s each, ratio;
* the trace kernel alone on one 4.15M-ray primary batch -> seconds,
  inner_visits / leaf_tests counters (same BVH topology, so visit counts
  should nearly match; quantized boxes are rounded OUT so they can only
  add visits), and ns per packet-visit for each kernel.

If the same-scene ratio is ~1.1x (like the parity integrator's 207 vs
187 Mrays/s), the 599k gap was scene scaling. If it is >=2x, the
quantized kernel itself has headroom — the f32 PT kernel does ONE
vector->scalar sync per inner visit (packed_or reduction,
pallas_kernels.py `_traverse_kernel_pt`) while the quantized kernel does
EIGHT (per-child `jnp.min` reductions for entry-distance ordering), plus
a 10-word stack entry vs 1.

Writes ISOLATE_QPT.json. Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/isolate_qpt.py
Match: the reference's single traversal cost model
(/root/reference/src/scene/triangle_bvh/ray_bvh_intersection.rs:26-96).
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
from minipath_tpu.render.pallas_kernels import (
    prepare_scene_pt,
    prepare_scene_qpt,
)
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
    f32_scene = prepare_scene_pt(res.as_device())
    q_scene = prepare_scene_qpt(res.arrays)
    cam = (Camera().look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
           .f_number(8.0).sensor_width(36e-3))
    sampler = cam.build_sampler((W, H))
    key = jax.random.key(0)
    paths = W * H * SPP

    out = {
        "workload": f"SAME 249k-tri atrium, PT {W}x{H} @ {SPP}spp, "
        f"{BOUNCES} bounces, BSDF-only, packet {PKT}",
        "triangle_count": res.triangle_count,
    }

    # ---- full PT frames, both layouts --------------------------------
    for name, scene in (("f32_lean", f32_scene), ("quantized_lean", q_scene)):
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

    out["frame_ratio_q_over_f32"] = round(
        out["quantized_lean_s_per_frame"] / out["f32_lean_s_per_frame"], 3
    )

    # ---- kernel-only primary batch, both layouts ----------------------
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
    for name, scene in (("f32_lean", f32_scene), ("quantized_lean", q_scene)):
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
        out[f"{name}_inner_visits"] = visits
        out[f"{name}_leaf_tests"] = tests
        out[f"{name}_us_per_packet_visit"] = round(
            dt / (visits + tests) * 1e6, 3
        )
        print(f"{name} kernel: {dt:.3f}s  visits {visits}  leaf {tests}  "
              f"{out[f'{name}_us_per_packet_visit']} us/packet-visit",
              flush=True)

    out["kernel_ratio_q_over_f32"] = round(
        out["quantized_lean_trace_s"] / out["f32_lean_trace_s"], 3
    )
    out["visit_ratio_q_over_f32"] = round(
        (out["quantized_lean_inner_visits"] + out["quantized_lean_leaf_tests"])
        / (out["f32_lean_inner_visits"] + out["f32_lean_leaf_tests"]), 3
    )

    from minipath_tpu.utils.calibrate import device_health

    out["device_health"] = device_health()
    with open(os.path.join(REPO, "ISOLATE_QPT.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
