#!/usr/bin/env python
"""f32 vs quantized Pallas kernel on the atrium bench scene (real TPU).

Usage: python tools/perf_quantized.py [n_frames]
Writes progress to stderr; summary line at the end.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.camera import Camera
from minipath_tpu.parallel.mesh import gen_frame_rays9
from minipath_tpu.render.pallas_kernels import (
    prepare_scene,
    prepare_scene_quantized,
    trace_packets_pallas,
    trace_packets_pallas_q,
)

W, H = 1920, 1080


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_atrium():
    import bench

    return bench.build_scene()


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    result = load_atrium()
    arrays = result.as_device()
    stack = result.recommended_stack_size
    log(f"tris={result.triangle_count} depth={result.max_depth} stack={stack}")
    scene_f = prepare_scene(arrays)
    scene_q = prepare_scene_quantized(result.arrays)
    log(f"vmem f32={scene_f.vmem_bytes()/1e6:.1f}MB quant={scene_q.vmem_bytes()/1e6:.1f}MB")

    cam = (
        Camera()
        .look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
        .f_number(8.0)
        .sensor_width(36e-3)
    )
    sampler = cam.build_sampler((W, H))
    key = jax.random.key(0)

    @jax.jit
    def summarize(t, tri):
        hit = tri >= 0
        return jnp.stack(
            [jnp.mean(hit.astype(jnp.float32)), jnp.sum(jnp.where(hit, t, 0.0))]
        )

    r9, _ = gen_frame_rays9(sampler, key, width=W, height=H, px_block=(16, 16), samples=32)
    np.asarray(jnp.sum(r9))
    B, _, S, LN = r9.shape
    nrays = B * S * LN
    log(f"rays={nrays/1e6:.1f}M B={B} P={S*LN}")

    for name, fn, scn in [
        ("f32  ", trace_packets_pallas, scene_f),
        ("quant", trace_packets_pallas_q, scene_q),
    ]:
        t0 = time.time()
        kh = fn(scn, r9, stack_size=stack)
        s = np.asarray(summarize(kh.t, kh.tri))
        ovf = int(np.asarray(kh.overflow).sum())
        log(f"{name}: warmup {time.time()-t0:.1f}s hit={s[0]:.2%} tsum={s[1]:.5e} ovf={ovf}")
        best = 1e9
        for i in range(reps):
            r9b, _ = gen_frame_rays9(
                sampler, jax.random.fold_in(key, i + 1),
                width=W, height=H, px_block=(16, 16), samples=32,
            )
            np.asarray(jnp.sum(r9b))
            t0 = time.time()
            kh = fn(scn, r9b, stack_size=stack)
            np.asarray(summarize(kh.t, kh.tri))
            dt = time.time() - t0
            best = min(best, dt)
            log(f"  {name} rep{i}: {dt*1e3:.0f} ms  {nrays/dt/1e6:.1f} Mrays/s")
        log(f"{name} BEST: {best*1e3:.0f} ms  {nrays/best/1e6:.1f} Mrays/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
