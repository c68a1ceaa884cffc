#!/usr/bin/env python
"""Packet-configuration sweep for the Pallas traversal kernel on real TPU.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/perf_sweep.py
Times whole-frame traces of the cached atrium benchmark scene for several
(pixel-block x samples) packet shapes. Keeps all summaries on-device — bulk
device->host transfers through the axon tunnel are slow.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.camera import Camera
from minipath_tpu.parallel.mesh import gen_frame_rays9
from minipath_tpu.render.pallas_kernels import prepare_scene, trace_packets_pallas
from minipath_tpu.scene.bvh.build import BvhArrays, BuildResult

W, H = 1920, 1080


def load_cached_atrium():
    data = np.load("/root/repo/.bench_cache/atrium_250k_v4.npz")
    arrays = BvhArrays(**{f: jnp.asarray(data[f]) for f in BvhArrays._fields})
    return BuildResult(
        arrays=arrays,
        triangle_count=int(data["meta_tris"]),
        vertex_count=int(data["meta_verts"]),
        max_depth=int(data["meta_depth"]),
    )


@jax.jit
def summarize(t, tri):
    hit = tri >= 0
    return jnp.stack(
        [jnp.mean(hit.astype(jnp.float32)), jnp.sum(jnp.where(hit, t, 0.0))]
    )


def main():
    result = load_cached_atrium()
    scene = prepare_scene(result.arrays)
    stack = result.recommended_stack_size
    cam = (
        Camera()
        .look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
        .f_number(8.0)
        .sensor_width(36e-3)
    )
    sampler = cam.build_sampler((W, H))
    key = jax.random.key(0)

    def bench_cfg(name, px_block, samples, reps=2):
        r9, _ = gen_frame_rays9(
            sampler, key, width=W, height=H, px_block=px_block, samples=samples
        )
        r9.block_until_ready()
        B, _, S, LN = r9.shape
        nrays = B * S * LN
        kh = trace_packets_pallas(scene, r9, stack_size=stack)
        s = np.asarray(summarize(kh.t, kh.tri))
        best = 1e9
        for i in range(reps):
            r9b, _ = gen_frame_rays9(
                sampler,
                jax.random.fold_in(key, i + 1),
                width=W,
                height=H,
                px_block=px_block,
                samples=samples,
            )
            r9b.block_until_ready()
            t0 = time.time()
            kh2 = trace_packets_pallas(scene, r9b, stack_size=stack)
            np.asarray(summarize(kh2.t, kh2.tri))
            best = min(best, time.time() - t0)
        print(
            f"{name}: B={B} P={S*LN} rays={nrays/1e6:.1f}M hit={s[0]:.1%} "
            f"{best*1e3:.1f} ms  {nrays/best/1e6:.0f} Mrays/s",
            flush=True,
        )

    bench_cfg("16x16 x1spp  P=256  ", (16, 16), 1)
    bench_cfg("16x16 x16spp P=4096 ", (16, 16), 16)
    bench_cfg("16x16 x32spp P=8192 ", (16, 16), 32)
    bench_cfg("8x8  x32spp  P=2048 ", (8, 8), 32)
    bench_cfg("32x32 x16spp P=16384", (32, 32), 16)
    bench_cfg("16x16 x64spp P=16384", (16, 16), 64)
    return 0


if __name__ == "__main__":
    sys.exit(main())
