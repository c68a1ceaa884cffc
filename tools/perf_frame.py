#!/usr/bin/env python
"""End-to-end frame benchmark: full pipeline (gen + trace + shade + accum).

PYTHONPATH=/root/repo:$PYTHONPATH python tools/perf_frame.py [spp] [samples_per_packet]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.camera import Camera
from minipath_tpu.render.frame import render_frame_pallas
from minipath_tpu.render.pallas_kernels import prepare_scene
from tools.perf_sweep import load_cached_atrium

W, H = 1920, 1080


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    samples_pp = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    result = load_cached_atrium()
    bvh = result.arrays
    scene = prepare_scene(bvh)
    stack = result.recommended_stack_size
    cam = (
        Camera()
        .look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
        .f_number(8.0)
        .sensor_width(36e-3)
    )
    sampler = cam.build_sampler((W, H))
    key = jax.random.key(0)

    def frame(k):
        img = render_frame_pallas(
            bvh,
            sampler,
            k,
            width=W,
            height=H,
            spp=spp,
            stack_size=stack,
            samples_per_packet=samples_pp,
            scene=scene,
        )
        return jnp.mean(img, axis=(0, 1))  # tiny device->host transfer

    t0 = time.time()
    m = np.asarray(frame(key))
    print(f"warmup: {time.time()-t0:.1f}s mean_rgba={m}", flush=True)
    times = []
    for i in range(3):
        t0 = time.time()
        np.asarray(frame(jax.random.fold_in(key, 10 + i)))
        times.append(time.time() - t0)
        print(f"frame {i}: {times[-1]:.3f}s", flush=True)
    best = min(times)
    rays = W * H * spp
    print(
        f"{W}x{H}@{spp}spp spp_chunk={samples_pp}: {best:.3f}s  "
        f"{rays/best/1e6:.1f} Mrays/s"
    )


if __name__ == "__main__":
    sys.exit(main() or 0)
