#!/usr/bin/env python
"""Sweep packet size x compaction-key granularity on REAL bounce-1 rays.

Builds the PT atrium, traces primaries, scatters once, then times the
traversal of the resulting (divergent) ray set for several packet sizes and
sort keys. Also times the compaction sort itself.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.camera import Camera
from minipath_tpu.parallel.mesh import gen_frame_rays9
from minipath_tpu.render.pallas_kernels import prepare_scene
from minipath_tpu.render.wavefront import make_pallas_tracer, scatter
from minipath_tpu.scene.materials import Environment

sys.path.insert(0, "/root/repo/tools")
from bench_pt import build_scene

W, H, SPP = 960, 540, 8


def sync(x):
    return float(np.asarray(jnp.sum(x)))


def sort_state(o, d, key_bits):
    lo = jnp.min(o, axis=0)
    hi = jnp.max(o, axis=0)
    c = key_bits  # cells per axis bits
    scale = (1 << c) / jnp.maximum(hi - lo, 1e-6)
    cell = jnp.clip((o - lo) * scale, 0, (1 << c) - 1).astype(jnp.int32)
    cell_id = (cell[:, 0] << (2 * c)) | (cell[:, 1] << c) | cell[:, 2]
    octant = (
        (d[:, 0] > 0).astype(jnp.int32) * 4
        + (d[:, 1] > 0).astype(jnp.int32) * 2
        + (d[:, 2] > 0).astype(jnp.int32)
    )
    key = (octant << (3 * c)) | cell_id
    return jnp.argsort(key)


def main():
    res, table = build_scene()
    scene = prepare_scene(res.as_device())
    stack = res.recommended_stack_size
    cam = (
        Camera().look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
        .f_number(8.0).sensor_width(36e-3)
    )
    sampler = cam.build_sampler((W, H))
    key = jax.random.key(0)
    rays9, _ = gen_frame_rays9(sampler, key, width=W, height=H, px_block=(16, 16), samples=SPP)
    B0, _, S, LN = rays9.shape
    N = B0 * S * LN
    flat = jnp.swapaxes(rays9.reshape(B0, 9, S * LN), 1, 2).reshape(N, 9)
    o, d, inv = flat[:, 0:3], flat[:, 3:6], flat[:, 6:9]

    tracer0, tstate = make_pallas_tracer(scene, stack_size=stack, packet_size=2048)
    kh = tracer0(tstate, o, d, inv)
    sync(kh.t)
    # One diffuse-ish scatter to produce the divergent bounce-1 set.
    nd, _, _, _ = scatter(table, key, d, kh.normal, kh.material)
    hit = kh.tri >= 0
    point = o + d * kh.t[..., None]
    o1 = jnp.where(hit[..., None], point + 1e-3 * jnp.sign(nd), o)
    d1 = jnp.where(hit[..., None], nd, d)
    inv1 = jnp.where(d1 == 0, jnp.inf, 1.0 / d1)
    print(f"N={N/1e6:.2f}M bounce-1 rays, live={float(jnp.mean(hit.astype(jnp.float32))):.1%}", flush=True)

    for kb in (3, 4, 5):
        t0 = time.time()
        perm = sort_state(o1, d1, kb)
        os_, ds_, is_ = o1[perm], d1[perm], inv1[perm]
        sync(os_)
        tsort = time.time() - t0
        for pkt in (512, 1024, 2048, 4096):
            tracer, _ = make_pallas_tracer(scene, stack_size=stack, packet_size=pkt)
            kh2 = tracer(tstate, os_, ds_, is_)
            sync(kh2.t)  # warmup/compile
            t0 = time.time()
            kh2 = tracer(tstate, os_, ds_, is_)
            sync(kh2.t)
            dt = time.time() - t0
            print(
                f"key={kb}b/axis pkt={pkt}: sort {tsort*1e3:5.0f} ms  "
                f"trace {dt*1e3:7.1f} ms  {N/dt/1e6:5.1f} Mrays/s",
                flush=True,
            )
    # unsorted baseline
    tracer, _ = make_pallas_tracer(scene, stack_size=stack, packet_size=2048)
    t0 = time.time()
    kh2 = tracer(tstate, o1, d1, inv1)
    sync(kh2.t)
    print(f"unsorted pkt=2048: trace {(time.time()-t0)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
