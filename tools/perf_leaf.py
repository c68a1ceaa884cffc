#!/usr/bin/env python
"""Leaf-size tuning: trace time on the atrium vs leaf_max."""
import sys, time
import numpy as np, jax
from minipath_tpu.camera import Camera
from minipath_tpu.parallel.mesh import gen_frame_rays9
from minipath_tpu.render.pallas_kernels import prepare_scene, trace_packets_pallas
from minipath_tpu.scene.bvh.build import build_bvh
from minipath_tpu.scene.procedural import make_atrium

W, H = 1920, 1080
mesh = make_atrium(250_000)
cam = Camera().look_at((-16.0,4.0,0.0),(10.0,3.0,0.5)).f_number(8.0).sensor_width(36e-3)
sampler = cam.build_sampler((W,H))
key = jax.random.key(0)
r9, _ = gen_frame_rays9(sampler, key, width=W, height=H, px_block=(16,16), samples=32)
r9.block_until_ready()
B, _, S, LN = r9.shape
nrays = B*S*LN

import jax.numpy as jnp

@jax.jit
def summarize(t, tri):
    return jnp.sum(jnp.where(tri >= 0, t, 0.0))

for leaf_max in [56, 32, 24, 16, 8]:
    t0 = time.time()
    res = build_bvh(mesh, leaf_max=leaf_max)
    bt = time.time() - t0
    scene = prepare_scene(res.as_device())
    stack = res.recommended_stack_size
    kh = trace_packets_pallas(scene, r9, stack_size=stack)
    np.asarray(summarize(kh.t, kh.tri))
    best = 1e9
    for i in range(2):
        t0 = time.time()
        kh = trace_packets_pallas(scene, r9, stack_size=stack)
        np.asarray(summarize(kh.t, kh.tri))
        best = min(best, time.time() - t0)
    mb = (scene.tri_data.size*4 + scene.tri_shade.size*4)/1e6
    print(f"leaf_max={leaf_max:2d}: build {bt:.1f}s depth={res.max_depth} "
          f"packets={scene.tri_data.shape[0]} vmem={mb:.0f}MB "
          f"trace {best*1e3:.0f} ms -> {nrays/best/1e6:.0f} Mrays/s", flush=True)
