#!/usr/bin/env python
"""Compare trace speed of native-built vs python-built trees."""
import time
import numpy as np, jax, jax.numpy as jnp
from minipath_tpu.camera import Camera
from minipath_tpu.parallel.mesh import gen_frame_rays9
from minipath_tpu.render.pallas_kernels import prepare_scene, trace_packets_pallas
from minipath_tpu.scene.bvh.build import build_bvh
from minipath_tpu.scene.bvh import native
from minipath_tpu.scene.procedural import make_atrium

W, H = 1920, 1080
mesh = make_atrium(250_000)
cam = Camera().look_at((-16.0,4.0,0.0),(10.0,3.0,0.5)).f_number(8.0).sensor_width(36e-3)
sampler = cam.build_sampler((W,H))
r9, _ = gen_frame_rays9(sampler, jax.random.key(0), width=W, height=H, px_block=(16,16), samples=32)
r9.block_until_ready()
B,_,S,LN = r9.shape; nrays = B*S*LN

@jax.jit
def summarize(t, tri):
    return jnp.sum(jnp.where(tri >= 0, t, 0.0))

def bench(name, res):
    scene = prepare_scene(res.as_device())
    stack = res.recommended_stack_size
    kh = trace_packets_pallas(scene, r9, stack_size=stack)
    np.asarray(summarize(kh.t, kh.tri))
    best = 1e9
    for i in range(2):
        t0=time.time()
        kh = trace_packets_pallas(scene, r9, stack_size=stack)
        np.asarray(summarize(kh.t, kh.tri))
        best = min(best, time.time()-t0)
    print(f"{name}: depth={res.max_depth} nodes={res.arrays.node_child_links.shape[0]} "
          f"packets={res.arrays.tri_packets.shape[0]} trace {best*1e3:.0f} ms -> {nrays/best/1e6:.0f} Mrays/s", flush=True)

import sys
order = sys.argv[1] if len(sys.argv) > 1 else "np"
if order == "np":
    bench("native-24", native.build_bvh_native(mesh, leaf_max=24))
    bench("python-24", build_bvh(mesh, leaf_max=24))
elif order == "n":
    bench("native-24", native.build_bvh_native(mesh, leaf_max=24))
else:
    bench("python-24", build_bvh(mesh, leaf_max=24))
    bench("native-24", native.build_bvh_native(mesh, leaf_max=24))
