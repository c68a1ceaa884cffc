#!/usr/bin/env python
"""Packet size x child-sort x ray density on real bounce-2 rays.

The wavefront tracer's cost is dominated by incoherent-bounce traversal,
where a packet pays the UNION of its lanes' node visits. Two levers:
smaller packets (smaller union, but fixed scalar cost per visit) and
higher ray density (more spp per chunk -> sorted packets span fewer
direction/position buckets). This measures both on rays that bounced twice.

Usage: PYTHONPATH=/root/repo python tools/sweep_pt5.py [spp ...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import importlib
pk = importlib.import_module("minipath_tpu.render.pallas_kernels")
from minipath_tpu.camera import Camera
from minipath_tpu.parallel.mesh import gen_frame_rays9
from minipath_tpu.render.wavefront import (
    _PathState,
    _compact,
    make_pallas_tracer,
    scatter,
)
sys.path.insert(0, "/root/repo/tools")
from bench_pt import build_scene

W, H = 960, 540


def sync(x):
    return float(np.asarray(jnp.sum(x)))


def bounce2_rays(res, table, scene, stack, spp, key):
    """Real bounce-2 ray set: trace 2 bounces from the camera, compact."""
    cam = (Camera().look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
           .f_number(8.0).sensor_width(36e-3))
    sampler = cam.build_sampler((W, H))
    rays9, _ = gen_frame_rays9(sampler, key, width=W, height=H,
                               px_block=(16, 16), samples=spp)
    B0, _, S, LN = rays9.shape
    N = B0 * S * LN
    flat = jnp.swapaxes(rays9.reshape(B0, 9, S * LN), 1, 2).reshape(N, 9)
    state = _PathState(
        origin=flat[:, 0:3], direction=flat[:, 3:6], inv_direction=flat[:, 6:9],
        throughput=jnp.ones((N, 3), jnp.float32),
        radiance=jnp.zeros((N, 3), jnp.float32),
        pixel=jnp.arange(N, dtype=jnp.int32),
        active=jnp.ones((N,), bool),
    )
    tr, tstate = make_pallas_tracer(scene, stack_size=stack, packet_size=2048)
    for b in range(2):
        kh = tr(tstate, state.origin, state.direction, state.inv_direction)
        hit = (kh.tri >= 0) & state.active
        nd, _, _, term = scatter(table, jax.random.fold_in(key, b),
                                 state.direction, kh.normal, kh.material)
        point = state.origin + state.direction * kh.t[..., None]
        o = jnp.where(hit[..., None], point + 1e-3 * jnp.sign(nd), state.origin)
        d = jnp.where(hit[..., None], nd, state.direction)
        state = _PathState(
            origin=o, direction=d,
            inv_direction=jnp.where(d == 0, jnp.inf, 1.0 / d),
            throughput=state.throughput, radiance=state.radiance,
            pixel=state.pixel, active=hit & ~term,
        )
    state = _compact(state, fine_direction=False)
    live = int(np.asarray(jnp.sum(state.active.astype(jnp.int32))))
    return state, live, N


def main():
    spps = [int(a) for a in sys.argv[1:]] or [8, 32]
    res, table = build_scene()
    scene = pk.prepare_scene(res.as_device())
    stack = res.recommended_stack_size
    key = jax.random.key(0)

    real_pairs = pk._BATCHER_PAIRS
    for spp in spps:
        state, live, N = bounce2_rays(res, table, scene, stack, spp, key)
        print(f"--- spp={spp}: {N/1e6:.1f}M rays, live {live/N:.1%} ---",
              flush=True)
        for sort_on in (True, False):
            pk._BATCHER_PAIRS = real_pairs if sort_on else ()
            ss = stack if sort_on else stack + 1  # distinct jit cache key
            for pkt in (1024, 2048, 4096):
                tr, tstate = make_pallas_tracer(scene, stack_size=ss,
                                                packet_size=pkt)
                kh = tr(tstate, state.origin, state.direction,
                        state.inv_direction, jnp.int32(live))
                sync(kh.t)
                t0 = time.time()
                kh = tr(tstate, state.origin, state.direction,
                        state.inv_direction, jnp.int32(live))
                sync(kh.t)
                dt = time.time() - t0
                print(f"sort={int(sort_on)} pkt={pkt}: {dt*1e3:8.1f} ms  "
                      f"{live/dt/1e6:6.2f} live-Mrays/s", flush=True)
        pk._BATCHER_PAIRS = real_pairs


if __name__ == "__main__":
    sys.exit(main() or 0)
