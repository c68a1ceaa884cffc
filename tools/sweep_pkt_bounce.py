#!/usr/bin/env python
"""Per-bounce packet-size sweep on REAL bounce-k ray distributions.

The headline profile (PROFILE_PT.json) shows deep bounces dominate the
trace phase: bounce-2/3 rays cost ~3x more per live ray than bounce-1
rays because a 2048-lane packet traverses the UNION of its lanes' node
visits, and diffuse bounce rays decohere. A SMALLER packet shrinks that
union (fewer lanes per union) at the cost of more per-packet scalar
stack work. The original sweep (tools/sweep_pt2.py) only went UP from
2048 on primary rays; this one goes DOWN (512/1024/2048) on the actual
compacted bounce-k wavefronts of the headline scene.

Prints per (bounce, packet) trace seconds + visit counters; if a small
packet wins at deep bounces, wire a per-bounce tracer in _pt_trace.

Usage: PYTHONPATH=/root/repo python tools/sweep_pkt_bounce.py [W H spp]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.camera import Camera
from minipath_tpu.parallel.mesh import gen_frame_rays9
from minipath_tpu.render.pallas_kernels import prepare_scene_pt
from minipath_tpu.render.wavefront import (
    _PathState,
    _compact,
    make_pt_tracer,
    scatter,
)
from minipath_tpu.scene.materials import Environment
from minipath_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
sys.path.insert(0, "/root/repo/tools")
from bench_pt import build_scene


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    SPP = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    BOUNCES = 5
    PKTS = (512, 1024, 2048)

    res, table = build_scene()
    scene = prepare_scene_pt(res.as_device())
    stack = res.recommended_stack_size
    tracers = {
        p: make_pt_tracer(scene, stack_size=stack, packet_size=p)
        for p in PKTS
    }
    env = Environment.sky()
    cam = (Camera().look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
           .f_number(8.0).sensor_width(36e-3))
    sampler = cam.build_sampler((W, H))
    key = jax.random.key(0)

    rays9, _ = gen_frame_rays9(
        sampler, key, width=W, height=H, px_block=(16, 16), samples=SPP
    )
    B0, _, S, LN = rays9.shape
    N = B0 * S * LN
    flat = jnp.swapaxes(rays9.reshape(B0, 9, S * LN), 1, 2).reshape(N, 9)
    state = _PathState(
        origin=flat[:, 0:3],
        direction=flat[:, 3:6],
        inv_direction=flat[:, 6:9],
        throughput=jnp.ones((N, 3), jnp.float32),
        radiance=jnp.zeros((N, 3), jnp.float32),
        pixel=jnp.arange(N, dtype=jnp.int32),
        active=jnp.ones((N,), bool),
    )
    print(f"N={N/1e6:.2f}M rays", flush=True)

    @jax.jit
    def advance(state, kh, bkey):
        hit = (kh.tri >= 0) & state.active
        new_dir, _, _, term = scatter(
            table, bkey, state.direction, kh.normal, kh.material
        )
        point = state.origin + state.direction * kh.t[..., None]
        d_dot_n = jnp.sum(state.direction * kh.normal, axis=-1, keepdims=True)
        nf = jnp.where(d_dot_n < 0, kh.normal, -kh.normal)
        offset_dir = jnp.where(
            jnp.sum(new_dir * nf, axis=-1, keepdims=True) >= 0, nf, -nf
        )
        new_origin = point + offset_dir * 1e-3
        inv = jnp.where(new_dir == 0.0, jnp.inf, 1.0 / new_dir)
        return _PathState(
            origin=jnp.where(hit[..., None], new_origin, state.origin),
            direction=jnp.where(hit[..., None], new_dir, state.direction),
            inv_direction=jnp.where(hit[..., None], inv, state.inv_direction),
            throughput=state.throughput,
            radiance=state.radiance,
            pixel=state.pixel,
            active=hit & ~term,
        )

    trace = {
        p: jax.jit(lambda st, o, d, i, lv, t=tracers[p][0]: t(st, o, d, i, lv))
        for p in PKTS
    }

    for b in range(BOUNCES):
        live_n = None
        if b > 0:
            state = _compact(state, fine_direction=b == 1)
            live_n = jnp.sum(state.active.astype(jnp.int32))
        rows = []
        kh_keep = None
        for p in PKTS:
            f = trace[p]
            kh = f(tracers[p][1], state.origin, state.direction,
                   state.inv_direction, live_n)
            jax.block_until_ready(kh.t)
            ts = []
            for _ in range(3):
                t0 = time.time()
                kh = f(tracers[p][1], state.origin, state.direction,
                       state.inv_direction, live_n)
                jax.block_until_ready(kh.t)
                ts.append(time.time() - t0)
            dt = min(ts)
            iv = int(np.asarray(kh.inner_visits).sum())
            lt = int(np.asarray(kh.leaf_tests).sum())
            rows.append((p, dt, iv, lt))
            if p == 2048:
                kh_keep = kh
        live = float(np.asarray(jnp.mean(state.active.astype(jnp.float32))))
        print(f"bounce {b} (live {live:.1%}):", flush=True)
        for p, dt, iv, lt in rows:
            print(f"  pkt {p:5d}: {dt*1e3:7.1f} ms  inner_visits {iv:9d}  "
                  f"leaf_tests {lt:9d}", flush=True)
        state = advance(state, kh_keep, jax.random.fold_in(key, b + 1))


if __name__ == "__main__":
    sys.exit(main() or 0)
