#!/usr/bin/env python
"""Per-bounce PT cost breakdown on the real TPU.

Times, per bounce: the traversal kernel on the current (compacted) ray set,
the compaction sort, and the shading/scatter glue — plus live-ray fractions.
Eager jit boundaries between phases add ~25 ms dispatch overhead each but
expose the split.

Usage: PYTHONPATH=... python tools/profile_pt.py [W H spp bounces packet_size]
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

sys.path.insert(0, "/root/repo/tools")
from bench_pt import build_scene


def sync(x):
    return float(np.asarray(jnp.sum(x)))


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 960
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 540
    SPP = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    BOUNCES = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    PKT = int(sys.argv[5]) if len(sys.argv) > 5 else 2048

    res, table = build_scene()
    scene = prepare_scene_pt(res.as_device())
    tracer, tstate = make_pt_tracer(
        scene, stack_size=res.recommended_stack_size, packet_size=PKT
    )
    env = Environment.sky()
    cam = (
        Camera()
        .look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
        .f_number(8.0)
        .sensor_width(36e-3)
    )
    sampler = cam.build_sampler((W, H))
    key = jax.random.key(0)

    trace_j = jax.jit(lambda st, o, d, i, lv=None: tracer(st, o, d, i, lv))
    compact_j = jax.jit(_compact)

    @jax.jit
    def shade(state, kh, bkey):
        hit = (kh.tri >= 0) & state.active
        missed = (~(kh.tri >= 0)) & state.active
        env_rad = env.radiance(state.direction)
        radiance = state.radiance + jnp.where(
            missed[..., None], state.throughput * env_rad, 0.0
        )
        new_dir, atten, emitted, terminate = scatter(
            table, bkey, state.direction, kh.normal, kh.material
        )
        radiance = radiance + jnp.where(hit[..., None], state.throughput * emitted, 0.0)
        throughput = jnp.where(hit[..., None], state.throughput * atten, state.throughput)
        point = state.origin + state.direction * kh.t[..., None]
        d_dot_n = jnp.sum(state.direction * kh.normal, axis=-1, keepdims=True)
        nf = jnp.where(d_dot_n < 0, kh.normal, -kh.normal)
        offset_dir = jnp.where(
            jnp.sum(new_dir * nf, axis=-1, keepdims=True) >= 0, nf, -nf
        )
        new_origin = point + offset_dir * 1e-3
        inv = jnp.where(new_dir == 0.0, jnp.inf, 1.0 / new_dir)
        active = hit & ~terminate
        return _PathState(
            origin=jnp.where(hit[..., None], new_origin, state.origin),
            direction=jnp.where(hit[..., None], new_dir, state.direction),
            inv_direction=jnp.where(hit[..., None], inv, state.inv_direction),
            throughput=throughput,
            radiance=radiance,
            pixel=state.pixel,
            active=active,
        )

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
    print(f"N={N/1e6:.2f}M rays, packet={PKT}", flush=True)

    # Warmup all programs once.
    kh = tracer(tstate, state.origin, state.direction, state.inv_direction)
    s2 = shade(state, kh, key)
    sync(compact_j(s2).origin)

    totals = {"trace": 0.0, "compact": 0.0, "shade": 0.0}
    for b in range(BOUNCES):
        live_n = None
        if b > 0:
            t0 = time.time()
            state = compact_j(state)
            sync(state.origin)
            dt = time.time() - t0
            totals["compact"] += dt
            # Dead rays form a suffix after compaction: pass the live count
            # so the tracer's live-prefix early exit skips whole-dead
            # packets (as the fused _pt_chunk loop does).
            live_n = jnp.sum(state.active.astype(jnp.int32))
        else:
            dt = 0.0
        t0 = time.time()
        kh = trace_j(
            tstate, state.origin, state.direction, state.inv_direction, live_n
        )
        sync(kh.t)
        tt = time.time() - t0
        totals["trace"] += tt
        t0 = time.time()
        state = shade(state, kh, jax.random.fold_in(key, b + 1))
        live = float(np.asarray(jnp.mean(state.active.astype(jnp.float32))))
        st = time.time() - t0
        totals["shade"] += st
        print(
            f"bounce {b}: trace {tt*1e3:7.1f} ms  compact {dt*1e3:6.1f} ms  "
            f"shade {st*1e3:6.1f} ms  live_after {live:.1%}",
            flush=True,
        )
    tot = sum(totals.values())
    print(f"totals: {totals}  sum {tot:.2f}s", flush=True)
    print(f"rays traced: {N*BOUNCES/1e6:.1f}M in {totals['trace']:.2f}s "
          f"= {N*BOUNCES/totals['trace']/1e6:.1f} Mrays/s avg", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
