#!/usr/bin/env python
"""Phase breakdown + VPU utilization of the BASELINE headline PT config.

The north-star number (BENCH_r04: pt_1080p64_wavefront_s = 112.0 s at
1920x1080 @ 64 spp, 5 bounces, atrium+materials) runs as 32 sequential
~4.15M-ray fused chunks (render_frame_pt, samples_per_packet=2). This tool
answers, at exactly that config, the two questions the number alone can't:

1. WHERE does the time go?  It times (a) the full frame, (b) one fused
   chunk (the jitted `_pt_chunk` program), and (c) the same chunk re-run
   with eager jit boundaries between phases — traversal kernel, the
   shade_from_flat row gather, the compaction sort, and the BSDF
   shade/scatter glue — so the fused chunk's interior splits into
   kernel-vs-XLA-glue fractions, and `frame - 32*chunk` exposes any
   chunk-boundary serialization (the Python accumulation loop never syncs
   the host, so XLA's async dispatch should hide it).

2. Is the kernel ACTUALLY fast?  The kernel counts its own work
   (inner_visits / leaf_tests per packet, each costing the full
   2048-lane packet width); multiplying by the kernel's per-lane op
   counts gives achieved VPU ops/s for the trace phase, compared against
   the same session's `vpu_chain_gops` device-health probe (the
   dependent-chain f32 ceiling measured on this very chip, which drifts
   between sessions — utils/calibrate.py).

Per-lane op model (counted off _traverse_kernel_pt, pallas_kernels.py):
  inner visit : 8 children x (12 slab sub/mul + 12 min/max + 2 cmp/cvt
                + 2 pack)                     = 224 ops/lane/visit
  leaf packet : 8 triangles x (24 cross/dot + 1 div + 3 sub + 12 u,v,t
                + 9 cmp/and + 4 select + 6 misc) = 464 ops/lane/packet
These count every VPU op the traversal loop issues per ray lane; scalar
stack work (push/sort/pop on the SMEM stack) is NOT in the op count, so
achieved/ceiling below is a LOWER bound on how busy the core is.

Writes PROFILE_PT.json. Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_pt_headline.py
Cites: BASELINE.md "Sponza 1080p/64spp"; the workload extends
/root/reference/src/renderer/worker.rs:51-65 to full path tracing.
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
from minipath_tpu.render.pallas_kernels import prepare_scene_pt
from minipath_tpu.render.stratify import render_seed
from minipath_tpu.render.wavefront import (
    _PathState,
    _compact,
    _pack_rays9,
    _trace_pt_any,
    make_pt_tracer,
    render_frame_pt,
    scatter_full,
    shade_from_flat,
)
from minipath_tpu.scene.materials import Environment
from minipath_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_pt import build_scene

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

W, H, SPP, BOUNCES = 1920, 1080, 64, 5
SPP_CHUNK = 2  # the headline config's measured shade-gather sweet spot
PKT = 2048
STACK_DEFAULT = None  # from the build
INNER_OPS_PER_LANE = 224
LEAF_OPS_PER_LANE = 464


def sync(x):
    return float(np.asarray(jnp.sum(x)))


def main():
    res, table = build_scene()
    scene = prepare_scene_pt(res.as_device())
    stack = res.recommended_stack_size
    tracer, tstate = make_pt_tracer(scene, stack_size=stack, packet_size=PKT)
    env = Environment.sky()
    cam = (Camera().look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
           .f_number(8.0).sensor_width(36e-3))
    sampler = cam.build_sampler((W, H))
    key = jax.random.key(0)

    # ---- 1. the full headline frame (the 112 s number) ----------------
    def frame(k):
        img = render_frame_pt(
            tracer, tstate, table, sampler, k,
            width=W, height=H, spp=SPP, bounces=BOUNCES, env=env,
            samples_per_packet=SPP_CHUNK, compaction=True,
        )
        return jnp.mean(img[..., :3])

    print("frame warmup (compile)...", flush=True)
    t0 = time.time()
    float(np.asarray(frame(key)))
    print(f"  warm: {time.time()-t0:.1f}s", flush=True)
    frame_times = []
    for i in range(2):
        t0 = time.time()
        float(np.asarray(frame(jax.random.fold_in(key, 100 + i))))
        frame_times.append(time.time() - t0)
        print(f"  frame {i}: {frame_times[-1]:.1f}s", flush=True)
    frame_s = float(np.mean(frame_times))
    n_chunks = SPP // SPP_CHUNK

    # ---- 2. one fused chunk (the compiled program the frame repeats) ---
    def chunk(k):
        img = render_frame_pt(
            tracer, tstate, table, sampler, k,
            width=W, height=H, spp=SPP_CHUNK, bounces=BOUNCES, env=env,
            samples_per_packet=SPP_CHUNK, compaction=True,
        )
        return jnp.mean(img[..., :3])

    float(np.asarray(chunk(key)))  # warm (shares the _pt_chunk program)
    chunk_times = []
    for i in range(3):
        t0 = time.time()
        float(np.asarray(chunk(jax.random.fold_in(key, 200 + i))))
        chunk_times.append(time.time() - t0)
    chunk_s = float(np.mean(chunk_times))
    print(f"fused chunk: {chunk_s:.2f}s x {n_chunks} = "
          f"{chunk_s*n_chunks:.1f}s vs frame {frame_s:.1f}s", flush=True)

    # ---- 3. eager phase breakdown of one chunk -------------------------
    # Same estimator as the fused chunk (stratified dims, RR at bounce 3,
    # live-prefix early exit) with a jit boundary per phase. The kernel is
    # timed WITHOUT the shade_from_flat row gather so "trace" is the Pallas
    # program alone and "gather" is the XLA glue it feeds.
    spp_total = SPP  # strata span the full frame spp, as in the real frame

    def trace_kernel(scn, origin, direction, inv_direction, live):
        r9, live_packets, Np = _pack_rays9(
            PKT, live, origin, direction, inv_direction
        )
        ph = _trace_pt_any(
            scn, r9, stack_size=stack, interpret=False,
            live_packets=live_packets,
        )
        N = origin.shape[0]
        return (ph.t.reshape(Np)[:N], ph.tri.reshape(Np)[:N],
                ph.u.reshape(Np)[:N], ph.v.reshape(Np)[:N],
                ph.inner_visits, ph.leaf_tests)

    trace_j = jax.jit(trace_kernel)
    gather_j = jax.jit(
        lambda st, tri, u, v: shade_from_flat(st.shade_flat, tri, u, v)
    )
    compact_j = jax.jit(_compact, static_argnames=("fine_direction",))

    def shade_step(state, t, tri, normal, material, bkey, bounce,
                   strat_seed):
        hit = (tri >= 0) & state.active
        missed = (~(tri >= 0)) & state.active
        radiance = state.radiance + jnp.where(
            missed[..., None], state.throughput * env.radiance(state.direction),
            0.0,
        )
        # Reconstruct the stratum coordinates exactly as _pt_trace does.
        bp0 = (16 * 16)
        p_blk = SPP_CHUNK * bp0
        within = state.pixel % p_blk
        s_idx = within // bp0
        pid_s = ((state.pixel // p_blk) * bp0 + within % bp0) ^ jnp.int32(
            strat_seed
        )
        strat_b = (s_idx, pid_s, spp_total, 8 * bounce)
        new_dir, atten, emitted, terminate, _, _ = scatter_full(
            table, bkey, state.direction, normal, material, strat=strat_b
        )
        radiance = radiance + jnp.where(
            hit[..., None], state.throughput * emitted, 0.0
        )
        throughput = jnp.where(
            hit[..., None], state.throughput * atten, state.throughput
        )
        point = state.origin + state.direction * t[..., None]
        d_dot_n = jnp.sum(state.direction * normal, axis=-1, keepdims=True)
        nf = jnp.where(d_dot_n < 0, normal, -normal)
        offset_dir = jnp.where(
            jnp.sum(new_dir * nf, axis=-1, keepdims=True) >= 0, nf, -nf
        )
        new_origin = point + offset_dir * 1e-3
        inv = jnp.where(new_dir == 0.0, jnp.inf, 1.0 / new_dir)
        active = hit & ~terminate
        if bounce >= 3:  # the shipped rr_start
            p_cont = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 1.0)
            rr = jax.random.uniform(jax.random.fold_in(bkey, 7), active.shape)
            survived = rr < p_cont
            throughput = jnp.where(
                (active & survived)[..., None],
                throughput / p_cont[..., None], throughput,
            )
            active = active & survived
        return _PathState(
            origin=jnp.where(hit[..., None], new_origin, state.origin),
            direction=jnp.where(hit[..., None], new_dir, state.direction),
            inv_direction=jnp.where(hit[..., None], inv, state.inv_direction),
            throughput=throughput, radiance=radiance,
            pixel=state.pixel, active=active,
        )

    shade_js = {
        b: jax.jit(lambda st, t, tri, n, m, k, ss, _b=b: shade_step(
            st, t, tri, n, m, k, _b, ss))
        for b in range(BOUNCES)
    }

    def eager_pass(k, timed):
        strat_seed = render_seed(k)
        rays9, _ = gen_frame_rays9(
            sampler, k, width=W, height=H, px_block=(16, 16),
            samples=SPP_CHUNK, strat_spp=spp_total,
            strat_offset=jnp.int32(0), strat_seed=jnp.int32(strat_seed),
        )
        B0, _, S, LN = rays9.shape
        N = B0 * S * LN
        flat = jnp.swapaxes(rays9.reshape(B0, 9, S * LN), 1, 2).reshape(N, 9)
        state = _PathState(
            origin=flat[:, 0:3], direction=flat[:, 3:6],
            inv_direction=flat[:, 6:9],
            throughput=jnp.ones((N, 3), jnp.float32),
            radiance=jnp.zeros((N, 3), jnp.float32),
            pixel=jnp.arange(N, dtype=jnp.int32),
            active=jnp.ones((N,), bool),
        )
        totals = {"trace": 0.0, "gather": 0.0, "compact": 0.0, "shade": 0.0}
        visits = tests = 0
        bounces_out = []
        for b in range(BOUNCES):
            live = None
            dt_c = 0.0
            if b > 0:
                t0 = time.time()
                state = compact_j(state, fine_direction=b == 1)
                sync(state.origin)
                dt_c = time.time() - t0
                totals["compact"] += dt_c
                live = jnp.sum(state.active.astype(jnp.int32))
            t0 = time.time()
            t, tri, u, v, iv, lt = trace_j(
                scene, state.origin, state.direction, state.inv_direction,
                live,
            )
            sync(t)
            dt_t = time.time() - t0
            totals["trace"] += dt_t
            visits += int(np.asarray(jnp.sum(iv)))
            tests += int(np.asarray(jnp.sum(lt)))
            t0 = time.time()
            normal, material, _ = gather_j(tstate, tri, u, v)
            sync(normal)
            dt_g = time.time() - t0
            totals["gather"] += dt_g
            t0 = time.time()
            state = shade_js[b](
                state, t, tri, normal, material,
                jax.random.fold_in(k, b + 1), jnp.int32(strat_seed),
            )
            live_frac = float(np.asarray(jnp.mean(
                state.active.astype(jnp.float32))))
            dt_s = time.time() - t0
            totals["shade"] += dt_s
            bounces_out.append({
                "bounce": b, "trace_s": round(dt_t, 3),
                "gather_s": round(dt_g, 3), "compact_s": round(dt_c, 3),
                "shade_s": round(dt_s, 3), "live_after": round(live_frac, 3),
            })
            if timed:
                print(f"  bounce {b}: trace {dt_t*1e3:7.1f}  gather "
                      f"{dt_g*1e3:6.1f}  compact {dt_c*1e3:6.1f}  shade "
                      f"{dt_s*1e3:6.1f} ms  live {live_frac:.1%}", flush=True)
        return totals, visits, tests, bounces_out, N

    print("eager pass warmup (compile)...", flush=True)
    eager_pass(jax.random.fold_in(key, 300), timed=False)
    print("eager pass (timed)...", flush=True)
    totals, visits, tests, bounces_out, N = eager_pass(
        jax.random.fold_in(key, 301), timed=True
    )
    eager_sum = sum(totals.values())

    inner_ops = visits * PKT * INNER_OPS_PER_LANE
    leaf_ops = tests * PKT * LEAF_OPS_PER_LANE
    gops = (inner_ops + leaf_ops) / totals["trace"] / 1e9

    from minipath_tpu.utils.calibrate import device_health

    health = device_health()
    vpu = health.get("vpu_chain_gops", float("nan"))

    # Attribution: inside the fused chunk the phases shrink together
    # (no per-phase dispatch), so scale the eager split onto the fused
    # chunk time; the frame then splits into kernel / glue / boundary.
    scale = chunk_s / eager_sum
    in_kernel_frac = totals["trace"] / eager_sum
    boundary_s = frame_s - n_chunks * chunk_s

    out = {
        "workload": f"atrium PT {W}x{H} @ {SPP} spp, {BOUNCES} bounces, "
        f"wavefront (BASELINE headline config), {n_chunks} chunks x "
        f"{SPP_CHUNK} spp ({N/1e6:.2f}M rays/chunk), packet {PKT}",
        "frame_s": round(frame_s, 2),
        "frame_times_s": [round(t, 2) for t in frame_times],
        "fused_chunk_s": round(chunk_s, 3),
        "chunks": n_chunks,
        "chunk_boundary_s": round(boundary_s, 2),
        "chunk_boundary_frac": round(boundary_s / frame_s, 4),
        "eager_phase_totals_s": {k: round(v, 3) for k, v in totals.items()},
        "eager_sum_s": round(eager_sum, 3),
        "eager_vs_fused_ratio": round(eager_sum / chunk_s, 3),
        "in_kernel_frac_of_chunk": round(in_kernel_frac, 4),
        "per_bounce": bounces_out,
        "trace_counters": {
            "inner_visits": visits,
            "leaf_packet_tests": tests,
            "inner_ops_per_lane": INNER_OPS_PER_LANE,
            "leaf_ops_per_lane": LEAF_OPS_PER_LANE,
            "total_traversal_gops": round((inner_ops + leaf_ops) / 1e9, 1),
        },
        "trace_achieved_gops": round(gops, 1),
        "vpu_chain_gops_probe": vpu,
        "trace_vpu_utilization": round(gops / vpu, 4) if vpu else None,
        "device_health": health,
        "note": "in_kernel_frac is the eager trace share of the eager sum; "
        "inside the fused chunk the same programs run without per-phase "
        "dispatch (eager_vs_fused_ratio ~ 1 + dispatch overhead). "
        "trace_vpu_utilization counts only per-lane slab/MT vector ops — "
        "scalar stack work rides the same core and is excluded, so it is "
        "a lower bound.",
    }
    with open(os.path.join(REPO, "PROFILE_PT.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
