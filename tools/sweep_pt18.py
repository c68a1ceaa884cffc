#!/usr/bin/env python
"""Lean PT kernel: push-decision reduction strategy on real bounce-3 rays.

Each inner visit must answer "which children did any lane hit?" before the
scalar core can push. The shipped scheme reduces 4 packed sums -> 4
vector->scalar reads per visit; the ``packed_or`` variant bit-packs all 8
children into one word, OR-folds sublanes, roll-ORs across lanes, and does
ONE vector->scalar read. If the visit is dominated by that serialized sync
(not by the slab math), packed_or should cut the per-visit constant.

Usage: PYTHONPATH=/root/repo python tools/sweep_pt18.py [spp]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.camera import Camera
from minipath_tpu.parallel.mesh import gen_frame_rays9
from minipath_tpu.render.pallas_kernels import (
    prepare_scene_pt,
    trace_packets_pallas_pt,
)
from minipath_tpu.render.wavefront import _morton16, make_pt_tracer, scatter
from minipath_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

sys.path.insert(0, "/root/repo/tools")
from bench_pt import build_scene

W, H = 960, 540


def sync(x):
    return float(np.asarray(jnp.sum(x)))


def bounce_rays(res, table, scene_pt, stack, spp, bounces=3):
    key = jax.random.key(0)
    cam = (Camera().look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
           .f_number(8.0).sensor_width(36e-3))
    sampler = cam.build_sampler((W, H))
    rays9, _ = gen_frame_rays9(sampler, key, width=W, height=H,
                               px_block=(16, 16), samples=spp)
    B0, _, S, LN = rays9.shape
    N = B0 * S * LN
    flat = jnp.swapaxes(rays9.reshape(B0, 9, S * LN), 1, 2).reshape(N, 9)
    o, d, inv = flat[:, 0:3], flat[:, 3:6], flat[:, 6:9]
    active = jnp.ones((N,), bool)
    tr0, ts0 = make_pt_tracer(scene_pt, stack_size=stack, packet_size=2048)
    for b in range(bounces):
        kh = tr0(ts0, o, d, inv)
        sync(kh.t)
        hit = (kh.tri >= 0) & active
        nd, _, _, term = scatter(table, jax.random.fold_in(key, b), d,
                                 kh.normal, kh.material)
        point = o + d * kh.t[..., None]
        o = jnp.where(hit[..., None], point + 1e-3 * jnp.sign(nd), o)
        d = jnp.where(hit[..., None], nd, d)
        inv = jnp.where(d == 0, jnp.inf, 1.0 / d)
        active = hit & ~term
    live = int(np.asarray(jnp.sum(active.astype(jnp.int32))))
    lo, hi = jnp.min(o, axis=0), jnp.max(o, axis=0)
    cell = jnp.clip(
        (o - lo) * (16.0 / jnp.maximum(hi - lo, 1e-6)), 0, 15
    ).astype(jnp.int32)
    octant = ((d[:, 0] > 0).astype(jnp.int32) * 4
              + (d[:, 1] > 0).astype(jnp.int32) * 2
              + (d[:, 2] > 0).astype(jnp.int32))
    k = jnp.where(active, (octant << 12) | _morton16(cell),
                  jnp.int32(1 << 30))
    perm = jnp.argsort(k)
    o, d, inv = o[perm], d[perm], inv[perm]
    sync(o)
    print(f"bounce-{bounces} rays: {N/1e6:.2f}M, live {live/N:.1%}",
          flush=True)
    return o, d, inv, N, live


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    res, table = build_scene()
    scene_pt = prepare_scene_pt(res.as_device())
    stack = res.recommended_stack_size
    o, d, inv, N, live = bounce_rays(res, table, scene_pt, stack, spp)

    pkt = 2048
    B = N // pkt
    r9 = jnp.concatenate([o, d, inv], axis=-1)
    r9 = jnp.swapaxes(r9.reshape(B, pkt, 9), 1, 2).reshape(
        B, 9, pkt // 128, 128)
    lp = jnp.int32(-(-live // pkt))
    ref = None
    for por in (False, True):
        ph = trace_packets_pallas_pt(
            scene_pt, r9, stack_size=stack, live_packets=lp, packed_or=por)
        sync(ph.t)
        reps = []
        for _ in range(3):
            t0 = time.time()
            ph = trace_packets_pallas_pt(
                scene_pt, r9, stack_size=stack, live_packets=lp,
                packed_or=por)
            sync(ph.t)
            reps.append(time.time() - t0)
        dt = min(reps)
        nlp = int(lp)
        iv = float(np.asarray(jnp.sum(ph.inner_visits))) / nlp
        lt = float(np.asarray(jnp.sum(ph.leaf_tests))) / nlp
        tri = np.asarray(ph.tri).reshape(-1)[:live]
        agree = ""
        if ref is None:
            ref = tri
        else:
            agree = f"  [tri agreement: {(tri == ref).mean():.2%}]"
        print(f"packed_or={por}: {dt*1e3:8.1f} ms"
              f"  {live/dt/1e6:6.2f} live-Mrays/s"
              f"  visits/pkt {iv:7.1f}  leaftests/pkt {lt:7.1f}{agree}",
              flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
