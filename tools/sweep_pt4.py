#!/usr/bin/env python
"""Child-sort on/off x packet size on real bounce-3 rays (oct+morton key)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import importlib
pk = importlib.import_module("minipath_tpu.render.pallas_kernels")
from minipath_tpu.camera import Camera
from minipath_tpu.parallel.mesh import gen_frame_rays9
from minipath_tpu.render.wavefront import _morton16, make_pallas_tracer, scatter
sys.path.insert(0, "/root/repo/tools")
from bench_pt import build_scene

W, H, SPP = 960, 540, 8


def sync(x):
    return float(np.asarray(jnp.sum(x)))


def main():
    res, table = build_scene()
    scene = pk.prepare_scene(res.as_device())
    stack = res.recommended_stack_size
    cam = (Camera().look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
           .f_number(8.0).sensor_width(36e-3))
    sampler = cam.build_sampler((W, H))
    key = jax.random.key(0)
    rays9, _ = gen_frame_rays9(sampler, key, width=W, height=H, px_block=(16, 16), samples=SPP)
    B0, _, S, LN = rays9.shape
    N = B0 * S * LN
    flat = jnp.swapaxes(rays9.reshape(B0, 9, S * LN), 1, 2).reshape(N, 9)
    o, d, inv = flat[:, 0:3], flat[:, 3:6], flat[:, 6:9]
    active = jnp.ones((N,), bool)
    tr0, tstate = make_pallas_tracer(scene, stack_size=stack, packet_size=2048)
    kh = tr0(tstate, o, d, inv)
    sync(kh.t)
    for b in range(3):
        nd, _, _, term = scatter(table, jax.random.fold_in(key, b), d, kh.normal, kh.material)
        hit = (kh.tri >= 0) & active
        point = o + d * kh.t[..., None]
        o = jnp.where(hit[..., None], point + 1e-3 * jnp.sign(nd), o)
        d = jnp.where(hit[..., None], nd, d)
        inv = jnp.where(d == 0, jnp.inf, 1.0 / d)
        active = hit & ~term
        if b < 2:
            kh = tr0(tstate, o, d, inv)
            sync(kh.t)
    live = int(np.asarray(jnp.sum(active.astype(jnp.int32))))
    # oct + morton sort, dead last
    lo, hi = jnp.min(o, axis=0), jnp.max(o, axis=0)
    cell = jnp.clip((o - lo) * (16.0 / jnp.maximum(hi - lo, 1e-6)), 0, 15).astype(jnp.int32)
    octant = ((d[:, 0] > 0).astype(jnp.int32) * 4 + (d[:, 1] > 0).astype(jnp.int32) * 2
              + (d[:, 2] > 0).astype(jnp.int32))
    k = jnp.where(active, (octant << 12) | _morton16(cell), jnp.int32(1 << 30))
    perm = jnp.argsort(k)
    o, d, inv = o[perm], d[perm], inv[perm]
    sync(o)
    print(f"bounce-3 rays, live {live/N:.1%}", flush=True)

    real_pairs = pk._BATCHER_PAIRS
    for sort_on in (True, False):
        pk._BATCHER_PAIRS = real_pairs if sort_on else ()
        ss = stack if sort_on else stack + 1  # force a fresh jit/Mosaic config
        for pkt in (2048, 4096):
            tr, _ = make_pallas_tracer(scene, stack_size=ss, packet_size=pkt)
            kh2 = tr(tstate, o, d, inv, jnp.int32(live))
            sync(kh2.t)
            t0 = time.time()
            kh2 = tr(tstate, o, d, inv, jnp.int32(live))
            sync(kh2.t)
            dt = time.time() - t0
            print(f"sort_children={sort_on} pkt={pkt}: {dt*1e3:7.1f} ms  "
                  f"{live/dt/1e6:5.2f} live-Mrays/s", flush=True)
    pk._BATCHER_PAIRS = real_pairs


if __name__ == "__main__":
    sys.exit(main() or 0)
