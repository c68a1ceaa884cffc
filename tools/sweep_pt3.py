#!/usr/bin/env python
"""Key-scheme comparison on REAL bounce-k ray sets (k=1..4), all with dead
rays sorted to the back and the live-prefix skip active."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.camera import Camera
from minipath_tpu.parallel.mesh import gen_frame_rays9
from minipath_tpu.render.pallas_kernels import prepare_scene
from minipath_tpu.render.wavefront import (
    _direction_bin,
    make_pallas_tracer,
    scatter,
)
sys.path.insert(0, "/root/repo/tools")
from bench_pt import build_scene

W, H, SPP = 960, 540, 8
PKT = 2048


def sync(x):
    return float(np.asarray(jnp.sum(x)))


def cellid(o, bits):
    lo, hi = jnp.min(o, axis=0), jnp.max(o, axis=0)
    n = 1 << bits
    scale = n / jnp.maximum(hi - lo, 1e-6)
    c = jnp.clip((o - lo) * scale, 0, n - 1).astype(jnp.int32)
    return c


def raster(c, bits):
    return (c[:, 0] << (2 * bits)) | (c[:, 1] << bits) | c[:, 2]


def morton(c, bits):
    out = jnp.zeros_like(c[:, 0])
    for b in range(bits):
        for ax in range(3):
            out = out | (((c[:, ax] >> b) & 1) << (3 * b + (2 - ax)))
    return out


def octant(d):
    return ((d[:, 0] > 0).astype(jnp.int32) * 4
            + (d[:, 1] > 0).astype(jnp.int32) * 2
            + (d[:, 2] > 0).astype(jnp.int32))


KEYS = {
    "oct+cell8 raster (r1)": lambda o, d: (octant(d) << 9) | raster(cellid(o, 3), 3),
    "dir96+cell16 raster": lambda o, d: (_direction_bin(d) << 12) | raster(cellid(o, 4), 4),
    "dir96+morton16": lambda o, d: (_direction_bin(d) << 12) | morton(cellid(o, 4), 4),
    "oct+morton16": lambda o, d: (octant(d) << 12) | morton(cellid(o, 4), 4),
    "morton32+dir96": lambda o, d: (morton(cellid(o, 5), 5) << 7) | _direction_bin(d),
    "morton16+dir96": lambda o, d: (morton(cellid(o, 4), 4) << 7) | _direction_bin(d),
}


def main():
    res, table = build_scene()
    scene = prepare_scene(res.as_device())
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

    tracer, tstate = make_pallas_tracer(scene, stack_size=stack, packet_size=PKT)

    @jax.jit
    def advance(o, d, inv, active, kh, bkey):
        nd, _, _, term = scatter(table, bkey, d, kh.normal, kh.material)
        hit = (kh.tri >= 0) & active
        point = o + d * kh.t[..., None]
        o2 = jnp.where(hit[..., None], point + 1e-3 * jnp.sign(nd), o)
        d2 = jnp.where(hit[..., None], nd, d)
        inv2 = jnp.where(d2 == 0, jnp.inf, 1.0 / d2)
        return o2, d2, inv2, hit & ~term

    sets = []
    kh = tracer(tstate, o, d, inv)
    sync(kh.t)
    for b in range(4):
        o, d, inv, active = advance(o, d, inv, active, kh, jax.random.fold_in(key, b))
        sets.append((o, d, inv, active))
        kh = tracer(tstate, o, d, inv)  # trace unsorted to get next set's hits
        sync(kh.t)

    for bounce, (o, d, inv, active) in enumerate(sets, start=1):
        live = int(np.asarray(jnp.sum(active.astype(jnp.int32))))
        print(f"--- bounce {bounce}: live {live/N:.1%}", flush=True)
        for name, kf in KEYS.items():
            k = jnp.where(active, kf(o, d), jnp.int32(1 << 30))
            perm = jnp.argsort(k)
            os_, ds_, is_ = o[perm], d[perm], inv[perm]
            sync(os_)
            lp = (live + PKT - 1) // PKT
            kh2 = tracer(tstate, os_, ds_, is_, jnp.int32(live))
            sync(kh2.t)
            t0 = time.time()
            kh2 = tracer(tstate, os_, ds_, is_, jnp.int32(live))
            sync(kh2.t)
            dt = time.time() - t0
            print(f"  {name:24s}: {dt*1e3:7.1f} ms  {live/dt/1e6:5.1f} live-Mrays/s", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
