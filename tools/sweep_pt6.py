#!/usr/bin/env python
"""Compaction sort-key shootout on real bounce-3 rays (pkt fixed).

Candidate keys (all dead-last):
  cur    oct(3) . morton16^3           — the shipping deep-bounce key
  m64    oct(3) . morton64^3           — finer position grid
  posmaj morton64^3 . oct(3)           — position-major
  6d     interleaved pos(4b/ax) + dir(4b/ax) 6-D morton
  fine   dirbin(96) . morton16^3       — the shipping bounce-1 key
  leaf   prev-hit tri packet . oct(3)  — BVH leaf id = tree locality, free
  leafmaj oct(3) . prev-hit tri packet

Usage: PYTHONPATH=/root/repo python tools/sweep_pt6.py [spp] [pkt]
"""

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
    _morton16,
    make_pallas_tracer,
    scatter,
)
sys.path.insert(0, "/root/repo/tools")
from bench_pt import build_scene

W, H = 960, 540


def sync(x):
    return float(np.asarray(jnp.sum(x)))


def _morton(cell, bits):
    out = jnp.zeros_like(cell[:, 0])
    for b in range(bits):
        for ax in range(3):
            out = out | (((cell[:, ax] >> b) & 1) << (3 * b + (2 - ax)))
    return out


def _cells(o, n):
    lo, hi = jnp.min(o, axis=0), jnp.max(o, axis=0)
    return jnp.clip((o - lo) * (n / jnp.maximum(hi - lo, 1e-6)), 0, n - 1).astype(jnp.int32)


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    pkt = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    res, table = build_scene()
    scene = prepare_scene(res.as_device())
    stack = res.recommended_stack_size
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
    tr, tstate = make_pallas_tracer(scene, stack_size=stack, packet_size=pkt)
    prev_tri = None
    for b in range(3):
        kh = tr(tstate, o, d, inv)
        sync(kh.t)
        print(f"  prep bounce {b}: visits/pkt "
              f"{float(np.asarray(jnp.mean(kh.inner_visits))):.1f}  leaftests/pkt "
              f"{float(np.asarray(jnp.mean(kh.leaf_tests))):.1f}", flush=True)
        hit = (kh.tri >= 0) & active
        prev_tri = jnp.where(hit, kh.tri, 0)
        nd, _, _, term = scatter(table, jax.random.fold_in(key, b), d,
                                 kh.normal, kh.material)
        point = o + d * kh.t[..., None]
        o = jnp.where(hit[..., None], point + 1e-3 * jnp.sign(nd), o)
        d = jnp.where(hit[..., None], nd, d)
        inv = jnp.where(d == 0, jnp.inf, 1.0 / d)
        active = hit & ~term
    live = int(np.asarray(jnp.sum(active.astype(jnp.int32))))
    print(f"bounce-3 rays: {N/1e6:.2f}M, live {live/N:.1%}, pkt={pkt}",
          flush=True)

    oct_ = ((d[:, 0] > 0).astype(jnp.int32) * 4
            + (d[:, 1] > 0).astype(jnp.int32) * 2
            + (d[:, 2] > 0).astype(jnp.int32))
    c16 = _cells(o, 16)
    c64 = _cells(o, 64)
    leaf = prev_tri >> 3  # 8 tris per packet

    # 6-D morton: interleave 4 bits of each of 6 axes (pos then dir).
    dq = jnp.clip(((d + 1.0) * 8.0), 0, 15).astype(jnp.int32)
    six = jnp.zeros_like(oct_)
    for bbit in range(4):
        for ax in range(3):
            six = six | (((c16[:, ax] >> bbit) & 1) << (6 * bbit + 2 * (2 - ax) + 1))
            six = six | (((dq[:, ax] >> bbit) & 1) << (6 * bbit + 2 * (2 - ax)))

    keys = {
        "cur(oct.m16)": (oct_ << 12) | _morton(c16, 4),
        "m64(oct.m64)": (oct_ << 18) | _morton(c64, 6),
        "posmaj(m64.oct)": (_morton(c64, 6) << 3) | oct_,
        "6d": six,
        "fine(dir96.m16)": (_direction_bin(d) << 12) | _morton16(c16),
        "leaf(leaf.oct)": (leaf << 3) | oct_,
        "leafmaj(oct.leaf)": (oct_ << 22) | leaf,
        "nosort": jnp.zeros_like(oct_),
    }
    for name, k in keys.items():
        k = jnp.where(active, k, jnp.int32(1 << 30))
        perm = jnp.argsort(k)
        os_, ds_, invs = o[perm], d[perm], inv[perm]
        sync(os_)
        kh = tr(tstate, os_, ds_, invs, jnp.int32(live))
        sync(kh.t)
        t0 = time.time()
        kh = tr(tstate, os_, ds_, invs, jnp.int32(live))
        sync(kh.t)
        dt = time.time() - t0
        lp = -(-live // pkt)
        iv = float(np.asarray(jnp.sum(kh.inner_visits))) / lp
        lt = float(np.asarray(jnp.sum(kh.leaf_tests))) / lp
        print(f"{name:18s}: {dt*1e3:8.1f} ms  {live/dt/1e6:6.2f} live-Mrays/s"
              f"  visits/pkt {iv:7.1f}  leaftests/pkt {lt:7.1f}", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
