#!/usr/bin/env python
"""Two-level binned traversal vs the flat sorted wavefront, on REAL
bounce-k ray sets (the sweep_pt3 harness). For each bounce depth:

* baseline: oct+morton16 compaction sort + flat trace (live-prefix skip)
* two-level: broad phase -> treelet-bucketed packets with per-packet
  roots, near-to-far rounds + global-root leftovers

Parity: hit ids/t compared against the baseline trace on the same rays.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.camera import Camera
from minipath_tpu.parallel.mesh import gen_frame_rays9
from minipath_tpu.render.pallas_kernels import prepare_scene_pt
from minipath_tpu.render.twolevel import build_treelets, make_pt_tracer_twolevel
from minipath_tpu.render.wavefront import make_pt_tracer, scatter

sys.path.insert(0, "/root/repo/tools")
from bench_pt import build_scene

W, H, SPP = 960, 540, 8
PKT = 2048


def sync(x):
    return float(np.asarray(jnp.sum(x)))


def octant(d):
    return ((d[:, 0] > 0).astype(jnp.int32) * 4
            + (d[:, 1] > 0).astype(jnp.int32) * 2
            + (d[:, 2] > 0).astype(jnp.int32))


def morton(c, bits):
    out = jnp.zeros_like(c[:, 0])
    for b in range(bits):
        for ax in range(3):
            out = out | (((c[:, ax] >> b) & 1) << (3 * b + (2 - ax)))
    return out


def cellid(o, bits):
    lo, hi = jnp.min(o, axis=0), jnp.max(o, axis=0)
    n = 1 << bits
    scale = n / jnp.maximum(hi - lo, 1e-6)
    return jnp.clip((o - lo) * scale, 0, n - 1).astype(jnp.int32)


def main():
    res, table = build_scene()
    scene = prepare_scene_pt(res.as_device())
    stack = res.recommended_stack_size
    cam = (Camera().look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
           .f_number(8.0).sensor_width(36e-3))
    sampler = cam.build_sampler((W, H))
    key = jax.random.key(0)
    rays9, _ = gen_frame_rays9(sampler, key, width=W, height=H,
                               px_block=(16, 16), samples=SPP)
    B0, _, S, LN = rays9.shape
    N = B0 * S * LN
    flat = jnp.swapaxes(rays9.reshape(B0, 9, S * LN), 1, 2).reshape(N, 9)
    o, d, inv = flat[:, 0:3], flat[:, 3:6], flat[:, 6:9]
    active = jnp.ones((N,), bool)

    tracer, tstate = make_pt_tracer(scene, stack_size=stack, packet_size=PKT)

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
        kh = tracer(tstate, o, d, inv)
        sync(kh.t)

    variants = []
    for levels in (2, 3):
        tl = build_treelets(res.arrays, levels=levels)
        T = int(tl.links.shape[0])
        for rounds in (1, 2, 3):
            tr, st = make_pt_tracer_twolevel(
                scene, tl, stack_size=stack, packet_size=PKT,
                K=8, rounds=rounds,
            )
            variants.append((f"2lvl L{levels}(T={T}) r{rounds}", jax.jit(tr), st))

    @jax.jit
    def base_sortkey(o, d, active):
        k = (octant(d) << 12) | morton(cellid(o, 4), 4)
        return jnp.where(active, k, jnp.int32(1 << 30))

    for bounce, (o, d, inv, active) in enumerate(sets, start=1):
        live = int(np.asarray(jnp.sum(active.astype(jnp.int32))))
        print(f"--- bounce {bounce}: live {live/N:.1%}", flush=True)
        # Baseline: sorted flat trace (sort INSIDE the timed region? no —
        # match production: sort is part of the per-bounce cost for both).
        perm = jnp.argsort(base_sortkey(o, d, active))
        os_, ds_, is_ = o[perm], d[perm], inv[perm]
        sync(os_)
        ref = None
        for name, fn in [
            ("flat oct+morton16", None),
        ] + [(n, (t, s)) for n, t, s in variants]:
            try:
                if fn is None:
                    def run():
                        kh2 = tracer(tstate, os_, ds_, is_, jnp.int32(live))
                        return kh2
                else:
                    t2, s2 = fn
                    def run():
                        return t2(s2, o, d, inv, active)
                kh2 = run(); sync(kh2.t)  # warm
                t0 = time.time()
                kh2 = run(); sync(kh2.t)
                dt = time.time() - t0
                # Parity vs the flat trace (permute back for the baseline).
                tri = np.asarray(kh2.tri)
                tt = np.asarray(kh2.t)
                if fn is None:
                    inv_perm = np.argsort(np.asarray(perm))
                    tri, tt = tri[inv_perm], tt[inv_perm]
                    ref = (tri, tt)
                    mism = 0.0
                else:
                    act = np.asarray(active)
                    mism = ((tri >= 0) != (ref[0] >= 0))[act].mean()
                print(
                    f"  {name:24s}: {dt*1e3:7.1f} ms  "
                    f"{live/dt/1e6:5.2f} live-Mrays/s  mism {mism:.2%}",
                    flush=True,
                )
            except Exception as e:
                print(f"  {name:24s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
