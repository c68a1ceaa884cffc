#!/usr/bin/env python
"""Seeded traversal: pre-load each lane's best-hit from cheap guesses.

The deep-bounce union bound comes from lanes that prune only after
near-first ordering finds their own first hit. A TRUE intersection seeded
before traversal lets every lane prune from the first slab test. Guesses
come from K representative rays per packet: trace the reps (B*K rays, ~1
packet), then MT-test every lane against the reps' hit leaf rows in XLA.

Measures real bounce-k atrium wavefronts through the lean kernel:
  base      — unseeded (production today)
  repK=k    — seeds from k reps/packet
  perfect   — seeds = the true hits (the pruning ceiling; free of seed
              quality, still pays seeded-kernel overhead)

Usage: PYTHONPATH=/root/repo python tools/sweep_pt14.py [n_tris]
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
from minipath_tpu.render.wavefront import make_pt_tracer, scatter
from minipath_tpu.scene.procedural import make_atrium, atrium_materials
from minipath_tpu.scene.materials import material_table

sys.path.insert(0, "/root/repo/tools")
from sweep_sbvh import cached_build, cellid, morton, octant, sync

W, H, SPP = 960, 540, 8
PKT = 2048


def pack9(o, d, inv):
    N = o.shape[0]
    B = N // PKT
    r9 = jnp.concatenate([o, d, inv], axis=-1).reshape(B, PKT, 9)
    r9 = jnp.swapaxes(r9, 1, 2)
    return r9.reshape(B, 9, PKT // 128, 128)


def mt_rows(o, d, tris):
    """MT-test rays (B, P, 3) against per-packet triangle rows (B, T, 9)
    (T tris as v0,e1,e2). Returns (t, u, v) each (B, P, T), +inf t on miss."""
    v0 = tris[:, None, :, 0:3]
    e1 = tris[:, None, :, 3:6]
    e2 = tris[:, None, :, 6:9]
    dd = d[:, :, None, :]
    p = jnp.cross(dd, e2)
    det = jnp.sum(e1 * p, -1)
    inv_det = 1.0 / det
    s = o[:, :, None, :] - v0
    u = inv_det * jnp.sum(s * p, -1)
    q = jnp.cross(s, e1)
    v = inv_det * jnp.sum(dd * q, -1)
    t = inv_det * jnp.sum(e2 * q, -1)
    ok = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= 0.0)
    return jnp.where(ok, t, jnp.inf), u, v


def make_seeder(scene, stack_size, K):
    @jax.jit
    def seeds(rays9):
        B, _, S, LN = rays9.shape
        P = S * LN
        flat = jnp.swapaxes(rays9.reshape(B, 9, P), 1, 2)  # (B, P, 9)
        idx = jnp.arange(K) * (P // K)
        reps = flat[:, idx, :].reshape(B * K, 9)  # (B*K, 9)
        rr9 = pack9(reps[:, 0:3], reps[:, 3:6], reps[:, 6:9]) if (B * K) % PKT == 0 else None
        if rr9 is None:
            pad = -(-(B * K) // PKT) * PKT - B * K
            reps = jnp.concatenate([reps, jnp.broadcast_to(reps[-1:], (pad, 9))])
            rr9 = pack9(reps[:, 0:3], reps[:, 3:6], reps[:, 6:9])
        rh = trace_packets_pallas_pt(scene, rr9, stack_size=stack_size)
        rep_tri = rh.tri.reshape(-1)[: B * K].reshape(B, K)
        row = jnp.where(rep_tri >= 0, rep_tri // 8, 0)
        rowdata = scene.tri_data[row]  # (B, K, 80)
        o, d = flat[:, :, 0:3], flat[:, :, 3:6]
        best_t = jnp.full((B, P), jnp.inf)
        best_tri = jnp.full((B, P), -1, jnp.int32)
        best_u = jnp.zeros((B, P))
        best_v = jnp.zeros((B, P))
        for k in range(K):
            tris = rowdata[:, k, :72].reshape(B, 8, 9)
            t, u, v = mt_rows(o, d, tris)  # (B, P, 8)
            t = jnp.where((rep_tri[:, k] >= 0)[:, None, None], t, jnp.inf)
            j = jnp.argmin(t, axis=-1)  # (B, P)
            tk = jnp.take_along_axis(t, j[..., None], -1)[..., 0]
            better = tk < best_t
            tri_id = row[:, k, None] * 8 + j
            best_tri = jnp.where(better, tri_id, best_tri)
            best_u = jnp.where(
                better, jnp.take_along_axis(u, j[..., None], -1)[..., 0], best_u
            )
            best_v = jnp.where(
                better, jnp.take_along_axis(v, j[..., None], -1)[..., 0], best_v
            )
            best_t = jnp.where(better, tk, best_t)
        return best_t, best_tri, best_u, best_v

    return seeds


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    mesh = make_atrium(n_tris)
    mats, dicts = atrium_materials(mesh)
    res = cached_build(mesh, mats, False, n_tris)
    stack = res.recommended_stack_size
    scene = prepare_scene_pt(res.as_device())
    tracer, tstate = make_pt_tracer(scene, stack_size=stack, packet_size=PKT)
    table = material_table(dicts)

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

    @jax.jit
    def advance(o, d, inv, active, kh, bkey):
        nd, _, _, term = scatter(table, bkey, d, kh.normal, kh.material)
        hit = (kh.tri >= 0) & active
        point = o + d * kh.t[..., None]
        o2 = jnp.where(hit[..., None], point + 1e-3 * jnp.sign(nd), o)
        d2 = jnp.where(hit[..., None], nd, d)
        inv2 = jnp.where(d2 == 0, jnp.inf, 1.0 / d2)
        return o2, d2, inv2, hit & ~term

    sets = [(o, d, inv, active)]
    kh = tracer(tstate, o, d, inv)
    sync(kh.t)
    for b in range(4):
        o, d, inv, active = advance(o, d, inv, active, kh,
                                    jax.random.fold_in(key, b))
        sets.append((o, d, inv, active))
        kh = tracer(tstate, o, d, inv)
        sync(kh.t)

    @jax.jit
    def base_sortkey(o, d, active):
        k = (octant(d) << 12) | morton(cellid(o, 4), 4)
        return jnp.where(active, k, jnp.int32(1 << 30))

    seeders = {K: make_seeder(scene, stack, K) for K in (1, 2, 4)}

    for bounce, (o, d, inv, active) in enumerate(sets):
        if bounce == 0:
            continue  # primaries are not the bottleneck
        live = int(np.asarray(jnp.sum(active.astype(jnp.int32))))
        print(f"--- bounce {bounce}: live {live/N:.1%}", flush=True)
        perm = jnp.argsort(base_sortkey(o, d, active))
        o2, d2, i2 = o[perm], d[perm], inv[perm]
        sync(o2)
        r9 = pack9(o2, d2, i2)
        lp = jnp.int32(-(-live // PKT))

        def run(tag, seed, extra_s=0.0):
            kh2 = trace_packets_pallas_pt(
                scene, r9, stack_size=stack, live_packets=lp, seed=seed)
            sync(kh2.t)  # warm
            t0 = time.time()
            kh2 = trace_packets_pallas_pt(
                scene, r9, stack_size=stack, live_packets=lp, seed=seed)
            sync(kh2.t)
            dt = time.time() - t0 + extra_s
            visits = int(np.asarray(jnp.sum(kh2.inner_visits)))
            tests = int(np.asarray(jnp.sum(kh2.leaf_tests)))
            print(f"  {tag:9s}: {dt*1e3:7.1f} ms  {live/dt/1e6:6.2f}"
                  f" live-Mrays/s  visits {visits:>9d}  leaf_tests"
                  f" {tests:>9d}", flush=True)
            return kh2

        base = run("base", None)
        for K, seeder in seeders.items():
            sd = seeder(r9)
            sync(sd[0])  # warm
            t0 = time.time()
            sd = seeder(r9)
            sync(sd[0])
            seed_s = time.time() - t0
            frac = float(np.asarray(jnp.mean(jnp.isfinite(sd[0]))))
            kh2 = run(f"rep{K}", sd, extra_s=seed_s)
            mism = float(np.asarray(jnp.mean(
                (kh2.tri != base.tri)[base.tri >= 0])))
            print(f"            seed {seed_s*1e3:6.1f} ms  cover {frac:.1%}"
                  f"  mism {mism:.3%}", flush=True)
        run("perfect", (base.t, base.tri, base.u, base.v))


if __name__ == "__main__":
    sys.exit(main() or 0)
