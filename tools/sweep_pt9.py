#!/usr/bin/env python
"""Lean PT kernel: leaf_max sweep on real bounce-3 rays.

Leaf MT tests run unconditionally for every packet in a popped leaf, while
child boxes are slab-tested (vectorized) and sorted. Smaller leaves shift
work from the unconditional MT loop to the pruned/sorted inner loop.

Usage: PYTHONPATH=/root/repo python tools/sweep_pt9.py [spp] [leaf_max ...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.camera import Camera
from minipath_tpu.parallel.mesh import gen_frame_rays9
from minipath_tpu.render.pallas_kernels import prepare_scene_pt
from minipath_tpu.render.wavefront import _morton16, make_pt_tracer, scatter
from minipath_tpu.scene.bvh import native
from minipath_tpu.scene.bvh.build import build_bvh

sys.path.insert(0, "/root/repo/tools")
from bench_pt import build_scene

W, H = 960, 540


def sync(x):
    return float(np.asarray(jnp.sum(x)))


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    leaf_sizes = [int(a) for a in sys.argv[2:]] or [8, 16, 24]
    res, table = build_scene()
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
    scene0 = prepare_scene_pt(res.as_device())
    tr0, ts0 = make_pt_tracer(scene0, stack_size=stack, packet_size=2048)
    for b in range(3):
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
    cell = jnp.clip((o - lo) * (16.0 / jnp.maximum(hi - lo, 1e-6)), 0, 15).astype(jnp.int32)
    octant = ((d[:, 0] > 0).astype(jnp.int32) * 4 + (d[:, 1] > 0).astype(jnp.int32) * 2
              + (d[:, 2] > 0).astype(jnp.int32))
    k = jnp.where(active, (octant << 12) | _morton16(cell), jnp.int32(1 << 30))
    perm = jnp.argsort(k)
    o, d, inv = o[perm], d[perm], inv[perm]
    sync(o)
    print(f"bounce-3 rays: {N/1e6:.2f}M, live {live/N:.1%}", flush=True)

    # Rebuild the scene mesh once; re-run the BVH build per leaf size.
    from minipath_tpu.scene.procedural import make_atrium
    from minipath_tpu.scene.materials import material_table  # noqa: F401
    mesh = make_atrium(250_000)
    tri_y = mesh.positions[mesh.triangles][:, :, 1].mean(axis=1)
    rng = np.random.default_rng(11)
    mats = np.zeros(mesh.triangle_count, np.int32)
    mats[tri_y > 10.0] = 4
    props = (tri_y > 0.1) & (tri_y < 4.0)
    mats[props] = rng.integers(1, 4, props.sum())

    for lm in leaf_sizes:
        if native.is_available():
            r = native.build_bvh_native(mesh, materials=mats, leaf_max=lm)
        else:
            r = build_bvh(mesh, materials=mats, leaf_max=lm)
        sc = prepare_scene_pt(r.as_device())
        st = r.recommended_stack_size
        tr, ts = make_pt_tracer(sc, stack_size=st, packet_size=2048)
        lv = jnp.int32(live)
        kh = tr(ts, o, d, inv, lv)
        sync(kh.t)
        t0 = time.time()
        kh = tr(ts, o, d, inv, lv)
        sync(kh.t)
        dt = time.time() - t0
        nlp = -(-live // 2048)
        iv = float(np.asarray(jnp.sum(kh.inner_visits))) / nlp
        lt = float(np.asarray(jnp.sum(kh.leaf_tests))) / nlp
        print(f"leaf_max={lm:3d} (depth {r.max_depth}, stack {st}): "
              f"{dt*1e3:8.1f} ms  {live/dt/1e6:6.2f} live-Mrays/s  "
              f"visits/pkt {iv:7.1f}  leaftests/pkt {lt:7.1f}", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
