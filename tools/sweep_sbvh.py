#!/usr/bin/env python
"""SBVH (spatial-split) tree vs the plain binned-SAH tree on REAL bounce-k
ray sets of the atrium PT workload (the sweep_pt11 harness).

For each bounce depth, traces the SAME sorted wavefront through both trees
with the lean PT kernel and reports wall time plus the kernel's
inner-visit / leaf-test counters — the direct measure of whether clipped
references shrink the per-packet traversal unions that bound deep-bounce
throughput.

Usage: PYTHONPATH=/root/repo python tools/sweep_sbvh.py [n_tris]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.camera import Camera
from minipath_tpu.parallel.mesh import gen_frame_rays9
from minipath_tpu.render.pallas_kernels import prepare_scene_pt
from minipath_tpu.render.wavefront import make_pt_tracer, scatter
from minipath_tpu.scene.bvh.build import build_bvh, BuildResult, BvhArrays
from minipath_tpu.scene.bvh import native
from minipath_tpu.scene.procedural import make_atrium, atrium_materials
from minipath_tpu.scene.materials import material_table

W, H, SPP = 960, 540, 8
PKT = 2048
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")


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


def cached_build(mesh, mats, spatial, n_tris):
    os.makedirs(CACHE, exist_ok=True)
    tag = "sbvh" if spatial else "obj"
    path = os.path.join(CACHE, f"atrium_{tag}_{n_tris}_v1.npz")
    if os.path.exists(path):
        z = np.load(path)
        arrays = BvhArrays(**{k: z[k] for k in BvhArrays._fields})
        res = BuildResult(
            arrays=arrays,
            triangle_count=int(z["tc"]),
            vertex_count=int(z["vc"]),
            max_depth=int(z["md"]),
        )
        return res
    t0 = time.time()
    if spatial or not native.is_available():
        res = build_bvh(mesh, materials=mats, leaf_max=24, spatial_splits=spatial)
    else:
        res = native.build_bvh_native(mesh, materials=mats, leaf_max=24)
    print(f"{tag} build: {time.time()-t0:.1f}s  refs={int(res.leaf_fill.total)}"
          f" depth={res.max_depth}", flush=True)
    np.savez_compressed(
        path,
        tc=res.triangle_count, vc=res.vertex_count, md=res.max_depth,
        **{k: np.asarray(getattr(res.arrays, k)) for k in BvhArrays._fields},
    )
    return res


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    mesh = make_atrium(n_tris)
    mats, dicts = atrium_materials(mesh)
    material_table(dicts)  # parity with bench scene setup
    res_o = cached_build(mesh, mats, False, n_tris)
    res_s = cached_build(mesh, mats, True, n_tris)

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

    table = material_table(dicts)
    engines = {}
    for name, res in (("obj", res_o), ("sbvh", res_s)):
        scene = prepare_scene_pt(res.as_device())
        tr, st = make_pt_tracer(scene, stack_size=res.recommended_stack_size,
                                packet_size=PKT)
        engines[name] = (tr, st)
        print(f"{name}: nodes={res.arrays.node_child_links.shape[0]}"
              f" packets={res.arrays.tri_packets.shape[0]}"
              f" vmem={scene.vmem_bytes()/1e6:.1f}MB", flush=True)

    @jax.jit
    def advance(o, d, inv, active, kh, bkey):
        nd, _, _, term = scatter(table, bkey, d, kh.normal, kh.material)
        hit = (kh.tri >= 0) & active
        point = o + d * kh.t[..., None]
        o2 = jnp.where(hit[..., None], point + 1e-3 * jnp.sign(nd), o)
        d2 = jnp.where(hit[..., None], nd, d)
        inv2 = jnp.where(d2 == 0, jnp.inf, 1.0 / d2)
        return o2, d2, inv2, hit & ~term

    # Bounce-ray sets advance on the OBJ tree (identical rays fed to both).
    tracer_o, state_o = engines["obj"]
    sets = [(o, d, inv, active)]
    kh = tracer_o(state_o, o, d, inv)
    sync(kh.t)
    for b in range(4):
        o, d, inv, active = advance(o, d, inv, active, kh, jax.random.fold_in(key, b))
        sets.append((o, d, inv, active))
        kh = tracer_o(state_o, o, d, inv)
        sync(kh.t)

    @jax.jit
    def base_sortkey(o, d, active):
        k = (octant(d) << 12) | morton(cellid(o, 4), 4)
        return jnp.where(active, k, jnp.int32(1 << 30))

    for bounce, (o, d, inv, active) in enumerate(sets):
        live = int(np.asarray(jnp.sum(active.astype(jnp.int32))))
        print(f"--- bounce {bounce}: live {live/N:.1%}", flush=True)
        if bounce > 0:
            perm = jnp.argsort(base_sortkey(o, d, active))
            o2, d2, i2 = o[perm], d[perm], inv[perm]
        else:
            perm = None
            o2, d2, i2 = o, d, inv
        sync(o2)
        ref = None
        for name in ("obj", "sbvh"):
            tr, st = engines[name]
            kh2 = tr(st, o2, d2, i2, jnp.int32(live))
            sync(kh2.t)  # warm
            t0 = time.time()
            kh2 = tr(st, o2, d2, i2, jnp.int32(live))
            sync(kh2.t)
            dt = time.time() - t0
            visits = int(np.asarray(jnp.sum(kh2.inner_visits)))
            tests = int(np.asarray(jnp.sum(kh2.leaf_tests)))
            tri = np.asarray(kh2.tri)
            tt = np.asarray(kh2.t)
            if ref is None:
                ref = (tri, tt)
                mism = 0.0
            else:
                act = np.asarray(active)
                if perm is not None:
                    act = act[np.asarray(perm)]
                hitmask = (tri >= 0) != (ref[0] >= 0)
                mism = hitmask[act].mean() if act.any() else 0.0
            print(
                f"  {name:5s}: {dt*1e3:7.1f} ms  {live/dt/1e6:6.2f} live-Mrays/s"
                f"  visits {visits:>9d}  leaf_tests {tests:>9d}  mism {mism:.3%}",
                flush=True,
            )


if __name__ == "__main__":
    sys.exit(main() or 0)
