#!/usr/bin/env python
"""Round 2 sweep: huge packets + direction-fine sort keys on bounce-1 rays."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.camera import Camera
from minipath_tpu.parallel.mesh import gen_frame_rays9
from minipath_tpu.render.pallas_kernels import prepare_scene
from minipath_tpu.render.wavefront import make_pallas_tracer, scatter
sys.path.insert(0, "/root/repo/tools")
from bench_pt import build_scene

W, H, SPP = 960, 540, 8


def sync(x):
    return float(np.asarray(jnp.sum(x)))


@jax.jit
def key_octant_cell(o, d):
    lo, hi = jnp.min(o, axis=0), jnp.max(o, axis=0)
    scale = 16.0 / jnp.maximum(hi - lo, 1e-6)
    cell = jnp.clip((o - lo) * scale, 0, 15).astype(jnp.int32)
    cid = (cell[:, 0] << 8) | (cell[:, 1] << 4) | cell[:, 2]
    octant = ((d[:, 0] > 0).astype(jnp.int32) * 4
              + (d[:, 1] > 0).astype(jnp.int32) * 2
              + (d[:, 2] > 0).astype(jnp.int32))
    return jnp.argsort((octant << 12) | cid)


def _dirbin(d, sub_bits):
    ax = jnp.argmax(jnp.abs(d), axis=-1)  # dominant axis
    sgn = (jnp.take_along_axis(d, ax[:, None], -1)[:, 0] > 0).astype(jnp.int32)
    face = ax.astype(jnp.int32) * 2 + sgn  # 0..5
    # minor components normalized to [-1,1] by the major magnitude
    major = jnp.maximum(jnp.abs(jnp.take_along_axis(d, ax[:, None], -1)[:, 0]), 1e-9)
    m1 = jnp.take_along_axis(d, ((ax + 1) % 3)[:, None], -1)[:, 0] / major
    m2 = jnp.take_along_axis(d, ((ax + 2) % 3)[:, None], -1)[:, 0] / major
    n = 1 << sub_bits
    q1 = jnp.clip(((m1 + 1) * 0.5 * n).astype(jnp.int32), 0, n - 1)
    q2 = jnp.clip(((m2 + 1) * 0.5 * n).astype(jnp.int32), 0, n - 1)
    return (face << (2 * sub_bits)) | (q1 << sub_bits) | q2  # 6*n^2 bins


def make_key_dir(sub_bits, cell_bits, dir_major=True):
    @jax.jit
    def f(o, d):
        lo, hi = jnp.min(o, axis=0), jnp.max(o, axis=0)
        n = 1 << cell_bits
        scale = n / jnp.maximum(hi - lo, 1e-6)
        cell = jnp.clip((o - lo) * scale, 0, n - 1).astype(jnp.int32)
        cid = (cell[:, 0] << (2 * cell_bits)) | (cell[:, 1] << cell_bits) | cell[:, 2]
        db = _dirbin(d, sub_bits)
        dbits = 3 + 2 * sub_bits
        if dir_major:
            key = (db << (3 * cell_bits)) | cid
        else:
            key = (cid << dbits) | db
        return jnp.argsort(key)
    return f


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
    tracer0, tstate = make_pallas_tracer(scene, stack_size=stack, packet_size=2048)
    kh = tracer0(tstate, o, d, inv)
    sync(kh.t)
    nd, _, _, _ = scatter(table, key, d, kh.normal, kh.material)
    hit = kh.tri >= 0
    point = o + d * kh.t[..., None]
    o1 = jnp.where(hit[..., None], point + 1e-3 * jnp.sign(nd), o)
    d1 = jnp.where(hit[..., None], nd, d)
    inv1 = jnp.where(d1 == 0, jnp.inf, 1.0 / d1)
    print(f"N={N/1e6:.2f}M bounce-1 rays", flush=True)

    keys = {
        "octant+cell16 (cur)": key_octant_cell,
        "dir96+cell16 dmaj": make_key_dir(2, 4, True),
        "dir384+cell8 dmaj": make_key_dir(3, 3, True),
        "cell16-major+dir96": make_key_dir(2, 4, False),
    }
    tracers = {}
    for pkt in (2048, 4096, 8192, 16384):
        tracers[pkt], _ = make_pallas_tracer(scene, stack_size=stack, packet_size=pkt)

    for kname, kf in keys.items():
        perm = kf(o1, d1)
        os_, ds_, is_ = o1[perm], d1[perm], inv1[perm]
        sync(os_)
        for pkt in (2048, 4096, 8192, 16384):
            tr = tracers[pkt]
            kh2 = tr(tstate, os_, ds_, is_)
            sync(kh2.t)
            t0 = time.time()
            kh2 = tr(tstate, os_, ds_, is_)
            sync(kh2.t)
            dt = time.time() - t0
            print(f"{kname:24s} pkt={pkt:5d}: {dt*1e3:7.1f} ms  {N/dt/1e6:5.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
