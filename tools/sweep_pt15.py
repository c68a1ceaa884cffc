#!/usr/bin/env python
"""NEE shadow-pass anatomy: where do the ~1.2 s/bounce go, and what helps?

Reconstructs the production NEE candidate sets (diffuse|glossy vertices,
pos-sorted compact prefix) for each bounce of the atrium workload, then
measures per bounce:
  candidates, occlusion rate, XLA glue (key+argsort+gather) time,
  anyhit trace time,
and three variants on the same sets:
  nosort  — sort_children=False (anyhit has no best_t to prune with;
            is near-first ordering still worth the sorting network?)
  rev     — segments traced FROM the light end (occluders near the
            surface are found last instead of first)
  rr      — throughput-proportional roulette (q = clamp(max thr, .05, 1))
            on candidates: unbiased, trades shadow rays for variance

Usage: PYTHONPATH=/root/repo python tools/sweep_pt15.py
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
from minipath_tpu.render.wavefront import (
    GLOSSY_MIN_FUZZ,
    _EPS,
    _SHADOW_T_MAX,
    _direction_bin,
    _morton16,
    _pack_rays9,
    make_pt_tracer,
    scatter_full,
)
from minipath_tpu.scene.materials import (
    METAL,
    Environment,
    build_light_table,
    material_table,
    sample_lights,
)

sys.path.insert(0, "/root/repo/tools")
from bench_pt import build_scene
from sweep_sbvh import cellid, morton, octant, sync

W, H, SPP, BOUNCES = 960, 540, 8, 5
PKT = 2048


def main():
    res, table = build_scene()
    scene = prepare_scene_pt(res.as_device())
    stack = res.recommended_stack_size
    tracer, tstate = make_pt_tracer(scene, stack_size=stack, packet_size=PKT)
    lights = build_light_table(
        res.arrays.tri_packets, res.arrays.tri_material, table
    )
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
    thr = jnp.ones((N, 3), jnp.float32)

    @jax.jit
    def nee_batch(o, d, active, thr, kh, bkey):
        """Reproduce _pt_trace's candidate segments for one bounce."""
        nd, atten, _, term, _, diffuse = scatter_full(
            table, bkey, d, kh.normal, kh.material
        )
        hit = (kh.tri >= 0) & active
        point = o + d * kh.t[..., None]
        ddn = jnp.sum(d * kh.normal, axis=-1, keepdims=True)
        nf = jnp.where(ddn < 0, kh.normal, -kh.normal)
        kindv = table.kind[kh.material]
        fuzzv = table.param[kh.material]
        glossy = (kindv == METAL) & (fuzzv >= GLOSSY_MIN_FUZZ)
        cand = (diffuse | glossy) & hit
        lkey = jax.random.fold_in(bkey, 11)
        sh_o = point + nf * _EPS
        y, wi, pdf_nee, em_l, cos_y, li = sample_lights(lights, lkey, sh_o)
        cos_x = jnp.sum(wi * nf, axis=-1)
        cand = cand & (cos_x > 0.0) & (cos_y > 1e-6) & (pdf_nee > 0.0)
        seg = y - wi * _EPS - sh_o
        # advance for next bounce
        thr2 = jnp.where(hit[..., None], thr * atten, thr)
        o2 = jnp.where(hit[..., None], point + 1e-3 * jnp.sign(nd), o)
        d2 = jnp.where(hit[..., None], nd, d)
        inv2 = jnp.where(d2 == 0, jnp.inf, 1.0 / d2)
        return cand, sh_o, seg, thr2, o2, d2, inv2, hit & ~term

    @jax.jit
    def sort_compact(cand, sh_o, seg):
        """Production pos-major shadow sort; returns sorted (o, seg, n)."""
        sh_safe = jnp.where(cand[..., None], sh_o, 0.0)
        lo = jnp.min(jnp.where(cand[..., None], sh_safe, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(cand[..., None], sh_safe, -jnp.inf), axis=0)
        scale = 16.0 / jnp.maximum(hi - lo, 1e-6)
        cell = jnp.clip((sh_safe - lo) * scale, 0, 15).astype(jnp.int32)
        wi = seg / jnp.maximum(
            jnp.sqrt(jnp.sum(seg * seg, -1, keepdims=True)), 1e-9)
        skey = (_morton16(cell) << 7) | _direction_bin(wi)
        skey = (((~cand).astype(jnp.int32)) << 27) | skey
        order = jnp.argsort(skey)
        cand_s = cand[order]
        o_eff = jnp.where(cand_s[..., None], sh_o[order], 1e9)
        s_eff = jnp.where(cand_s[..., None], seg[order], 1.0)
        return o_eff, s_eff, jnp.sum(cand.astype(jnp.int32))

    def anyhit(o_eff, s_eff, n_cand, sort_children=True):
        inv_s = jnp.where(s_eff == 0.0, jnp.inf, 1.0 / s_eff)
        r9, lp, Np = _pack_rays9(PKT, n_cand, o_eff, s_eff, inv_s)
        ph = trace_packets_pallas_pt(
            scene, r9, stack_size=stack, t_max=_SHADOW_T_MAX,
            live_packets=lp, anyhit=True, sort_children=sort_children,
        )
        return ph.tri.reshape(Np)[: o_eff.shape[0]] >= 0

    anyhit_j = jax.jit(anyhit, static_argnames=("sort_children",))

    for bounce in range(BOUNCES):
        kh = tracer(tstate, o, d, inv)
        sync(kh.t)
        bkey = jax.random.fold_in(key, bounce + 1)
        cand, sh_o, seg, thr2, o2, d2, inv2, act2 = nee_batch(
            o, d, active, thr, kh, bkey
        )
        nc = int(np.asarray(jnp.sum(cand.astype(jnp.int32))))
        print(f"--- bounce {bounce}: cand {nc} ({nc/N:.1%})", flush=True)

        # glue cost
        sync(sort_compact(cand, sh_o, seg)[0])
        t0 = time.time()
        o_eff, s_eff, n_cand = sort_compact(cand, sh_o, seg)
        sync(o_eff)
        glue = time.time() - t0

        variants = {}
        occ_prod = None
        for tag, (oo, ss, sc) in {
            "prod": (o_eff, s_eff, True),
            "nosort": (o_eff, s_eff, False),
            "rev": (o_eff + s_eff, -s_eff, True),
        }.items():
            occ = anyhit_j(oo, ss, n_cand, sort_children=sc)
            sync(occ)  # warm
            t0 = time.time()
            occ = anyhit_j(oo, ss, n_cand, sort_children=sc)
            sync(occ)
            dt = time.time() - t0
            variants[tag] = dt
            occv = np.asarray(occ)
            if tag == "prod":
                occ_prod = occv
                rate = occv[: nc].mean() if nc else 0.0
                print(f"  glue {glue*1e3:6.1f} ms   occlusion {rate:.1%}",
                      flush=True)
            mism = (occv[:nc] != occ_prod[:nc]).mean() if nc else 0.0
            print(f"  {tag:7s}: {dt*1e3:7.1f} ms  "
                  f"{nc/dt/1e6:6.2f} Mrays/s  mism {mism:.3%}", flush=True)

        # throughput-roulette candidate reduction (simulated)
        q = jnp.clip(jnp.max(thr, axis=-1), 0.05, 1.0)
        u = jax.random.uniform(jax.random.fold_in(bkey, 17), q.shape)
        keep = cand & (u < q)
        cand_rr = int(np.asarray(jnp.sum(keep.astype(jnp.int32))))
        o_r, s_r, n_r = sort_compact(keep, sh_o, seg)
        occ = anyhit_j(o_r, s_r, n_r)
        sync(occ)
        t0 = time.time()
        occ = anyhit_j(o_r, s_r, n_r)
        sync(occ)
        dt = time.time() - t0
        print(f"  rr     : {dt*1e3:7.1f} ms  cand {cand_rr}"
              f" ({cand_rr/max(nc,1):.1%} of prod)", flush=True)

        o, d, inv, active, thr = o2, d2, inv2, act2, thr2

    # end-to-end reference: how production sorts rays INTO the bounce
    # (this script leaves rays unsorted between bounces; per-bounce anyhit
    # numbers above are on identically-sorted candidate sets either way)


if __name__ == "__main__":
    sys.exit(main() or 0)
