#!/usr/bin/env python
"""PT + NEE parity on a Sponza-scale (>600k tris) scene: quantized lean
kernel vs the portable XLA engine.

The round-3 gap: every PT parity test lived below the f32 VMEM budget, so
the big-scene path (quantized lean kernel + quantized anyhit shadows) had
no evidence against an independent engine. This runs both engines on a
650k-tri materialized atrium (over the f32 budget — asserted) and checks:

  1. ray-level: closest-hit agreement on camera rays and on random
     interior rays (hit sets, and |dt| where the winning triangle agrees —
     quantization legitimately flips winners between edge-adjacent
     triangles at nearly-equal t);
  2. anyhit-level: occlusion bits vs the XLA shadow tracer;
  3. frame-level: a full render_frame_pt PT + NEE frame through each
     engine (same RNG stream) must agree in the mean well inside MC noise.

Writes PARITY_BIG.json. Intended for the TPU (the lean kernel is a Pallas
program); the XLA engine side is portable.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/parity_big.py
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.camera import Camera
from minipath_tpu.render.pallas_kernels import (
    QPTScene,
    prepare_scene_pt,
    prepare_scene_qpt,
)
from minipath_tpu.render.wavefront import (
    make_pt_shadow_tracer,
    make_pt_tracer,
    make_xla_shadow_tracer,
    make_xla_tracer,
    render_frame_pt,
)
from minipath_tpu.scene.bvh import native
from minipath_tpu.scene.bvh.build import build_bvh
from minipath_tpu.scene.materials import (
    Environment,
    build_light_table,
    material_table,
)
from minipath_tpu.scene.procedural import atrium_materials, make_atrium
from minipath_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_TRIS = 650_000
W, H, SPP, BOUNCES = 160, 90, 8, 4


def main():
    t0 = time.time()
    mesh = make_atrium(N_TRIS)
    mats, dicts = atrium_materials(mesh)
    table = material_table(dicts)
    if native.is_available():
        res = native.build_bvh_native(mesh, materials=mats, leaf_max=24)
    else:
        res = build_bvh(mesh, materials=mats, leaf_max=24)
    print(f"scene: {res.triangle_count} tris, built in {time.time()-t0:.1f}s",
          flush=True)

    # The point of the exercise: this scene must NOT fit the f32 budget.
    try:
        prepare_scene_pt(res.as_device())
        over_budget = False
    except ValueError:
        over_budget = True
    assert over_budget, "scene unexpectedly fits the f32 VMEM budget"

    qpt = prepare_scene_qpt(res.arrays)
    assert isinstance(qpt, QPTScene)
    stack = res.recommended_stack_size
    tr_q, _ = make_pt_tracer(qpt, stack_size=stack, packet_size=2048)
    sh_q, _ = make_pt_shadow_tracer(qpt, stack_size=stack, packet_size=2048)
    arrays_dev = jax.tree.map(jnp.asarray, res.arrays)
    tr_x, xs = make_xla_tracer(arrays_dev, stack_size=stack, packet_size=256)
    sh_x, _ = make_xla_shadow_tracer(arrays_dev, stack_size=stack,
                                     packet_size=256)
    lights = build_light_table(res.arrays.tri_packets, res.arrays.tri_material,
                               table)
    cam = (Camera().look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
           .f_number(8.0).sensor_width(36e-3))
    out = {"triangle_count": res.triangle_count, "over_f32_budget": True}

    # ---- 1. ray-level closest-hit parity -------------------------------
    rng = np.random.default_rng(7)
    n = 4096
    # half camera-ish rays from the viewpoint, half random interior rays
    o = np.concatenate([
        np.tile(np.array([-16.0, 4.0, 0.0], np.float32), (n // 2, 1)),
        rng.uniform([-18, 0.5, -8], [18, 12, 8], (n // 2, 3)).astype(np.float32),
    ])
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[: n // 2] += np.array([3.0, 0.0, 0.0], np.float32)  # bias into the hall
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    iv = np.where(d == 0, np.inf, 1.0 / d).astype(np.float32)
    a = tr_q(qpt, jnp.asarray(o), jnp.asarray(d), jnp.asarray(iv))
    b = tr_x(xs, jnp.asarray(o), jnp.asarray(d), jnp.asarray(iv))
    ha, hb = np.asarray(a.tri) >= 0, np.asarray(b.tri) >= 0
    hit_agree = float((ha == hb).mean())
    same = ha & hb & (np.asarray(a.tri) == np.asarray(b.tri))
    dt = np.abs(np.asarray(a.t)[same] - np.asarray(b.t)[same])
    rel = dt / np.maximum(np.asarray(b.t)[same], 1e-3)
    out["ray_parity"] = {
        "rays": n,
        "hit_agreement": round(hit_agree, 5),
        "same_winner_frac": round(float(same.mean()), 5),
        "dt_rel_p99_same_winner": round(float(np.quantile(rel, 0.99)), 6),
    }
    print(f"ray parity: hit agreement {hit_agree:.4f}, same winner "
          f"{same.mean():.4f}, p99 rel dt {np.quantile(rel, 0.99):.2e}",
          flush=True)
    assert hit_agree > 0.995, hit_agree
    assert float(np.quantile(rel, 0.99)) < 5e-3

    # ---- 2. anyhit occlusion parity ------------------------------------
    tgt = rng.uniform([-18, 0.5, -8], [18, 12, 8], (n, 3)).astype(np.float32)
    seg = tgt - o
    occ_q = np.asarray(sh_q(qpt, jnp.asarray(o), jnp.asarray(seg)))
    occ_x = np.asarray(sh_x(xs, jnp.asarray(o), jnp.asarray(seg)))
    occ_agree = float((occ_q == occ_x).mean())
    out["anyhit_parity"] = {
        "segments": n,
        "occlusion_agreement": round(occ_agree, 5),
        "occluded_frac": round(float(occ_x.mean()), 4),
    }
    print(f"anyhit parity: agreement {occ_agree:.4f} "
          f"(occluded {occ_x.mean():.3f})", flush=True)
    assert occ_agree > 0.99, occ_agree

    # ---- 3. full PT + NEE frame parity ---------------------------------
    sampler = cam.build_sampler((W, H))
    kw = dict(
        width=W, height=H, spp=SPP, bounces=BOUNCES, env=Environment.sky(),
        samples_per_packet=SPP, compaction=True, lights=lights,
    )
    t0 = time.time()
    img_q = np.asarray(render_frame_pt(
        tr_q, qpt, table, sampler, jax.random.key(3), shadow_tracer=sh_q,
        **kw))[..., :3]
    t_q = time.time() - t0
    t0 = time.time()
    img_x = np.asarray(render_frame_pt(
        tr_x, xs, table, sampler, jax.random.key(3), shadow_tracer=sh_x,
        **kw))[..., :3]
    t_x = time.time() - t0
    shift = abs(img_q.mean() - img_x.mean()) / max(img_x.mean(), 1e-9)
    out["frame_parity"] = {
        "workload": f"{W}x{H} @ {SPP}spp, {BOUNCES} bounces, PT+NEE",
        "mean_quantized": round(float(img_q.mean()), 5),
        "mean_xla": round(float(img_x.mean()), 5),
        "mean_shift_frac": round(float(shift), 5),
        "seconds_quantized_lean": round(t_q, 2),
        "seconds_xla": round(t_x, 2),
        "timing_note": (
            "seconds_* are SINGLE COLD calls including full XLA/Mosaic "
            "compile - parity evidence only, NOT a kernel-vs-XLA speed "
            "comparison; warm per-frame rates live in BENCH_extra.json / "
            "ISOLATE_QPT.json"
        ),
    }
    print(f"frame parity: qpt mean {img_q.mean():.5f} vs xla "
          f"{img_x.mean():.5f} (shift {shift*100:.2f}%), "
          f"{t_q:.1f}s vs {t_x:.1f}s", flush=True)
    assert shift < 0.05, shift

    with open(os.path.join(REPO, "PARITY_BIG.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main() or 0)
