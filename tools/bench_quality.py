#!/usr/bin/env python
"""Estimator-quality artifact: stratification, adaptive sampling, denoise.

Equal-sample-count RMSE comparisons are hardware-independent (the same
JAX program produces the same estimator statistics on CPU and TPU), so
this artifact can be (re)generated anywhere. It measures, on the atrium
interior-GI scene (the PT benchmark workload, scaled down):

* iid vs stratified RMSE at matched spp (the stratification MSE gain),
* uniform vs adaptive RMSE at matched average-spp budgets,
* noisy vs denoised RMSE at low AND moderate spp (the variance-guided
  filter's no-harm property at higher spp).

Writes QUALITY.json at the repo root.

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/bench_quality.py
"""

import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.camera import Camera
from minipath_tpu.render.adaptive import render_frame_pt_adaptive
from minipath_tpu.render.denoise import atrous_denoise, render_aux
from minipath_tpu.render.wavefront import make_xla_tracer, render_frame_pt
from minipath_tpu.scene.bvh import native
from minipath_tpu.scene.bvh.build import build_bvh
from minipath_tpu.scene.materials import Environment, material_table
from minipath_tpu.scene.procedural import atrium_materials, make_atrium
from minipath_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
W, H, BOUNCES = 160, 90, 5


def rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a, np.float64) -
                                  np.asarray(b, np.float64)) ** 2)))


def sphere_adaptive_section():
    """Adaptive-vs-uniform on a CONCENTRATED-noise scene (glossy ball on a
    diffuse floor under a smooth sky): most packets see near-zero variance,
    so the allocator can actually move budget. Appends to QUALITY.json."""
    from minipath_tpu.scene.materials import lambertian, metal
    from minipath_tpu.scene.procedural import (
        make_quad,
        make_uv_sphere,
        merge_meshes,
    )
    from minipath_tpu.scene.triangle_bvh import TriangleBvh

    sph = make_uv_sphere(1.0, rings=12, segments=20)
    sph.positions[:, 1] += 1.0
    floor = make_quad(30.0)
    p = floor.positions.copy()
    floor.positions = np.stack([p[:, 0], p[:, 2], p[:, 1]], axis=-1)
    mesh = merge_meshes([sph, floor])
    mats = np.concatenate([
        np.zeros(len(sph.triangles), np.int32),
        np.ones(len(floor.triangles), np.int32),
    ])
    table = material_table([
        metal((0.9, 0.7, 0.4), fuzz=0.4),
        lambertian((0.5, 0.55, 0.6)),
    ])
    obj = TriangleBvh.build(mesh, materials=mats)
    tracer, tstate = make_xla_tracer(
        obj.arrays, stack_size=obj.recommended_stack_size, packet_size=256
    )
    cam = Camera().look_at((0, 2.2, 6), (0, 1.0, 0)).f_number(32.0)
    sampler = cam.build_sampler((128, 96))
    kw = dict(
        width=128, height=96, bounces=3, env=Environment.sky(),
        px_block=(16, 16),
    )

    def uni(seed, spp):
        return np.asarray(render_frame_pt(
            tracer, tstate, table, sampler, jax.random.key(seed),
            spp=spp, samples_per_packet=min(8, spp), **kw,
        ))[..., :3]

    print("sphere scene reference (192 spp)...", flush=True)
    ref = uni(999, 192)
    rows = []
    for budget in (10, 18):
        r_uni = np.mean([rmse(uni(30 + i, budget), ref) for i in range(3)])
        r_ada = np.mean([
            rmse(np.asarray(render_frame_pt_adaptive(
                tracer, tstate, table, sampler, jax.random.key(30 + i),
                spp=budget, pilot_spp=2, samples_per_packet=8, **kw,
            ))[..., :3], ref)
            for i in range(3)
        ])
        rows.append({
            "avg_spp": budget, "rmse_uniform": round(float(r_uni), 5),
            "rmse_adaptive": round(float(r_ada), 5),
            "mse_ratio_uniform_over_adaptive": round(
                float((r_uni / r_ada) ** 2), 3
            ),
        })
        print(f"sphere adaptive budget={budget}: uniform {r_uni:.5f} vs "
              f"adaptive {r_ada:.5f}", flush=True)
    path = os.path.join(REPO, "QUALITY.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["adaptive_concentrated_noise"] = {
        "workload": "glossy ball + diffuse floor 128x96, 3 bounces, "
                    "reference 192 spp",
        "rows": rows,
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print("appended adaptive_concentrated_noise", flush=True)


def tworooms_adaptive_section():
    """Adaptive-vs-uniform where noise is GENUINELY concentrated and
    unconverged: the two-rooms scene (make_tworooms) from the camera room —
    most of the frame is near-black walls with near-zero variance, all the
    noise lives in the doorway + light spill. BSDF-only (no NEE) keeps the
    noise high at the tested budgets. This is the scene class adaptive
    sampling exists for; variants measure the allocator levers (pilot
    size, allocation granularity via px_block). Appends to QUALITY.json."""
    from minipath_tpu.scene.procedural import make_tworooms, tworooms_materials
    from minipath_tpu.scene.triangle_bvh import TriangleBvh

    mesh = make_tworooms(40_000)
    mats, dicts = tworooms_materials(mesh)
    table = material_table(dicts)
    obj = TriangleBvh.build(mesh, materials=mats)
    tracer, tstate = make_xla_tracer(
        obj.arrays, stack_size=obj.recommended_stack_size, packet_size=256
    )
    cam = (Camera().look_at((-10.0, 3.0, 0.0), (0.0, 1.5, 0.0))
           .f_number(8.0).sensor_width(36e-3))
    W2, H2 = 128, 96
    sampler = cam.build_sampler((W2, H2))
    kw = dict(
        width=W2, height=H2, bounces=6, env=Environment.none(),
    )

    def uni(seed, spp):
        return np.asarray(render_frame_pt(
            tracer, tstate, table, sampler, jax.random.key(seed),
            spp=spp, samples_per_packet=min(8, spp), px_block=(16, 16), **kw,
        ))[..., :3]

    def ada(seed, spp, pilot, chunk, pb):
        return np.asarray(render_frame_pt_adaptive(
            tracer, tstate, table, sampler, jax.random.key(seed),
            spp=spp, pilot_spp=pilot, samples_per_packet=chunk,
            px_block=(pb, pb), **kw,
        ))[..., :3]

    print("tworooms reference (512 spp)...", flush=True)
    ref = np.mean([uni(990 + i, 256) for i in range(2)], axis=0)
    rows = []
    for budget in (12, 24):
        r_uni = np.mean([rmse(uni(30 + i, budget), ref) for i in range(3)])
        row = {"avg_spp": budget, "rmse_uniform": round(float(r_uni), 5)}
        for name, pilot, chunk, pb in (
            ("p2_px16", 2, 8, 16),
            ("p4_px16", 4, 8, 16),
            ("p4_px8", 4, 4, 8),
        ):
            r_ada = np.mean([
                rmse(ada(30 + i, budget, pilot, chunk, pb), ref)
                for i in range(3)
            ])
            row[f"rmse_adaptive_{name}"] = round(float(r_ada), 5)
            row[f"mse_ratio_uniform_over_adaptive_{name}"] = round(
                float((r_uni / r_ada) ** 2), 3
            )
            print(f"tworooms budget={budget} {name}: uniform {r_uni:.5f} "
                  f"vs adaptive {r_ada:.5f} "
                  f"(x{row[f'mse_ratio_uniform_over_adaptive_{name}']})",
                  flush=True)
        rows.append(row)
    path = os.path.join(REPO, "QUALITY.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["adaptive_tworooms_concentrated"] = {
        "workload": f"tworooms (dark room, lit doorway) {W2}x{H2}, 6 bounces,"
                    " BSDF-only, reference 2x256 spp",
        "rows": rows,
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print("appended adaptive_tworooms_concentrated", flush=True)


def sobol_section():
    """Owen-scrambled Sobol vs jittered strata vs iid at matched spp — the
    round-5 low-discrepancy rung (stratify.py's spp < 0 mode), measured
    exactly like the stratification rows: same atrium interior-GI scene,
    same reference, 3 seeds per row. Appends the `sobol` key to
    QUALITY.json."""
    mesh = make_atrium(60_000)
    mats, dicts = atrium_materials(mesh)
    table = material_table(dicts)
    if native.is_available():
        res = native.build_bvh_native(mesh, materials=mats, leaf_max=24)
    else:
        res = build_bvh(mesh, materials=mats, leaf_max=24)
    arrays = jax.tree.map(jnp.asarray, res.arrays)
    tracer, tstate = make_xla_tracer(
        arrays, stack_size=res.recommended_stack_size, packet_size=256
    )
    cam = (Camera().look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
           .f_number(8.0).sensor_width(36e-3))
    sampler = cam.build_sampler((W, H))
    kw = dict(
        width=W, height=H, bounces=BOUNCES, env=Environment.sky(),
        px_block=(16, 16),
    )

    def frame(seed, spp, stratify=True, sobol=False):
        return np.asarray(render_frame_pt(
            tracer, tstate, table, sampler, jax.random.key(seed),
            spp=spp, samples_per_packet=min(8, spp), stratify=stratify,
            sobol=sobol, **kw,
        ))[..., :3]

    print("sobol section reference (256 spp stratified)...", flush=True)
    ref = frame(999, 256)
    rows = []
    for spp in (8, 32):
        r_iid = np.mean([rmse(frame(20 + i, spp, stratify=False), ref)
                         for i in range(3)])
        r_st = np.mean([rmse(frame(20 + i, spp), ref) for i in range(3)])
        r_so = np.mean([rmse(frame(20 + i, spp, sobol=True), ref)
                        for i in range(3)])
        rows.append({
            "spp": spp,
            "rmse_iid": round(float(r_iid), 5),
            "rmse_stratified": round(float(r_st), 5),
            "rmse_sobol": round(float(r_so), 5),
            "mse_ratio_strat_over_sobol": round(float((r_st / r_so) ** 2), 3),
            "mse_ratio_iid_over_sobol": round(float((r_iid / r_so) ** 2), 3),
        })
        print(f"sobol spp={spp}: iid {r_iid:.5f} strat {r_st:.5f} "
              f"sobol {r_so:.5f} (MSE strat/sobol "
              f"x{rows[-1]['mse_ratio_strat_over_sobol']})", flush=True)
    path = os.path.join(REPO, "QUALITY.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["sobol"] = {
        "workload": f"atrium interior GI {W}x{H}, {BOUNCES} bounces, "
                    "Owen-scrambled padded 2-D Sobol (stratify.py) vs "
                    "jittered strata vs iid, reference 256 spp, 3 seeds",
        "rows": rows,
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print("appended sobol section", flush=True)


def main():
    if "--sphere-only" in sys.argv:
        return sphere_adaptive_section()
    if "--tworooms-only" in sys.argv:
        return tworooms_adaptive_section()
    if "--sobol-only" in sys.argv:
        return sobol_section()
    adaptive_only = "--atrium-adaptive-only" in sys.argv
    mesh = make_atrium(60_000)
    mats, dicts = atrium_materials(mesh)
    table = material_table(dicts)
    if native.is_available():
        res = native.build_bvh_native(mesh, materials=mats, leaf_max=24)
    else:
        res = build_bvh(mesh, materials=mats, leaf_max=24)
    arrays = jax.tree.map(jnp.asarray, res.arrays)  # device-resident
    tracer, tstate = make_xla_tracer(
        arrays, stack_size=res.recommended_stack_size, packet_size=256
    )
    cam = (
        Camera()
        .look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
        .f_number(8.0)
        .sensor_width(36e-3)
    )
    sampler = cam.build_sampler((W, H))
    kw = dict(
        width=W, height=H, bounces=BOUNCES, env=Environment.sky(),
        px_block=(16, 16),
    )

    def frame(seed, spp, stratify=True, variance=False):
        return render_frame_pt(
            tracer, tstate, table, sampler, jax.random.key(seed),
            spp=spp, samples_per_packet=min(8, spp), stratify=stratify,
            return_variance=variance, **kw,
        )

    print("reference (256 spp stratified)...", flush=True)
    ref = np.asarray(frame(999, 256))[..., :3]

    out = {
        "workload": f"atrium interior GI {W}x{H}, {BOUNCES} bounces, "
                    "XLA tracer (estimator statistics are "
                    "hardware-independent)",
        "reference_spp": 256,
    }
    if adaptive_only:
        prev = os.path.join(REPO, "QUALITY.json")
        if os.path.exists(prev):
            out = json.load(open(prev))

    # 1. Stratification gain at matched spp.
    strat = []
    for spp in () if adaptive_only else (8, 32):
        r_iid = np.mean([
            rmse(np.asarray(frame(20 + i, spp, stratify=False))[..., :3], ref)
            for i in range(3)
        ])
        r_st = np.mean([
            rmse(np.asarray(frame(20 + i, spp))[..., :3], ref)
            for i in range(3)
        ])
        strat.append({
            "spp": spp, "rmse_iid": round(float(r_iid), 5),
            "rmse_stratified": round(float(r_st), 5),
            "mse_reduction": round(float((r_iid / r_st) ** 2), 3),
        })
        print(f"strat spp={spp}: iid {r_iid:.5f} vs {r_st:.5f} "
              f"(MSE x{strat[-1]['mse_reduction']})", flush=True)
    if not adaptive_only:
        out["stratification"] = strat

    # 2. Adaptive vs uniform at matched average budget.
    adap = []
    for budget in (10, 18, 34):
        r_uni = np.mean([
            rmse(np.asarray(frame(30 + i, budget))[..., :3], ref)
            for i in range(3)
        ])
        r_ada = np.mean([
            rmse(np.asarray(render_frame_pt_adaptive(
                tracer, tstate, table, sampler, jax.random.key(30 + i),
                spp=budget, pilot_spp=2, samples_per_packet=8, **kw,
            ))[..., :3], ref)
            for i in range(3)
        ])
        adap.append({
            "avg_spp": budget, "rmse_uniform": round(float(r_uni), 5),
            "rmse_adaptive": round(float(r_ada), 5),
            "mse_ratio_uniform_over_adaptive": round(
                float((r_uni / r_ada) ** 2), 3
            ),
        })
        print(f"adaptive budget={budget}: uniform {r_uni:.5f} vs "
              f"adaptive {r_ada:.5f}", flush=True)
    out["adaptive"] = adap

    # 3. Variance-guided denoiser: gain at 4 spp, no harm at 32 spp.
    if adaptive_only:
        with open(os.path.join(REPO, "QUALITY.json"), "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out["adaptive"], indent=2), flush=True)
        return
    n_img, z_img = render_aux(
        tracer, tstate, sampler, jax.random.key(1), width=W, height=H,
        px_block=(16, 16),
    )
    den = []
    for spp in (4, 32):
        img, var = frame(40, spp, variance=True)
        noisy = np.asarray(img)[..., :3]
        filtered = np.asarray(atrous_denoise(
            jnp.asarray(noisy), n_img, z_img, var
        ))
        den.append({
            "spp": spp, "rmse_noisy": round(rmse(noisy, ref), 5),
            "rmse_denoised": round(rmse(filtered, ref), 5),
        })
        print(f"denoise spp={spp}: noisy {den[-1]['rmse_noisy']} -> "
              f"{den[-1]['rmse_denoised']}", flush=True)
    out["denoise_variance_guided"] = den

    with open(os.path.join(REPO, "QUALITY.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
