#!/usr/bin/env python
"""Fewer-rays levers: roulette start/floor and the wavefront tail cutoff.

The oracle-ceiling measurements (pallas_kernels.py section comment) put
traversal within ~20% of its union-bound floor, so the remaining PT
throughput lever is tracing FEWER rays. Three knobs do that:

  rr_start   first bounce where path roulette may kill (unbiased)
  rr_floor   survival-probability floor; HIGHER = gentler roulette (dim
             paths survive at least that often, reweighted — unbiased);
             floor 1.0 disables path roulette entirely
  min_live_frac  whole-wavefront tail cutoff (BIASED: drops the remaining
             contribution once the live fraction falls below the
             threshold; trades correctness for the per-bounce fixed cost)

This sweep measures each config on the production NEE workload (atrium,
960x540 @ 8spp, 5 bounces, nee_max_depth=1): wall-clock across seeds,
estimator mean, per-pixel variance across seeds, and Monte-Carlo
efficiency 1/(var x time). For the biased cutoff rows it additionally
reports the mean shift vs the exact baseline (in % of the baseline mean)
— a cutoff is only shippable as default if that shift is indistinguishable
from zero, which this records either way.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/sweep_rr2.py
Writes SWEEP_RR.json.
"""

import json
import os
import sys
import time

import numpy as np
import jax

from minipath_tpu.camera import Camera
from minipath_tpu.render.pallas_kernels import prepare_scene_pt
from minipath_tpu.render.wavefront import (
    make_pt_shadow_tracer,
    make_pt_tracer,
    render_frame_pt,
)
from minipath_tpu.scene.materials import Environment, build_light_table
from minipath_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_pt import build_scene

W, H, SPP, BOUNCES = 960, 540, 8, 5
SEEDS = 6
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (rr_start, rr_floor, min_live_frac); first row = shipped baseline.
CONFIGS = [
    (3, 0.05, None),
    (2, 0.05, None),
    (1, 0.05, None),
    (3, 0.25, None),
    (3, 0.50, None),
    (2, 0.25, None),
    (3, 0.05, 0.02),
    (3, 0.05, 0.05),
]


def floors_precise(floors, seeds=6):
    """Error-barred survival-floor comparison (round-4 verdict item: the
    6-seed grid showed rr_floor 0.5 at 1.061x efficiency but recorded no
    spread, so 'defaults unchanged' shipped unjustified).

    The across-seed variance estimate of the coarse grid has relative
    standard error ~sqrt(2/(n-1)) ~ 63% at 6 seeds — hopeless for a 6%
    effect. This mode instead uses the WITHIN-frame variance estimator
    (render_frame_pt(return_variance=True): per-pixel sample variance of
    the luminance, aggregated over all 0.5M pixels), which is precise per
    seed; the seed-to-seed spread of (pixel-mean variance x wall time)
    then gives honest error bars on the efficiency ratio. Stratification
    makes within-pixel samples non-iid, so the estimator reads the
    PER-SAMPLE variance, not the stratified mean's — the stratification
    gain is floor-independent, so efficiency RATIOS between floors are
    unaffected. Wall time includes the sumsq accumulation for every row
    equally. Writes the `floor_precise` key of SWEEP_RR.json.
    """
    import jax.numpy as jnp

    res, table = build_scene()
    scene = prepare_scene_pt(res.as_device())
    stack = res.recommended_stack_size
    tracer, tstate = make_pt_tracer(scene, stack_size=stack, packet_size=2048)
    shadow, _ = make_pt_shadow_tracer(scene, stack_size=stack, packet_size=2048)
    lights = build_light_table(
        res.arrays.tri_packets, res.arrays.tri_material, table
    )
    cam = (Camera().look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
           .f_number(8.0).sensor_width(36e-3))
    sampler = cam.build_sampler((W, H))
    key = jax.random.key(7)

    rows = []
    for fl in floors:
        def frame(k):
            img, var = render_frame_pt(
                tracer, tstate, table, sampler, k,
                width=W, height=H, spp=SPP, bounces=BOUNCES,
                env=Environment.sky(), samples_per_packet=SPP,
                compaction=True, lights=lights, shadow_tracer=shadow,
                nee_max_depth=1, rr_start=3, rr_floor=fl,
                return_variance=True,
            )
            return (float(np.asarray(jnp.mean(img[..., :3]))),
                    float(np.asarray(jnp.mean(var))))

        t0 = time.time()
        frame(key)
        print(f"floor {fl}: warmup {time.time()-t0:.1f}s", flush=True)
        per_seed = []
        for i in range(seeds):
            t0 = time.time()
            mean, var = frame(jax.random.fold_in(key, 80 + i))
            dt = time.time() - t0
            per_seed.append({"t_s": round(dt, 3), "var": var,
                             "mean": round(mean, 5)})
        ts = np.array([s["t_s"] for s in per_seed])
        vs = np.array([s["var"] for s in per_seed])
        effs = 1.0 / (vs * ts)
        rows.append({
            "rr_floor": fl,
            "t_mean_s": round(float(ts.mean()), 3),
            "t_std_s": round(float(ts.std()), 3),
            "var_mean": float(vs.mean()),
            "var_rel_std": round(float(vs.std() / vs.mean()), 4),
            "eff_mean": float(effs.mean()),
            "eff_stderr": float(effs.std() / np.sqrt(len(effs))),
            "per_seed": per_seed,
        })
        print(f"floor {fl}: t {ts.mean():.3f}s var {vs.mean():.3e} "
              f"eff {effs.mean():.2f} +- {rows[-1]['eff_stderr']:.2f}",
              flush=True)

    base = rows[0]
    for r in rows:
        ratio = r["eff_mean"] / base["eff_mean"]
        # Independent-seed ratio error propagation.
        rel = np.sqrt((r["eff_stderr"] / r["eff_mean"]) ** 2
                      + (base["eff_stderr"] / base["eff_mean"]) ** 2)
        r["efficiency_vs_first"] = round(float(ratio), 4)
        r["efficiency_vs_first_stderr"] = round(float(ratio * rel), 4)
        print(f"floor {r['rr_floor']}: eff ratio {r['efficiency_vs_first']} "
              f"+- {r['efficiency_vs_first_stderr']}", flush=True)

    path = os.path.join(REPO, "SWEEP_RR.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["floor_precise"] = {
        "workload": f"atrium NEE(cap=1) {W}x{H} @ {SPP}spp, {BOUNCES} "
        f"bounces, {seeds} seeds, within-frame variance estimator",
        "rows": rows,
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(data["floor_precise"], indent=2), flush=True)


def main():
    global CONFIGS
    if "--floors-precise" in sys.argv:
        floors = [float(x) for x in
                  sys.argv[sys.argv.index("--floors-precise") + 1].split(",")]
        return floors_precise(floors)
    bsdf_only = "--bsdf-only" in sys.argv
    if "--floors" in sys.argv:
        # Extension run: sweep additional survival floors at the shipped
        # rr_start; rows are APPENDED to the workload's existing grid.
        floors = [float(x) for x in
                  sys.argv[sys.argv.index("--floors") + 1].split(",")]
        CONFIGS = [(3, f, None) for f in floors]
    res, table = build_scene()
    scene = prepare_scene_pt(res.as_device())
    stack = res.recommended_stack_size
    tracer, tstate = make_pt_tracer(scene, stack_size=stack, packet_size=2048)
    if bsdf_only:
        shadow, lights, cap = None, None, None
    else:
        shadow, _ = make_pt_shadow_tracer(
            scene, stack_size=stack, packet_size=2048
        )
        lights = build_light_table(
            res.arrays.tri_packets, res.arrays.tri_material, table
        )
        cap = 1
    cam = (Camera().look_at((-16.0, 4.0, 0.0), (10.0, 3.0, 0.5))
           .f_number(8.0).sensor_width(36e-3))
    sampler = cam.build_sampler((W, H))
    key = jax.random.key(0)

    rows = []
    for rs, fl, mlf in CONFIGS:
        def frame(k):
            img = render_frame_pt(
                tracer, tstate, table, sampler, k,
                width=W, height=H, spp=SPP, bounces=BOUNCES,
                env=Environment.sky(), samples_per_packet=SPP,
                compaction=True, lights=lights, shadow_tracer=shadow,
                nee_max_depth=cap, rr_start=rs, rr_floor=fl,
                min_live_frac=mlf,
            )
            return np.asarray(img[..., :3])

        t0 = time.time()
        imgs = [frame(key)]
        print(f"rs={rs} fl={fl} mlf={mlf}: warmup {time.time()-t0:.1f}s",
              flush=True)
        times = []
        for i in range(SEEDS - 1):
            t0 = time.time()
            imgs.append(frame(jax.random.fold_in(key, 40 + i)))
            times.append(time.time() - t0)
        stack_i = np.stack(imgs)
        mean = float(stack_i.mean())
        var = float(stack_i.var(axis=0).mean())
        t = float(np.mean(times))
        eff = 1.0 / (var * t) if var > 0 else float("inf")
        rows.append({
            "rr_start": rs, "rr_floor": fl, "min_live_frac": mlf,
            "s_per_frame": round(t, 3), "mean": round(mean, 5),
            "var": var, "eff": eff,
        })
        print(
            f"rs={rs} fl={fl} mlf={mlf}: {t:.3f}s/frame mean={mean:.4f} "
            f"var={var:.3e} eff={eff:.1f}",
            flush=True,
        )

    base_eff, base_mean = rows[0]["eff"], rows[0]["mean"]
    print("\nrs  floor  mlf    time   mean    var        eff (vs baseline)  "
          "mean shift")
    for r in rows:
        r["efficiency_vs_baseline"] = round(r["eff"] / base_eff, 3)
        r["mean_shift_pct"] = round(
            100.0 * (r["mean"] - base_mean) / max(base_mean, 1e-9), 3
        )
        print(
            f"{r['rr_start']}  {r['rr_floor']:5.2f}  {str(r['min_live_frac']):>5}"
            f"  {r['s_per_frame']:6.3f}  {r['mean']:.4f}  {r['var']:.3e}"
            f"  {r['efficiency_vs_baseline']:5.2f}x  {r['mean_shift_pct']:+.2f}%"
        )
        del r["eff"]
    # Unbiased rows must agree with the baseline mean within MC noise.
    for r in rows:
        if r["min_live_frac"] is None:
            assert abs(r["mean_shift_pct"]) < 2.0, r

    mode = "wavefront (BSDF-only)" if bsdf_only else "NEE(cap=1)"
    out = {
        "workload": f"atrium {mode} {W}x{H} @ {SPP}spp, {BOUNCES} bounces,"
        f" {SEEDS} seeds",
        "rows": rows,
    }
    path = os.path.join(REPO, "SWEEP_RR.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    key = "wavefront" if bsdf_only else "nee_capped"
    if "--floors" in sys.argv and key in data:
        # Re-baseline the appended rows against the existing first row
        # (efficiencies stay comparable across runs only approximately —
        # the shared TPU drifts — so each row keeps its absolute numbers).
        data[key]["rows"].extend(rows)
    else:
        data[key] = out
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main() or 0)
