#!/usr/bin/env python
"""The reference's criterion benchmark workload, reproduced.

``/root/reference/benches/render_teapot.rs``: full tiled render of
teapot.obj at 2048x1536, 10 spp, 64-px tiles, CLI camera. Reports best-of-N
wall-clock through the real ``render()`` machinery (tile batching, callbacks,
image assembly — everything the criterion bench measured on CPU threads).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_teapot.py [runs]
"""

import json
import os
import sys
import time

from minipath_tpu import Camera, RenderSettings, Scene, TriangleBvh, render

TEAPOT = "/root/reference/data/teapot.obj"


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    if os.path.exists(TEAPOT):
        bvh = TriangleBvh.with_obj(TEAPOT)
    else:
        from minipath_tpu.scene.procedural import make_uv_sphere

        print("teapot unavailable; procedural stand-in", file=sys.stderr)
        bvh = TriangleBvh.build(make_uv_sphere(1.0, rings=32, segments=64))

    camera = (
        Camera()
        .look_at((0.0, 2.0, 10.0), (0.0, 1.5, 0.0))
        .f_number(4.8)
        .focus_distance(10.0)
    )  # cli.rs:13-20
    settings = RenderSettings(
        tile_size=64, sample_count=10, resolution=(2048, 1536)
    )  # render_teapot.rs:20-24

    def once():
        t0 = time.time()
        p = render(Scene(bvh), camera, settings)
        p.wait()
        dt = time.time() - t0
        return dt, p

    # Warmup includes compile.
    dt, p = once()
    print(f"warmup (incl compile): {dt:.2f}s")
    import numpy as np

    times = []
    for i in range(runs):
        dt, p = once()
        times.append(dt)
        print(f"run {i}: {dt:.3f}s")
    arr = np.array(times)
    rays = 2048 * 1536 * 10
    print(
        f"render_teapot: mean {arr.mean():.3f}s +- {arr.std():.3f}s "
        f"(min {arr.min():.3f})  ({rays/arr.mean()/1e6:.1f} Mrays/s)  "
        f"timings: {p.timings().summary()}"
    )
    out = {
        "metric": "render_teapot_2048x1536_10spp",
        "value": round(float(arr.mean()), 3),
        "unit": "s/frame",
        "std_s": round(float(arr.std()), 3),
        "min_s": round(float(arr.min()), 3),
        "mrays_per_s": round(rays / arr.mean() / 1e6, 1),
        "n": runs,
        "note": "the reference's criterion workload (render_teapot.rs:20-24) "
        "through the full tile machinery; the Rust reference publishes no "
        "number and no Rust toolchain exists in this image to measure one "
        "(BASELINE.md). Check p.timings(): under the remote-TPU tunnel this "
        "workload is image-transfer bound, not compute bound.",
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_teapot.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main() or 0)
