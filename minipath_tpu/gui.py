"""Interactive progressive viewer.

Counterpart of the reference's egui front-end (``/root/reference/src/gui.rs``):
a preview render (1 spp) auto-escalates to a full render (2 spp) on
completion (``gui.rs:171-173,216-224``), finished tiles stream into the
displayed image, in-progress tiles get a red border, a checkerboard shows
through transparent pixels (``gui.rs:244-282``), and arrow keys translate the
camera — aborting the current render and restarting the preview
(``gui.rs:181-198``).

Architecture: all behavior lives in the headless :class:`GuiController`
state machine (unit-testable without a display); :func:`main` wraps it in a
thin Tk shell. The reference couples this logic to eframe callbacks; here the
controller polls a thread-safe tile queue, the TPU renders, and the UI thread
just blits.
"""

from __future__ import annotations

import argparse
import queue
import sys
import threading

import numpy as np

from minipath_tpu.camera import Camera
from minipath_tpu.render import RenderSettings, render
from minipath_tpu.scene import Scene
from minipath_tpu.utils.image import checkerboard_under


class GuiController:
    """Headless progressive-render state machine."""

    PREVIEW_SPP = 1
    FULL_SPP = 2  # gui.rs:216-224

    def __init__(self, scene: Scene, camera: Camera, resolution, tile_size=64, full_spp=None):
        self.scene = scene
        self.camera = camera
        self.resolution = tuple(resolution)
        self.tile_size = tile_size
        self.full_spp = full_spp or self.FULL_SPP
        w, h = self.resolution
        self.image = np.zeros((h, w, 4), np.uint8)
        self.pending = queue.Queue()  # (tile, finished: bool)
        self.in_progress_tiles: list = []
        self.progress = None
        self.mode = None  # "preview" | "full"
        self._lock = threading.Lock()

    # -- render control (gui.rs:74-135) -----------------------------------------

    def start(self):
        self._start_render("preview", self.PREVIEW_SPP)

    def _start_render(self, mode, spp):
        self.cancel_previous_render()
        self.mode = mode
        settings = RenderSettings(
            tile_size=self.tile_size, sample_count=spp, resolution=self.resolution
        )
        self.progress = render(
            self.scene,
            self.camera,
            settings,
            started_tile_callback=lambda t: self.pending.put((t, False)),
            finished_tile_callback=lambda t, s: self.pending.put((t, True)),
        )

    def cancel_previous_render(self):
        if self.progress is not None:
            self.progress.abort()
            self.progress.wait()
            self.progress = None
        # Drain stale callbacks.
        while not self.pending.empty():
            try:
                self.pending.get_nowait()
            except queue.Empty:
                break

    # -- per-frame update (gui.rs:152-198) -----------------------------------------

    def update(self) -> bool:
        """Drain pending tiles into the image; escalate preview -> full.
        Returns True if the display should repaint."""
        dirty = False
        full = None  # progress.image() snapshot, taken once per drain
        while True:
            try:
                tile, finished = self.pending.get_nowait()
            except queue.Empty:
                break
            dirty = True
            if finished:
                self.in_progress_tiles = [
                    t for t in self.in_progress_tiles if not np.array_equal(t.min, tile.min)
                ]
                if full is None:
                    full = self.progress.image()
                x0, y0 = int(tile.min[0]), int(tile.min[1])
                x1, y1 = int(tile.max[0]), int(tile.max[1])
                with self._lock:
                    self.image[y0:y1, x0:x1] = full[y0:y1, x0:x1]
            else:
                self.in_progress_tiles.append(tile)

        if (
            self.mode == "preview"
            and self.progress is not None
            and self.progress.is_finished()
            and self.progress.progress().finished == self.progress.progress().total
        ):
            self._start_render("full", self.full_spp)
            dirty = True
        return dirty

    def move_camera(self, dx: float, dy: float, dz: float):
        """Translate the camera in its own frame and restart the preview
        (``gui.rs:181-198``)."""
        m = np.eye(4)
        m[:3, 3] = [dx, dy, dz]
        self.camera = self.camera.transformed(m)
        self._start_render("preview", self.PREVIEW_SPP)

    def display_image(self) -> np.ndarray:
        """Composite: checkerboard under alpha + red borders on in-progress
        tiles (``gui.rs:244-282``)."""
        with self._lock:
            img = checkerboard_under(self.image)
        for tile in list(self.in_progress_tiles):
            x0, y0 = int(tile.min[0]), int(tile.min[1])
            x1, y1 = int(tile.max[0]), int(tile.max[1])
            b = 4
            img[y0 : y0 + b, x0:x1, :3] = (255, 0, 0)
            img[max(y1 - b, 0) : y1, x0:x1, :3] = (255, 0, 0)
            img[y0:y1, x0 : x0 + b, :3] = (255, 0, 0)
            img[y0:y1, max(x1 - b, 0) : x1, :3] = (255, 0, 0)
        return img

    def shutdown(self):
        self.cancel_previous_render()


class ProgressivePtController:
    """Progressive path-traced viewport (beyond the reference GUI, whose
    full mode is 2-spp parity shading — ``gui.rs:216-224``).

    A worker thread accumulates fixed-spp path-traced frames forever; the
    displayed image is the running mean (gamma 2.2). Camera moves bump a
    generation counter, which restarts accumulation with a freshly built
    frame function at the next loop iteration — the reference's
    abort-and-restart-preview semantics (``gui.rs:106-135``) at whole-frame
    granularity. Implements the same controller protocol ``run_tk`` drives
    (start/update/display_image/move_camera/shutdown).
    """

    def __init__(self, make_frame, camera, resolution, make_aux=None):
        # make_frame(camera) -> callable(chunk_index) -> (H, W, >=3) float
        # linear-RGB mean image for that chunk (one compiled spp chunk).
        # make_aux(camera) -> (normal (H, W, 3), depth (H, W)) guide
        # buffers; when given, the displayed mean goes through the
        # variance-guided a-trous denoiser (cross-pass noise sets the
        # color tolerance, so the filter self-limits as the accumulation
        # converges; display-only — the accumulator is untouched).
        self.make_frame = make_frame
        self.make_aux = make_aux
        self.camera = camera
        self.resolution = tuple(resolution)
        w, h = self.resolution
        self._acc = np.zeros((h, w, 3), np.float64)
        self._acc_sq = np.zeros((h, w), np.float64)  # per-pass luminance^2
        self._n = 0
        self._seen = 0
        self._gen = 0
        self._aux = None
        self._display_cache = None  # (gen, n, uint8 image)
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self):
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        gen = -1
        frame = None
        i = 0
        while not self._stop.is_set():
            with self._lock:
                cur_gen, camera = self._gen, self.camera
            if cur_gen != gen:
                gen, i = cur_gen, 0
                frame = self.make_frame(camera)
                aux = self.make_aux(camera) if self.make_aux else None
                with self._lock:
                    self._acc[:] = 0.0
                    self._acc_sq[:] = 0.0
                    self._n = 0
                    self._aux = aux
            img = np.asarray(frame(i), np.float64)[..., :3]
            i += 1
            with self._lock:
                if self._gen != gen:
                    continue  # camera moved mid-frame; drop the result
                self._acc += img
                from minipath_tpu.utils import LUMA_WEIGHTS

                lum = img @ LUMA_WEIGHTS
                self._acc_sq += lum * lum
                self._n += 1

    # -- controller protocol -----------------------------------------------------

    def update(self) -> bool:
        with self._lock:
            dirty = self._n != self._seen
            self._seen = self._n
        return dirty

    def move_camera(self, dx: float, dy: float, dz: float):
        m = np.eye(4)
        m[:3, 3] = [dx, dy, dz]
        with self._lock:
            self.camera = self.camera.transformed(m)
            self._gen += 1

    def samples(self) -> int:
        with self._lock:
            return self._n

    def display_image(self) -> np.ndarray:
        w, h = self.resolution
        with self._lock:
            if self._n == 0:
                return np.zeros((h, w, 3), np.uint8)
            cache = self._display_cache
            if cache is not None and cache[0] == self._gen and cache[1] == self._n:
                return cache[2]  # no new samples since the last display
            gen = self._gen
            acc = self._acc.copy()
            mean = acc / self._n
            n, aux = self._n, self._aux
            acc_sq = self._acc_sq.copy()
        if aux is not None:
            # Display-side variance-guided denoise: the color tolerance
            # scales with the measured cross-pass noise, so the filter
            # tends to the identity as the accumulation converges — no
            # hard fade needed, and the raw accumulator stays unbiased.
            import jax.numpy as jnp

            from minipath_tpu.render.denoise import atrous_denoise

            var = None
            if n >= 2:
                from minipath_tpu.utils import LUMA_WEIGHTS

                lum_sum = acc @ LUMA_WEIGHTS
                v = np.maximum(acc_sq - lum_sum * lum_sum / n, 0.0)
                var = jnp.asarray(v / ((n - 1) * n), jnp.float32)
            mean = np.asarray(
                atrous_denoise(
                    jnp.asarray(mean, jnp.float32), aux[0], aux[1], var
                ),
                np.float64,
            )
        srgb = np.clip(mean, 0.0, 1.0) ** (1.0 / 2.2)
        out = (srgb * 255.0 + 0.5).astype(np.uint8)
        with self._lock:
            self._display_cache = (gen, n, out)
        return out

    def shutdown(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30.0)


def run_tk(controller: GuiController, fps: int = 30):
    """Run the Tk event loop around a controller (requires a display)."""
    import tkinter as tk

    from PIL import Image, ImageTk

    w, h = controller.resolution
    root = tk.Tk()
    root.title("minipath-tpu")
    label = tk.Label(root)
    label.pack()

    step = 0.5

    def on_key(event):
        moves = {
            "Left": (-step, 0, 0),
            "Right": (step, 0, 0),
            "Up": (0, 0, -step),
            "Down": (0, 0, step),
            "Prior": (0, step, 0),
            "Next": (0, -step, 0),
        }
        if event.keysym in moves:
            controller.move_camera(*moves[event.keysym])
        elif event.keysym == "Escape":
            root.destroy()

    root.bind("<Key>", on_key)

    photo_ref = {}

    def tick():
        controller.update()
        img = controller.display_image()
        photo = ImageTk.PhotoImage(Image.fromarray(img))
        photo_ref["p"] = photo  # keep alive
        label.configure(image=photo)
        root.after(1000 // fps, tick)

    controller.start()
    tick()
    try:
        root.mainloop()
    finally:
        controller.shutdown()


def main(argv=None) -> int:
    from minipath_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(prog="minipath-tpu-gui")
    p.add_argument("--obj", default=None)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--tile-size", type=int, default=64)
    p.add_argument("--full-spp", type=int, default=2)
    p.add_argument(
        "--integrator", choices=["parity", "pt"], default="parity",
        help="pt = progressive path-traced viewport (accumulates spp forever)",
    )
    args = p.parse_args(argv)

    from minipath_tpu.cli import load_scene

    class _SceneArgs:
        obj = args.obj
        scene = "obj"
        integrator = args.integrator

    bvh, material_dicts = load_scene(_SceneArgs)
    camera = (
        Camera()
        .look_at((0.0, 2.0, 10.0), (0.0, 1.5, 0.0))
        .f_number(4.8)
        .focus_distance(10.0)
    )
    if args.integrator == "pt":
        controller = _make_pt_controller(
            args, bvh, camera, material_dicts
        )
    else:
        controller = GuiController(
            Scene(bvh),
            camera,
            (args.width, args.height),
            tile_size=args.tile_size,
            full_spp=args.full_spp,
        )
    run_tk(controller)
    return 0


def _make_pt_controller(args, bvh, camera, material_dicts):
    """Build a ProgressivePtController over the best available tracer."""
    import jax

    from minipath_tpu.render.wavefront import (
        make_pt_tracer,
        make_xla_tracer,
        render_frame_pt,
    )
    from minipath_tpu.scene.materials import lambertian, material_table

    table = material_table(
        material_dicts
        if material_dicts is not None
        else [lambertian((0.73, 0.73, 0.73))]
    )
    if jax.default_backend() == "cpu":
        tracer, tstate = make_xla_tracer(
            bvh.arrays, stack_size=bvh.recommended_stack_size, packet_size=256
        )
    else:
        try:
            tracer, tstate = make_pt_tracer(
                bvh.pt_scene,
                stack_size=bvh.recommended_stack_size,
                packet_size=2048,
            )
        except ValueError:
            # Scene past the f32 VMEM budget: quantized full kernel (the
            # same fallback policy as cli._render_pt).
            from minipath_tpu.render.wavefront import make_pallas_tracer

            tracer, tstate = make_pallas_tracer(
                bvh.pallas_scene,
                stack_size=bvh.recommended_stack_size,
                packet_size=2048,
            )
    w, h = args.width, args.height

    def make_frame(cam):
        sampler = cam.build_sampler((w, h))

        def frame(i):
            # Strata tile across accumulation passes in 64-pass rounds:
            # the spp-1 viewport passes then converge like a 64-way
            # stratified render instead of iid frames. The pairing seed
            # is per ROUND (shared by the 64 passes of one window, fresh
            # for the next — render/stratify.py).
            return np.asarray(render_frame_pt(
                tracer, tstate, table, sampler,
                jax.random.key(i),
                width=w, height=h, spp=1, bounces=5,
                px_block=(16, 16), samples_per_packet=1,
                strat_total=64, strat_offset=i % 64,
                strat_seed=(i // 64) * 0x9E37 + 17,
            ))

        return frame

    def make_aux(cam):
        # First-hit guide buffers for the display-side denoiser (one
        # coherent 1-spp trace per camera generation).
        from minipath_tpu.render.denoise import render_aux

        return render_aux(
            tracer, tstate, cam.build_sampler((w, h)), jax.random.key(0),
            width=w, height=h,
        )

    return ProgressivePtController(make_frame, camera, (w, h), make_aux)


if __name__ == "__main__":
    sys.exit(main())
