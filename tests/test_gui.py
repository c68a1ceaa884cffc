"""Headless tests of the GUI controller state machine (no display).

The controller's renderer is stubbed with an instant fake so these tests
exercise only the GUI logic (escalation, tile streaming, camera moves,
cancellation); the real render machinery is covered by test_render.py.
"""

import threading
import time

import numpy as np
import pytest

import minipath_tpu.gui as gui_mod
from minipath_tpu.camera import Camera
from minipath_tpu.gui import GuiController
from minipath_tpu.render.machinery import RenderProgressSnapshot
from minipath_tpu.scene import Scene
from minipath_tpu.screen_block import ScreenBlock


class FakeProgress:
    """Mimics RenderProgress: renders tiles on a thread via callbacks."""

    def __init__(self, settings, started_cb, finished_cb, delay=0.005):
        w, h = settings.resolution
        self.image_arr = np.zeros((h, w, 4), np.uint8)
        self.spp = settings.sample_count
        screen = ScreenBlock.with_size((0, 0), (w, h))
        self.tiles = screen.tile_ordering(settings.tile_size, rng=np.random.default_rng(0))
        self.finished = 0
        self._abort = threading.Event()

        def run():
            for i, tile in enumerate(self.tiles):
                if self._abort.is_set():
                    break
                if started_cb:
                    started_cb(tile)
                time.sleep(delay)
                x0, y0 = tile.min
                x1, y1 = tile.max
                self.image_arr[y0:y1, x0:x1] = (128, 128, 128, 255)
                self.finished = i + 1
                if finished_cb:
                    finished_cb(tile, RenderProgressSnapshot(i + 1, len(self.tiles)))

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def progress(self):
        return RenderProgressSnapshot(self.finished, len(self.tiles))

    def is_finished(self):
        return not self._thread.is_alive()

    def abort(self):
        self._abort.set()

    def wait(self):
        self._thread.join()

    def image(self):
        return self.image_arr.copy()


@pytest.fixture(autouse=True)
def fake_render(monkeypatch):
    calls = []

    def render(scene, camera, settings, started_tile_callback=None, finished_tile_callback=None, **kw):
        calls.append(settings)
        return FakeProgress(settings, started_tile_callback, finished_tile_callback)

    monkeypatch.setattr(gui_mod, "render", render)
    yield calls


def _controller(w=64, h=64, tile=32):
    camera = Camera().look_at((0, 0, 4), (0, 0, 0))
    return GuiController(Scene(object()), camera, (w, h), tile_size=tile)


def _pump(c, timeout=10.0, until=None):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        c.update()
        if until is not None and until():
            return True
        time.sleep(0.01)
    return False


def test_preview_escalates_to_full(fake_render):
    c = _controller()
    c.start()
    assert c.mode == "preview"
    assert fake_render[-1].sample_count == GuiController.PREVIEW_SPP
    assert _pump(c, until=lambda: c.mode == "full"), "never escalated to full"
    assert fake_render[-1].sample_count == c.full_spp  # gui.rs:216-224
    assert _pump(c, until=lambda: c.progress.is_finished())
    c.update()
    assert c.image[..., 3].max() == 255
    c.shutdown()


def test_camera_move_restarts_preview(fake_render):
    c = _controller()
    c.start()
    _pump(c, until=lambda: c.mode == "full")
    before = c.camera
    c.move_camera(1.0, 0.0, 0.0)
    assert c.mode == "preview"
    assert fake_render[-1].sample_count == GuiController.PREVIEW_SPP
    center_before, *_ = before.center_forward_up_right()
    center_after, *_ = c.camera.center_forward_up_right()
    np.testing.assert_allclose(center_after - center_before, [1, 0, 0], atol=1e-6)
    c.shutdown()


def test_display_image_composites():
    c = _controller()
    img = c.display_image()  # all transparent -> checkerboard
    assert img.shape == (64, 64, 4)
    vals = np.unique(img[..., 0])
    assert len(vals) == 2  # two checker grays
    c.in_progress_tiles.append(ScreenBlock((0, 0), (32, 32)))
    img2 = c.display_image()
    assert (img2[0, :32, :3] == (255, 0, 0)).all()
    c.shutdown()


def test_cancel_drains_queue():
    c = _controller()
    c.start()
    time.sleep(0.05)
    c.cancel_previous_render()
    assert c.pending.empty()
    assert c.progress is None
    c.shutdown()


def test_in_progress_tiles_tracked():
    c = _controller()
    c.start()
    # While rendering, some tiles should appear as in-progress then clear.
    saw_in_progress = _pump(c, until=lambda: len(c.in_progress_tiles) > 0)
    assert saw_in_progress
    _pump(c, until=lambda: c.mode == "full" and c.progress.is_finished())
    c.update()
    assert c.in_progress_tiles == []
    c.shutdown()


class TestProgressivePt:
    """ProgressivePtController with a fake frame function."""

    def _controller(self, w=8, h=6):
        from minipath_tpu.gui import ProgressivePtController

        calls = {"made": 0}

        def make_frame(camera):
            calls["made"] += 1
            gen = calls["made"]

            def frame(i):
                time.sleep(0.002)
                # Distinguishable constant per generation; mean over chunks
                # of one generation equals that constant.
                return np.full((h, w, 4), 0.25 * gen, np.float32)

            return frame

        cam = Camera().look_at((0, 0, 5), (0, 0, 0))
        c = ProgressivePtController(make_frame, cam, (w, h))
        return c, calls

    def test_accumulates_and_displays_mean(self):
        c, calls = self._controller()
        c.start()
        deadline = time.time() + 20
        while c.samples() < 3 and time.time() < deadline:
            time.sleep(0.01)
        assert c.samples() >= 3
        assert c.update() is True
        img = c.display_image()
        assert img.shape == (6, 8, 3) and img.dtype == np.uint8
        # Mean of constant 0.25 frames -> gamma(0.25)*255.
        want = int(0.25 ** (1 / 2.2) * 255 + 0.5)
        assert abs(int(img[0, 0, 0]) - want) <= 1
        c.shutdown()

    def test_camera_move_restarts_accumulation(self):
        c, calls = self._controller()
        c.start()
        deadline = time.time() + 20
        while c.samples() < 2 and time.time() < deadline:
            time.sleep(0.01)
        old_cam = c.camera
        c.move_camera(1.0, 0.0, 0.0)
        # Accumulation restarts with a new frame function + moved camera.
        deadline = time.time() + 20
        while (calls["made"] < 2 or c.samples() < 1) and time.time() < deadline:
            time.sleep(0.01)
        assert calls["made"] >= 2
        assert c.camera is not old_cam
        img = c.display_image()
        want = int(0.5 ** (1 / 2.2) * 255 + 0.5)  # generation 2 constant
        assert abs(int(img[0, 0, 0]) - want) <= 1
        c.shutdown()

    def test_display_denoise_blend(self):
        # With make_aux given, early-pass display goes through the
        # edge-avoiding denoiser. On a constant image the filter is an
        # identity (all neighbor diffs are 0), so the displayed value must
        # match the raw mean regardless of the blend weight — this checks
        # the aux wiring and the blend math don't corrupt the image.
        import jax.numpy as jnp

        from minipath_tpu.gui import ProgressivePtController

        w, h = 8, 6

        def make_frame(camera):
            def frame(i):
                time.sleep(0.002)
                return np.full((h, w, 4), 0.25, np.float32)

            return frame

        def make_aux(camera):
            n = jnp.zeros((h, w, 3), jnp.float32).at[..., 1].set(1.0)
            z = jnp.full((h, w), 3.0, jnp.float32)
            return n, z

        cam = Camera().look_at((0, 0, 5), (0, 0, 0))
        c = ProgressivePtController(make_frame, cam, (w, h), make_aux)
        c.start()
        deadline = time.time() + 30
        while c.samples() < 2 and time.time() < deadline:
            time.sleep(0.01)
        assert c.samples() >= 2  # < 64 passes -> denoise branch active
        img = c.display_image()
        want = int(0.25 ** (1 / 2.2) * 255 + 0.5)
        assert abs(int(img[0, 0, 0]) - want) <= 1
        assert abs(int(img[h // 2, w // 2, 0]) - want) <= 1
        c.shutdown()

    def test_update_reports_new_samples_only(self):
        c, _ = self._controller()
        assert c.update() is False  # nothing yet
        c.start()
        deadline = time.time() + 20
        while c.samples() < 1 and time.time() < deadline:
            time.sleep(0.01)
        assert c.update() is True
        assert c.update() in (True, False)  # second call only if new frames
        c.shutdown()
