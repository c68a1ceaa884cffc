"""Render scheduler and progress control.

Behavioral counterpart of ``/root/reference/src/renderer/machinery.rs``. The
reference spins one pinned OS thread per core pulling 64-px tiles off an
atomic cursor; here one *driver thread* streams tiles to the accelerator —
the TPU itself is the parallel machine, so tile-level parallelism becomes
batched packets inside one device dispatch, and the host thread exists only
to pipeline dispatches and stream results back progressively.

``render()`` keeps the reference's non-blocking contract and the full
``RenderProgress`` surface (``machinery.rs:125-178``): ``progress()``,
``is_finished()``, ``elapsed()``, ``abort()`` (cooperative — running tiles
finish, new ones don't start), ``wait()``, ``image()``.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from minipath_tpu.camera import Camera
from minipath_tpu.render import integrator
from minipath_tpu.scene import Scene
from minipath_tpu.scene.primitives import Sphere
from minipath_tpu.scene.triangle_bvh import TriangleBvh
from minipath_tpu.screen_block import ScreenBlock
from minipath_tpu.utils.image import color_to_image

# Pixel-block shape of one traversal packet (coherent rays). 16x16 = 256 rays.
PACKET_SHAPE = (16, 16)


@dataclass(frozen=True)
class RenderSettings:
    """Counterpart of ``renderer/mod.rs:8-13``. ``resolution`` is (w, h)."""

    tile_size: int
    sample_count: int
    resolution: tuple

    def __post_init__(self):
        assert self.tile_size >= 1
        assert self.sample_count >= 1


@dataclass
class RenderProgressSnapshot:
    finished: int
    total: int

    def percent(self) -> float:
        return 100.0 * self.finished / self.total if self.total else 100.0


class _RenderState:
    def __init__(self, image: np.ndarray, tiles: list):
        self.image = image
        self.image_lock = threading.Lock()
        self.tiles = tiles
        self.finished_count = 0
        self.abort_flag = threading.Event()
        self.start_time = time.monotonic()
        self.end_time: float | None = None


class RenderProgress:
    """Handle to an in-flight render (``machinery.rs:125-178``)."""

    def __init__(self, state: _RenderState, thread: threading.Thread):
        self._state = state
        self._thread = thread

    def progress(self) -> RenderProgressSnapshot:
        return RenderProgressSnapshot(
            finished=self._state.finished_count, total=len(self._state.tiles)
        )

    def is_finished(self) -> bool:
        return not self._thread.is_alive()

    def elapsed(self) -> float:
        """Seconds since render start; stops counting when finished."""
        end = self._state.end_time
        return (end if end is not None else time.monotonic()) - self._state.start_time

    def abort(self) -> None:
        """Cooperative abort: in-flight tiles finish, no new tiles start."""
        self._state.abort_flag.set()

    def wait(self) -> None:
        self._thread.join()

    def image(self) -> np.ndarray:
        """Snapshot of the (possibly partial) RGBA uint8 image."""
        with self._state.image_lock:
            return self._state.image.copy()


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def render(
    scene: Scene,
    camera: Camera,
    settings: RenderSettings,
    started_tile_callback=None,
    finished_tile_callback=None,
    *,
    seed: int = 0,
    samples_per_pass: int | None = None,
    tile_rng=None,
) -> RenderProgress:
    """Start rendering; returns immediately with a :class:`RenderProgress`.

    Callbacks fire on the driver thread: ``started_tile_callback(tile)`` and
    ``finished_tile_callback(tile, snapshot)`` with a
    :class:`RenderProgressSnapshot`, mirroring ``machinery.rs:75,93-99``.
    """
    width, height = settings.resolution
    # The render dispatch shape is padded up to packet multiples; edge tiles
    # are cropped on write-back so there is exactly ONE compiled program.
    tile_shape = (
        _round_up(settings.tile_size, PACKET_SHAPE[0]),
        _round_up(settings.tile_size, PACKET_SHAPE[1]),
    )

    screen = ScreenBlock.with_size((0, 0), (width, height))
    tiles = screen.tile_ordering(settings.tile_size, rng=tile_rng)
    image = np.zeros((height, width, 4), np.uint8)
    state = _RenderState(image, tiles)

    obj = scene.object
    spp_total = settings.sample_count
    spp_pass = min(samples_per_pass or 32, spp_total)

    if isinstance(obj, TriangleBvh):
        bvh_arrays = obj.arrays
        stack_size = obj.recommended_stack_size

        def tile_sum(origin, key, spp):
            return integrator.render_tile_sum_bvh(
                bvh_arrays,
                sampler,
                origin,
                key,
                tile_shape=tile_shape,
                packet_shape=PACKET_SHAPE,
                spp=spp,
                stack_size=stack_size,
            )

    elif isinstance(obj, Sphere):

        def tile_sum(origin, key, spp):
            return integrator.render_tile_sum_sphere(
                obj,
                sampler,
                origin,
                key,
                tile_shape=tile_shape,
                packet_shape=PACKET_SHAPE,
                spp=spp,
            )

    else:
        raise TypeError(f"Unsupported scene object: {type(obj)!r}")

    sampler = camera.build_sampler(settings.resolution)
    base_key = jax.random.key(seed)

    def driver():
        try:
            for tile_index, tile in enumerate(tiles):
                if state.abort_flag.is_set():
                    break
                if started_tile_callback is not None:
                    started_tile_callback(tile)

                origin = jnp.asarray(tile.min, jnp.float32)
                tile_key = jax.random.fold_in(base_key, tile_index)
                acc = None
                done = 0
                while done < spp_total:
                    n = min(spp_pass, spp_total - done)
                    pass_key = jax.random.fold_in(tile_key, done)
                    part = tile_sum(origin, pass_key, n)
                    acc = part if acc is None else acc + part
                    done += n
                mean = np.asarray(acc) / spp_total  # (th, tw, 4)

                x0, y0 = int(tile.min[0]), int(tile.min[1])
                x1, y1 = int(tile.max[0]), int(tile.max[1])
                tile_u8 = color_to_image(mean[: y1 - y0, : x1 - x0])
                with state.image_lock:
                    state.image[y0:y1, x0:x1] = tile_u8
                state.finished_count += 1

                if finished_tile_callback is not None:
                    finished_tile_callback(
                        tile,
                        RenderProgressSnapshot(
                            finished=state.finished_count, total=len(tiles)
                        ),
                    )
        finally:
            state.end_time = time.monotonic()

    thread = threading.Thread(target=driver, name="minipath-render-driver", daemon=True)
    thread.start()
    return RenderProgress(state, thread)
