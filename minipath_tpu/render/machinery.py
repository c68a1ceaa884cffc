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
from functools import partial

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
from minipath_tpu.utils.profiling import PhaseTimers

# Pixel-block shape of one traversal packet (coherent rays). 16x16 = 256 rays.
PACKET_SHAPE = (16, 16)


# The small device programs around the integrator live at MODULE level:
# a fresh ``@jax.jit`` closure inside every ``render()`` call would miss
# jit's function-identity cache and recompile per render — measured 13 s
# of pure recompile per frame through the remote-TPU tunnel on the
# criterion teapot (vs 39 ms dispatch once hoisted). Interactive callers
# (the GUI re-renders on every navigation) pay this on every frame.


@partial(jax.jit, static_argnames=("spp",))
def _finalize_u8(acc, *, spp: int):
    # Mean + u8 conversion on device: fetching u8 quarters the
    # device->host bytes (the tunnel roundtrip dominates small batches).
    # Stays RGBA (…, 4): a trailing dim of 4 packs each pixel into one
    # 32-bit word, which is what keeps the frame-mode tile scatter fast
    # (measured: dispatch 54 ms RGBA, ~2.3 s channel-major (2, …), 7 s
    # trailing (…, 2) u8). The wire slimming happens in _repack_va at
    # the fetch boundary instead.
    mean = acc / spp
    return jnp.clip(jnp.round(mean * 255.0), 0.0, 255.0).astype(jnp.uint8)


@jax.jit
def _repack_va(rgba_u8):
    # The parity integrator is grayscale (R=G=B — worker.rs:51-65), so
    # only (value, alpha) cross the wire: 2 bytes/px instead of 4,
    # halving the fetch that bounds the criterion workload (BENCH_teapot
    # phase timers). Bitcasting (…, 4) u8 -> (…) u32 and masking keeps
    # this elementwise on the VPU — no u8 gather/scatter with a short
    # minor dim (the layouts that measured 40-130x slower above).
    # Channel-major (2, …) output so the minor dim stays wide.
    words = jax.lax.bitcast_convert_type(rgba_u8, jnp.uint32)
    value = (words & 0xFF).astype(jnp.uint8)  # R = byte 0 (LSB)
    alpha = (words >> 24).astype(jnp.uint8)  # A = byte 3 (MSB)
    return jnp.stack([value, alpha], axis=0)


@partial(jax.jit, static_argnames=("th", "tw"))
def _place_tiles(frame, tiles_u8, origins_xy, *, th: int, tw: int):
    # One scatter for the whole batch (an unrolled dynamic_update_slice
    # per tile would explode compile time at frame-mode batch sizes).
    # Duplicate padded tiles carry identical content, so overlapping
    # writes are benign. The frame stays RGBA: the (…, 4) u8 minor dim
    # scatters as one 32-bit word per pixel (54 ms; 40-130x faster than
    # any 2-wide or channel-major u8 layout — see _finalize_u8).
    yy = origins_xy[:, 1, None, None] + jnp.arange(th)[None, :, None]
    xx = origins_xy[:, 0, None, None] + jnp.arange(tw)[None, None, :]
    return frame.at[yy, xx].set(tiles_u8)


def _expand_va(va: np.ndarray) -> np.ndarray:
    """(2, …) u8 channel-major value+alpha wire format -> (…, 4) RGBA."""
    out = np.empty(va.shape[1:] + (4,), np.uint8)
    out[..., 0:3] = va[0][..., None]
    out[..., 3] = va[1]
    return out


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
        self.timers = PhaseTimers()
        # Frame mode (no tile callbacks): tiles accumulate into this device
        # buffer and the host fetches ONE image at the end instead of one
        # batch of tiles per dispatch (the device->host tunnel, not compute,
        # bounds the reference criterion workload — BENCH_teapot.json).
        self.frame_dev = None
        self.frame_fetch = None  # callable fetching frame_dev into .image


class RenderProgress:
    """Handle to an in-flight render (``machinery.rs:125-178``)."""

    def __init__(
        self, state: _RenderState, thread: threading.Thread, spp_effective: int
    ):
        self._state = state
        self._thread = thread
        #: Samples actually rendered per pixel. ``sample_count`` is rounded
        #: up to a whole number of equal compiled passes (one Mosaic program
        #: per render), so this can exceed ``RenderSettings.sample_count``;
        #: the mean image stays unbiased either way.
        self.spp_effective = spp_effective

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
        fetch = self._state.frame_fetch
        if fetch is not None:
            fetch()  # frame mode: pull the device buffer down first
        with self._state.image_lock:
            return self._state.image.copy()

    def timings(self) -> PhaseTimers:
        """Per-phase wall-clock accumulators (dispatch / fetch)."""
        return self._state.timers


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
    backend: str = "auto",
    mesh=None,
) -> RenderProgress:
    """Start rendering; returns immediately with a :class:`RenderProgress`.

    Callbacks fire on the driver thread: ``started_tile_callback(tile)`` and
    ``finished_tile_callback(tile, snapshot)`` with a
    :class:`RenderProgressSnapshot`, mirroring ``machinery.rs:75,93-99``.

    ``backend``: "pallas" (TPU kernel), "xla" (portable engine), or "auto"
    (pallas on accelerators, xla on CPU).

    ``mesh``: an optional 1-D ``jax.sharding.Mesh``; tile batches are then
    sharded across its devices with ``shard_map`` (scene replicated, tiles
    split). Per-tile RNG keys are derived from GLOBAL tile indices, so the
    sharded render produces bit-identical images to the single-device one.
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
    # Equal-size sample passes: every pass compiles to the SAME program
    # (per-config Mosaic compiles cost minutes, so one config only).
    max_pass = samples_per_pass or 32
    n_passes = -(-spp_total // max_pass)
    spp_pass = -(-spp_total // n_passes)
    # Rounds the effective sample count up to n_passes * spp_pass.
    spp_effective = n_passes * spp_pass

    if backend == "auto":
        backend = "xla" if jax.default_backend() == "cpu" else "pallas"

    if isinstance(obj, TriangleBvh):
        stack_size = obj.recommended_stack_size
        if backend == "pallas":
            pallas_scene = obj.pallas_scene

            def tile_batch(origins, indices, key, spp):
                return integrator.render_tile_batch_bvh_pallas(
                    pallas_scene,
                    sampler,
                    origins,
                    indices,
                    key,
                    tile_shape=tile_shape,
                    packet_shape=PACKET_SHAPE,
                    spp=spp,
                    stack_size=stack_size,
                )

        else:
            bvh_arrays = obj.arrays

            def tile_batch(origins, indices, key, spp):
                return integrator.render_tile_batch_bvh_xla(
                    bvh_arrays,
                    sampler,
                    origins,
                    indices,
                    key,
                    tile_shape=tile_shape,
                    packet_shape=PACKET_SHAPE,
                    spp=spp,
                    stack_size=stack_size,
                )

    elif isinstance(obj, Sphere):

        def tile_batch(origins, indices, key, spp):
            return integrator.render_tile_batch_sphere(
                obj,
                sampler,
                origins,
                indices,
                key,
                tile_shape=tile_shape,
                packet_shape=PACKET_SHAPE,
                spp=spp,
            )

    else:
        raise TypeError(f"Unsupported scene object: {type(obj)!r}")

    sampler = camera.build_sampler(settings.resolution)
    base_key = jax.random.key(seed)

    # With no tile callbacks nobody observes per-tile progress, so frame
    # mode also batches as many tiles as memory allows per dispatch — every
    # dispatch costs host/tunnel latency that dwarfs the compute at this
    # workload size (BENCH_teapot phase timers).
    frame_mode = started_tile_callback is None and finished_tile_callback is None
    dispatch_cap = 1024 if frame_mode else 64
    tiles_per_dispatch = max(1, min(dispatch_cap, len(tiles)))
    if mesh is not None:
        # Shard each dispatch's tile batch over the device mesh: replicated
        # scene (closed over), tiles split on the batch dim. This is the
        # chip-level analog of the reference's per-core tile pulling
        # (machinery.rs:31-62,205-210) with static instead of dynamic
        # assignment.
        from jax.sharding import PartitionSpec as P

        ax = mesh.axis_names[0]
        n_dev = int(mesh.devices.size)
        tiles_per_dispatch = -(-tiles_per_dispatch // n_dev) * n_dev
        inner_tile_batch = tile_batch
        _sharded_cache = {}

        def tile_batch(origins, indices, key, spp):
            if spp not in _sharded_cache:

                def local(o, i, k):
                    return inner_tile_batch(o, i, k, spp)

                _sharded_cache[spp] = jax.jit(
                    jax.shard_map(
                        local,
                        mesh=mesh,
                        in_specs=(P(ax), P(ax), P()),
                        out_specs=P(ax),
                        check_vma=False,
                    )
                )
            return _sharded_cache[spp](origins, indices, key)

    def finalize_u8(acc):
        return _finalize_u8(acc, spp=spp_effective)

    def compute_batch(batch_start):
        batch = tiles[batch_start : batch_start + tiles_per_dispatch]
        origins = np.array([t.min for t in batch], np.float32)
        indices = np.arange(batch_start, batch_start + len(batch), dtype=np.int32)
        # Pad the last batch to the compiled batch size.
        pad = tiles_per_dispatch - len(batch)
        if pad:
            origins = np.concatenate([origins, np.tile(origins[-1:], (pad, 1))])
            indices = np.concatenate([indices, np.full(pad, indices[-1], np.int32)])
        acc = None
        with state.timers.phase("dispatch"):
            for p in range(n_passes):
                part = tile_batch(
                    jnp.asarray(origins),
                    jnp.asarray(indices),
                    jax.random.fold_in(base_key, p),
                    spp_pass,
                )
                acc = part if acc is None else acc + part
        # Device u8 RGBA (K, th, tw, 4); fetched 2-channel (tile mode) or
        # placed into the device frame (frame mode) later.
        return batch, finalize_u8(acc), origins

    def write_batch(batch, acc_u8, origins=None):
        with state.timers.phase("fetch"):
            # single 2-ch fetch: (2, K, th, tw) wire -> (K, th, tw, 4)
            tiles_u8 = _expand_va(np.asarray(_repack_va(acc_u8)))
        for tile, tile_img in zip(batch, tiles_u8):
            x0, y0 = int(tile.min[0]), int(tile.min[1])
            x1, y1 = int(tile.max[0]), int(tile.max[1])
            with state.image_lock:
                state.image[y0:y1, x0:x1] = tile_img[: y1 - y0, : x1 - x0]
            state.finished_count += 1
            if finished_tile_callback is not None:
                finished_tile_callback(
                    tile,
                    RenderProgressSnapshot(
                        finished=state.finished_count, total=len(tiles)
                    ),
                )

    # Frame mode: tiles are placed into a device frame buffer (one fused
    # dynamic_update_slice program per batch) and the host fetches the
    # frame ONCE — the tunnel roundtrips per batch disappear.
    if frame_mode:
        th, tw = tile_shape
        state.frame_dev = jnp.zeros((height + th, width + tw, 4), jnp.uint8)

        def place_tiles(frame, tiles_u8, origins_xy):
            return _place_tiles(frame, tiles_u8, origins_xy, th=th, tw=tw)

        def fetch_frame():
            frame = state.frame_dev
            if frame is None:
                return
            with state.timers.phase("fetch"):
                full = _expand_va(np.asarray(_repack_va(frame)))
            with state.image_lock:
                state.image[:, :] = full[:height, :width]

        state.frame_fetch = fetch_frame

        def place_batch(batch, acc_u8, origins):
            with state.timers.phase("dispatch"):
                state.frame_dev = place_tiles(
                    state.frame_dev, acc_u8, jnp.asarray(origins, jnp.int32)
                )
            state.finished_count += len(batch)

    def driver():
        try:
            pending = None  # (batch, device acc) — double buffer
            for start in range(0, len(tiles), tiles_per_dispatch):
                if state.abort_flag.is_set():
                    break
                batch = tiles[start : start + tiles_per_dispatch]
                if started_tile_callback is not None:
                    for t in batch:
                        started_tile_callback(t)
                current = compute_batch(start)  # async dispatch
                if frame_mode:
                    place_batch(*current)
                elif pending is not None:
                    write_batch(*pending)  # fetch previous while current runs
                if not frame_mode:
                    pending = current
            # Already-dispatched work still lands, mirroring the reference's
            # abort semantics (running tiles finish; machinery.rs:161-165).
            if pending is not None:
                write_batch(*pending)
            if frame_mode:
                fetch_frame()
        finally:
            state.end_time = time.monotonic()

    thread = threading.Thread(target=driver, name="minipath-render-driver", daemon=True)
    thread.start()
    return RenderProgress(state, thread, spp_effective)
