"""Shrinking property tests with a checked-in regression corpus.

The reference leans on proptest with committed shrunk failure seeds
(``/root/reference/proptest-regressions/``; SURVEY.md section 4):
round-trip bounds for the u16 quantization
(``compressed_geometry.rs:190-200``), full-range link encoding round trips
(``triangle_bvh/mod.rs:189-206``), exact-coverage tiling invariants
(``screen_block.rs:216-240``), and geometric postconditions for the
intersection kernels (``aabb.rs:374-411``). This file is the hypothesis
equivalent: every example hypothesis ever falsified is persisted under
``tests/hypothesis_corpus/`` (committed), so regressions replay first.

The committed corpus is opened READ-ONLY: it replays as the regression
seed set, while runtime example-DB writes (new shrunk failures, covering
examples hypothesis caches on every run) go to the gitignored
``tests/.hypothesis_runtime/`` — so a full test run leaves ``git status``
clean. To pin a new regression permanently, copy its file from the runtime
directory into ``hypothesis_corpus/`` and commit it.
"""

import os

import numpy as np
import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from hypothesis.database import (
    DirectoryBasedExampleDatabase,
    MultiplexedDatabase,
    ReadOnlyDatabase,
)

_HERE = os.path.dirname(os.path.abspath(__file__))
_CORPUS = os.path.join(_HERE, "hypothesis_corpus")
_RUNTIME = os.path.join(_HERE, ".hypothesis_runtime")
_SETTINGS = settings(
    database=MultiplexedDatabase(
        ReadOnlyDatabase(DirectoryBasedExampleDatabase(_CORPUS)),
        DirectoryBasedExampleDatabase(_RUNTIME),
    ),
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

finite_f32 = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, width=32
)
unit_f32 = st.floats(min_value=0.0, max_value=1.0, allow_nan=False, width=32)


class TestLinkEncoding:
    """Full-range round trips of the compressed node link
    (``triangle_bvh/mod.rs:189-206``)."""

    @_SETTINGS
    @given(index=st.integers(min_value=0, max_value=(1 << 28) - 2))
    def test_inner_roundtrip(self, index):
        from minipath_tpu.scene.bvh import links as L

        link = L.new_inner(index)
        assert L.is_inner(link)
        assert not L.is_leaf(link)
        assert not L.is_null(link)
        assert L.decode_index(link) == index

    @_SETTINGS
    @given(
        index=st.integers(min_value=0, max_value=(1 << 28) - 2),
        count=st.integers(min_value=1, max_value=7),
    )
    def test_leaf_roundtrip(self, index, count):
        from minipath_tpu.scene.bvh import links as L

        link = L.new_leaf(index, count)
        assert L.is_leaf(link)
        assert not L.is_inner(link)
        assert L.decode_index(link) == index
        assert L.decode_count(link) == count


class TestQuantization:
    """u16 round-trip bounds (``compressed_geometry.rs:20-56,190-200``)."""

    @_SETTINGS
    @given(x=st.lists(unit_f32, min_size=1, max_size=32))
    def test_unit_roundtrip_error(self, x):
        from minipath_tpu.scene.bvh.quantize import compress_unit, decompress_unit

        x = np.asarray(x, np.float32)
        got = decompress_unit(compress_unit(x, rounding="round"))
        assert np.all(np.abs(got - x) <= 0.5 / 65535 + 1e-7)

    @_SETTINGS
    @given(x=st.lists(unit_f32, min_size=1, max_size=32))
    def test_floor_ceil_bracket(self, x):
        """Conservative rounding must bracket the exact value — the
        round-out invariant that keeps lossy boxes containing their
        geometry (``compress_round_out``, ``:122-131``)."""
        from minipath_tpu.scene.bvh.quantize import compress_unit, decompress_unit

        x = np.asarray(x, np.float32)
        lo = decompress_unit(compress_unit(x, rounding="floor"))
        hi = decompress_unit(compress_unit(x, rounding="ceil"))
        assert np.all(lo <= x + 1e-7)
        assert np.all(hi >= x - 1e-7)

    @_SETTINGS
    @given(
        data=st.lists(
            st.tuples(finite_f32, finite_f32, finite_f32), min_size=3, max_size=24
        ),
        span=st.floats(min_value=1e-3, max_value=1e5, allow_nan=False),
    )
    def test_child_box_containment(self, data, span):
        """Quantized child boxes must CONTAIN the originals (round-out)."""
        from minipath_tpu.scene.bvh.quantize import (
            compress_child_boxes,
            decompress_child_boxes,
        )

        pts = np.asarray(data, np.float32).reshape(-1, 3)
        n = min(8, len(pts) // 3)
        if n == 0:
            return
        tri = pts[: n * 3].reshape(n, 3, 3) * np.float32(span / 1e5)
        cmin = np.zeros((1, 8, 3), np.float32)
        cmax = np.zeros((1, 8, 3), np.float32)
        cmin[0, :n] = tri.min(axis=1)
        cmax[0, :n] = tri.max(axis=1)
        valid = np.zeros((1, 8), bool)
        valid[0, :n] = True
        qb = compress_child_boxes(cmin, cmax, valid=valid)
        dmin, dmax = decompress_child_boxes(qb)
        tol = 1e-5 * (1 + np.abs(cmin[0, :n])) + 1e-4 * np.abs(
            qb.box_size[0]
        )
        assert np.all(dmin[0, :n] <= cmin[0, :n] + tol)
        assert np.all(dmax[0, :n] >= cmax[0, :n] - tol)

    @_SETTINGS
    @given(
        n=st.lists(
            st.tuples(finite_f32, finite_f32, finite_f32), min_size=1, max_size=16
        )
    )
    def test_normal_i8_roundtrip(self, n):
        from minipath_tpu.scene.bvh.quantize import (
            compress_normals_i8,
            decompress_normals_i8,
        )

        v = np.asarray(n, np.float32)
        norm = np.linalg.norm(v, axis=-1, keepdims=True)
        v = np.where(norm > 1e-6, v / np.maximum(norm, 1e-6), 0.0).astype(np.float32)
        got = decompress_normals_i8(compress_normals_i8(v))
        assert np.all(np.abs(got - v) <= 1.0 / 127 + 1e-6)


class TestSlabPostconditions:
    """Random ray-vs-box geometric postconditions (``aabb.rs:374-411``)."""

    @_SETTINGS
    @given(
        box=st.tuples(*[finite_f32] * 6),
        origin=st.tuples(*[finite_f32] * 3),
        direction=st.tuples(
            *[st.floats(min_value=-1, max_value=1, allow_nan=False, width=32)] * 3
        ),
    )
    def test_entry_point_on_or_in_box(self, box, origin, direction):
        import jax.numpy as jnp

        from minipath_tpu.geometry.aabb import slab_test

        b = np.asarray(box, np.float32).reshape(2, 3)
        bmin, bmax = np.minimum(b[0], b[1]), np.maximum(b[0], b[1])
        d = np.asarray(direction, np.float32)
        if np.linalg.norm(d) < 1e-3:
            return
        d = d / np.linalg.norm(d)
        o = np.asarray(origin, np.float32)
        inv = np.where(d == 0, np.inf, 1.0 / d).astype(np.float32)
        t1, t2 = slab_test(
            jnp.asarray(bmin), jnp.asarray(bmax), jnp.asarray(o), jnp.asarray(inv),
            jnp.float32(np.inf),
        )
        t1, t2 = float(t1), float(t2)
        if t1 <= t2:  # hit: entry point must lie on/in the (padded) box
            p = o + np.maximum(t1, 0.0) * d
            # f32 roundoff in ``p = o + t*d`` scales with the OVERALL
            # magnitude of the computation (|t| and the largest coordinate),
            # not per-component: a huge x-extent box hit at t~5e4 produces
            # ~1e-3 absolute error in a DEGENERATE z slab (hypothesis corpus
            # 0ee5646ef5ec9521). Pad with a single max-norm-scaled scalar.
            scale = 1.0 + np.max(np.abs(bmax - bmin)) + np.max(np.abs(p)) + abs(t1)
            pad = 1e-4 * scale
            assert np.all(p >= bmin - pad) and np.all(p <= bmax + pad)

    @_SETTINGS
    @given(
        box=st.tuples(*[finite_f32] * 6),
        origin=st.tuples(*[finite_f32] * 3),
    )
    def test_ray_from_inside_hits(self, box, origin):
        import jax.numpy as jnp

        from minipath_tpu.geometry.aabb import slab_test

        b = np.asarray(box, np.float32).reshape(2, 3)
        bmin, bmax = np.minimum(b[0], b[1]), np.maximum(b[0], b[1])
        if np.any(bmax - bmin < 1e-3):
            return
        o = bmin + 0.5 * (bmax - bmin)
        d = np.asarray([1.0, 0.0, 0.0], np.float32)
        inv = np.where(d == 0, np.inf, 1.0 / d).astype(np.float32)
        t1, t2 = slab_test(
            jnp.asarray(bmin), jnp.asarray(bmax), jnp.asarray(o), jnp.asarray(inv),
            jnp.float32(np.inf),
        )
        assert float(t1) <= float(t2)


class TestTiling:
    """Exact-coverage tiling invariants (``screen_block.rs:216-240``)."""

    @_SETTINGS
    @given(
        w=st.integers(min_value=1, max_value=300),
        h=st.integers(min_value=1, max_value=300),
        tile=st.integers(min_value=1, max_value=97),
    )
    def test_tiles_cover_exactly(self, w, h, tile):
        from minipath_tpu.screen_block import ScreenBlock

        screen = ScreenBlock.with_size((0, 0), (w, h))
        tiles = screen.tile_ordering(tile, rng=np.random.default_rng(0))
        seen = np.zeros((h, w), np.int32)
        for t in tiles:
            x0, y0 = int(t.min[0]), int(t.min[1])
            x1, y1 = int(t.max[0]), int(t.max[1])
            assert 0 <= x0 < x1 <= w and 0 <= y0 < y1 <= h
            seen[y0:y1, x0:x1] += 1
        assert np.all(seen == 1)

    @_SETTINGS
    @given(
        w=st.integers(min_value=1, max_value=64),
        h=st.integers(min_value=1, max_value=64),
    )
    def test_internal_points_exact(self, w, h):
        from minipath_tpu.screen_block import ScreenBlock

        block = ScreenBlock.with_size((3, 5), (w, h))
        pts = list(block.internal_points())
        assert len(pts) == w * h == block.area()
        assert len(set(pts)) == len(pts)


class TestMorton:
    """The compaction sort's Morton interleave is a bijection on cells."""

    @_SETTINGS
    @given(
        cells=st.lists(
            st.tuples(
                st.integers(0, 15), st.integers(0, 15), st.integers(0, 15)
            ),
            min_size=1,
            max_size=64,
        )
    )
    def test_morton16_bijective(self, cells):
        import jax.numpy as jnp

        from minipath_tpu.render.wavefront import _morton16

        c = jnp.asarray(np.asarray(cells, np.int32))
        codes = np.asarray(_morton16(c))
        assert np.all(codes >= 0) and np.all(codes < 4096)
        # Injective: distinct cells map to distinct codes.
        uniq_cells = len(set(map(tuple, np.asarray(cells).tolist())))
        assert len(set(codes.tolist())) == uniq_cells


class TestStratification:
    """Tiling invariants of the stratified-sampling layer
    (render/stratify.py) under arbitrary spp, pixel ids, and pairing
    seeds — the properties the unbiasedness argument rests on."""

    @_SETTINGS
    @given(
        spp=st.integers(min_value=1, max_value=64),
        pid=st.integers(min_value=0, max_value=(1 << 31) - 1),
        seed=st.integers(min_value=0, max_value=(1 << 31) - 1),
        salt=st.integers(min_value=0, max_value=1 << 13),
    )
    def test_strat1d_tiles_any_window(self, spp, pid, seed, salt):
        import jax
        import jax.numpy as jnp

        from minipath_tpu.render.stratify import strat1d

        s = jnp.arange(spp, dtype=jnp.int32)
        u = jax.random.uniform(jax.random.key(seed), (spp,))
        vals = np.asarray(
            strat1d(u, s, jnp.int32(pid ^ seed), spp, salt=salt)
        )
        assert (vals >= 0.0).all() and (vals < 1.0).all()
        strata = sorted(np.floor(vals * spp).astype(int).tolist())
        assert strata == list(range(spp))

    @_SETTINGS
    @given(
        spp=st.integers(min_value=1, max_value=36),
        pid=st.integers(min_value=0, max_value=(1 << 31) - 1),
        seed=st.integers(min_value=0, max_value=(1 << 31) - 1),
        salt=st.integers(min_value=0, max_value=1 << 13),
    )
    def test_strat2d_tiles_any_grid(self, spp, pid, seed, salt):
        import jax
        import jax.numpy as jnp

        from minipath_tpu.render.stratify import grid_factor, strat2d

        gx, gy = grid_factor(spp)
        assert gx * gy == spp and gx >= gy >= 1
        s = jnp.arange(spp, dtype=jnp.int32)
        k1, k2 = jax.random.split(jax.random.key(seed))
        u1 = jax.random.uniform(k1, (spp,))
        u2 = jax.random.uniform(k2, (spp,))
        v1, v2 = strat2d(u1, u2, s, jnp.int32(pid ^ seed), spp, salt=salt)
        v1, v2 = np.asarray(v1), np.asarray(v2)
        assert (v1 >= 0).all() and (v1 < 1).all()
        assert (v2 >= 0).all() and (v2 < 1).all()
        cells = sorted(
            (np.floor(v1 * gx).astype(int) * gy
             + np.floor(v2 * gy).astype(int)).tolist()
        )
        assert cells == list(range(spp))
