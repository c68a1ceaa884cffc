"""Screen block tests: the coverage invariants from the reference's property
tests (``/root/reference/src/screen_block.rs:216-240``) — every pixel exactly
once, tiles disjoint and covering.
"""

import numpy as np

from minipath_tpu.screen_block import ScreenBlock, divide_range


class TestInternalPoints:
    def test_every_pixel_exactly_once(self, rng):
        for _ in range(20):
            x0, y0 = rng.integers(0, 50, 2)
            w, h = rng.integers(0, 30, 2)
            block = ScreenBlock.with_size((x0, y0), (w, h))
            pts = list(block.internal_points())
            assert len(pts) == block.area()
            assert len(set(pts)) == len(pts)
            for p in pts:
                assert block.contains(p)

    def test_row_major_order(self):
        block = ScreenBlock((2, 3), (4, 5))
        assert list(block.internal_points()) == [(2, 3), (3, 3), (2, 4), (3, 4)]

    def test_array_matches_iter(self):
        block = ScreenBlock((1, 1), (5, 4))
        arr = block.internal_points_array()
        assert [tuple(p) for p in arr] == list(block.internal_points())

    def test_empty(self):
        assert list(ScreenBlock((5, 5), (5, 9)).internal_points()) == []
        assert ScreenBlock((5, 5), (4, 9)).area() == 0


class TestTileOrdering:
    def test_tiles_cover_exactly_once(self, rng):
        for _ in range(10):
            w, h = rng.integers(1, 200, 2)
            tile_size = int(rng.integers(1, 70))
            block = ScreenBlock.with_size((0, 0), (w, h))
            tiles = block.tile_ordering(tile_size, rng=rng)
            covered = np.zeros((h, w), int)
            for t in tiles:
                assert block.contains_box(t)
                assert not t.is_empty()
                covered[t.min[1] : t.max[1], t.min[0] : t.max[0]] += 1
            assert (covered == 1).all()

    def test_tile_sizes(self):
        block = ScreenBlock.with_size((0, 0), (100, 70))
        tiles = block.tile_ordering(32)
        for t in tiles:
            size = t.size()
            assert size[0] in (32, 100 - 96) or t.max[0] == 100
            assert (size <= 32).all()

    def test_center_out_tendency(self):
        # Without jitter influence dominating, early tiles should be nearer
        # the center on average than late tiles.
        block = ScreenBlock.with_size((0, 0), (512, 512))
        tiles = block.tile_ordering(64, rng=np.random.default_rng(0))
        center = block.center()
        dists = [float(np.linalg.norm(center - t.center())) for t in tiles]
        first = np.mean(dists[: len(dists) // 4])
        last = np.mean(dists[-len(dists) // 4 :])
        assert first < last

    def test_empty_block(self):
        assert ScreenBlock.with_size((0, 0), (0, 10)).tile_ordering(8) == []


class TestDivideRange:
    def test_exact_division(self):
        assert list(divide_range(0, 12, 4)) == [(0, 4), (4, 8), (8, 12)]

    def test_clipped_tail(self):
        assert list(divide_range(2, 11, 4)) == [(2, 6), (6, 10), (10, 11)]

    def test_empty(self):
        assert list(divide_range(5, 5, 4)) == []
