"""Incremental / streaming decode tests.

Reference tiers: avifincrtest.cc + avifincrtest_helpers.cc (byte-clamped
reader, row monotonicity, final equality) and aviftest.c's truncation
sweep (SURVEY.md §4).
"""

import numpy as np
import pytest

from libavif_tpu.api import Decoder, Encoder, decode
from libavif_tpu.api.io import FileIO, LimitedIO, MemoryIO
from libavif_tpu.constants import AvifError, PixelFormat, Result
from libavif_tpu.image import Image


def make_image(width, height, seed=0):
    rng = np.random.default_rng(seed)
    img = Image(width, height, 8, PixelFormat.YUV420)
    img.allocate_planes("yuv")
    for c in range(3):
        img.yuv_planes[c][:] = rng.integers(0, 256, img.yuv_planes[c].shape).astype(
            np.uint8
        )
    return img


@pytest.fixture(scope="module")
def grid_file():
    cells = [make_image(64, 64, seed=i) for i in range(4)]
    enc = Encoder()
    enc.quality = 100
    data = enc.write_grid(cells, columns=2, rows=2)
    full = decode(data)
    return data, full


class TestIncrementalGrid:
    def test_row_count_monotonic_and_final_equal(self, grid_file):
        data, full = grid_file
        inner = MemoryIO(data)
        last_rows = 0
        done = False
        for avail in range(0, len(data) + 1, max(1, len(data) // 37)):
            d = Decoder()
            d.allow_incremental = True
            try:
                d.parse(LimitedIO(inner, avail))
            except AvifError as e:
                assert e.result == Result.WAITING_ON_IO
                continue
            try:
                ok = d.next_image()
            except AvifError as e:
                assert e.result == Result.WAITING_ON_IO
                rows = d.decoded_row_count()
                assert rows >= 0
                assert rows >= last_rows or rows == 0
                if rows:
                    last_rows = rows
                    got = d.image.yuv_planes[0][:rows]
                    np.testing.assert_array_equal(got, full.yuv_planes[0][:rows])
                continue
            assert ok
            done = True
            assert d.decoded_row_count() == full.height
            np.testing.assert_array_equal(d.image.yuv_planes[0], full.yuv_planes[0])
        # The final pass (full bytes) must have completed.
        d = Decoder()
        d.allow_incremental = True
        d.parse(LimitedIO(inner, len(data)))
        assert d.next_image()
        assert done or d.decoded_row_count() == full.height

    def test_without_incremental_waits(self, grid_file):
        data, _ = grid_file
        d = Decoder()
        # enough for parse + first cells but not everything
        try:
            d.parse(LimitedIO(MemoryIO(data), len(data) - 8))
            with pytest.raises(AvifError) as e:
                d.next_image()
            assert e.value.result == Result.WAITING_ON_IO
        except AvifError as e:
            assert e.result == Result.WAITING_ON_IO


class TestIOReaders:
    def test_file_io(self, tmp_path, grid_file):
        data, full = grid_file
        p = tmp_path / "x.avif"
        p.write_bytes(data)
        d = Decoder()
        d.set_io_file(p)
        d.parse()
        assert d.next_image()
        np.testing.assert_array_equal(d.image.yuv_planes[0], full.yuv_planes[0])

    def test_memory_io_read_exact_errors(self):
        io = MemoryIO(b"0123456789")
        assert io.read_exact(2, 3) == b"234"
        with pytest.raises(AvifError) as e:
            io.read_exact(8, 5)
        assert e.value.result == Result.TRUNCATED_DATA

    def test_limited_io_waits(self):
        io = LimitedIO(MemoryIO(b"0123456789"), 4)
        with pytest.raises(AvifError) as e:
            io.read_exact(2, 5)
        assert e.value.result == Result.WAITING_ON_IO

    def test_parse_waiting_then_success(self, grid_file):
        data, _ = grid_file
        inner = MemoryIO(data)
        d = Decoder()
        with pytest.raises(AvifError) as e:
            d.parse(LimitedIO(inner, 40))
        assert e.value.result == Result.WAITING_ON_IO
        d.parse(LimitedIO(inner, len(data)))
        assert d.next_image()


class TestExtentAndTiming:
    def test_max_extent_covers_decode(self, grid_file):
        """Bytes within the reported extent suffice to decode (read.c:5169)."""
        data, full = grid_file
        d = Decoder()
        d.parse(data)
        off, size = d.nth_image_max_extent(0)
        assert size > 0 and off + size <= len(data)
        # Truncating right AT the end of the extent still decodes.
        d2 = Decoder()
        d2.parse(LimitedIO(MemoryIO(data), off + size))
        assert d2.next_image()
        np.testing.assert_array_equal(d2.image.yuv_planes[0], full.yuv_planes[0])

    def test_animation_timing(self):
        frames = [make_image(32, 24, seed=i) for i in range(3)]
        enc = Encoder()
        enc.quality = 100
        enc.timescale = 30
        for f in frames:
            enc.add_image(f, duration=10)
        d = Decoder()
        d.parse(enc.finish())
        assert d.nth_image_timing(0) == (0, 10)
        assert d.nth_image_timing(1) == (10, 10)
        assert d.nth_image_timing(2) == (20, 10)
