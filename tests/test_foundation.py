"""Foundation tests: constants, image model, streams, fractions."""

import numpy as np
import pytest

from libavif_tpu import (
    AvifError,
    CleanApertureBox,
    CropRect,
    Image,
    PixelFormat,
    Result,
    clap_from_crop_rect,
    crop_rect_from_clap,
    result_to_string,
)
from libavif_tpu.utils import ROStream, RWStream


class TestResults:
    def test_result_strings(self):
        assert result_to_string(Result.OK) == "OK"
        assert result_to_string(Result.WAITING_ON_IO) == "Waiting on IO"
        assert result_to_string(Result.MISSING_DATA) == "Missing data"

    def test_result_count(self):
        # Reference has 35 codes (avif.h:164-204).
        assert len(Result) == 35


class TestImage:
    def test_allocate_420(self):
        im = Image(101, 57, 8, PixelFormat.YUV420)
        im.allocate_planes("all")
        assert im.yuv_planes[0].shape == (57, 101)
        # Chroma ceil-shift: (101+1)//2 = 51, (57+1)//2 = 29
        assert im.yuv_planes[1].shape == (29, 51)
        assert im.yuv_planes[2].shape == (29, 51)
        assert im.alpha_plane.shape == (57, 101)
        assert im.dtype == np.uint8

    def test_allocate_422_10bit(self):
        im = Image(100, 50, 10, PixelFormat.YUV422)
        im.allocate_planes("yuv")
        assert im.yuv_planes[1].shape == (50, 50)
        assert im.dtype == np.uint16
        assert im.max_value == 1023

    def test_allocate_400(self):
        im = Image(64, 64, 12, PixelFormat.YUV400)
        im.allocate_planes("yuv")
        assert im.yuv_planes[0] is not None
        assert im.yuv_planes[1] is None
        assert im.monochrome

    def test_view_rect_zero_copy(self):
        im = Image(64, 64, 8, PixelFormat.YUV420)
        im.allocate_planes("yuv")
        im.yuv_planes[0][10, 10] = 99
        view = im.view_rect(CropRect(8, 8, 32, 32))
        assert view.yuv_planes[0][2, 2] == 99
        view.yuv_planes[0][2, 2] = 42
        assert im.yuv_planes[0][10, 10] == 42  # shares memory
        assert view.yuv_planes[1].shape == (16, 16)

    def test_view_rect_odd_origin_rejected(self):
        im = Image(64, 64, 8, PixelFormat.YUV420)
        im.allocate_planes("yuv")
        with pytest.raises(AvifError):
            im.view_rect(CropRect(1, 0, 32, 32))

    def test_copy_deep(self):
        im = Image(16, 16, 8, PixelFormat.YUV444)
        im.allocate_planes("yuv")
        im.yuv_planes[0][0, 0] = 7
        cp = im.copy()
        cp.yuv_planes[0][0, 0] = 9
        assert im.yuv_planes[0][0, 0] == 7

    def test_opacity(self):
        im = Image(4, 4, 8, PixelFormat.YUV444)
        im.allocate_planes("all")
        assert not im.is_opaque()
        im.alpha_plane[:] = 255
        assert im.is_opaque()


class TestClap:
    def test_roundtrip(self):
        rect = CropRect(4, 2, 32, 16)
        clap = clap_from_crop_rect(rect, 64, 48, PixelFormat.YUV420)
        back = crop_rect_from_clap(clap, 64, 48, PixelFormat.YUV420)
        assert (back.x, back.y, back.width, back.height) == (4, 2, 32, 16)

    def test_negative_offset_encoding(self):
        # Crop at origin of a larger image: offsets are negative fractions.
        rect = CropRect(0, 0, 32, 32)
        clap = clap_from_crop_rect(rect, 64, 64, PixelFormat.YUV444)
        back = crop_rect_from_clap(clap, 64, 64, PixelFormat.YUV444)
        assert (back.x, back.y) == (0, 0)

    def test_odd_crop_rejected_420(self):
        with pytest.raises(AvifError):
            clap_from_crop_rect(CropRect(0, 0, 33, 32), 64, 64, PixelFormat.YUV420)

    def test_out_of_bounds_rejected(self):
        clap = CleanApertureBox(width_n=128, width_d=1, height_n=32, height_d=1,
                                horiz_off_n=0, horiz_off_d=1, vert_off_n=0, vert_off_d=1)
        with pytest.raises(AvifError):
            crop_rect_from_clap(clap, 64, 64, PixelFormat.YUV444)


class TestStreams:
    def test_byte_roundtrip(self):
        w = RWStream()
        w.write_u8(0xAB)
        w.write_u16(0x1234)
        w.write_u24(0x56789A)
        w.write_u32(0xDEADBEEF)
        w.write_u64(0x0102030405060708)
        r = ROStream(w.data())
        assert r.read_u8() == 0xAB
        assert r.read_u16() == 0x1234
        assert r.read_u24() == 0x56789A
        assert r.read_u32() == 0xDEADBEEF
        assert r.read_u64() == 0x0102030405060708
        assert r.remaining() == 0

    def test_bit_roundtrip(self):
        w = RWStream()
        vals = [(1, 1), (0, 1), (5, 3), (1023, 10), (0, 2), (77, 7)]
        for v, n in vals:
            w.write_bits(v, n)
        w.flush_bits()
        r = ROStream(w.data())
        r.start_bits()
        for v, n in vals:
            assert r.read_bits(n) == v

    def test_box_roundtrip(self):
        w = RWStream()
        m = w.write_box("meta")
        w.write_u32(42)
        inner = w.write_full_box("pitm", 0, 0)
        w.write_u16(1)
        w.finish_box(inner)
        w.finish_box(m)
        r = ROStream(w.data())
        hdr = r.read_box_header()
        assert hdr.type == "meta"
        assert hdr.size == len(w.data())
        assert r.read_u32() == 42
        inner_hdr = r.read_box_header()
        assert inner_hdr.type == "pitm"
        assert inner_hdr.content_size == 4 + 2  # version/flags + u16

    def test_largesize_box(self):
        import struct
        payload = b"\x00" * 10
        data = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(payload)) + payload
        r = ROStream(data)
        hdr = r.read_box_header()
        assert hdr.type == "mdat"
        assert hdr.content_size == len(payload)

    def test_truncated_box_raises(self):
        import struct
        data = struct.pack(">I", 100) + b"mdat" + b"\x00" * 4
        r = ROStream(data)
        with pytest.raises(AvifError):
            r.read_box_header()

    def test_string_read(self):
        r = ROStream(b"hello\x00world\x00")
        assert r.read_string() == "hello"
        assert r.read_string() == "world"
