"""MinimizedImageBox ('mini') tests (reference tier: avifminitest.cc)."""

import numpy as np
import pytest

from libavif_tpu.api import Decoder, Encoder
from libavif_tpu.constants import PixelFormat, Range, TransformFlags
from libavif_tpu.image import Image


def make_image(width=48, height=32, depth=8, fmt=PixelFormat.YUV420, seed=0, alpha=False):
    rng = np.random.default_rng(seed)
    img = Image(width, height, depth, fmt)
    img.allocate_planes("yuv")
    maxv = (1 << depth) - 1
    for c in range(3):
        if img.yuv_planes[c] is not None:
            img.yuv_planes[c][:] = rng.integers(0, maxv + 1, img.yuv_planes[c].shape).astype(
                img.dtype
            )
    if alpha:
        img.alpha_plane = rng.integers(0, maxv, (height, width)).astype(img.dtype)
    return img


class TestMini:
    def test_mini_lossless_roundtrip(self):
        img = make_image()
        enc = Encoder()
        enc.quality = 100
        data = enc.write_mini(img)
        assert data[4:8] == b"ftyp" and data[8:12] == b"mif3"
        assert b"mini" in data[:40]
        d = Decoder()
        out = d.read(data)
        for c in range(3):
            np.testing.assert_array_equal(out.yuv_planes[c], img.yuv_planes[c])

    def test_mini_is_smaller_than_full_container(self):
        img = make_image(seed=1)
        enc1 = Encoder()
        enc1.quality = 90
        mini = enc1.write_mini(img)
        enc2 = Encoder()
        enc2.quality = 90
        full = enc2.write(img)
        assert len(mini) < len(full)

    def test_mini_alpha(self):
        img = make_image(seed=2, alpha=True)
        enc = Encoder()
        enc.quality = 100
        data = enc.write_mini(img)
        d = Decoder()
        out = d.read(data)
        assert d.alpha_present
        np.testing.assert_array_equal(out.alpha_plane, img.alpha_plane)

    def test_mini_10bit_444_cicp_range(self):
        img = make_image(depth=10, fmt=PixelFormat.YUV444, seed=3)
        img.color_primaries = 9
        img.transfer_characteristics = 16
        img.matrix_coefficients = 9
        img.yuv_range = Range.LIMITED
        enc = Encoder()
        enc.quality = 100
        out = Decoder().read(enc.write_mini(img))
        assert out.depth == 10
        assert int(out.color_primaries) == 9
        assert int(out.transfer_characteristics) == 16
        assert out.yuv_range == Range.LIMITED
        np.testing.assert_array_equal(out.yuv_planes[0], img.yuv_planes[0])

    def test_mini_metadata(self):
        img = make_image(seed=4)
        img.exif = b"II*\x00miniexif"
        img.xmp = b"<x:xmpmeta/>"
        img.icc = b"\x00" * 40
        enc = Encoder()
        enc.quality = 95
        d = Decoder()
        out = d.read(enc.write_mini(img))
        assert out.exif == img.exif
        assert out.xmp == img.xmp
        assert out.icc == img.icc

    def test_mini_orientation(self):
        img = make_image(seed=5)
        img.transform_flags = TransformFlags.IROT
        img.irot.angle = 1
        enc = Encoder()
        enc.quality = 95
        out = Decoder().read(enc.write_mini(img))
        assert out.transform_flags & TransformFlags.IROT
        assert out.irot.angle == 1

    def test_mini_large_dimensions(self):
        img = make_image(width=200, height=144, seed=6)
        enc = Encoder()
        enc.quality = 100
        out = Decoder().read(enc.write_mini(img))
        assert (out.width, out.height) == (200, 144)
        np.testing.assert_array_equal(out.yuv_planes[0], img.yuv_planes[0])
