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


class TestMiniGainMap:
    """Mini HDR section: gain map + clli (reference: avifminitest.cc
    EncodeDecodeMiniGainMap; write.c:2695-2744, read.c:4257-4330)."""

    def _pair(self, seed=7):
        from test_gainmap import make_sdr_hdr_pair

        import libavif_tpu.hdr.gainmap as gmlib

        base, alt = make_sdr_hdr_pair(seed=seed)
        base.gain_map = gmlib.compute_gain_map(
            base, alt, gain_map_format=PixelFormat.YUV420
        )
        return base

    def test_mini_gainmap_roundtrip(self):
        import libavif_tpu.hdr.gainmap as gmlib

        base = self._pair()
        enc = Encoder()
        enc.quality = 100
        data = enc.write_mini(base)
        d = Decoder()
        out = d.read(data)
        assert d.gain_map_present
        assert out.gain_map is not None
        assert gmlib.same_metadata(out.gain_map.metadata, base.gain_map.metadata)
        np.testing.assert_array_equal(
            out.gain_map.image.yuv_planes[0], base.gain_map.image.yuv_planes[0]
        )
        np.testing.assert_array_equal(out.yuv_planes[0], base.yuv_planes[0])

    def test_mini_gainmap_alt_cicp_and_clli(self):
        from libavif_tpu.image import ContentLightLevelInformationBox

        base = self._pair(seed=8)
        base.gain_map.alt_clli = ContentLightLevelInformationBox(1000, 400)
        base.clli = ContentLightLevelInformationBox(203, 100)
        enc = Encoder()
        enc.quality = 90
        out = Decoder().read(enc.write_mini(base))
        assert out.gain_map is not None
        assert int(out.gain_map.alt_transfer_characteristics) == 16  # PQ
        assert (out.gain_map.alt_clli.max_cll, out.gain_map.alt_clli.max_pall) == (1000, 400)
        assert (out.clli.max_cll, out.clli.max_pall) == (203, 100)

    def test_mini_gainmap_smaller_than_full(self):
        base = self._pair(seed=9)
        enc1 = Encoder()
        enc1.quality = 90
        mini = enc1.write_mini(base)
        enc2 = Encoder()
        enc2.quality = 90
        full = enc2.write(base)
        assert len(mini) < len(full)
        assert Decoder().read(mini).gain_map is not None
