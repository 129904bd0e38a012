"""Gain map tests (reference tier: avifgainmaptest.cc, SURVEY.md §4)."""

from fractions import Fraction

import numpy as np
import pytest

from libavif_tpu.api import Decoder, Encoder
from libavif_tpu.constants import (
    ColorPrimaries,
    MatrixCoefficients,
    PixelFormat,
    Range,
    TransferCharacteristics,
)
from libavif_tpu.hdr import gainmap as gmlib
from libavif_tpu.image import GainMap, GainMapMetadata, Image


def make_sdr_hdr_pair(width=48, height=32, seed=0):
    """Base SDR + alternate HDR (same scene, alternate 4x brighter)."""
    rng = np.random.default_rng(seed)
    base = Image(width, height, 8, PixelFormat.YUV444)
    base.allocate_planes("yuv")
    base.yuv_range = Range.FULL
    base.color_primaries = ColorPrimaries.BT709
    base.transfer_characteristics = TransferCharacteristics.SRGB
    base.matrix_coefficients = MatrixCoefficients.BT601
    base.yuv_planes[0][:] = rng.integers(30, 220, (height, width)).astype(np.uint8)
    base.yuv_planes[1][:] = 128
    base.yuv_planes[2][:] = 128

    alt = Image(width, height, 10, PixelFormat.YUV444)
    alt.allocate_planes("yuv")
    alt.yuv_range = Range.FULL
    alt.color_primaries = ColorPrimaries.BT709
    alt.transfer_characteristics = TransferCharacteristics.PQ
    alt.matrix_coefficients = MatrixCoefficients.BT601
    alt.yuv_planes[0][:] = (base.yuv_planes[0].astype(np.uint16) * 3).clip(0, 1023)
    alt.yuv_planes[1][:] = 512
    alt.yuv_planes[2][:] = 512
    return base, alt


class TestMetadataWire:
    def test_tmap_roundtrip_single_channel(self):
        meta = GainMapMetadata()
        meta.gain_map_min = [Fraction(-1, 2)] * 3
        meta.gain_map_max = [Fraction(3, 1)] * 3
        meta.base_hdr_headroom = Fraction(0, 1)
        meta.alternate_hdr_headroom = Fraction(3, 1)
        blob = gmlib.write_tmap(meta)
        back = gmlib.parse_tmap(blob)
        assert gmlib.same_metadata(meta, back)

    def test_tmap_roundtrip_multichannel(self):
        meta = GainMapMetadata()
        meta.gain_map_min = [Fraction(-1, 2), Fraction(-1, 3), Fraction(0)]
        meta.gain_map_max = [Fraction(2), Fraction(5, 2), Fraction(3)]
        meta.alternate_hdr_headroom = Fraction(2)
        blob = gmlib.write_tmap(meta)
        back = gmlib.parse_tmap(blob)
        assert gmlib.same_metadata(meta, back)

    def test_validate_rejects_bad(self):
        meta = GainMapMetadata()
        meta.gain_map_min = [Fraction(2)] * 3
        meta.gain_map_max = [Fraction(1)] * 3  # max < min
        with pytest.raises(Exception):
            gmlib.validate_metadata(meta)


class TestWeight:
    def test_weight_interpolation(self):
        meta = GainMapMetadata()
        meta.base_hdr_headroom = Fraction(0)
        meta.alternate_hdr_headroom = Fraction(2)
        assert gmlib.gain_map_weight(0.0, meta) == 0.0
        assert gmlib.gain_map_weight(2.0, meta) == 1.0
        assert abs(gmlib.gain_map_weight(1.0, meta) - 0.5) < 1e-6
        assert gmlib.gain_map_weight(5.0, meta) == 1.0  # clamped

    def test_weight_negative_direction(self):
        meta = GainMapMetadata()
        meta.base_hdr_headroom = Fraction(2)
        meta.alternate_hdr_headroom = Fraction(0)
        assert gmlib.gain_map_weight(0.0, meta) == -1.0

    def test_equal_headrooms_no_apply(self):
        meta = GainMapMetadata()
        meta.base_hdr_headroom = meta.alternate_hdr_headroom = Fraction(1)
        assert gmlib.gain_map_weight(0.5, meta) == 0.0


class TestComputeApply:
    def test_compute_then_apply_recovers_alternate(self):
        base, alt = make_sdr_hdr_pair()
        gm = gmlib.compute_gain_map(base, alt, gain_map_format=PixelFormat.YUV444)
        assert gm.image is not None
        assert gm.image.width == base.width
        # Tone-map fully toward the alternate rendition.
        alt_headroom = float(gm.metadata.alternate_hdr_headroom)
        toned = gmlib.apply_gain_map(
            base, gm, hdr_headroom=alt_headroom,
            output_transfer_characteristics=alt.transfer_characteristics,
        )
        # Compare against the alternate's own linear RGB.
        alt_rgb = gmlib._image_to_linear_rgb(alt, alt.transfer_characteristics)
        from libavif_tpu.pixels.colr import from_linear_fn

        expect = np.clip(from_linear_fn(alt.transfer_characteristics)(alt_rgb), 0, 1)
        err = np.abs(toned - expect)
        assert float(np.mean(err)) < 0.05

    def test_weight_zero_returns_base(self):
        base, alt = make_sdr_hdr_pair(seed=2)
        gm = gmlib.compute_gain_map(base, alt, gain_map_format=PixelFormat.YUV444)
        toned = gmlib.apply_gain_map(base, gm, hdr_headroom=0.0)
        base_lin = gmlib._image_to_linear_rgb(base, base.transfer_characteristics)
        from libavif_tpu.pixels.colr import from_linear_fn

        expect = np.clip(from_linear_fn(base.transfer_characteristics)(base_lin), 0, 1)
        assert float(np.mean(np.abs(toned - expect))) < 0.02

    def test_outlier_robust_minmax(self):
        vals = np.zeros(10000, dtype=np.float32)
        vals[:3] = 100.0  # 3 outliers out of 10000 (< 0.05% per side budget)
        lo, hi = gmlib.find_min_max_without_outliers(vals)
        assert hi < 100.0


class TestContainerRoundtrip:
    def test_gain_map_file_roundtrip(self):
        base, alt = make_sdr_hdr_pair(seed=5)
        gm = gmlib.compute_gain_map(base, alt, gain_map_format=PixelFormat.YUV420)
        base.gain_map = gm
        enc = Encoder()
        enc.quality = 100
        data = enc.write(base)
        d = Decoder()
        out = d.read(data)
        assert d.gain_map_present
        assert out.gain_map is not None
        assert gmlib.same_metadata(out.gain_map.metadata, gm.metadata)
        np.testing.assert_array_equal(
            out.gain_map.image.yuv_planes[0], gm.image.yuv_planes[0]
        )
        assert int(out.gain_map.alt_transfer_characteristics) == int(
            TransferCharacteristics.PQ
        )

    def test_gain_map_decode_optional(self):
        base, alt = make_sdr_hdr_pair(seed=6)
        base.gain_map = gmlib.compute_gain_map(base, alt)
        enc = Encoder()
        enc.quality = 90
        data = enc.write(base)
        d = Decoder()
        d.decode_gain_map = False
        out = d.read(data)
        assert d.gain_map_present  # still detected
        assert out.gain_map is None  # but not decoded
