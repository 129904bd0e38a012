"""Pixel pipeline tests: YUV<->RGB numerics vs independent scalar references,
known broadcast constants, lossless integer paths, alpha premultiply."""

import numpy as np
import pytest

from libavif_tpu.constants import (
    ChromaUpsampling,
    MatrixCoefficients,
    PixelFormat,
    Range,
)
from libavif_tpu.pixels import (
    calc_yuv_coefficients,
    premultiply_alpha,
    rgb_to_yuv_arrays,
    unpremultiply_alpha,
    yuv_to_rgb_arrays,
)


def _scalar_rgb_to_yuv444(rgb, depth, rgb_depth, yuv_range, kr, kb):
    """Independent scalar reference of the reformat.c float math."""
    kg = 1 - kr - kb
    rgb_max = (1 << rgb_depth) - 1
    h, w, _ = rgb.shape
    y = np.zeros((h, w), dtype=np.int64)
    u = np.zeros((h, w), dtype=np.int64)
    v = np.zeros((h, w), dtype=np.int64)
    if yuv_range == Range.LIMITED:
        y_bias, y_rng = 16 << (depth - 8), 219 << (depth - 8)
        uv_rng = 224 << (depth - 8)
    else:
        y_bias, y_rng = 0, (1 << depth) - 1
        uv_rng = (1 << depth) - 1
    uv_bias = 1 << (depth - 1)
    max_ch = (1 << depth) - 1
    for i in range(h):
        for j in range(w):
            R, G, B = (float(c) / rgb_max for c in rgb[i, j])
            Y = kr * R + kg * G + kb * B
            U = (B - Y) / (2 * (1 - kb))
            V = (R - Y) / (2 * (1 - kr))
            y[i, j] = min(max(int(np.floor(Y * y_rng + y_bias + 0.5)), 0), max_ch)
            u[i, j] = min(max(int(np.floor(U * uv_rng + uv_bias + 0.5)), 0), max_ch)
            v[i, j] = min(max(int(np.floor(V * uv_rng + uv_bias + 0.5)), 0), max_ch)
    return y, u, v


class TestKnownValues:
    def test_bt601_limited_primary_colors(self):
        # Classic BT.601 studio-swing values for saturated primaries.
        rgb = np.array(
            [[[255, 255, 255], [0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]]],
            dtype=np.uint8,
        )
        y, u, v = rgb_to_yuv_arrays(
            rgb, depth=8, rgb_depth=8, yuv_format=PixelFormat.YUV444,
            yuv_range=Range.LIMITED, matrix_coefficients=MatrixCoefficients.BT601,
        )
        assert list(y[0]) == [235, 16, 81, 145, 41]
        assert list(u[0]) == [128, 128, 90, 54, 240]
        assert list(v[0]) == [128, 128, 240, 34, 110]

    def test_bt709_full_range_white_black(self):
        rgb = np.array([[[255, 255, 255], [0, 0, 0]]], dtype=np.uint8)
        y, u, v = rgb_to_yuv_arrays(
            rgb, depth=8, rgb_depth=8, yuv_format=PixelFormat.YUV444,
            yuv_range=Range.FULL, matrix_coefficients=MatrixCoefficients.BT709,
        )
        assert list(y[0]) == [255, 0]
        assert list(u[0]) == [128, 128]
        assert list(v[0]) == [128, 128]

    def test_coefficients(self):
        kr, kg, kb = calc_yuv_coefficients(1, MatrixCoefficients.BT709)
        assert abs(kr - 0.2126) < 1e-9 and abs(kb - 0.0722) < 1e-9
        kr, kg, kb = calc_yuv_coefficients(9, MatrixCoefficients.BT2020_NCL)
        assert abs(kr - 0.2627) < 1e-9
        # Chroma-derived NCL from BT.709 primaries reproduces ~BT.709 coeffs.
        kr, kg, kb = calc_yuv_coefficients(1, MatrixCoefficients.CHROMA_DERIVED_NCL)
        assert abs(kr - 0.2126) < 2e-3 and abs(kb - 0.0722) < 2e-3


class TestVsScalarReference:
    @pytest.mark.parametrize("depth,rgb_depth,rng", [
        (8, 8, Range.LIMITED), (8, 8, Range.FULL),
        (10, 10, Range.LIMITED), (12, 12, Range.FULL), (10, 8, Range.FULL),
    ])
    def test_rgb_to_yuv444_matches_scalar(self, depth, rgb_depth, rng):
        rs = np.random.RandomState(42)
        rgb_max = (1 << rgb_depth) - 1
        rgb = rs.randint(0, rgb_max + 1, (7, 9, 3)).astype(
            np.uint8 if rgb_depth == 8 else np.uint16
        )
        kr, kg, kb = calc_yuv_coefficients(1, MatrixCoefficients.BT709)
        ref = _scalar_rgb_to_yuv444(rgb, depth, rgb_depth, rng, kr, kb)
        got = rgb_to_yuv_arrays(
            rgb, depth=depth, rgb_depth=rgb_depth, yuv_format=PixelFormat.YUV444,
            yuv_range=rng, matrix_coefficients=MatrixCoefficients.BT709,
        )
        for r, g in zip(ref, got):
            # float32 vs float64 rounding may differ by at most 1 on ties
            assert np.max(np.abs(r.astype(np.int64) - g.astype(np.int64))) <= 1


class TestRoundTrips:
    def test_444_full_roundtrip_max_error_1(self):
        rs = np.random.RandomState(0)
        rgb = rs.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        y, u, v = rgb_to_yuv_arrays(
            rgb, depth=8, rgb_depth=8, yuv_format=PixelFormat.YUV444,
            yuv_range=Range.FULL, matrix_coefficients=MatrixCoefficients.BT601,
        )
        back = yuv_to_rgb_arrays(
            y, u, v, depth=8, rgb_depth=8, yuv_format=PixelFormat.YUV444,
            yuv_range=Range.FULL, matrix_coefficients=MatrixCoefficients.BT601,
        )
        err = np.abs(back.astype(int) - rgb.astype(int))
        assert err.max() <= 2  # quantization of chroma only

    def test_identity_bit_exact(self):
        rs = np.random.RandomState(1)
        rgb = rs.randint(0, 256, (8, 8, 3)).astype(np.uint8)
        y, u, v = rgb_to_yuv_arrays(
            rgb, depth=8, rgb_depth=8, yuv_format=PixelFormat.YUV444,
            yuv_range=Range.FULL, matrix_coefficients=MatrixCoefficients.IDENTITY,
        )
        # GBR mapping
        assert np.array_equal(y, rgb[..., 1])
        assert np.array_equal(u, rgb[..., 2])
        assert np.array_equal(v, rgb[..., 0])
        back = yuv_to_rgb_arrays(
            y, u, v, depth=8, rgb_depth=8, yuv_format=PixelFormat.YUV444,
            yuv_range=Range.FULL, matrix_coefficients=MatrixCoefficients.IDENTITY,
        )
        assert np.array_equal(back, rgb)

    def test_ycgco_re_bit_exact(self):
        rs = np.random.RandomState(2)
        rgb = rs.randint(0, 256, (8, 8, 3)).astype(np.uint8)
        y, u, v = rgb_to_yuv_arrays(
            rgb, depth=10, rgb_depth=8, yuv_format=PixelFormat.YUV444,
            yuv_range=Range.FULL, matrix_coefficients=MatrixCoefficients.YCGCO_RE,
        )
        back = yuv_to_rgb_arrays(
            y, u, v, depth=10, rgb_depth=8, yuv_format=PixelFormat.YUV444,
            yuv_range=Range.FULL, matrix_coefficients=MatrixCoefficients.YCGCO_RE,
        )
        assert np.array_equal(back, rgb)

    def test_ycgco_ro_bit_exact(self):
        rs = np.random.RandomState(3)
        rgb = rs.randint(0, 1024, (8, 8, 3)).astype(np.uint16)
        y, u, v = rgb_to_yuv_arrays(
            rgb, depth=11, rgb_depth=10, yuv_format=PixelFormat.YUV444,
            yuv_range=Range.FULL, matrix_coefficients=MatrixCoefficients.YCGCO_RO,
        )
        back = yuv_to_rgb_arrays(
            y, u, v, depth=11, rgb_depth=10, yuv_format=PixelFormat.YUV444,
            yuv_range=Range.FULL, matrix_coefficients=MatrixCoefficients.YCGCO_RO,
        )
        assert np.array_equal(back, rgb)

    @pytest.mark.parametrize("fmt", [PixelFormat.YUV420, PixelFormat.YUV422])
    def test_subsampled_roundtrip_smooth_image(self, fmt):
        # Smooth gradients survive 420/422 chroma roundtrip within tolerance.
        xx, yy = np.meshgrid(np.arange(32), np.arange(24))
        rgb = np.stack(
            [(xx * 8) % 256, (yy * 8) % 256, ((xx + yy) * 4) % 256], axis=-1
        ).astype(np.uint8)
        y, u, v = rgb_to_yuv_arrays(
            rgb, depth=8, rgb_depth=8, yuv_format=fmt,
            yuv_range=Range.FULL, matrix_coefficients=MatrixCoefficients.BT601,
        )
        assert u.shape == ((12, 16) if fmt == PixelFormat.YUV420 else (24, 16))
        back = yuv_to_rgb_arrays(
            y, u, v, depth=8, rgb_depth=8, yuv_format=fmt,
            yuv_range=Range.FULL, matrix_coefficients=MatrixCoefficients.BT601,
            chroma_upsampling=ChromaUpsampling.BILINEAR,
        )
        err = np.abs(back.astype(int) - rgb.astype(int)).astype(float)
        assert np.mean(err) < 8.0

    def test_monochrome(self):
        rs = np.random.RandomState(4)
        rgb = rs.randint(0, 256, (8, 8, 3)).astype(np.uint8)
        rgb[..., 1] = rgb[..., 0]
        rgb[..., 2] = rgb[..., 0]  # grey input
        y, u, v = rgb_to_yuv_arrays(
            rgb, depth=8, rgb_depth=8, yuv_format=PixelFormat.YUV400,
            yuv_range=Range.FULL, matrix_coefficients=MatrixCoefficients.BT601,
        )
        assert u is None and v is None
        back = yuv_to_rgb_arrays(
            y, None, None, depth=8, rgb_depth=8, yuv_format=PixelFormat.YUV400,
            yuv_range=Range.FULL, matrix_coefficients=MatrixCoefficients.BT601,
        )
        assert np.max(np.abs(back.astype(int) - rgb.astype(int))) <= 1

    def test_limited_range_roundtrip(self):
        rs = np.random.RandomState(5)
        rgb = rs.randint(0, 256, (8, 8, 3)).astype(np.uint8)
        y, u, v = rgb_to_yuv_arrays(
            rgb, depth=8, rgb_depth=8, yuv_format=PixelFormat.YUV444,
            yuv_range=Range.LIMITED, matrix_coefficients=MatrixCoefficients.BT601,
        )
        assert y.min() >= 16 and y.max() <= 235
        back = yuv_to_rgb_arrays(
            y, u, v, depth=8, rgb_depth=8, yuv_format=PixelFormat.YUV444,
            yuv_range=Range.LIMITED, matrix_coefficients=MatrixCoefficients.BT601,
        )
        err = np.abs(back.astype(int) - rgb.astype(int))
        assert err.max() <= 3  # limited-range quantization


class TestAlpha:
    def test_premultiply_roundtrip(self):
        rs = np.random.RandomState(6)
        rgb = rs.randint(0, 256, (8, 8, 3)).astype(np.uint8)
        alpha = rs.randint(1, 256, (8, 8)).astype(np.uint8)
        pm = premultiply_alpha(rgb, alpha, 255)
        assert pm.dtype == np.uint8
        assert np.all(pm <= np.maximum(rgb, 1))
        un = unpremultiply_alpha(pm, alpha, 255)
        # Roundtrip error bounded by 255/alpha quantization.
        err = np.abs(un.astype(int) - rgb.astype(int))
        bound = (255 // alpha.astype(int) + 1)[..., None]
        assert np.all(err <= bound)

    def test_premultiply_zero_alpha(self):
        rgb = np.full((2, 2, 3), 200, dtype=np.uint8)
        alpha = np.zeros((2, 2), dtype=np.uint8)
        pm = premultiply_alpha(rgb, alpha, 255)
        assert np.all(pm == 0)
        un = unpremultiply_alpha(pm, alpha, 255)
        assert np.all(un == 0)
