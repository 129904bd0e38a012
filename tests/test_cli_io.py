"""CLI + file-IO tests (reference tiers: test_cmd.sh scripts, SURVEY.md §4.3)."""

import pathlib

import numpy as np
import pytest

from libavif_tpu.cli import avifdec, avifenc
from libavif_tpu.constants import PixelFormat, Range
from libavif_tpu.image import Image
from libavif_tpu.io_formats import guess_format, read_image
from libavif_tpu.io_formats.y4m import count_y4m_frames, read_y4m, write_y4m


def make_image(width, height, depth=8, fmt=PixelFormat.YUV420, seed=0):
    rng = np.random.default_rng(seed)
    img = Image(width, height, depth, fmt)
    img.allocate_planes("yuv")
    maxv = (1 << depth) - 1
    for c in range(3):
        if img.yuv_planes[c] is not None:
            img.yuv_planes[c][:] = rng.integers(
                0, maxv + 1, img.yuv_planes[c].shape
            ).astype(img.dtype)
    return img


class TestY4m:
    @pytest.mark.parametrize(
        "fmt,depth",
        [
            (PixelFormat.YUV420, 8),
            (PixelFormat.YUV444, 10),
            (PixelFormat.YUV422, 12),
            (PixelFormat.YUV400, 8),
        ],
    )
    def test_roundtrip(self, tmp_path, fmt, depth):
        img = make_image(32, 20, depth, fmt)
        p = tmp_path / "t.y4m"
        write_y4m(p, img)
        assert guess_format(p) == "y4m"
        out = read_y4m(p)
        assert (out.width, out.height, out.depth, out.yuv_format) == (32, 20, depth, fmt)
        n = 1 if fmt == PixelFormat.YUV400 else 3
        for c in range(n):
            np.testing.assert_array_equal(out.yuv_planes[c], img.yuv_planes[c])

    def test_multiframe(self, tmp_path):
        frames = [make_image(16, 16, seed=i) for i in range(3)]
        p = tmp_path / "anim.y4m"
        write_y4m(p, frames)
        assert count_y4m_frames(p) == 3
        for i, f in enumerate(frames):
            out = read_y4m(p, i)
            np.testing.assert_array_equal(out.yuv_planes[0], f.yuv_planes[0])

    def test_range_flag(self, tmp_path):
        img = make_image(16, 16)
        img.yuv_range = Range.FULL
        p = tmp_path / "full.y4m"
        write_y4m(p, img)
        assert read_y4m(p).yuv_range == Range.FULL


class TestPngJpeg:
    def test_png_roundtrip(self, tmp_path):
        pil = pytest.importorskip("PIL.Image")
        rng = np.random.default_rng(0)
        px = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
        src = tmp_path / "in.png"
        pil.fromarray(px, "RGB").save(src)
        img = read_image(src, requested_format=PixelFormat.YUV444)
        assert (img.width, img.height) == (32, 24)
        from libavif_tpu.io_formats.png_jpeg import write_png

        out = tmp_path / "out.png"
        write_png(out, img)
        back = np.asarray(pil.open(out).convert("RGB"))
        # identity-free YUV444 conversion keeps RGB within small error
        assert np.abs(back.astype(int) - px.astype(int)).max() <= 3

    def test_png_alpha(self, tmp_path):
        pil = pytest.importorskip("PIL.Image")
        rng = np.random.default_rng(1)
        px = rng.integers(0, 256, (16, 16, 4)).astype(np.uint8)
        src = tmp_path / "a.png"
        pil.fromarray(px, "RGBA").save(src)
        img = read_image(src)
        assert img.alpha_plane is not None
        np.testing.assert_array_equal(img.alpha_plane, px[..., 3])


class TestCliEndToEnd:
    def test_encode_decode_png(self, tmp_path):
        pil = pytest.importorskip("PIL.Image")
        rng = np.random.default_rng(2)
        px = (rng.integers(0, 64, (48, 64, 3)) * 4).astype(np.uint8)
        src = tmp_path / "in.png"
        pil.fromarray(px, "RGB").save(src)
        avif = tmp_path / "out.avif"
        rc = avifenc.main([str(src), str(avif), "-q", "90", "-y", "444"])
        assert rc == 0 and avif.exists()
        out_png = tmp_path / "roundtrip.png"
        rc = avifdec.main([str(avif), str(out_png)])
        assert rc == 0
        back = np.asarray(pil.open(out_png).convert("RGB"))
        err = back.astype(int) - px.astype(int)
        assert np.sqrt(np.mean(err**2)) < 12.0

    def test_lossless_y4m_roundtrip(self, tmp_path):
        img = make_image(32, 24, fmt=PixelFormat.YUV420)
        src = tmp_path / "in.y4m"
        write_y4m(src, img)
        avif = tmp_path / "l.avif"
        assert avifenc.main([str(src), str(avif), "-l"]) == 0
        out = tmp_path / "out.y4m"
        assert avifdec.main([str(avif), str(out)]) == 0
        back = read_y4m(out)
        for c in range(3):
            np.testing.assert_array_equal(back.yuv_planes[c], img.yuv_planes[c])

    def test_grid_cli(self, tmp_path):
        img = make_image(128, 128)
        src = tmp_path / "g.y4m"
        write_y4m(src, img)
        avif = tmp_path / "g.avif"
        assert avifenc.main([str(src), str(avif), "-l", "-g", "2x2"]) == 0
        from libavif_tpu.api import decode

        out = decode(avif.read_bytes())
        np.testing.assert_array_equal(out.yuv_planes[0], img.yuv_planes[0])

    def test_animation_cli_and_info(self, tmp_path, capsys):
        frames = [make_image(32, 24, seed=i) for i in range(2)]
        src = tmp_path / "a.y4m"
        write_y4m(src, frames)
        avif = tmp_path / "a.avif"
        assert avifenc.main([str(src), str(avif), "-l", "--fps", "10"]) == 0
        assert avifdec.main([str(avif), "--info"]) == 0
        cap = capsys.readouterr()
        assert "Image count   : 2" in cap.out
        out = tmp_path / "back.y4m"
        assert avifdec.main([str(avif), str(out), "--index", "all"]) == 0
        assert count_y4m_frames(out) == 2


class TestPng16:
    def test_16bit_png_writer_bytes(self, tmp_path):
        import struct
        import zlib

        from libavif_tpu.constants import MatrixCoefficients
        from libavif_tpu.io_formats.png_jpeg import write_png

        rng = np.random.default_rng(0)
        img = make_image(16, 8, depth=10, fmt=PixelFormat.YUV444)
        img.matrix_coefficients = MatrixCoefficients.IDENTITY  # GBR: lossless map
        p = tmp_path / "deep.png"
        write_png(p, img)
        data = p.read_bytes()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        # IHDR says 16-bit truecolor
        w, h, bits, ctype = struct.unpack(">IIBB", data[16:26])
        assert (w, h, bits, ctype) == (16, 8, 16, 2)
        # decode IDAT and check the G channel equals Y scaled 10->16 bits
        pos = 8
        idat = b""
        while pos < len(data):
            (ln,) = struct.unpack(">I", data[pos : pos + 4])
            tag = data[pos + 4 : pos + 8]
            if tag == b"IDAT":
                idat += data[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
        raw = zlib.decompress(idat)
        stride = 1 + w * 3 * 2
        row0 = np.frombuffer(raw[1:stride], dtype=">u2").reshape(w, 3)
        # identity path scales 10->16 bit by left shift (integer exact)
        expect_g = img.yuv_planes[0][0].astype(np.uint32) << 6
        np.testing.assert_array_equal(row0[:, 1].astype(np.uint32), expect_g)

    def test_avifdec_png16(self, tmp_path):
        img = make_image(24, 16, depth=10, fmt=PixelFormat.YUV444)
        src = tmp_path / "t.y4m"
        write_y4m(src, img)
        avif = tmp_path / "t.avif"
        assert avifenc.main([str(src), str(avif), "-l"]) == 0
        out = tmp_path / "deep.png"
        assert avifdec.main([str(avif), str(out), "--png-depth", "16"]) == 0
        import struct

        data = out.read_bytes()
        assert struct.unpack(">B", data[24:25])[0] == 16  # bit depth field


class TestUpdatableArgs:
    """avifenc `:u` per-input updatable options (reference
    apps/avifenc.c:278-328 parseOptionSuffix + avifInputFileSettings)."""

    def test_qcolor_update_applies_to_later_inputs(self, tmp_path):
        from libavif_tpu.api.decoder import Decoder

        paths = []
        for i in range(2):
            img = make_image(32, 24, seed=i)
            p = tmp_path / f"f{i}.y4m"
            write_y4m(p, [img])
            paths.append(str(p))
        avif = tmp_path / "anim.avif"
        # frame 0 at q85, frame 1 drops to q20 via -q:u
        rc = avifenc.main(
            ["-q", "85", paths[0], "-q:u", "20", paths[1], str(avif),
             "--fps", "10"]
        )
        assert rc == 0
        d = Decoder()
        d.set_io_file(avif)
        d.parse()
        st = d._color_track.sample_table
        s0, s1 = (st.sample_sizes[i] for i in range(2))
        assert s1 < s0, (s0, s1)  # q20 frame must be much smaller

    def test_unsuffixed_after_input_warns_and_applies_globally(self, tmp_path, capsys):
        img = make_image(32, 24, seed=3)
        p0 = tmp_path / "a.y4m"
        p1 = tmp_path / "b.y4m"
        write_y4m(p0, [img])
        write_y4m(p1, [img])
        avif = tmp_path / "o.avif"
        rc = avifenc.main([str(p0), "-q", "50", str(p1), str(avif), "--fps", "10"])
        assert rc == 0
        cap = capsys.readouterr()
        assert "applying to all inputs" in cap.err

    def test_duration_update_per_input(self, tmp_path):
        from libavif_tpu.api.decoder import Decoder

        paths = []
        for i in range(2):
            img = make_image(32, 24, seed=i)
            p = tmp_path / f"d{i}.y4m"
            write_y4m(p, [img])
            paths.append(str(p))
        avif = tmp_path / "dur.avif"
        rc = avifenc.main(
            [paths[0], "--duration", "7", paths[1], str(avif), "--timescale", "30"]
        )
        assert rc == 0
        d = Decoder()
        d.set_io_file(avif)
        d.parse()
        _, dur0 = d.nth_image_timing(0)
        _, dur1 = d.nth_image_timing(1)
        assert dur0 == 1  # --duration is always :u
        assert dur1 == 7
