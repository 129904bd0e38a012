"""avifenc-equivalent CLI (reference: apps/avifenc.c, 2714 LoC).

Flag surface mirrors the reference's core options: quality/qalpha, speed,
depth, yuv format, range, CICP, lossless, grid, animation timing,
metadata injection, transforms. Run `python -m libavif_tpu.cli.avifenc -h`.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from ..constants import VERSION

    p = argparse.ArgumentParser(
        prog="avifenc", description="Encode images to AVIF (TPU-native codec)"
    )
    p.add_argument("-V", "--version", action="version", version=f"avifenc (libavif_tpu) {VERSION}")
    p.add_argument(
        "inputs", nargs="+",
        help="input file(s): png/jpeg/y4m, or '-' for stdin (test_cmd_stdin.sh parity)",
    )
    p.add_argument("output", help="output.avif")
    p.add_argument("-q", "--qcolor", type=int, default=60, help="color quality 0-100")
    p.add_argument("--qalpha", type=int, default=-1, help="alpha quality 0-100")
    p.add_argument("-s", "--speed", type=int, default=6, help="encoder speed 0-10")
    p.add_argument("-l", "--lossless", action="store_true", help="lossless (q=100)")
    p.add_argument("-d", "--depth", type=int, choices=(8, 10, 12), help="coding depth")
    p.add_argument(
        "-y", "--yuv", choices=("444", "422", "420", "400"), help="YUV format"
    )
    p.add_argument("-r", "--range", choices=("limited", "full"), default="full")
    p.add_argument("--cicp", "--nclx", dest="cicp", help="P/T/M, e.g. 1/13/6")
    p.add_argument("-g", "--grid", help="MxN grid split of a single input")
    p.add_argument("--fps", type=float, default=30.0, help="animation frame rate")
    p.add_argument("--timescale", type=int, help="animation timescale (overrides fps)")
    p.add_argument("--duration", type=int, default=1, help="frame duration (timescales)")
    p.add_argument("-k", "--keyframe", type=int, default=0, help="keyframe interval")
    p.add_argument("--exif", help="Exif payload file to inject")
    p.add_argument("--xmp", help="XMP payload file to inject")
    p.add_argument("--icc", help="ICC profile file to inject")
    p.add_argument("--irot", type=int, choices=(0, 1, 2, 3), help="rotation (90° ccw units)")
    p.add_argument("--imir", type=int, choices=(0, 1), help="mirror axis")
    p.add_argument("--pasp", help="pixel aspect ratio: Hspacing,Vspacing")
    p.add_argument("--clap", help="clean aperture: WN,WD,HN,HD,HON,HOD,VON,VOD")
    p.add_argument("--clli", help="content light level: MaxCLL,MaxPALL")
    p.add_argument("--tx-size", type=int, default=16, choices=(4, 8, 16, 32))
    p.add_argument(
        "-a", "--advanced", action="append", default=[], metavar="KEY=VALUE",
        help="codec-specific option (avifenc -a; e.g. -a enable-cdef=0, "
        "-a cq-level=32, -a mode-breadth=5, -a color:tx-breadth=2)",
    )
    p.add_argument(
        "-c", "--codec", choices=("auto", "spec", "native"), default="auto",
        help="auto/spec: spec-conformant AV1 (decodes in any AVIF "
        "viewer; the default); native: the TPU-pipelined own format "
        "(fastest, decodes only with this framework)",
    )
    p.add_argument(
        "--sharpyuv", action="store_true",
        help="sharp RGB->YUV420 chroma downsampling",
    )
    p.add_argument(
        "--target-size", type=int,
        help="search the quality that fits this many bytes (stills only)",
    )
    p.add_argument(
        "--progressive", metavar="Q1,Q2,...",
        help="layered progressive encode at these qualities (stills only)",
    )
    return p


def _target_size_search(image, args, proto_encoder):
    """Bisect quality to fit --target-size (reference: avifenc.c
    --target-size search loop)."""
    from ..api.encoder import Encoder

    lo, hi = 0, 100
    best = None
    while lo <= hi:
        q = (lo + hi) // 2
        enc = Encoder()
        enc.quality = q
        enc.quality_alpha = proto_encoder.quality_alpha
        enc.speed = proto_encoder.speed
        enc.tx_size = proto_encoder.tx_size
        enc.codec_choice = proto_encoder.codec_choice
        data = enc.write(image)
        if len(data) <= args.target_size:
            best = data
            lo = q + 1  # best quality that still fits
        else:
            hi = q - 1
    if best is None:
        # Even quality 0 exceeds the budget: return the smallest encode.
        enc = Encoder()
        enc.quality = 0
        enc.speed = proto_encoder.speed
        enc.codec_choice = proto_encoder.codec_choice
        best = enc.write(image)
    return best


def _parse_fraction_list(arg, count, flag):
    vals = [int(x) for x in arg.split(",")]
    if len(vals) != count:
        raise SystemExit(f"{flag} expects {count} comma-separated integers")
    return vals


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if "-" in args.inputs:
        # Materialize stdin once so format sniffing and multi-pass reads work.
        import tempfile

        raw = sys.stdin.buffer.read()
        tmp = tempfile.NamedTemporaryFile(suffix=".stdin", delete=False)
        tmp.write(raw)
        tmp.close()
        args.inputs = [tmp.name if p == "-" else p for p in args.inputs]

    from ..api.encoder import Encoder
    from ..constants import PixelFormat, Range, TransformFlags
    from ..image import (
        CleanApertureBox,
        ContentLightLevelInformationBox,
        ImageMirror,
        ImageRotation,
        PixelAspectRatioBox,
    )
    from ..io_formats import read_image
    from ..io_formats.y4m import count_y4m_frames
    from ..io_formats import guess_format

    fmt_map = {
        "444": PixelFormat.YUV444,
        "422": PixelFormat.YUV422,
        "420": PixelFormat.YUV420,
        "400": PixelFormat.YUV400,
    }
    req_fmt = fmt_map[args.yuv] if args.yuv else None

    quality = 100 if args.lossless else args.qcolor
    lossless_identity = False
    if args.lossless and not args.yuv:
        # true RGB-lossless requires 4:4:4 + identity matrix + full range
        # (reference avifenc -l behavior, apps/avifenc.c lossless checks)
        req_fmt = PixelFormat.YUV444
        lossless_identity = True
        if not args.cicp:
            args.cicp = "1/13/0"  # sRGB primaries/transfer, identity matrix

    def load(path):
        from ..constants import MatrixCoefficients

        img = read_image(
            path, requested_format=req_fmt, requested_depth=args.depth,
            sharp_yuv=args.sharpyuv,
            matrix_coefficients=(
                MatrixCoefficients.IDENTITY if lossless_identity else None
            ),
        )
        if args.range == "limited":
            img.yuv_range = Range.LIMITED
        if args.cicp:
            parts = args.cicp.split("/")
            if len(parts) != 3:
                raise SystemExit("--cicp expects P/T/M")
            img.color_primaries = int(parts[0])
            img.transfer_characteristics = int(parts[1])
            img.matrix_coefficients = int(parts[2])
        if args.icc:
            img.icc = pathlib.Path(args.icc).read_bytes()
        if args.exif:
            img.exif = pathlib.Path(args.exif).read_bytes()
        if args.xmp:
            img.xmp = pathlib.Path(args.xmp).read_bytes()
        if args.irot is not None:
            img.irot = ImageRotation(angle=args.irot)
            img.transform_flags |= TransformFlags.IROT
        if args.imir is not None:
            img.imir = ImageMirror(axis=args.imir)
            img.transform_flags |= TransformFlags.IMIR
        if args.pasp:
            h, v = _parse_fraction_list(args.pasp, 2, "--pasp")
            img.pasp = PixelAspectRatioBox(h_spacing=h, v_spacing=v)
            img.transform_flags |= TransformFlags.PASP
        if args.clap:
            v = _parse_fraction_list(args.clap, 8, "--clap")
            img.clap = CleanApertureBox(*v)
            img.transform_flags |= TransformFlags.CLAP
        if args.clli:
            cll, pall = _parse_fraction_list(args.clli, 2, "--clli")
            img.clli = ContentLightLevelInformationBox(max_cll=cll, max_pall=pall)
        return img

    enc = Encoder()
    enc.quality = quality
    enc.quality_alpha = 100 if args.lossless else args.qalpha
    enc.speed = args.speed
    enc.keyframe_interval = args.keyframe
    enc.tx_size = args.tx_size
    enc.codec_choice = args.codec
    for kv in args.advanced:
        if "=" not in kv:
            print(f"bad -a option (need KEY=VALUE): {kv}", file=sys.stderr)
            return 1
        k, v = kv.split("=", 1)
        enc.set_codec_specific_option(k.strip(), v.strip())

    if args.grid:
        try:
            cols, rows = (int(x) for x in args.grid.lower().split("x"))
        except ValueError:
            raise SystemExit("-g/--grid expects MxN")
        if len(args.inputs) != 1:
            raise SystemExit("grid mode takes exactly one input")
        img = load(args.inputs[0])
        cells = []
        cw = -(-img.width // cols)
        ch = -(-img.height // rows)
        # MIAF: cells on non-final edges must be equal size; split evenly.
        from ..image import CropRect

        for r in range(rows):
            for c in range(cols):
                w = min(cw, img.width - c * cw)
                h = min(ch, img.height - r * ch)
                cells.append(img.view_rect(CropRect(c * cw, r * ch, w, h)))
        data = enc.write_grid(cells, columns=cols, rows=rows)
    else:
        # Animation when multiple inputs or a multi-frame y4m.
        frames = []
        for path in args.inputs:
            if guess_format(path) == "y4m":
                n = count_y4m_frames(path)
                from ..io_formats.y4m import read_y4m

                for i in range(n):
                    frames.append(read_y4m(path, i))
            else:
                frames.append(load(path))
        if len(frames) == 1 and args.progressive:
            qualities = [int(q) for q in args.progressive.split(",")]
            data = enc.write_progressive(frames[0], qualities)
        elif len(frames) == 1 and args.target_size:
            data = _target_size_search(frames[0], args, enc)
        elif len(frames) == 1:
            data = enc.write(frames[0])
        else:
            enc.timescale = args.timescale or int(round(args.fps))
            for f in frames:
                enc.add_image(f, duration=args.duration)
            data = enc.finish()

    pathlib.Path(args.output).write_bytes(data)
    print(f"Wrote {args.output}: {len(data)} bytes", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
