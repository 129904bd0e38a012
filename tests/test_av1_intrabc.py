"""Intrabc (screen content) decode — bit-exactness vs dav1d.

The reference decodes intrabc streams via dav1d (codec_dav1d.c:58);
here the DV prediction stack, MV_INTRABC_CONTEXT entropy, and
current-frame bilinear MC are native. Streams are generated through the
aom oracle with tune-content=screen + enable-intrabc at low speeds.

Known limitation (tracked in COVERAGE.md): some narrow-vertical-rect
blocks whose DV-predictor stack has an exact weight tie can resolve the
tie differently from libaom's (undocumented) candidate-scan ordering;
such streams decode cleanly but may differ from dav1d in copy regions.
The cases below are dav1d-bit-exact and cover 150+ intrabc blocks.
"""

import numpy as np
import pytest

from libavif_tpu.api import Decoder
from libavif_tpu.codec.av1 import interdec as ID
from libavif_tpu.interop import libavif_oracle as oracle

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="libavif oracle unavailable"
)


def _screen(h, w, gl=16, n=8, seed=4):
    r = np.random.default_rng(seed)
    glyphs = [r.integers(0, 256, (gl, gl)).astype(np.uint8) for _ in range(n)]
    y = np.zeros((h, w), np.uint8)
    for by in range(0, h, gl):
        for bx in range(0, w, gl):
            y[by : by + gl, bx : bx + gl] = glyphs[(by // gl * 3 + bx // gl) % n][
                : min(gl, h - by), : min(gl, w - bx)
            ]
    return y


def _roundtrip(tag, planes, fmt, quality, speed, min_blocks):
    count = [0]
    orig = ID.intrabc_mode_info

    def spy(*a, **kw):
        count[0] += 1
        return orig(*a, **kw)

    data = oracle.encode_animation(
        [planes], yuv_format=fmt, quality=quality, speed=speed,
        codec_options={"tune-content": "screen", "enable-intrabc": "1"})
    ofr = oracle.decode_frames(data)[0]
    ID.intrabc_mode_info = spy
    try:
        d = Decoder()
        d.parse(data)
        d.next_image()
    finally:
        ID.intrabc_mode_info = orig
    assert count[0] >= min_blocks, (
        f"{tag}: stream exercises only {count[0]} intrabc blocks"
    )
    for i, th in enumerate(ofr.planes):
        ours = np.asarray(d.image.yuv_planes[i])[: th.shape[0], : th.shape[1]]
        assert np.array_equal(ours.astype(np.int64), th.astype(np.int64)), (
            f"{tag}: plane {i} mismatch"
        )


def test_intrabc_glyph_screen_odd_dims():
    """Dense intrabc (134 blocks incl. 4xN/Nx4, multi-SB rows) on odd
    frame dims, decoded bit-exact vs dav1d."""
    h, w = 197, 333
    cw, ch = (w + 1) >> 1, (h + 1) >> 1
    planes = [
        _screen(h, w, seed=77),
        _screen(ch, cw, gl=8, seed=78),
        _screen(ch, cw, gl=8, seed=79),
    ]
    _roundtrip("odd-glyphs", planes, "yuv420", 60, 2, min_blocks=100)


def test_intrabc_unique_content_pair():
    """Right half is an exact copy of unique left-half content: every DV
    resolves to one true source — validates DV semantics, not just
    pixels."""
    r = np.random.default_rng(42)
    h, w = 128, 768
    left = np.full((h, w // 2), 235, np.uint8)
    for _ in range(900):
        yy = int(r.integers(0, h - 3))
        xx = int(r.integers(0, w // 2 - 8))
        left[yy : yy + int(r.integers(1, 3)), xx : xx + int(r.integers(2, 8))] = int(
            r.integers(0, 60)
        )
    y = np.concatenate([left, left], axis=1)
    uh = np.full((h // 2, w // 4), 128, np.uint8)
    planes = [y, np.concatenate([uh, uh], 1), np.concatenate([uh, uh], 1)]
    _roundtrip("text-pair", planes, "yuv420", 80, 2, min_blocks=8)


def test_intrabc_monochrome():
    _roundtrip("mono", [_screen(160, 160, seed=5)], "yuv400", 70, 2,
               min_blocks=8)


def test_edge_palette_chroma_map_bit_exact():
    """Frame-edge 4xN blocks with chroma palettes: §5.11.43 widens a
    sub-4 chroma map dimension by 2 on BOTH the block and the ONSCREEN
    extent — clipping the onscreen width without the widening under-reads
    the map and silently desyncs the rest of the tile (round-5 fix;
    reproduced from fuzzed aom screen-content encodes)."""

    def _glyphs(h, w, gl, n, seed):
        r = np.random.default_rng(seed)
        gs = [r.integers(0, 256, (gl, gl)).astype(np.uint8) for _ in range(n)]
        y = np.zeros((h, w), np.uint8)
        for by in range(0, h, gl):
            for bx in range(0, w, gl):
                y[by : by + gl, bx : bx + gl] = gs[(by // gl * 3 + bx // gl) % n][
                    : min(gl, h - by), : min(gl, w - bx)
                ]
        return y

    # the original fuzz reproducer: 64x64 q95 s2, VERT_4 palette strips
    # with chroma palettes in the last mi column
    for seed, gl, n, h, w, q, sp in [
        (764890, 12, 8, 64, 64, 95, 2),
        (232373, 16, 8, 64, 333, 95, 2),
    ]:
        cw, ch = (w + 1) >> 1, (h + 1) >> 1
        planes = [
            _glyphs(h, w, gl, n, seed),
            _glyphs(ch, cw, max(4, gl // 2), n, seed + 1),
            _glyphs(ch, cw, max(4, gl // 2), n, seed + 2),
        ]
        data = oracle.encode_animation(
            [planes], quality=q, speed=sp,
            codec_options={"tune-content": "screen", "enable-intrabc": "1"},
        )
        ofr = oracle.decode_frames(data)[0]
        d = Decoder()
        d.parse(data)
        d.next_image()
        for i, th in enumerate(ofr.planes):
            ours = np.asarray(d.image.yuv_planes[i])[: th.shape[0], : th.shape[1]]
            assert np.array_equal(ours.astype(np.int64), th.astype(np.int64)), (
                f"seed {seed} plane {i}"
            )


def test_intrabc_encode_repeated_content():
    """Encoder-side intra block copy: repeated regions code as skip
    DV-copy blocks (av1_is_dv_valid wavefront rule), shrinking
    repeated-texture screen content several-fold at identical
    distortion; bit-exact in dav1d and libaom."""
    import numpy as np

    from libavif_tpu.codec.av1.encode import encode_lossy_still
    from libavif_tpu.codec.av1.stream import StreamDecoder
    from libavif_tpu.interop import dav1d_oracle

    rng = np.random.RandomState(7)
    H, W = 448, 640
    y = np.full((H, W), 240, np.uint8)
    nz = rng.randint(0, 256, (8, W)).astype(np.uint8)
    for row in range(16, H, 64):
        y[row:row + 8] = nz
    u = np.full((H // 2, W // 2), 128, np.uint8)
    v = np.full((H // 2, W // 2), 128, np.uint8)
    base = encode_lossy_still([y, u, v], 100, speed=6, allow_scc=True)
    ibc = encode_lossy_still([y, u, v], 100, speed=6, allow_scc=True,
                             allow_intrabc=True)
    assert len(ibc) < len(base) * 0.5, (len(ibc), len(base))
    rec = StreamDecoder().decode_obus(ibc)[0][0]
    dav = dav1d_oracle.decode_obus([ibc])[0]
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(rec[i], np.int64), np.asarray(dav.planes[i], np.int64))
    from libavif_tpu.interop import aom_oracle
    if aom_oracle.available():
        aomp = aom_oracle.decode_raw(ibc)
        assert aomp is not None, "libaom rejected the intrabc stream"
        for i in range(3):
            np.testing.assert_array_equal(
                np.asarray(rec[i], np.int64), np.asarray(aomp[i], np.int64))
