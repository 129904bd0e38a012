"""Film grain synthesis (§7.18.3) — bit-exactness vs dav1d.

The reference returns dav1d's post-grain planes directly
(codec_dav1d.c:204-223); these tests hold our synthesis to the same
output on (a) aom-generated grain streams (denoise-noise-level), (b)
streams our own spec encoder writes with adversarial parameter sets
(all depths/subsamplings, chroma-from-luma, AR lags 0-3, overlap,
restricted range), and (c) animated streams, proving inter prediction
runs on pre-grain reference frames.
"""

import numpy as np
import pytest

from libavif_tpu.codec.av1 import encode as E
from libavif_tpu.codec.av1.headers import FilmGrainParams
from libavif_tpu.codec.av1.still import decode_still
from libavif_tpu.constants import Range
from libavif_tpu.containers.items import (
    CodecConfiguration,
    ColorInformation,
    ImageSpatialExtents,
    PixelInformation,
)
from libavif_tpu.containers.write import OutputItem, Property, write_still
from libavif_tpu.interop import libavif_oracle as oracle

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="libavif oracle unavailable"
)

RNG = np.random.default_rng(5)


def _fg(**kw):
    fg = FilmGrainParams(apply=True, seed=kw.pop("seed", 12345))
    for k, v in kw.items():
        setattr(fg, k, v)
    return fg


def _container(payload, w, h, depth, sx, sy, mono):
    if depth == 12:
        profile = 2
    elif mono or (sx and sy):
        profile = 0
    elif not sx and not sy:
        profile = 1
    else:
        profile = 2
    item = OutputItem(
        id=1, item_type="av01", payload=payload,
        properties=[
            Property("ispe", ImageSpatialExtents(w, h)),
            Property("pixi", PixelInformation(
                plane_depths=[depth] * (1 if mono else 3))),
            Property("av1C", CodecConfiguration(
                chroma_subsampling_x=sx, chroma_subsampling_y=sy,
                monochrome=mono, high_bitdepth=depth > 8,
                twelve_bit=depth == 12, seq_profile=profile)),
            Property("colr", ColorInformation(
                has_nclx=True, color_primaries=2,
                transfer_characteristics=2, matrix_coefficients=2,
                yuv_range=Range.FULL)),
        ],
    )
    return write_still([item], 1)


def _assert_matches_dav1d(tag, fg, h=96, w=160, depth=8, sx=1, sy=1,
                          mono=False):
    mx = (1 << depth) - 1
    dt = np.uint8 if depth == 8 else np.uint16
    pl = [RNG.integers(0, mx + 1, (h, w)).astype(dt)]
    if not mono:
        pl += [
            RNG.integers(0, mx + 1, ((h + sy) >> sy, (w + sx) >> sx)).astype(dt)
            for _ in range(2)
        ]
    payload = E.encode_lossy_still(
        pl, qindex=100, speed=9, monochrome=mono, subsampling_x=sx,
        subsampling_y=sy, bit_depth=depth, film_grain=fg)
    data = _container(payload, w, h, depth, sx, sy, mono)
    ofr = oracle.decode_frames(data)[0]
    planes, _, _ = decode_still(payload)
    for i, th in enumerate(ofr.planes):
        ours = np.asarray(planes[i])[: th.shape[0], : th.shape[1]]
        assert np.array_equal(ours.astype(np.int64), th.astype(np.int64)), (
            f"{tag}: plane {i} mismatch "
            f"({int((ours.astype(np.int64) != th.astype(np.int64)).sum())} px)"
        )


PY = [(0, 40), (40, 48), (128, 60), (255, 44)]
PCB = [(0, 30), (128, 36), (255, 24)]
PCR = [(0, 28), (96, 20), (255, 35)]
AR2 = [int(v) for v in np.random.default_rng(7).integers(-30, 30, 12)]
AR3 = [int(v) for v in np.random.default_rng(8).integers(-20, 20, 24)]

CASES = [
    ("lag3-overlap-clip-8b", dict(fg=_fg(
        point_y=PY, point_cb=PCB, point_cr=PCR, ar_coeff_lag=3,
        ar_coeffs_y=AR3, ar_coeffs_cb=AR3 + [15], ar_coeffs_cr=AR3 + [-12],
        overlap_flag=True, clip_to_restricted_range=True, ar_coeff_shift=7,
        cb_mult=200, cb_luma_mult=64, cb_offset=100,
        cr_mult=90, cr_luma_mult=180, cr_offset=400))),
    ("chroma-from-luma", dict(fg=_fg(
        point_y=PY, chroma_scaling_from_luma=True, ar_coeff_lag=1,
        ar_coeffs_y=[5, -9, 22, -30], ar_coeffs_cb=[1, 2, 3, 4, 5],
        ar_coeffs_cr=[-1, -2, -3, -4, -5], overlap_flag=True))),
    ("chroma-only-444", dict(fg=_fg(
        point_y=[], point_cb=PCB, point_cr=PCR, ar_coeff_lag=2,
        ar_coeffs_cb=AR2, ar_coeffs_cr=[-v for v in AR2], overlap_flag=True,
        cb_mult=160, cb_luma_mult=100, cb_offset=300,
        cr_mult=120, cr_luma_mult=140, cr_offset=200), sx=0, sy=0)),
    ("10bit-420-gss", dict(fg=_fg(
        point_y=PY, point_cb=PCB, point_cr=PCR, ar_coeff_lag=2,
        ar_coeffs_y=AR2, ar_coeffs_cb=AR2 + [10],
        ar_coeffs_cr=[-v for v in AR2] + [-7], overlap_flag=True,
        grain_scale_shift=1, cb_mult=160, cb_luma_mult=100, cb_offset=300,
        cr_mult=120, cr_luma_mult=140, cr_offset=200), depth=10)),
    ("12bit-422-clip", dict(fg=_fg(
        point_y=PY, point_cb=PCB, point_cr=PCR, ar_coeff_lag=1,
        ar_coeffs_y=[5, -9, 22, -30], ar_coeffs_cb=[1, 2, 3, 4, 5],
        ar_coeffs_cr=[-1, -2, -3, -4, -5], overlap_flag=True,
        clip_to_restricted_range=True, cb_mult=160, cb_luma_mult=100,
        cb_offset=300, cr_mult=120, cr_luma_mult=140, cr_offset=200),
        depth=12, sx=1, sy=0)),
    ("odd-dims-luma-only", dict(fg=_fg(
        point_y=PY, ar_coeff_lag=1, ar_coeffs_y=[9, -10, 11, -12],
        overlap_flag=True), h=101, w=167)),
]


@pytest.mark.parametrize("tag,kw", CASES, ids=[c[0] for c in CASES])
def test_grain_parameter_space_dav1d_exact(tag, kw):
    """Our encoder writes §5.9.30 grain params; dav1d's synthesis and
    ours must produce identical planes."""
    _assert_matches_dav1d(tag, **kw)


def test_aom_denoise_grain_stream_exact():
    """A stream whose grain aom itself estimated (denoise-noise-level)
    decodes bit-exactly — grain params we didn't choose."""
    rng = np.random.default_rng(3)
    h, w = 96, 128
    pl = [
        rng.integers(0, 256, (h, w)).astype(np.uint8),
        rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
        rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
    ]
    data = oracle.encode_animation(
        [pl], quality=70, speed=6,
        codec_options={"denoise-noise-level": "25"})
    ofr = oracle.decode_frames(data)[0]
    from libavif_tpu.api.decoder import Decoder

    d = Decoder()
    d.parse(data)
    d.next_image()
    for i, th in enumerate(ofr.planes):
        ours = np.asarray(d.image.yuv_planes[i])[: th.shape[0], : th.shape[1]]
        assert np.array_equal(ours.astype(np.int64), th.astype(np.int64))


def test_animated_grain_references_pre_grain_frames():
    """Grain is an output transform: inter frames predict from the
    pre-grain reconstruction. Every frame of an animated grain stream
    must stay bit-exact."""
    rng = np.random.default_rng(9)
    h, w = 96, 128
    base = rng.integers(0, 256, (h, w)).astype(np.uint8)
    frames = []
    for t in range(4):
        frames.append([
            np.clip(base.astype(np.int64) + t * 3, 0, 255).astype(np.uint8),
            np.full((h // 2, w // 2), 100 + t, np.uint8),
            np.full((h // 2, w // 2), 150 - t, np.uint8),
        ])
    data = oracle.encode_animation(
        frames, quality=70, speed=6,
        codec_options={"denoise-noise-level": "20"})
    ofrs = oracle.decode_frames(data)
    from libavif_tpu.api.decoder import Decoder

    d = Decoder()
    d.parse(data)
    for i in range(len(ofrs)):
        d.next_image()
        for pi, th in enumerate(ofrs[i].planes):
            ours = np.asarray(d.image.yuv_planes[pi])[
                : th.shape[0], : th.shape[1]
            ]
            assert np.array_equal(
                ours.astype(np.int64), th.astype(np.int64)
            ), f"frame {i} plane {pi}"
