"""Inter-frame spec decode conformance: aom-encoded animations vs dav1d.

Mirrors the reference's reliance on dav1d for every legal stream
(codec_dav1d.c:100-156): animations are encoded through the libavif/aom
oracle with controlled coding tools, then every frame must decode
bit-exactly against dav1d's output. Tool phases mirror the bring-up
ladder in tools/inter_probe.py.
"""

import numpy as np
import pytest

from libavif_tpu.api import Decoder
from libavif_tpu.interop import libavif_oracle as oracle

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="libavif oracle unavailable"
)

# tools outside the currently-validated set are disabled per case
BASE_OFF = {
    "enable-obmc": "0",
    "enable-warped-motion": "0",
    "enable-global-motion": "0",
    "enable-ref-frame-mvs": "0",
    "enable-dual-filter": "0",
    "enable-masked-comp": "0",
    "enable-diff-wtd-comp": "0",
    "enable-interinter-wedge": "0",
    "enable-interintra-comp": "0",
    "enable-interintra-wedge": "0",
    "enable-smooth-interintra": "0",
    "enable-dist-wtd-comp": "0",
    "enable-onesided-comp": "0",
}


def make_frames(n=4, w=64, h=64, seed=7, depth=8, static=False):
    rng = np.random.default_rng(seed)
    maxv = (1 << depth) - 1
    base = rng.integers(0, maxv + 1, (h + 32, w + 32))
    dt = np.uint16 if depth > 8 else np.uint8
    frames = []
    for t in range(n):
        dy, dx = (0, 0) if static else (t, 2 * t)
        y = base[dy : dy + h, dx : dx + w].astype(dt)
        u = np.full(((h + 1) // 2, (w + 1) // 2), (maxv * 2) // 5, dtype=dt)
        v = np.full(((h + 1) // 2, (w + 1) // 2), (maxv * 3) // 5, dtype=dt)
        frames.append([y, u, v])
    return frames


def assert_bit_exact(frames, opts, quality=60, speed=6, depth=8, fmt="yuv420"):
    data = oracle.encode_animation(
        frames, depth=depth, yuv_format=fmt, quality=quality, speed=speed,
        codec_options=opts,
    )
    want = oracle.decode_frames(data)
    d = Decoder()
    d.parse(data)
    assert d.image_count == len(want)
    for i, ofr in enumerate(want):
        d.next_image()
        for ci, op in enumerate(ofr.planes):
            np.testing.assert_array_equal(
                d.image.yuv_planes[ci].astype(np.int64),
                op.astype(np.int64),
                err_msg=f"frame {i} plane {ci}",
            )


class TestSingleRefTranslational:
    def test_static_scene(self):
        assert_bit_exact(make_frames(3, static=True), dict(BASE_OFF))

    def test_moving_quality_sweep(self):
        f = make_frames(4)
        for q in (35, 60, 85):
            assert_bit_exact(f, dict(BASE_OFF), quality=q)

    def test_moving_speed_sweep(self):
        f = make_frames(4)
        for s in (2, 8, 10):
            assert_bit_exact(f, dict(BASE_OFF), quality=70, speed=s)

    def test_nonsquare_dims(self):
        for (w, h) in ((96, 48), (80, 64), (64, 128)):
            assert_bit_exact(make_frames(4, w, h), dict(BASE_OFF))

    def test_longer_low_delay(self):
        opts = dict(BASE_OFF)
        opts["auto-alt-ref"] = "0"
        assert_bit_exact(make_frames(8), opts)

    def test_random_access_seek(self):
        opts = dict(BASE_OFF)
        opts["auto-alt-ref"] = "0"
        frames = make_frames(6)
        data = oracle.encode_animation(
            frames, quality=60, speed=6, codec_options=opts
        )
        want = oracle.decode_frames(data)
        d = Decoder()
        d.parse(data)
        img = d.nth_image(4)  # decodes 0..4 from the keyframe
        np.testing.assert_array_equal(
            img.yuv_planes[0].astype(np.int64), want[4].planes[0].astype(np.int64)
        )
        img = d.nth_image(2)  # backward seek restarts at the keyframe
        np.testing.assert_array_equal(
            img.yuv_planes[0].astype(np.int64), want[2].planes[0].astype(np.int64)
        )
