"""Inter-frame spec decode conformance: aom-encoded animations vs dav1d.

Mirrors the reference's reliance on dav1d for every legal stream
(codec_dav1d.c:100-156): animations are encoded through the libavif/aom
oracle — at DEFAULT settings wherever possible — then every frame must
decode bit-exactly against dav1d's output. The per-tool phases mirror
the bring-up ladder in tools/inter_probe.py; the default-settings
classes are the round-5 acceptance gates (smoothed ≥128x96 content,
speed sweep — rough noise hides tool bugs, VERDICT r4 #1).
"""

import numpy as np
import pytest

from libavif_tpu.api import Decoder
from libavif_tpu.interop import libavif_oracle as oracle

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="libavif oracle unavailable"
)


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


def smooth_frames(n=4, w=128, h=96, seed=7, depth=8, move=(2, 3)):
    """Box-filtered moving noise: smooth content makes aom pick the
    full toolset (global motion, warp, wedge...) that rough noise never
    triggers."""
    rng = np.random.default_rng(seed)
    maxv = (1 << depth) - 1
    base = rng.integers(0, maxv + 1, (h + 64, w + 64)).astype(np.float32)
    k = 5
    c = np.cumsum(np.cumsum(base, 0), 1)
    c = np.pad(c, ((1, 0), (1, 0)))
    sm = (c[k:, k:] - c[:-k, k:] - c[k:, :-k] + c[:-k, :-k]) / (k * k)
    dt = np.uint16 if depth > 8 else np.uint8
    frames = []
    for t in range(n):
        dy, dx = move[0] * t, move[1] * t
        y = np.clip(sm[dy : dy + h, dx : dx + w], 0, maxv).astype(dt)
        u = np.clip(sm[dy : dy + (h + 1) // 2, dx : dx + (w + 1) // 2] * 0.7,
                    0, maxv).astype(dt)
        v = np.clip(sm[dy : dy + (h + 1) // 2, dx : dx + (w + 1) // 2] * 0.4,
                    0, maxv).astype(dt)
        frames.append([y, u, v])
    return frames


def assert_bit_exact(frames, opts=None, quality=60, speed=6, depth=8,
                     fmt="yuv420"):
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


class TestDefaultToolset:
    """Default-settings aom animations (NO tool disables): the round-5
    acceptance gate. 128x96 smoothed moving texture, speeds 2-8."""

    @pytest.mark.parametrize("speed", [2, 4, 6, 8])
    def test_smoothed_speed_sweep(self, speed):
        assert_bit_exact(smooth_frames(4), speed=speed)

    def test_5frame_pyramid(self):
        # 5+ frames force the two-level GOP pyramid (BWDREF + overlays)
        assert_bit_exact(smooth_frames(5, 80, 80, seed=13), quality=55,
                         speed=5)

    def test_masked_compound_wide(self):
        assert_bit_exact(smooth_frames(5, 128, 64, seed=17), quality=65)

    def test_444_and_422(self):
        f = smooth_frames(5, 80, 80, seed=13)
        f444 = [[fr[0],
                 np.repeat(np.repeat(fr[1], 2, 0), 2, 1)[:80, :80],
                 np.repeat(np.repeat(fr[2], 2, 0), 2, 1)[:80, :80]]
                for fr in f]
        assert_bit_exact(f444, quality=55, speed=5, fmt="yuv444")
        f2 = smooth_frames(5, 128, 64, seed=17)
        f422 = [[fr[0], np.repeat(fr[1], 2, 0)[:64],
                 np.repeat(fr[2], 2, 0)[:64]] for fr in f2]
        assert_bit_exact(f422, quality=65, fmt="yuv422")

    def test_monochrome(self):
        frames = [[fr[0]] for fr in smooth_frames(4, 144, 96, seed=21)]
        assert_bit_exact(frames, quality=50, speed=7, fmt="yuv400")


class TestToolPhases:
    """Single-tool isolation on top of defaults (inter_probe ladder)."""

    @pytest.mark.parametrize("tool", [
        "enable-global-motion", "enable-obmc", "enable-warped-motion",
        "enable-dual-filter", "enable-dist-wtd-comp", "enable-ref-frame-mvs",
    ])
    def test_tool_off_still_exact(self, tool):
        # disabling any single tool must stay bit-exact (guards against
        # syntax-flow bugs that only show with specific tool subsets)
        assert_bit_exact(smooth_frames(4), opts={tool: "0"}, speed=4)


class TestSingleRefTranslational:
    def test_static_scene(self):
        assert_bit_exact(make_frames(3, static=True))

    @pytest.mark.parametrize("q", [
        35,
        60, 85,
    ])
    def test_moving_quality_sweep(self, q):
        assert_bit_exact(make_frames(4), quality=q)

    def test_moving_speed_sweep(self):
        f = make_frames(4)
        for s in (2, 8, 10):
            assert_bit_exact(f, quality=70, speed=s)

    @pytest.mark.parametrize("wh", [(96, 48), (80, 64), (64, 128)])
    def test_nonsquare_dims(self, wh):
        assert_bit_exact(make_frames(4, *wh))

    def test_longer_low_delay(self):
        assert_bit_exact(make_frames(8), opts={"auto-alt-ref": "0"})

    def test_random_access_seek(self):
        frames = make_frames(6)
        data = oracle.encode_animation(
            frames, quality=60, speed=6, codec_options={"auto-alt-ref": "0"}
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


class TestDifferentialFuzz:
    """Randomized (content, size, speed, quality) differential check:
    whatever aom encodes at default settings must decode bit-exact —
    wrong pixels with rc=0 are never acceptable (VERDICT r4 #2)."""

    @pytest.mark.parametrize("seed", [3, 23, 29])
    def test_random_configs(self, seed):
        rng = np.random.default_rng(seed)
        w = int(rng.choice([64, 96, 128, 160, 256]))
        h = int(rng.choice([64, 96, 128, 192]))
        n = int(rng.integers(2, 6))
        q = int(rng.integers(35, 90))
        s = int(rng.integers(4, 9))
        assert_bit_exact(smooth_frames(n, w, h, seed=seed), quality=q, speed=s)


class TestWedgeConformance:
    """Crafted compound-WEDGE streams (tools/wedge_conformance.py): a
    grid of skip=1 GLOBAL_GLOBALMV (LAST, LAST2) wedge blocks over
    constant 255/0 reference planes, so the reconstruction IS the wedge
    mask — dav1d (and libaom where available) adjudicate every
    (index, sign) for the block shape bit-exactly."""

    @pytest.mark.parametrize("shape", [(16, 16), (32, 8)])
    def test_wedge_grid_bit_exact(self, shape):
        import tools.wedge_conformance as WC
        from libavif_tpu.codec.av1.stream import StreamDecoder
        from libavif_tpu.interop import dav1d_oracle

        bw, bh = shape
        payloads, _ = WC.build_stream(bw, bh)
        dav = dav1d_oracle.decode_obus(payloads)
        sd = StreamDecoder()
        ours = []
        for p in payloads:
            ours += [s[0] for s in sd.decode_obus(p)]
        np.testing.assert_array_equal(
            np.asarray(ours[2][0], np.int64),
            np.asarray(dav[2].planes[0], np.int64),
        )
