"""Deblocking-filter conformance (AV1 §7.14).

Real libaom streams at qualities that enable non-trivial loop-filter
levels must reconstruct bit-exactly, including:
- 14/8/6/4-tap filters, per-column flat/hev selection,
- edges at the visible-frame boundary (never filtered),
- rectangular-tx coefficient contexts and frame-clipped blocks
  feeding the filters (regressions caught by odd frame sizes).
"""

import numpy as np
import pytest

from libavif_tpu.codec.av1.still import decode_still
from libavif_tpu.interop import libavif_oracle as oracle

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="libavif oracle unavailable"
)


def _photo(w, h, seed):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (128 + 80 * np.sin(yy / 9.0) * np.cos(xx / 11.0)
         + (rng.rand(h, w) * 20 - 10)).clip(0, 255).astype(np.uint8)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    u = (128 + 50 * np.sin(np.mgrid[0:ch, 0:cw][1] / 7.0)).clip(0, 255).astype(np.uint8)
    v = (128 + 50 * np.cos(np.mgrid[0:ch, 0:cw][0] / 5.0)).clip(0, 255).astype(np.uint8)
    return [y, u, v]


@pytest.mark.parametrize(
    "w,h,seed,quality",
    [
        (64, 64, 5, 40),     # filter14 luma paths, strong levels
        (64, 64, 5, 12),     # very strong levels
        (100, 76, 4, 70),    # visible-edge boundary (w%8 != 0)
        (200, 120, 6, 30),   # frame-clipped blocks + rect-tx contexts
        (65, 49, 5, 45),     # odd dims both directions
    ],
)
def test_decode_with_deblocking_bit_exact(w, h, seed, quality):
    pl = _photo(w, h, seed)
    data = oracle.encode(pl, quality=quality, speed=6)
    ref = oracle.decode(data)
    payload = data[data.find(b"mdat") + 4 :]
    out, _, hdr = decode_still(payload)
    assert any(hdr.lf.levels), "stream should exercise the loop filter"
    for ours, want in zip(out, ref.planes):
        assert np.array_equal(ours.astype(np.uint8), want)

def test_filter_lines_matches_scalar_reference():
    """The vectorized _filter_lines core must match the per-line scalar
    _filter_edge reference for every size/bd/threshold combination."""
    from libavif_tpu.codec.av1.loopfilter import (
        _filter_edge,
        _filter_lines,
        _thresholds,
    )

    rng = np.random.RandomState(3)
    for bd in (8, 10, 12):
        maxv = (1 << bd) - 1
        for size_pool in ((4, 8, 14), (4, 6)):  # luma / chroma size sets
            n = 512
            # mix of smooth lines (trigger flat/wide paths) and noisy ones
            base = rng.randint(0, maxv + 1, (n, 1))
            noise_amp = rng.choice([1, 3, 16, maxv // 2], (n, 1))
            lines = np.clip(
                base + rng.randint(-1, 2, (n, 14)) * noise_amp, 0, maxv
            ).astype(np.int32)
            size = rng.choice(size_pool, n).astype(np.int32)
            lvl = rng.randint(1, 64, n)
            sharp = int(rng.randint(0, 8))
            th = np.array([_thresholds(int(l), sharp, bd) for l in lvl], np.int64).T
            limit, blimit, thresh = (a.astype(np.int32) for a in th)
            out, n_mod = _filter_lines(lines, size, limit, blimit, thresh, bd)
            for i in range(n):
                ref = _filter_edge(
                    list(lines[i]), int(limit[i]), int(blimit[i]),
                    int(thresh[i]), int(size[i]), bd,
                )
                if ref is None:
                    assert n_mod[i] == 0, i
                else:
                    assert n_mod[i] > 0, i
                    assert list(out[i]) == list(ref), (i, int(size[i]), bd)
