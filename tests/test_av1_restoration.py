"""Loop-restoration conformance (AV1 §5.11.57 / §7.17).

aom speed-4 still encodes enable Wiener restoration; these streams must
reconstruct bit-exactly through the per-unit syntax (subexp taps with
inverse-recenter references) and the two-pass stripe filter.
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
        (64, 64, 1, 70),     # wiener y+u+v, two stripes, one unit
        (200, 120, 6, 30),   # luma-only wiener, multiple SBs
        (144, 112, 9, 30),
    ],
)
def test_decode_wiener_restoration_bit_exact(w, h, seed, quality):
    pl = _photo(w, h, seed)
    data = oracle.encode(pl, quality=quality, speed=4)
    ref = oracle.decode(data)
    out, _, hdr = decode_still(data[data.find(b"mdat") + 4 :])
    assert any(t == 2 for t in hdr.lr.frame_restoration_type), "expected wiener LR"
    for ours, want in zip(out, ref.planes):
        assert np.array_equal(ours.astype(np.uint8), want)


def test_encoder_wiener_restoration_conformant(monkeypatch):
    """Encoder-side Wiener search (two-pass mirror encode): force unit
    selection with a tiny lambda and check the stream decodes bit-exact
    in dav1d AND libaom (subexp tap symbolization + read_lr replay)."""
    import numpy as np

    from libavif_tpu.codec.av1 import encode as E
    from libavif_tpu.codec.av1 import restoration as R
    from libavif_tpu.codec.av1.stream import StreamDecoder
    from libavif_tpu.interop import dav1d_oracle
    from libavif_tpu.interop import aom_oracle

    orig = R.search_wiener_plan
    monkeypatch.setattr(
        E, "encode_lossy_still", E.encode_lossy_still)  # anchor module
    monkeypatch.setattr(
        R, "search_wiener_plan", lambda dec, srcs, lam: orig(dec, srcs, 0.01))

    rng = np.random.RandomState(2)
    y = (rng.rand(96, 128) * 255).astype(np.uint8)
    u = (rng.rand(48, 64) * 255).astype(np.uint8)
    v = (rng.rand(48, 64) * 255).astype(np.uint8)
    data = E.encode_lossy_still([y, u, v], 150, speed=7, enable_lr=True)
    # count wiener units actually coded (guards against the planner
    # silently answering RESTORE_NONE)
    n_wiener = 0
    orig_unit = R._read_lr_unit

    def spy(dec, plane, ur, uc):
        nonlocal n_wiener
        orig_unit(dec, plane, ur, uc)
        if int(dec.lr_type[plane][ur, uc]) in (2, 3):
            n_wiener += 1

    monkeypatch.setattr(R, "_read_lr_unit", spy)
    ours = StreamDecoder().decode_obus(data)[0][0]
    monkeypatch.setattr(R, "_read_lr_unit", orig_unit)
    assert n_wiener > 0, "no restoration unit coded"
    dav = dav1d_oracle.decode_obus([data])[0]
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(ours[i], np.int64), np.asarray(dav.planes[i], np.int64))
    if aom_oracle.available():
        aomp = aom_oracle.decode_raw(data)
        assert aomp is not None, "libaom rejected the LR stream"
        for i in range(3):
            np.testing.assert_array_equal(
                np.asarray(ours[i], np.int64), np.asarray(aomp[i], np.int64))
