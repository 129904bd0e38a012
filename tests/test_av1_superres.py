"""Superres (§7.16): decode-side upscale verified bit-exactly in dav1d.

The encoder emits superres frame headers (the planes are the coded,
downscaled frame); real dav1d (through the libavif oracle) decodes and
upscales, and our decoder must match it pixel-exactly — including
non-8-aligned coded widths, whose final taps read the decoder's
mi-padding pixels (tests the clamp_w rule), and odd upscaled widths.

Reference roles: aom av1_upscale_normative_rows / dav1d mc.resize; the
filter table is the spec constant av1_resize_filter_normative.
"""

import numpy as np
import pytest

from libavif_tpu.codec.av1 import encode as E
from libavif_tpu.codec.av1.stream import decode_still
from libavif_tpu.interop import libavif_oracle as oracle

from test_av1_lossy import _photo, _wrap

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="libavif oracle unavailable"
)


def _encode_decode(denom, up_w, h=96, **kw):
    cw = (up_w * 8 + denom // 2) // denom
    assert cw % 2 == 0, "test configs use even coded widths"
    pl = _photo(cw, h, seed=denom)
    payload = E.encode_lossy_still(
        pl, qindex=60, speed=6, superres_denom=denom, upscaled_width=up_w, **kw
    )
    ours = decode_still(payload)[0]
    ref = oracle.decode(_wrap(payload, up_w, h))
    return ours, ref


@pytest.mark.parametrize("denom,up_w", [(9, 216), (12, 288), (16, 384)])
def test_superres_dav1d_bit_exact(denom, up_w):
    ours, ref = _encode_decode(denom, up_w)
    assert ours[0].shape == (96, up_w)
    for a, b in zip(ours, ref.planes):
        assert np.array_equal(a.astype(np.uint8), b)


def test_superres_unaligned_coded_width():
    """Coded width not a multiple of 8: the upscale's right-edge taps
    read the decoder's mi-padding pixels, as dav1d does."""
    ours, ref = _encode_decode(9, 320)  # coded 284
    for a, b in zip(ours, ref.planes):
        assert np.array_equal(a.astype(np.uint8), b)


def test_superres_filter_table_invariants():
    from libavif_tpu.codec.av1.superres import _FILTER

    assert _FILTER.shape == (64, 8)
    assert (_FILTER.sum(axis=1) == 128).all()
    assert list(_FILTER[0]) == [0, 0, 0, 128, 0, 0, 0, 0]
    # phase symmetry: row[64-k] is row[k] reversed
    for k in range(1, 8):
        assert list(_FILTER[64 - k][::-1]) == list(_FILTER[k])


def test_superres_coded_width_validation():
    from libavif_tpu.constants import AvifError

    pl = _photo(100, 64)
    with pytest.raises(AvifError):
        E.encode_lossy_still(pl, qindex=60, speed=8, superres_denom=12,
                             upscaled_width=300)  # derives 200 != 100


@pytest.mark.parametrize("denom,up_w,cdef", [(12, 288, False), (9, 216, True)])
def test_superres_plus_loop_restoration(denom, up_w, cdef):
    """§7.16 + §7.17 combined: LR runs in the UPSCALED domain — unit
    columns map through the superres scale (§5.11.57) and the stripe
    boundary rows come from the upscaled deblocked frame. dav1d is the
    oracle (the reference decodes these via codec_dav1d.c:58)."""

    class ForceLr(E.LossyPlanner):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self._lr_i = 0

        def next_symbol(self, n, what=None):
            if what == "lr":
                v = [1, 2, 0][self._lr_i % 3]  # wiener, sgr, none, ...
                self._lr_i += 1
                return min(v, n - 1)
            return super().next_symbol(n, what)

    cw = (up_w * 8 + denom // 2) // denom
    pl = _photo(cw, 96, seed=denom)
    old = E.LossyPlanner
    try:
        E.LossyPlanner = ForceLr
        # cdef=True exercises the distinct stripe-boundary source: LR's
        # boundary rows are pre-CDEF pixels while the filtered area is
        # post-CDEF, both upscaled
        payload = E.encode_lossy_still(
            pl, qindex=60, superres_denom=denom, upscaled_width=up_w,
            enable_lr=True, enable_cdef=cdef,
        )
    finally:
        E.LossyPlanner = old
    out, _, hdr = decode_still(payload)
    assert any(t != 0 for t in hdr.lr.frame_restoration_type)
    assert hdr.upscaled_width == up_w and hdr.width == cw
    ref = oracle.decode(_wrap(payload, up_w, 96))
    for a, b in zip(out, ref.planes):
        assert np.array_equal(a.astype(np.uint8), b)
