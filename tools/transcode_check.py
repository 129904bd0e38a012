"""Entropy-transcode validator: find the FIRST misread symbol in a tile.

Decodes a spec-AV1 frame while recording every entropy operation (symbol
with its pre-read CDF snapshot, raw bit, literal/golomb expansion), then
replays the sequence through the bit-exact msac interval arithmetic and
checks after each op that the ORIGINAL tile bytes still lie inside the
encoder interval [low, low+rng). The first op where the containment
fails is the first symbol our decoder interpreted differently from the
one the (reference) encoder wrote — an exact desync localizer that needs
no access to libaom internals.

Usage: imported by debug scripts; see check_frame().
"""

from __future__ import annotations

import numpy as np

from libavif_tpu.models.av1 import msac as MS


class RecordingDecoder(MS.MsacDecoder):
    """MsacDecoder that logs every op with a caller-provided labeler."""

    def __init__(self, data: bytes, log: list, labeler):
        super().__init__(data)
        self._log = log
        self._labeler = labeler

    def decode_symbol(self, icdf, n, adapt=True, what=None):
        snap = icdf[: n].astype(np.uint16).copy()
        v = super().decode_symbol(icdf, n, adapt=adapt, what=what)
        self._log.append(("sym", int(v), snap, n, what, self._labeler()))
        return v

    def decode_bit(self):
        v = super().decode_bit()
        self._log.append(("bit", int(v), None, 2, "raw", self._labeler()))
        return v


def first_divergence(data: bytes, log: list):
    """Replay `log` through encoder interval math; return (index, op) of
    the first op after which `data` falls outside [low, low+rng), or
    (None, None) if the whole sequence is consistent."""
    orig = int.from_bytes(data, "big")
    nbits_total = len(data) * 8
    low = 0
    rng = MS.PROB_TOP
    shift = 0
    for i, (kind, val, snap, n, what, label) in enumerate(log):
        r8 = rng >> 8
        if kind == "sym":
            s = val
            if s == 0:
                v_prev = rng
            else:
                v_prev = ((r8 * (int(snap[s - 1]) >> MS.EC_PROB_SHIFT)) >> 1) + (
                    MS.EC_MIN_PROB * (n - s)
                )
            v_cur = ((r8 * (int(snap[s]) >> MS.EC_PROB_SHIFT)) >> 1) + (
                MS.EC_MIN_PROB * (n - 1 - s)
            )
            low += rng - v_prev
            rng = v_prev - v_cur
        else:  # raw bit
            half = (r8 << 7) + MS.EC_MIN_PROB
            if val:
                low += rng - half
                rng = half
            else:
                rng -= half
        d = 16 - rng.bit_length()
        if d:
            rng <<= d
            low <<= d
            shift += d
        # containment check: the decoder pre-loads 15 bits; the code word
        # is (shift + 15) bits long so far
        used = shift + 15
        if used > nbits_total:
            pad = used - nbits_total
            o, lo, hi = orig << pad, low, low + rng
        else:
            sc = nbits_total - used
            o, lo, hi = orig, low << sc, (low + rng) << sc
        if not (lo <= o < hi):
            return i, log[i]
    return None, None
