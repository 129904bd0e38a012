"""Value-forcing sweeper: for a failing coded event, re-decode forcing a
single decode_symbol read to each alternate VALUE (consuming the
arithmetic interval as if that symbol had been coded under our current
CDF). If exactly one early read is misdecoded (e.g. a flow-gating symbol
like comp_group_idx), forcing the true value resynchronizes the rest of
the tile and the event becomes bit-exact — something the row-override
sweeper (sweep_sites.py) cannot achieve for confidently-wrong reads.

Usage: python tools/sweep_values.py <file.avif> [--event N] [--max-sites M]
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from libavif_tpu.api import Decoder  # noqa: E402
from libavif_tpu.interop import dav1d_oracle as DV  # noqa: E402
from libavif_tpu.models.av1.msac import MsacDecoder, update_cdf, EC_MIN_PROB, EC_PROB_SHIFT  # noqa: E402
import libavif_tpu.codec.av1.stream as S  # noqa: E402
import libavif_tpu.codec.av1.decode as DEC  # noqa: E402


def payloads_of(data: bytes):
    d = Decoder()
    d.parse(data)
    st = d._color_track.sample_table
    return [data[off : off + size] for off, size in st.sample_ranges()]


class Stop(Exception):
    pass


def forced_symbol(self, icdf, n, s_forced, adapt=True):
    """Consume the interval as if symbol s_forced were decoded."""
    r8 = self.rng >> 8
    vs = []
    for s in range(n):
        if s < n - 1:
            v = ((r8 * (int(icdf[s]) >> EC_PROB_SHIFT)) >> 1) + EC_MIN_PROB * (
                n - 1 - s
            )
        else:
            v = 0
        vs.append(v)
    v_prev = self.rng if s_forced == 0 else vs[s_forced - 1]
    v_cur = vs[s_forced]
    self.dif = self.dif - (self.rng - v_prev)
    if self.dif < 0:
        # the true bits can't represent this symbol cleanly; clamp — the
        # downstream decode will be garbage anyway in that case
        self.dif &= (1 << 64) - 1
    self.rng = v_prev - v_cur
    self._renorm()
    if adapt:
        update_cdf(icdf, s_forced, n)
    return s_forced


class VSweep:
    def __init__(self, data):
        self.data = data
        self.dv = DV.decode_obus(payloads_of(data), all_frames=True)
        self.ev = {"i": -1, "site": 0}
        self.n_sites = 0
        self.ovr = None  # (site, value)
        self.record = False
        self.sites = []  # (site, what, n, value, blk)
        self.blk = [None]
        cls = [v for v in vars(S).values()
               if isinstance(v, type) and hasattr(v, "_decode_frame")][0]
        odf = cls._decode_frame
        sw = self
        self.events = []

        def dfw(s, hdr, tiles):
            sw.ev["i"] += 1
            sw.ev["site"] = 0
            out = odf(s, hdr, tiles)
            sw.events.append([p.copy() for p in out])
            if sw.stop_after is not None and sw.ev["i"] >= sw.stop_after:
                raise Stop()
            return out

        cls._decode_frame = dfw
        odb = DEC.FrameDecoder._decode_block

        def dbw(dself, r, c, bsize):
            sw.blk[0] = (r, c, bsize)
            return odb(dself, r, c, bsize)

        DEC.FrameDecoder._decode_block = dbw
        ods = MsacDecoder.decode_symbol

        def dsw(mself, icdf, n, adapt=True, what=None):
            if sw.ev["i"] == sw.tgt_ev:
                site = sw.ev["site"]
                sw.ev["site"] += 1
                if sw.record:
                    v = ods(mself, icdf, n, adapt=adapt, what=what)
                    sw.sites.append((site, what, n, v, sw.blk[0]))
                    return v
                if sw.ovr is not None and sw.ovr[0] == site:
                    return forced_symbol(mself, icdf, n, sw.ovr[1], adapt=adapt)
            return ods(mself, icdf, n, adapt=adapt, what=what)

        MsacDecoder.decode_symbol = dsw
        self.tgt_ev = None
        self.stop_after = None

    def run(self):
        self.ev["i"] = -1
        self.events = []
        d = Decoder()
        d.parse(self.data)
        try:
            for _ in range(d.image_count):
                d.next_image()
        except Stop:
            pass
        except Exception:
            return None
        return self.events

    def diffs_at(self, ev):
        evs = self.run()
        if evs is None or len(evs) <= ev:
            return None
        return sum(
            int((a.astype(np.int64) != b.astype(np.int64)).sum())
            for a, b in zip(evs[ev], self.dv[ev].planes)
        )


def main():
    data = open(sys.argv[1], "rb").read()
    ev = int(sys.argv[sys.argv.index("--event") + 1]) if "--event" in sys.argv else None
    maxs = int(sys.argv[sys.argv.index("--max-sites") + 1]) if "--max-sites" in sys.argv else 400
    sw = VSweep(data)
    if ev is None:
        # find first bad event
        sw.tgt_ev = -2
        sw.stop_after = None
        evs = sw.run()
        for i, planes in enumerate(evs):
            if any(not np.array_equal(a.astype(np.int64), b.astype(np.int64))
                   for a, b in zip(planes, sw.dv[i].planes)):
                ev = i
                break
        if ev is None:
            print("ALL EVENTS BIT-EXACT")
            return 0
    sw.tgt_ev = ev
    sw.stop_after = ev
    sw.record = True
    sw.sites.clear()
    base = sw.diffs_at(ev)
    sw.record = False
    print(f"event {ev}: baseline diffs {base}, {len(sw.sites)} sites")
    if not base:
        return 0
    hits = []
    for (site, what, n, v, blk) in sw.sites[:maxs]:
        for alt in range(n):
            if alt == v:
                continue
            sw.ovr = (site, alt)
            nd = sw.diffs_at(ev)
            sw.ovr = None
            if nd == 0:
                print(f"HIT site {site} ({what}, blk {blk}) value {v}->{alt}")
                hits.append((site, what, blk, v, alt))
            elif nd is not None and nd < base // 3:
                print(f"  near site {site} ({what}, blk {blk}) {v}->{alt}: {nd}")
    print("hits:", hits)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
