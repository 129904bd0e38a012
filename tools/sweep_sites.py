"""Locate a ctx-derivation bug by brute-force CDF-row override.

For a failing stream (ours vs the standalone dav1d oracle), finds the
first diverging coded event, then for every `decode_symbol` read in that
event (up to and including the first pixel-diverging block) re-decodes
the stream overriding that ONE read's CDF row with each sibling row of
the same table. An override that makes the event bit-exact pinpoints
the read whose context dav1d derived differently.

This is value-level ground truth the interval-replay checker
(find_desync.py) cannot see: a wrong ctx row still yields an
arithmetic-consistent decode, so only behavioral comparison against the
reference decoder (dav1d, mirroring codec_dav1d.c:58's role) exposes it.

Usage: python tools/sweep_sites.py <file.avif> [--event N] [--all-sites]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from libavif_tpu.api import Decoder  # noqa: E402
from libavif_tpu.codec.av1 import blocks as B  # noqa: E402
from libavif_tpu.codec.av1 import decode as DEC  # noqa: E402
from libavif_tpu.interop import dav1d_oracle as DV  # noqa: E402
from libavif_tpu.models.av1.msac import MsacDecoder  # noqa: E402
import libavif_tpu.codec.av1.stream as S  # noqa: E402


def payloads_of(data: bytes):
    d = Decoder()
    d.parse(data)
    st = d._color_track.sample_table
    return [data[off : off + size] for off, size in st.sample_ranges()]


class Stop(Exception):
    pass


class Sweeper:
    def __init__(self, data: bytes):
        self.data = data
        self.dv = DV.decode_obus(payloads_of(data), all_frames=True)
        self.evt = {"i": -1, "blk": None, "site": 0}
        self.sites = []
        self.ovr = {}
        self.record = False
        self.events = []
        self.blocks = []
        self.tgt_ev = None
        self.stop_after = None
        self._saved = []  # (owner, name, original) for close()
        self._install()

    def close(self):
        """Restore every monkey-patched method. A Sweeper permanently
        corrupts decoding in the process otherwise — construct it in a
        try/finally (or use it as a one-shot CLI)."""
        for owner, name, orig in reversed(self._saved):
            setattr(owner, name, orig)
        self._saved = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _patch(self, owner, name, fn):
        self._saved.append((owner, name, getattr(owner, name)))
        setattr(owner, name, fn)

    def _install(self):
        cls = [
            v for v in vars(S).values()
            if isinstance(v, type) and hasattr(v, "_decode_frame")
        ][0]
        odf = cls._decode_frame
        ose = cls._show_existing
        sw = self

        def dfw(s, hdr, tiles):
            out = odf(s, hdr, tiles)
            sw.events.append(("coded", [p.copy() for p in out]))
            if sw.stop_after is not None and len(sw.events) > sw.stop_after:
                raise Stop()
            return out

        def sew(s, hdr):
            out = ose(s, hdr)
            sw.events.append(("show", [p.copy() for p in out[0]]))
            if sw.stop_after is not None and len(sw.events) > sw.stop_after:
                raise Stop()
            return out

        self._patch(cls, "_decode_frame", dfw)
        self._patch(cls, "_show_existing", sew)

        odb = DEC.FrameDecoder._decode_block

        def dbw(dself, r, c, bsize):
            sw.evt["blk"] = (r, c)
            if sw.record and len(sw.events) == sw.tgt_ev:
                sw.blocks.append((r, c, bsize))
            return odb(dself, r, c, bsize)

        self._patch(DEC.FrameDecoder, "_decode_block", dbw)

        ods = MsacDecoder.decode_symbol

        def dsw(mself, icdf, n, adapt=True, what=None):
            if len(sw.events) == sw.tgt_ev:
                s = sw.evt["site"]
                sw.evt["site"] += 1
                base = icdf.base
                if base is not None:
                    L = icdf.shape[0]
                    bb = base
                    while bb.base is not None:
                        bb = bb.base
                    if bb.size % L == 0:
                        off = (
                            icdf.__array_interface__["data"][0]
                            - bb.__array_interface__["data"][0]
                        ) // icdf.itemsize
                        if off % L == 0 and off // L < bb.size // L:
                            if sw.record:
                                sw.sites.append(
                                    (s, what, int(off // L), bb.size // L,
                                     sw.evt["blk"])
                                )
                            if sw.ovr.get("site") == s:
                                icdf = bb.reshape(-1, L)[sw.ovr["row"]]
            return ods(mself, icdf, n, adapt=adapt, what=what)

        self._patch(MsacDecoder, "decode_symbol", dsw)

    def run(self, max_images=64):
        self.evt["site"] = 0
        self.events.clear()
        d = Decoder()
        d.parse(self.data)
        try:
            for _ in range(min(max_images, d.image_count or max_images)):
                d.next_image()
        except Stop:
            pass
        except Exception:
            # surface real decode failures instead of masking them as an
            # empty run (first_bad_event would crash on None otherwise)
            import traceback

            traceback.print_exc()
            raise
        return self.events

    def first_bad_event(self):
        evs = self.run()
        if evs is None:
            raise RuntimeError("sweep run produced no events")
        for i, ((kind, planes), dvf) in enumerate(zip(evs, self.dv)):
            if any(
                not np.array_equal(a.astype(np.int64), b.astype(np.int64))
                for a, b in zip(planes, dvf.planes)
            ):
                return i
        return None

    def diffs_at(self, ev):
        evs = self.run()
        if evs is None or len(evs) <= ev:
            return None
        return sum(
            int((a.astype(np.int64) != b.astype(np.int64)).sum())
            for a, b in zip(evs[ev][1], self.dv[ev].planes)
        )

    def sweep(self, ev, all_sites=False, measure_ev=None):
        """Override symbol reads in event `ev`; score bit-exactness at
        `measure_ev` (default: ev itself). measure_ev > ev catches bugs
        whose only footprint is mis-adapted CDF state inherited by a
        later frame via primary_ref_frame."""
        if measure_ev is None:
            measure_ev = ev
        self.tgt_ev = ev
        self.stop_after = measure_ev
        self.record = True
        self.sites.clear()
        self.blocks.clear()
        base = self.diffs_at(measure_ev)
        self.record = False
        print(f"override event {ev}, measure event {measure_ev}: "
              f"baseline diffs {base}, {len(self.sites)} sites")
        if not base:
            return []
        cut = None
        if measure_ev == ev:
            # first pixel-diverging block bounds the sweep window
            kind, planes = self.run()[ev]
            dm = planes[0].astype(np.int64) != self.dv[ev].planes[0].astype(np.int64)
            H, W = self.dv[ev].planes[0].shape
            for (r, c, bsize) in self.blocks:
                w, h = B.BLOCK_DIMS[bsize]
                if dm[: H, : W][r * 4 : r * 4 + h, c * 4 : c * 4 + w].any():
                    sites_blk = [s for s in self.sites if s[4] == (r, c)]
                    if sites_blk:
                        cut = max(s[0] for s in sites_blk)
                    break
        window = (
            self.sites if (all_sites or cut is None)
            else [s for s in self.sites if s[0] <= cut]
        )
        print(f"sweeping {len(window)} sites (cut {cut})")
        hits = []
        for s, what, ridx, nrows, blk in window:
            for alt in range(nrows):
                if alt == ridx:
                    continue
                self.ovr = {"site": s, "row": alt}
                nd = self.diffs_at(measure_ev)
                self.ovr = {}
                if nd == 0:
                    print(f"HIT site {s} ({what}, blk {blk}) row {ridx}->{alt}")
                    hits.append((s, what, blk, ridx, alt))
        print("hits:", hits)
        return hits


def main():
    data = open(sys.argv[1], "rb").read()
    sw = Sweeper(data)
    if "--event" in sys.argv:
        ev = int(sys.argv[sys.argv.index("--event") + 1])
    else:
        ev = sw.first_bad_event()
        if ev is None:
            print("ALL EVENTS BIT-EXACT")
            return 0
    measure = (int(sys.argv[sys.argv.index("--measure") + 1])
               if "--measure" in sys.argv else None)
    sw.sweep(ev, all_sites="--all-sites" in sys.argv, measure_ev=measure)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
