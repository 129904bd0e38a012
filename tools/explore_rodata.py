"""Exploration helper: map candidate CDF tables in libaom's .rodata.

Scans for contiguous runs of valid CDF rows (monotone non-increasing
inverse-CDF probs, zero terminator + counter) at each (nsym, width)
arity, printing offset + row count so table shapes can be matched to the
AV1 default-CDF inventory. Dev tool only; extraction itself lives in
extract_av1_tables.py."""

import sys

import numpy as np

sys.path.insert(0, "tools")
from extract_av1_tables import rodata, find_aom, find_fp


def valid_row(U, off, nsym, width):
    row = U[off : off + width]
    if len(row) < width:
        return False
    probs = row[: nsym - 1]
    if probs[0] <= 0 or probs[0] >= 32768:
        return False
    if np.any(np.diff(probs) > 0) or probs[-1] == 0:
        return False
    return not np.any(row[nsym - 1 : width] != 0)


def scan_runs(U, lo, hi, nsym, width, min_rows=3):
    """Find maximal runs of valid rows at stride `width` starting anywhere."""
    runs = []
    off = lo
    while off < hi - width:
        if valid_row(U, off, nsym, width):
            n = 0
            o = off
            while o < hi - width and valid_row(U, o, nsym, width):
                n += 1
                o += width
            if n >= min_rows:
                runs.append((off, n))
            off = o
        else:
            off += 1
    return runs


def main():
    U = rodata(find_aom())
    # anchor: kf_y_mode offset
    kf = find_fp(U, [17180, 15741, 13430, 12550, 12086, 11658, 10943, 9524])
    seg = find_fp(U, [27146, 24875, 16675, 14535, 4959, 4395, 235, 0])
    part = find_fp(U, [13636, 7258, 2376, 0, 0, 0, 0, 0])
    coeffb = find_fp(U, [28734, 23838, 20041, 0, 0, 14686, 3027, 891])
    nmv = find_fp(U, [28672, 21504, 13440, 0, 0, 4096, 1792, 910])
    print("anchors: kf_y_mode", kf, "seg_id", seg, "partition", part,
          "coeff_base", coeffb, "nmv", nmv)
    lo = min(kf + seg + part + nmv) - 40000
    hi = max(kf + seg + part + nmv) + 40000
    print(f"scan window u16 [{lo}, {hi}]")
    for nsym, width, label in [
        (8, 9, "8sym w9 (inter_compound_mode)"),
        (16, 17, "16sym w17 (wedge_idx / inter_ext_tx1)"),
        (12, 17, "12sym w17 (inter_ext_tx2)"),
        (3, 4, "3sym w4 (switchable_interp/motion_mode)"),
        (4, 5, "4sym w5 (interintra_mode)"),
    ]:
        runs = scan_runs(U, lo, hi, nsym, width)
        print(f"-- {label}:")
        for off, n in runs:
            print(f"   off={off} rows={n} first={list(U[off:off+width])}")


if __name__ == "__main__":
    main()
