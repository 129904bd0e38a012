"""Validation of the extracted AV1 spec default tables (codec/av1/tables.py).

Checks structural invariants (descending icdf rows, zero counters) and a
handful of spec-known literal values so a bad extraction can never slip
into the codec silently.
"""

import numpy as np
import pytest

from libavif_tpu.codec.av1 import tables as T


def _check_cdf(rows, nsym):
    rows = np.asarray(rows).reshape(-1, rows.shape[-1])
    for r in rows:
        probs = r[: nsym - 1].astype(int)
        assert probs[0] > 0 and probs[0] < 32768
        assert all(probs[i] >= probs[i + 1] for i in range(len(probs) - 1))
        assert r[nsym - 1] == 0 and r[nsym] == 0


def test_spec_known_values():
    d = T.defaults()
    # AV1 spec Default_Skip_Cdf = {31671},{16515},{4576} (icdf = 32768-x)
    assert list(d.skip[:, 0]) == [32768 - 31671, 32768 - 16515, 32768 - 4576]
    # Default MV-joint-style delta_q cdf {28160,32120,32677}
    assert list(d.delta_q[0, :3]) == [32768 - 28160, 32768 - 32120, 32768 - 32677]
    # Default_Intrabc_Cdf = {30531}
    assert d.intrabc[0, 0] == 32768 - 30531
    # Default_Filter_Intra_Mode_Cdf = {8949,12776,17211,29558}
    assert list(d.filter_intra_mode[0, :4]) == [
        32768 - 8949, 32768 - 12776, 32768 - 17211, 32768 - 29558]


def test_cdf_structure():
    d = T.defaults()
    _check_cdf(d.kf_y_mode, 13)
    _check_cdf(d.y_mode, 13)
    _check_cdf(d.uv_mode_nocfl, 13)
    _check_cdf(d.uv_mode_cfl, 14)
    _check_cdf(d.angle_delta, 7)
    _check_cdf(d.skip, 2)
    _check_cdf(d.txb_skip.reshape(-1, 3), 2)
    _check_cdf(d.coeff_base.reshape(-1, 5), 4)
    _check_cdf(d.coeff_br.reshape(-1, 5), 4)
    _check_cdf(d.coeff_base_eob.reshape(-1, 4), 3)
    _check_cdf(d.dc_sign.reshape(-1, 3), 2)
    _check_cdf(d.cfl_sign, 8)
    _check_cdf(d.cfl_alpha, 16)
    for ctx, nsym in enumerate(d.partition_nsym):
        _check_cdf(d.partition[ctx : ctx + 1, : nsym + 1], nsym)
    for n, t in d.eob_pt.items():
        nsym = {16: 5, 32: 6, 64: 7, 128: 8, 256: 9, 512: 10, 1024: 11}[n]
        # the [..,1,:] slot of 512/1024 is an unused filler in the binary
        real = t[:, :, 0] if n >= 512 else t.reshape(-1, t.shape[-1])
        _check_cdf(np.asarray(real).reshape(-1, t.shape[-1]), nsym)


def test_quantizer_lookups():
    # classic endpoints shared with VP9 (§7.12.2 tables)
    assert T.dc_q(0) == 4 and T.dc_q(255) == 1336
    assert T.ac_q(0) == 4 and T.ac_q(255) == 1828
    assert T.dc_q(255, 10) == 5347
    # monotone
    assert all(T.ac_q(q) <= T.ac_q(q + 1) for q in range(255))


def test_scan_orders():
    # spec Default_Scan_4x4 literal
    assert list(T.default_scan(4, 4)) == [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
    for w, h in [(4, 4), (8, 4), (4, 8), (8, 8), (16, 16), (32, 32), (16, 4)]:
        s = T.default_scan(w, h)
        assert sorted(s.tolist()) == list(range(w * h))
        assert sorted(T.mcol_scan(w, h).tolist()) == list(range(w * h))


def test_adaptation_roundtrip():
    # extracted CDFs must be usable by the msac coder directly
    from libavif_tpu.models.av1.msac import MsacEncoder, update_cdf

    d = T.defaults().copy()
    cdf = d.skip[1].copy()
    before = cdf.copy()
    update_cdf(cdf, 1, 2)
    assert cdf[2] == 1  # counter advanced
    assert cdf[0] != before[0]  # probability moved
