"""Codec core tests: transforms, quantization, intra predictors, msac."""

import numpy as np
import pytest

from libavif_tpu.ops import transforms as T
from libavif_tpu.ops import quant as Q
from libavif_tpu.ops import intra as I
from libavif_tpu.models.av1 import msac


class TestTransforms:
    @pytest.mark.parametrize("n", [4, 8, 16, 32])
    def test_dct_roundtrip_near_exact(self, n):
        rs = np.random.RandomState(n)
        x = rs.randint(-255, 256, (5, n, n)).astype(np.int32)
        c = np.asarray(T.forward_transform(x, T.DCT_DCT, n))
        back = np.asarray(T.inverse_transform(c, T.DCT_DCT, n))
        err = np.abs(back - x)
        assert err.max() <= 2, (n, err.max())

    @pytest.mark.parametrize("tx", [T.ADST_DCT, T.DCT_ADST, T.ADST_ADST, T.IDTX])
    def test_other_tx_roundtrip(self, tx):
        n = 8
        rs = np.random.RandomState(tx)
        x = rs.randint(-255, 256, (3, n, n)).astype(np.int32)
        c = np.asarray(T.forward_transform(x, tx, n))
        back = np.asarray(T.inverse_transform(c, tx, n))
        assert np.abs(back - x).max() <= 2

    def test_wht_bit_exact(self):
        rs = np.random.RandomState(7)
        x = rs.randint(-255, 256, (10, 4, 4)).astype(np.int32)
        c = np.asarray(T.forward_transform(x, T.WHT_WHT, 4))
        back = np.asarray(T.inverse_transform(c, T.WHT_WHT, 4))
        assert np.array_equal(back, x)

    def test_dc_coefficient_position(self):
        # A flat block concentrates energy in coeff [0,0].
        x = np.full((1, 8, 8), 100, dtype=np.int32)
        c = np.asarray(T.forward_transform(x, T.DCT_DCT, 8))
        assert abs(c[0, 0, 0]) > 100
        c_ac = c.copy()
        c_ac[0, 0, 0] = 0
        assert np.abs(c_ac).max() <= 1

    def test_deterministic(self):
        x = np.arange(64, dtype=np.int32).reshape(1, 8, 8) - 32
        c1 = np.asarray(T.forward_transform(x, T.DCT_DCT, 8))
        c2 = np.asarray(T.forward_transform(x.copy(), T.DCT_DCT, 8))
        assert np.array_equal(c1, c2)


class TestQuant:
    def test_quality_mapping(self):
        assert Q.quality_to_qindex(100) == 0  # lossless
        assert Q.quality_to_qindex(0) == 252
        assert 0 < Q.quality_to_qindex(75) < Q.quality_to_qindex(25)

    def test_quant_dequant_roundtrip_error_bound(self):
        rs = np.random.RandomState(0)
        c = rs.randint(-4000, 4000, (4, 8, 8)).astype(np.int32)
        dc, ac = Q.step_sizes(100)
        ql = np.asarray(Q.quantize(c, dc, ac))
        dq = np.asarray(Q.dequantize(ql, dc, ac))
        # |dq - c| <= step/2
        bound = np.full((8, 8), ac // 2 + 1)
        bound[0, 0] = dc // 2 + 1
        assert np.all(np.abs(dq - c) <= bound)

    def test_sign_symmetry(self):
        c = np.array([[[-100, 50], [-3, 3]]], dtype=np.int32)
        c = np.pad(c, ((0, 0), (0, 2), (0, 2)))
        ql = np.asarray(Q.quantize(c, 10, 10))
        qlm = np.asarray(Q.quantize(-c, 10, 10))
        assert np.array_equal(ql, -qlm)


class TestIntra:
    def _neigh(self, b, n, seed=0):
        rs = np.random.RandomState(seed)
        top = rs.randint(0, 256, (b, n)).astype(np.int32)
        left = rs.randint(0, 256, (b, n)).astype(np.int32)
        tl = rs.randint(0, 256, (b,)).astype(np.int32)
        return top, left, tl

    def test_dc(self):
        top = np.full((1, 8), 100, dtype=np.int32)
        left = np.full((1, 8), 50, dtype=np.int32)
        p = np.asarray(I.dc_pred(top, left, 8))
        assert np.all(p == 75)

    def test_v_h(self):
        top, left, tl = self._neigh(2, 8)
        v = np.asarray(I.v_pred(top, 8))
        h = np.asarray(I.h_pred(left, 8))
        assert np.array_equal(v[0, 3, :], top[0])
        assert np.array_equal(h[1, :, 5], left[1])

    def test_paeth_matches_scalar(self):
        top, left, tl = self._neigh(3, 4, seed=1)
        p = np.asarray(I.paeth_pred(top, left, tl, 4))
        for b in range(3):
            for r in range(4):
                for c in range(4):
                    base = int(top[b, c]) + int(left[b, r]) - int(tl[b])
                    cands = [int(left[b, r]), int(top[b, c]), int(tl[b])]
                    dists = [abs(base - x) for x in cands]
                    # priority order: left, top, topleft
                    best = cands[int(np.argmin(dists))]
                    # tie-break: left before top before topleft
                    if dists[0] <= dists[1] and dists[0] <= dists[2]:
                        best = cands[0]
                    elif dists[1] <= dists[2]:
                        best = cands[1]
                    else:
                        best = cands[2]
                    assert p[b, r, c] == best

    def test_smooth_range(self):
        top, left, tl = self._neigh(2, 16, seed=2)
        for fn in (I.smooth_pred, I.smooth_v_pred, I.smooth_h_pred):
            p = np.asarray(fn(top, left, 16))
            assert p.min() >= 0 and p.max() <= 255

    def test_predict_all_modes_shape(self):
        top, left, tl = self._neigh(4, 8, seed=3)
        p = np.asarray(I.predict_all_modes(top, left, tl, 8))
        assert p.shape == (4, I.N_MODES, 8, 8)

    def test_prepare_neighbors(self):
        top = np.zeros((2, 4), dtype=np.int32)
        left = np.full((2, 4), 99, dtype=np.int32)
        tl = np.zeros((2,), dtype=np.int32)
        have_top = np.array([False, True])
        have_left = np.array([True, False])
        t2, l2, tl2 = (np.asarray(a) for a in I.prepare_neighbors(
            top, left, tl, have_top, have_left, 4, 128))
        assert np.all(t2[0] == 99)  # top synthesized from left[0]
        assert np.all(l2[1] == 0)  # left synthesized from top[0]


class TestMsac:
    def test_bit_roundtrip(self):
        rs = np.random.RandomState(0)
        bits = rs.randint(0, 2, 1000).tolist()
        enc = msac.MsacEncoder()
        for b in bits:
            enc.encode_bit(b)
        data = enc.finish()
        dec = msac.MsacDecoder(data)
        out = [dec.decode_bit() for _ in bits]
        assert out == bits

    def test_literal_roundtrip(self):
        rs = np.random.RandomState(1)
        vals = [(int(rs.randint(0, 1 << b)), b) for b in rs.randint(1, 16, 200)]
        enc = msac.MsacEncoder()
        for v, b in vals:
            enc.encode_literal(v, b)
        data = enc.finish()
        dec = msac.MsacDecoder(data)
        for v, b in vals:
            assert dec.decode_literal(b) == v

    def test_golomb_roundtrip(self):
        vals = [0, 1, 2, 3, 5, 100, 1000, 65535, 7, 0, 2]
        enc = msac.MsacEncoder()
        for v in vals:
            enc.encode_golomb(v)
        data = enc.finish()
        dec = msac.MsacDecoder(data)
        for v in vals:
            assert dec.decode_golomb() == v

    @pytest.mark.parametrize("n", [2, 3, 4, 8, 13, 16])
    def test_adaptive_symbols_roundtrip(self, n):
        rs = np.random.RandomState(n)
        # Skewed distribution so adaptation actually moves the CDFs.
        symbols = rs.choice(n, size=2000, p=_skewed(n)).tolist()
        enc_cdf = msac.uniform_icdf(n)
        dec_cdf = msac.uniform_icdf(n)
        enc = msac.MsacEncoder()
        for s in symbols:
            enc.encode_symbol(s, enc_cdf, n)
        data = enc.finish()
        dec = msac.MsacDecoder(data)
        out = [dec.decode_symbol(dec_cdf, n) for _ in symbols]
        assert out == symbols
        assert np.array_equal(enc_cdf, dec_cdf)  # adaptation tracked in lockstep

    def test_adaptation_compresses(self):
        # Highly skewed stream must compress well below 1 bit/symbol.
        n = 4
        symbols = [0] * 5000
        cdf = msac.uniform_icdf(n)
        enc = msac.MsacEncoder()
        for s in symbols:
            enc.encode_symbol(s, cdf, n)
        data = enc.finish()
        assert len(data) * 8 < 0.25 * len(symbols)

    def test_mixed_stream(self):
        rs = np.random.RandomState(9)
        n = 5
        cdf_e = msac.uniform_icdf(n)
        cdf_d = msac.uniform_icdf(n)
        enc = msac.MsacEncoder()
        ops = []
        for _ in range(3000):
            kind = rs.randint(0, 4)
            if kind == 0:
                s = int(rs.randint(0, n)); ops.append(("sym", s))
                enc.encode_symbol(s, cdf_e, n)
            elif kind == 1:
                b = int(rs.randint(0, 2)); ops.append(("bit", b))
                enc.encode_bit(b)
            elif kind == 2:
                v = int(rs.randint(0, 256)); ops.append(("lit", v))
                enc.encode_literal(v, 8)
            else:
                g = int(rs.randint(0, 50)); ops.append(("gol", g))
                enc.encode_golomb(g)
        data = enc.finish()
        dec = msac.MsacDecoder(data)
        for kind, v in ops:
            if kind == "sym":
                assert dec.decode_symbol(cdf_d, n) == v
            elif kind == "bit":
                assert dec.decode_bit() == v
            elif kind == "lit":
                assert dec.decode_literal(8) == v
            else:
                assert dec.decode_golomb() == v

    def test_empty_and_single(self):
        enc = msac.MsacEncoder()
        enc.encode_bit(1)
        data = enc.finish()
        assert msac.MsacDecoder(data).decode_bit() == 1


def _skewed(n):
    p = np.array([2.0 ** -(i + 1) for i in range(n)])
    p[-1] += 1.0 - p.sum() + p[-1] - p[-1]
    p = p / p.sum()
    return p
