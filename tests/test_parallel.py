"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

The reference has no multi-node tests (nothing distributed, SURVEY.md §4);
these are the TPU build's own: sharded-vs-single bit-exactness and halo
exchange correctness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libavif_tpu.codec import recon
from libavif_tpu.parallel import (
    decode_cells_sharded,
    encode_cells_sharded,
    exchange_cell_boundaries,
    make_codec_mesh,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def mesh():
    return make_codec_mesh(8)


@pytest.fixture(scope="module")
def cells():
    rng = np.random.default_rng(0)
    # mesh is (frames=2, cells=4); 2 cells per shard on the cells axis
    return jnp.asarray(rng.integers(0, 256, (2, 8, 32, 32)), dtype=jnp.int32)


class TestShardedCodec:
    def test_sharded_encode_matches_single_device(self, mesh, cells):
        modes_s, levels_s, rec_s, tx_s = encode_cells_sharded(
            cells, 8, 11, n=16, depth=8, lossless=False, mesh=mesh
        )
        # Reference: per-cell single-device encode
        for f in range(cells.shape[0]):
            for k in range(cells.shape[1]):
                m, l, r, t = recon.encode_plane(
                    cells[f, k], jnp.int32(8), jnp.int32(11),
                    n=16, depth=8, lossless=False,
                )
                np.testing.assert_array_equal(np.asarray(modes_s[f, k]), np.asarray(m))
                np.testing.assert_array_equal(np.asarray(levels_s[f, k]), np.asarray(l))
                np.testing.assert_array_equal(np.asarray(rec_s[f, k]), np.asarray(r))
                np.testing.assert_array_equal(np.asarray(tx_s[f, k]), np.asarray(t))

    def test_sharded_decode_roundtrip_bit_exact(self, mesh, cells):
        modes, levels, rec, txs = encode_cells_sharded(
            cells, 8, 11, n=16, depth=8, lossless=False, mesh=mesh
        )
        rec2 = decode_cells_sharded(
            levels, modes, 8, 11, n=16, depth=8, lossless=False, mesh=mesh,
            tx_types=txs,
        )
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(rec2))

    def test_lossless_sharded(self, mesh, cells):
        modes, levels, rec, _ = encode_cells_sharded(
            cells, 1, 1, n=16, depth=8, lossless=True, mesh=mesh
        )
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(cells))


class TestHaloExchange:
    def test_boundary_rows_travel_right(self, mesh, cells):
        halo = np.asarray(exchange_cell_boundaries(cells, mesh))
        # shard s (cells axis, 4 shards x 2 cells each) receives the bottom
        # 8 rows of the LAST cell of shard s-1; shard 0 receives zeros.
        k_shards = mesh.devices.shape[1]
        per = cells.shape[1] // k_shards
        src = np.asarray(cells)
        for f in range(cells.shape[0]):
            for s in range(k_shards):
                got = halo[f, s]
                if s == 0:
                    assert (got == 0).all()
                else:
                    prev_last_cell = (s - 1) * per + (per - 1)
                    np.testing.assert_array_equal(
                        got, src[f, prev_last_cell, -8:, :]
                    )


class TestMesh:
    def test_mesh_factorization(self):
        m = make_codec_mesh(8)
        assert m.devices.shape == (2, 4)
        m1 = make_codec_mesh(1)
        assert m1.devices.shape == (1, 1)
        with pytest.raises(ValueError):
            make_codec_mesh(6, frames=4)
