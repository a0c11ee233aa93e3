"""Blocks LARGER than the hardware tile (unittest2's bigblocks regime):
one user block spans several store tiles — index machinery, indicator
matmuls, multiply and filtering must all handle the straddling.
"""
import numpy as np
import pytest

import dbcsr_tpu as dt
from dbcsr_tpu.block.tileops import valid_mask
from dbcsr_tpu.core.config import config_override

TILE = 8


def _mk(rng, occ=0.6):
    with config_override(tile_size=TILE):
        rbs = np.array([20, 5, 13, 30], dtype=np.int32)  # blocks >> tile
        cbs = np.array([17, 25, 9], dtype=np.int32)
        return dt.random_matrix(rbs, cbs, occ, rng, dtype=np.float64)


def test_bigblock_roundtrip_and_norms(rng):
    m = _mk(rng, occ=1.0)
    # flat <-> store roundtrip with straddling blocks
    np.testing.assert_array_equal(
        np.asarray(m.with_flat(m.flat_host()).data), np.asarray(m.data)
    )
    got = np.asarray(dt.block_norms(m), dtype=np.float64)
    ref = np.array([np.linalg.norm(blk) for _, _, blk in m.iter_blocks()])
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_bigblock_multiply_vs_oracle(rng):
    with config_override(tile_size=TILE):
        rbs = np.array([20, 30], dtype=np.int32)
        kbs = np.array([25, 9, 14], dtype=np.int32)
        cbs = np.array([11, 21], dtype=np.int32)
        a = dt.random_matrix(rbs, kbs, 0.8, rng, dtype=np.float64)
        b = dt.random_matrix(cbs, kbs, 0.8, rng, dtype=np.float64)
        c = dt.multiply("N", "T", 1.0, a, b)  # big blocks + transpose
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense()).T
    np.testing.assert_allclose(
        np.asarray(c.to_dense()), ref, rtol=1e-10, atol=1e-10
    )


def test_bigblock_filter_masks_across_tiles(rng):
    with config_override(tile_size=TILE):
        rbs = np.array([20, 20], dtype=np.int32)
        big = np.full((20, 20), 5.0)
        tiny = np.full((20, 20), 1e-12)
        m = dt.BCSRMatrix.from_blocks(
            [0, 0, 1], [0, 1, 1], [big, tiny, big], rbs, rbs,
            dtype=np.float64, tile=TILE,
        )
        f = dt.filter_blocks(m, 1e-6)
    assert f.nblks == 2
    # the dropped straddling block must be zero across ALL its tiles
    dense = np.asarray(f.to_dense())
    np.testing.assert_array_equal(dense[0:20, 20:40], 0.0)
    np.testing.assert_allclose(dense[0:20, 0:20], 5.0)
    vm = np.asarray(valid_mask(f.index, f.tile)) > 0.5
    assert np.all(np.asarray(f.data)[~vm] == 0)


def test_bigblock_add_and_trace(rng):
    m1 = _mk(rng)
    with config_override(tile_size=TILE):
        m2 = dt.random_matrix(
            m1.row_block_sizes, m1.col_block_sizes, 0.5, rng, dtype=np.float64
        )
    s = dt.add(1.0, m1, 2.0, m2)
    np.testing.assert_allclose(
        np.asarray(s.to_dense()),
        np.asarray(m1.to_dense()) + 2.0 * np.asarray(m2.to_dense()),
        atol=1e-12,
    )
