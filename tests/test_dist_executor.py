"""Plan-once distributed executors (Cannon + SUMMA) vs oracle."""
import numpy as np
import pytest

import dbcsr_tpu as dt
from dbcsr_tpu.core.config import config_override
from dbcsr_tpu.dist.distribution import tile_aligned_dist
from dbcsr_tpu.dist.grid import ProcessGrid
from dbcsr_tpu.mm.engine import build_distributed_executor

TILE = 8


def _mats(rng, occ=0.5):
    with config_override(tile_size=TILE):
        rbs = dt.random_block_sizes(96, [2, 4], rng)
        kbs = dt.random_block_sizes(80, [4], rng)
        cbs = dt.random_block_sizes(88, [2], rng)
        a = dt.random_matrix(rbs, kbs, occ, rng, dtype=np.float32)
        b = dt.random_matrix(kbs, cbs, occ, rng, dtype=np.float32)
    return a, b


@pytest.mark.parametrize("p,q,algo", [(2, 2, "cannon"), (2, 4, "summa"), (2, 2, "summa")])
def test_distributed_executor(rng, p, q, algo):
    grid = ProcessGrid.make(p, q)
    a, b = _mats(rng)
    dist = tile_aligned_dist(grid, a.row_block_sizes, b.col_block_sizes, TILE)
    with config_override(tile_size=TILE):
        fn, c_index, fl = build_distributed_executor(
            "N", "N", a, b, dist, algo=algo
        )
        out = fn(a.data, b.data)
        out2 = fn(a.data * 2.0, b.data)
    c = dt.BCSRMatrix(name="c", index=c_index, data=out)
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    np.testing.assert_allclose(np.asarray(c.to_dense()), ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out2), 2.0 * np.asarray(out), rtol=1e-4)
    assert fl > 0


def test_distributed_executor_cannon_25d(rng):
    grid = ProcessGrid.make(2, 2, nlayer=2)
    a, b = _mats(rng)
    dist = tile_aligned_dist(grid, a.row_block_sizes, b.col_block_sizes, TILE)
    with config_override(tile_size=TILE):
        fn, c_index, _ = build_distributed_executor("N", "N", a, b, dist)
        out = fn(a.data, b.data)
    c = dt.BCSRMatrix(name="c", index=c_index, data=out)
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    np.testing.assert_allclose(np.asarray(c.to_dense()), ref, rtol=1e-4, atol=1e-4)


def test_distributed_executor_transpose(rng):
    grid = ProcessGrid.make(2, 2)
    with config_override(tile_size=TILE):
        rbs = dt.random_block_sizes(64, [2, 4], rng)
        kbs = dt.random_block_sizes(56, [4], rng)
        a = dt.random_matrix(kbs, rbs, 0.5, rng, dtype=np.float32)
        b = dt.random_matrix(kbs, rbs, 0.5, rng, dtype=np.float32)
        dist = tile_aligned_dist(grid, rbs, rbs, TILE)
        fn, c_index, _ = build_distributed_executor("T", "N", a, b, dist)
        out = fn(a.data, b.data)
    c = dt.BCSRMatrix(name="c", index=c_index, data=out)
    ref = np.asarray(a.to_dense()).T @ np.asarray(b.to_dense())
    np.testing.assert_allclose(np.asarray(c.to_dense()), ref, rtol=1e-4, atol=1e-4)
