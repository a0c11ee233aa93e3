"""SUMMA distributed multiply: arbitrary grid shapes, oracle-checked."""
import numpy as np
import pytest

import dbcsr_tpu as dt
from dbcsr_tpu.core.config import config_override
from dbcsr_tpu.dist.distribution import tile_aligned_dist
from dbcsr_tpu.dist.grid import ProcessGrid

TILE = 8


def _mats(rng, m=96, k=80, n=88, occ=0.4):
    with config_override(tile_size=TILE):
        rbs = dt.random_block_sizes(m, [2, 4], rng)
        kbs = dt.random_block_sizes(k, [2, 4], rng)
        cbs = dt.random_block_sizes(n, [4], rng)
        a = dt.random_matrix(rbs, kbs, occ, rng, dtype=np.float32)
        b = dt.random_matrix(kbs, cbs, occ, rng, dtype=np.float32)
    return a, b


@pytest.mark.parametrize("p,q", [(2, 2), (2, 4), (4, 2), (1, 8), (2, 3)])
def test_summa_grids(rng, p, q):
    grid = ProcessGrid.make(p, q)
    a, b = _mats(rng)
    dist = tile_aligned_dist(grid, a.row_block_sizes, b.col_block_sizes, TILE)
    with config_override(tile_size=TILE, mm_dist_algo="summa"):
        c = dt.multiply("N", "N", 1.0, a, b, dist=dist)
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    np.testing.assert_allclose(
        np.asarray(c.to_dense()), ref, rtol=1e-4, atol=1e-4
    )


def test_auto_picks_summa_for_nonsquare(rng):
    grid = ProcessGrid.make(2, 4)
    a, b = _mats(rng)
    dist = tile_aligned_dist(grid, a.row_block_sizes, b.col_block_sizes, TILE)
    with config_override(tile_size=TILE):  # auto
        c = dt.multiply("N", "N", 1.0, a, b, dist=dist)
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    np.testing.assert_allclose(
        np.asarray(c.to_dense()), ref, rtol=1e-4, atol=1e-4
    )


def test_summa_transposes_alpha_beta(rng):
    grid = ProcessGrid.make(2, 3)
    with config_override(tile_size=TILE):
        rbs = dt.random_block_sizes(64, [2, 4], rng)
        kbs = dt.random_block_sizes(56, [4], rng)
        cbs = dt.random_block_sizes(72, [2], rng)
        a = dt.random_matrix(kbs, rbs, 0.5, rng, dtype=np.float32)  # for T
        b = dt.random_matrix(kbs, cbs, 0.5, rng, dtype=np.float32)
        c0 = dt.random_matrix(rbs, cbs, 0.3, rng, dtype=np.float32)
        dist = tile_aligned_dist(grid, rbs, cbs, TILE)
        c = dt.multiply(
            "T", "N", 2.0, a, b, 0.5, c0, dist=dist,
        )
    ref = 2.0 * np.asarray(a.to_dense()).T @ np.asarray(b.to_dense()) + 0.5 * np.asarray(
        c0.to_dense()
    )
    np.testing.assert_allclose(
        np.asarray(c.to_dense()), ref, rtol=1e-3, atol=1e-3
    )


@pytest.mark.parametrize("p,q,l", [(2, 2, 2), (1, 4, 2), (2, 1, 4)])
def test_summa_25d_layers(rng, p, q, l):
    """2.5D SUMMA: k split over the layer mesh axis, C partials psum'd
    (round-2: layer axis on the SUMMA path, dbcsr_mm_3d.F analog)."""
    grid = ProcessGrid.make(p, q, nlayer=l)
    a, b = _mats(rng)
    dist = tile_aligned_dist(grid, a.row_block_sizes, b.col_block_sizes, TILE)
    with config_override(tile_size=TILE, mm_dist_algo="summa"):
        c = dt.multiply("N", "N", 1.0, a, b, dist=dist)
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    np.testing.assert_allclose(
        np.asarray(c.to_dense()), ref, rtol=1e-4, atol=1e-4
    )


def test_summa_25d_executor_transposes(rng):
    from dbcsr_tpu.mm.engine import build_distributed_executor

    grid = ProcessGrid.make(2, 2, nlayer=2)
    a, b = _mats(rng, occ=0.5)
    dist = tile_aligned_dist(grid, a.row_block_sizes, b.col_block_sizes, TILE)
    with config_override(tile_size=TILE):
        fn, c_index, _ = build_distributed_executor(
            "N", "N", a, b, dist, algo="summa"
        )
        out = fn(a.data, b.data)
    c = dt.BCSRMatrix(name="c", index=c_index, data=out)
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    np.testing.assert_allclose(
        np.asarray(c.to_dense()), ref, rtol=1e-4, atol=1e-4
    )
