"""Tile-aligned Cannon fast path: must take the tiled plan and agree with
both the dense oracle and the element-path fallback."""
import numpy as np
import pytest

import dbcsr_tpu as dt
from dbcsr_tpu.core.config import config_override
from dbcsr_tpu.dist.distribution import (
    Distribution,
    dist_tile_bins,
    tile_aligned_dist,
    tile_dist_vector,
)
from dbcsr_tpu.dist.grid import ProcessGrid
from dbcsr_tpu.mm import cannon as cannon_mod

TILE = 8


@pytest.fixture
def grid22():
    return ProcessGrid.make(2, 2)


def _mats(rng, nelems=120, occ=0.4):
    with config_override(tile_size=TILE):
        rbs = dt.random_block_sizes(nelems, [2, 4], rng)
        kbs = dt.random_block_sizes(nelems - 16, [2, 4], rng)
        cbs = dt.random_block_sizes(nelems - 8, [4], rng)
        a = dt.random_matrix(rbs, kbs, occ, rng, dtype=np.float32)
        b = dt.random_matrix(kbs, cbs, occ, rng, dtype=np.float32)
    return a, b


def test_tile_dist_vector_alignment():
    sizes = np.array([2, 4, 2, 4, 4, 2, 2, 4], dtype=np.int32)
    v = tile_dist_vector(sizes, 2, 8)
    bins = dist_tile_bins(v, sizes, 8)
    assert bins is not None
    assert sorted(set(bins.tolist())) == [0, 1]


def test_dist_tile_bins_detects_misalignment():
    sizes = np.array([3, 5, 8], dtype=np.int32)  # block 0/1 share tile 0
    v = np.array([0, 1, 0], dtype=np.int32)
    assert dist_tile_bins(v, sizes, 8) is None


def test_tiled_cannon_matches_oracle(rng, grid22, monkeypatch):
    a, b = _mats(rng)
    dist = tile_aligned_dist(grid22, a.row_block_sizes, b.col_block_sizes, TILE)
    used = {}
    orig = cannon_mod._try_tiled_plan

    def spy(*args, **kw):
        plan = orig(*args, **kw)
        used["tiled"] = plan is not None
        return plan

    monkeypatch.setattr(cannon_mod, "_try_tiled_plan", spy)
    with config_override(tile_size=TILE):
        c = dt.multiply("N", "N", 1.0, a, b, dist=dist)
    assert used.get("tiled"), "tile-aligned dist must take the tiled plan"
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    np.testing.assert_allclose(
        np.asarray(c.to_dense()), ref, rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("transa,transb", [("T", "N"), ("N", "T")])
def test_tiled_cannon_transposes(rng, grid22, transa, transb):
    with config_override(tile_size=TILE):
        rbs = dt.random_block_sizes(96, [2, 4], rng)
        kbs = dt.random_block_sizes(80, [4], rng)
        cbs = dt.random_block_sizes(88, [2], rng)
        a_shape = (rbs, kbs) if transa == "N" else (kbs, rbs)
        b_shape = (kbs, cbs) if transb == "N" else (cbs, kbs)
        a = dt.random_matrix(*a_shape, 0.4, rng, dtype=np.float32)
        b = dt.random_matrix(*b_shape, 0.4, rng, dtype=np.float32)
        dist = tile_aligned_dist(grid22, rbs, cbs, TILE)
        c = dt.multiply(transa, transb, 1.0, a, b, dist=dist)
    da = np.asarray(a.to_dense())
    db = np.asarray(b.to_dense())
    if transa == "T":
        da = da.T
    if transb == "T":
        db = db.T
    np.testing.assert_allclose(
        np.asarray(c.to_dense()), da @ db, rtol=1e-4, atol=1e-4
    )


def test_tiled_matches_element_path(rng, grid22):
    """The two Cannon packings must agree bit-for-bit on the same inputs."""
    a, b = _mats(rng, occ=0.5)
    dist = tile_aligned_dist(grid22, a.row_block_sizes, b.col_block_sizes, TILE)
    with config_override(tile_size=TILE, use_tiled_cannon=True):
        c_t = dt.multiply("N", "N", 1.0, a, b, dist=dist)
    with config_override(tile_size=TILE, use_tiled_cannon=False):
        c_e = dt.multiply("N", "N", 1.0, a, b, dist=dist)
    np.testing.assert_allclose(
        np.asarray(c_t.to_dense()), np.asarray(c_e.to_dense()),
        rtol=1e-5, atol=1e-5,
    )


def test_tiled_cannon_25d(rng):
    grid = ProcessGrid.make(2, 2, nlayer=2)
    a, b = _mats(rng, nelems=96, occ=0.5)
    dist = tile_aligned_dist(grid, a.row_block_sizes, b.col_block_sizes, TILE)
    with config_override(tile_size=TILE):
        c = dt.multiply("N", "N", 1.0, a, b, dist=dist)
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    np.testing.assert_allclose(
        np.asarray(c.to_dense()), ref, rtol=1e-4, atol=1e-4
    )


def test_tiled_cannon_filter_eps(rng, grid22):
    a, b = _mats(rng, occ=0.3)
    dist = tile_aligned_dist(grid22, a.row_block_sizes, b.col_block_sizes, TILE)
    with config_override(tile_size=TILE):
        c = dt.multiply("N", "N", 1.0, a, b, dist=dist, filter_eps=1e-2)
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    diff = np.abs(np.asarray(c.to_dense()) - ref)
    assert diff.max() <= 0.1
