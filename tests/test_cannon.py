"""Distributed Cannon multiply on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import dbcsr_tpu as dt
from dbcsr_tpu.dist.distribution import Distribution, block_cyclic_dist
from dbcsr_tpu.dist.grid import ProcessGrid


def dense(m):
    return np.asarray(m.to_dense())


@pytest.fixture
def grid22():
    return ProcessGrid.make(2, 2)


def test_cannon_basic(rng, grid22):
    rbs = dt.random_block_sizes(100, [3, 5, 7], rng)
    kbs = dt.random_block_sizes(90, [4, 6], rng)
    cbs = dt.random_block_sizes(80, [2, 5], rng)
    a = dt.random_matrix(rbs, kbs, 0.3, rng, dtype=np.float64)
    b = dt.random_matrix(kbs, cbs, 0.3, rng, dtype=np.float64)
    dist = Distribution(
        grid=grid22,
        row_dist=(np.arange(len(rbs)) % 2).astype(np.int32),
        col_dist=(np.arange(len(cbs)) % 2).astype(np.int32),
    )
    c = dt.multiply("N", "N", 1.0, a, b, dist=dist)
    ref = dense(a) @ dense(b)
    assert np.abs(dense(c) - ref).max() < 1e-12 * max(1.0, np.abs(ref).max())


@pytest.mark.parametrize("transa,transb", [("T", "N"), ("N", "T"), ("T", "T")])
def test_cannon_transposes(rng, grid22, transa, transb):
    rbs = dt.random_block_sizes(60, [3, 5], rng)
    kbs = dt.random_block_sizes(50, [4], rng)
    cbs = dt.random_block_sizes(40, [6], rng)
    a_shape = (rbs, kbs) if transa == "N" else (kbs, rbs)
    b_shape = (kbs, cbs) if transb == "N" else (cbs, kbs)
    a = dt.random_matrix(*a_shape, 0.4, rng, dtype=np.float64)
    b = dt.random_matrix(*b_shape, 0.4, rng, dtype=np.float64)
    dist = Distribution(
        grid=grid22,
        row_dist=(np.arange(len(rbs)) % 2).astype(np.int32),
        col_dist=(np.arange(len(cbs)) % 2).astype(np.int32),
    )
    c = dt.multiply(transa, transb, 1.0, a, b, dist=dist)
    da = dense(a).T if transa == "T" else dense(a)
    db = dense(b).T if transb == "T" else dense(b)
    ref = da @ db
    assert np.abs(dense(c) - ref).max() < 1e-12 * max(1.0, np.abs(ref).max())


def test_cannon_alpha_beta_random_dist(rng, grid22):
    rbs = dt.random_block_sizes(70, [3, 4], rng)
    a = dt.random_matrix(rbs, rbs, 0.25, rng, dtype=np.float64)
    b = dt.random_matrix(rbs, rbs, 0.25, rng, dtype=np.float64)
    c0 = dt.random_matrix(rbs, rbs, 0.15, rng, dtype=np.float64)
    dist = Distribution(
        grid=grid22,
        row_dist=dt.random_dist_vector(len(rbs), 2, rng),
        col_dist=dt.random_dist_vector(len(rbs), 2, rng),
    )
    k_dist = dt.random_dist_vector(len(rbs), 2, rng)
    c = dt.multiply("N", "N", -1.5, a, b, beta=0.5, c=c0, dist=dist, k_dist=k_dist)
    ref = -1.5 * dense(a) @ dense(b) + 0.5 * dense(c0)
    assert np.abs(dense(c) - ref).max() < 1e-12 * max(1.0, np.abs(ref).max())


def test_cannon_grid_sizes(rng):
    """1x1 and 2x2 grids give identical results."""
    rbs = dt.random_block_sizes(50, [5], rng)
    a = dt.random_matrix(rbs, rbs, 0.3, rng, dtype=np.float64)
    b = dt.random_matrix(rbs, rbs, 0.3, rng, dtype=np.float64)
    outs = []
    for p in (1, 2):
        grid = ProcessGrid.make(p, p)
        dist = block_cyclic_dist(grid, len(rbs), len(rbs))
        outs.append(dense(dt.multiply("N", "N", 1.0, a, b, dist=dist)))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-12)
    np.testing.assert_allclose(outs[0], dense(a) @ dense(b), atol=1e-12)


def test_cannon_filter_eps(rng, grid22):
    rbs = dt.random_block_sizes(60, [4], rng)
    a = dt.random_matrix(rbs, rbs, 0.2, rng, dtype=np.float64)
    b = dt.random_matrix(rbs, rbs, 0.2, rng, dtype=np.float64)
    dist = block_cyclic_dist(grid22, len(rbs), len(rbs))
    eps = 1e-1
    c = dt.multiply("N", "N", 1.0, a, b, dist=dist, filter_eps=eps)
    nrm = np.asarray(dt.block_norms(c))
    assert (nrm >= eps * 0.999).all()
    ref = dense(a) @ dense(b)
    assert np.abs(dense(c) - ref).max() <= eps * 10


def test_cannon_25d_layers(rng):
    """2.5D: 2x2x2 mesh (8 devices), k split over the layer axis."""
    rbs = dt.random_block_sizes(60, [3, 5], rng)
    kbs = dt.random_block_sizes(70, [4, 6], rng)
    cbs = dt.random_block_sizes(50, [5], rng)
    a = dt.random_matrix(rbs, kbs, 0.3, rng, dtype=np.float64)
    b = dt.random_matrix(kbs, cbs, 0.3, rng, dtype=np.float64)
    grid = ProcessGrid.make(2, 2, nlayer=2)
    dist = Distribution(
        grid=grid,
        row_dist=(np.arange(len(rbs)) % 2).astype(np.int32),
        col_dist=(np.arange(len(cbs)) % 2).astype(np.int32),
    )
    c = dt.multiply("N", "N", 1.0, a, b, dist=dist)
    ref = dense(a) @ dense(b)
    assert np.abs(dense(c) - ref).max() < 1e-12 * max(1.0, np.abs(ref).max())
