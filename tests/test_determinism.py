"""Determinism: the engine replaces the reference's atomicAdd stack
processing with host-sorted, deterministic accumulation — identical inputs
must produce BIT-IDENTICAL results on every path."""
import numpy as np
import pytest

import dbcsr_tpu as dt
from dbcsr_tpu.core.config import config_override
from dbcsr_tpu.dist.distribution import tile_aligned_dist
from dbcsr_tpu.dist.grid import ProcessGrid


def _mats(rng, tile=8):
    with config_override(tile_size=tile):
        rbs = dt.random_block_sizes(80, [2, 4], rng)
        a = dt.random_matrix(rbs, rbs, 0.4, rng, dtype=np.float32)
        b = dt.random_matrix(rbs, rbs, 0.4, rng, dtype=np.float32)
    return a, b


@pytest.mark.parametrize("driver", ["dense", "xla"])
def test_local_multiply_bitwise_deterministic(rng, driver):
    a, b = _mats(rng)
    with config_override(tile_size=8, mm_driver=driver):
        c1 = dt.multiply("N", "N", 1.0, a, b)
        c2 = dt.multiply("N", "N", 1.0, a, b)
    np.testing.assert_array_equal(np.asarray(c1.data), np.asarray(c2.data))


def test_distributed_multiply_bitwise_deterministic(rng):
    grid = ProcessGrid.make(2, 2)
    a, b = _mats(rng)
    dist = tile_aligned_dist(grid, a.row_block_sizes, b.col_block_sizes, 8)
    with config_override(tile_size=8):
        c1 = dt.multiply("N", "N", 1.0, a, b, dist=dist)
        c2 = dt.multiply("N", "N", 1.0, a, b, dist=dist)
    np.testing.assert_array_equal(np.asarray(c1.data), np.asarray(c2.data))


def test_filtered_multiply_deterministic(rng):
    a, b = _mats(rng)
    with config_override(tile_size=8):
        c1 = dt.multiply("N", "N", 1.0, a, b, filter_eps=1e-3)
        c2 = dt.multiply("N", "N", 1.0, a, b, filter_eps=1e-3)
    assert c1.nblks == c2.nblks
    np.testing.assert_array_equal(np.asarray(c1.data), np.asarray(c2.data))
