"""Property-based invariants for the sharded ops layer: for ANY block
structure / occupancy / grid factorization, the sharded ops must agree with
the local ops layer (which is itself dense-oracle checked)."""
import numpy as np
from hypothesis import given, settings, strategies as st

import dbcsr_tpu as dt
from dbcsr_tpu.core.config import config_override
from dbcsr_tpu.dist.distribution import tile_aligned_dist
from dbcsr_tpu.dist.grid import ProcessGrid
from dbcsr_tpu.dist.sharded_ops import (
    shard_matrix,
    sharded_add,
    sharded_dot,
    sharded_filter,
    sharded_hadamard,
    sharded_trace,
)

TILE = 8
SIZES = st.lists(st.integers(1, 6), min_size=4, max_size=14)
GRIDS = st.sampled_from([(1, 1), (2, 2), (2, 4), (4, 2), (1, 8)])


def _shard_pair(rbs, occ_a, occ_b, seed, grid_pq):
    rng = np.random.default_rng(seed)
    rbs = np.asarray(rbs, np.int32)
    with config_override(tile_size=TILE):
        a = dt.random_matrix(rbs, rbs, occ_a, rng, dtype=np.float64)
        b = dt.random_matrix(rbs, rbs, occ_b, rng, dtype=np.float64)
    grid = ProcessGrid.make(*grid_pq)
    dist = tile_aligned_dist(grid, rbs, rbs, TILE)
    return a, b, shard_matrix(a, dist), shard_matrix(b, dist)


@settings(max_examples=12, deadline=None)
@given(rbs=SIZES, occ=st.floats(0.0, 1.0), seed=st.integers(0, 99),
       alpha=st.floats(-2, 2), beta=st.floats(-2, 2), grid_pq=GRIDS)
def test_sharded_add_matches_local(rbs, occ, seed, alpha, beta, grid_pq):
    a, b, sa, sb = _shard_pair(rbs, occ, 1.0 - occ, seed, grid_pq)
    got = sharded_add(alpha, sa, beta, sb).to_local()
    ref = dt.add(alpha, a, beta, b)
    assert got.nblks == ref.nblks
    np.testing.assert_allclose(
        np.asarray(got.to_dense()), np.asarray(ref.to_dense()), atol=1e-10
    )


@settings(max_examples=10, deadline=None)
@given(rbs=SIZES, occ=st.floats(0.1, 0.9), seed=st.integers(0, 99),
       grid_pq=GRIDS)
def test_sharded_hadamard_dot_trace_match_local(rbs, occ, seed, grid_pq):
    a, b, sa, sb = _shard_pair(rbs, occ, occ, seed, grid_pq)
    got = sharded_hadamard(sa, sb).to_local()
    ref = dt.hadamard_product(a, b)
    np.testing.assert_allclose(
        np.asarray(got.to_dense()), np.asarray(ref.to_dense()), atol=1e-10
    )
    assert abs(sharded_dot(sa, sb) - dt.dot(a, b)) <= 1e-8 * max(
        1.0, abs(dt.dot(a, b))
    )
    assert abs(sharded_trace(sa) - dt.trace(a)) <= 1e-8 * max(
        1.0, abs(dt.trace(a))
    )


@settings(max_examples=10, deadline=None)
@given(rbs=SIZES, occ=st.floats(0.2, 1.0), seed=st.integers(0, 99),
       eps_q=st.floats(0.1, 0.9), grid_pq=GRIDS)
def test_sharded_filter_matches_local(rbs, occ, seed, eps_q, grid_pq):
    a, _, sa, _ = _shard_pair(rbs, occ, occ, seed, grid_pq)
    norms = dt.block_norms(a)
    if len(norms) == 0:
        return
    eps = float(np.quantile(norms, eps_q))
    got = sharded_filter(sa, eps).to_local()
    ref = dt.filter_blocks(a, eps)
    assert got.nblks == ref.nblks
    np.testing.assert_allclose(
        np.asarray(got.to_dense()), np.asarray(ref.to_dense()), atol=1e-10
    )
