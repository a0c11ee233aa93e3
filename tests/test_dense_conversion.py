"""make_dense / make_undense / may_be_dense / retile conversions."""
import numpy as np
import pytest

import dbcsr_tpu as dt


def test_make_dense_and_back(rng):
    rbs = dt.random_block_sizes(30, [2, 3], rng)
    cbs = dt.random_block_sizes(25, [1, 4], rng)
    m = dt.random_matrix(rbs, cbs, 0.4, rng, dtype=np.float64)
    dm = dt.make_dense(m)
    assert dm.nblks == 1
    np.testing.assert_allclose(
        np.asarray(dm.to_dense()), np.asarray(m.to_dense())
    )
    back = dt.make_undense(dm, rbs, cbs, tol=0.0)
    np.testing.assert_allclose(
        np.asarray(back.to_dense()), np.asarray(m.to_dense())
    )
    # undense drops exact-zero blocks -> pattern subset of the original
    assert back.nblks <= m.nblks


def test_make_dense_symmetric(rng):
    rbs = dt.random_block_sizes(20, [2, 3], rng)
    s = dt.random_matrix(rbs, rbs, 0.5, rng, dtype=np.float64, sym="S")
    dm = dt.make_dense(s)
    np.testing.assert_allclose(
        np.asarray(dm.to_dense()), np.asarray(s.to_dense())
    )


def test_may_be_dense(rng):
    rbs = dt.random_block_sizes(20, [3], rng)
    dense = dt.random_matrix(rbs, rbs, 1.0, rng, dtype=np.float64)
    sparse = dt.random_matrix(rbs, rbs, 0.05, rng, dtype=np.float64)
    assert dt.may_be_dense(dense)
    assert not dt.may_be_dense(sparse)


def test_undense_threshold_drops_small_blocks():
    rbs = np.array([2, 2], dtype=np.int32)
    dense = np.zeros((4, 4))
    dense[:2, :2] = 5.0
    dense[2:, 2:] = 1e-12
    m = dt.BCSRMatrix.from_dense(dense, rbs, rbs, keep_zero_blocks=True)
    out = dt.make_undense(dt.make_dense(m), rbs, rbs, tol=1e-6)
    assert out.nblks == 1
    assert out.get_block(0, 0) is not None
