"""BCSRMatrix construction, block access, conversions."""
import numpy as np
import pytest

import dbcsr_tpu as dt


def test_builder_roundtrip(rng):
    rbs = np.array([2, 3], dtype=np.int32)
    cbs = np.array([4, 1], dtype=np.int32)
    b = dt.BCSRBuilder(rbs, cbs, dtype=np.float64)
    blk00 = rng.standard_normal((2, 4))
    blk11 = rng.standard_normal((3, 1))
    b.put_block(0, 0, blk00)
    b.put_block(1, 1, blk11)
    b.put_block(0, 0, blk00, sum=True)  # accumulate
    m = b.finalize()
    assert m.nblks == 2
    np.testing.assert_allclose(m.get_block(0, 0), 2 * blk00)
    np.testing.assert_allclose(m.get_block(1, 1), blk11)
    assert m.get_block(1, 0) is None
    assert m.shape == (5, 5)


def test_dense_roundtrip(rng):
    rbs = dt.random_block_sizes(30, [2, 3, 5], rng)
    cbs = dt.random_block_sizes(25, [4, 7], rng)
    m = dt.random_matrix(rbs, cbs, 0.5, rng, dtype=np.float64)
    d = np.asarray(m.to_dense())
    m2 = dt.BCSRMatrix.from_dense(d, rbs, cbs)
    np.testing.assert_allclose(np.asarray(m2.to_dense()), d)


def test_iter_blocks(rng):
    rbs = np.array([2, 3], dtype=np.int32)
    m = dt.random_matrix(rbs, rbs, 1.0, rng, dtype=np.float32)
    seen = {(r, c) for r, c, _ in m.iter_blocks()}
    assert len(seen) == m.nblks == 4
    for r, c, blk in m.iter_blocks():
        np.testing.assert_allclose(blk, m.get_block(r, c))


@pytest.mark.parametrize("sym", ["S", "A"])
def test_symmetric_storage(rng, sym):
    rbs = np.array([2, 3, 4], dtype=np.int32)
    m = dt.random_matrix(rbs, rbs, 0.9, rng, sym=sym, dtype=np.float64)
    d = np.asarray(m.to_dense())
    if sym == "S":
        np.testing.assert_allclose(d, d.T)
    else:
        np.testing.assert_allclose(d, -d.T)
    # reflected block access
    blk = m.get_block(2, 0)
    if blk is not None:
        ref = d[5:9, 0:2]
        np.testing.assert_allclose(blk, ref)
    full = dt.desymmetrize(m)
    np.testing.assert_allclose(np.asarray(full.to_dense()), d)
    assert full.sym == "N"


def test_occupation(rng):
    rbs = np.array([5, 5], dtype=np.int32)
    m = dt.random_matrix(rbs, rbs, 1.0, rng)
    assert m.occupation() == pytest.approx(1.0)
