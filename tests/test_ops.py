"""Elementwise ops / reductions vs dense oracles (unittest1 'add' cases +
the dbcsr_operations surface)."""
import numpy as np
import pytest

import dbcsr_tpu as dt


@pytest.fixture
def mats(rng):
    rbs = dt.random_block_sizes(40, [2, 3, 5], rng)
    cbs = dt.random_block_sizes(35, [1, 4, 6], rng)
    a = dt.random_matrix(rbs, cbs, 0.4, rng, dtype=np.float64, name="a")
    b = dt.random_matrix(rbs, cbs, 0.4, rng, dtype=np.float64, name="b")
    return a, b


def dense(m):
    return np.asarray(m.to_dense())


def test_add(mats):
    a, b = mats
    c = dt.add(1.5, a, -0.5, b)
    np.testing.assert_allclose(dense(c), 1.5 * dense(a) - 0.5 * dense(b), atol=1e-12)


def test_scale(mats):
    a, _ = mats
    np.testing.assert_allclose(dense(dt.scale(a, 3.0)), 3.0 * dense(a))


def test_scale_by_vector_transpose_invariance(rng):
    """unittest4's recipe (tests/dbcsr_test_scale_by_vector.F): scaling
    columns of A must equal transposing, scaling rows, transposing back."""
    rbs = dt.random_block_sizes(30, [2, 3], rng)
    cbs = dt.random_block_sizes(25, [1, 4], rng)
    m = dt.random_matrix(rbs, cbs, 0.5, rng, dtype=np.float64)
    v = rng.standard_normal(m.shape[1])
    right = dt.scale_by_vector(m, v, "right")
    via_t = dt.transpose(dt.scale_by_vector(dt.transpose(m), v, "left"))
    np.testing.assert_allclose(
        np.asarray(right.to_dense()), np.asarray(via_t.to_dense()), atol=1e-12
    )


def test_scale_by_vector(mats, rng):
    a, _ = mats
    vr = rng.standard_normal(a.shape[0])
    vc = rng.standard_normal(a.shape[1])
    np.testing.assert_allclose(
        dense(dt.scale_by_vector(a, vr, "left")), vr[:, None] * dense(a), atol=1e-12
    )
    np.testing.assert_allclose(
        dense(dt.scale_by_vector(a, vc, "right")), dense(a) * vc[None, :], atol=1e-12
    )


def test_trace_dot(rng):
    rbs = dt.random_block_sizes(30, [2, 3], rng)
    a = dt.random_matrix(rbs, rbs, 0.5, rng, dtype=np.float64)
    b = dt.random_matrix(rbs, rbs, 0.5, rng, dtype=np.float64)
    assert dt.trace(a) == pytest.approx(np.trace(dense(a)))
    assert dt.dot(a, b) == pytest.approx(np.sum(dense(a) * dense(b)))


def test_hadamard(mats):
    a, b = mats
    h = dt.hadamard_product(a, b)
    np.testing.assert_allclose(dense(h), dense(a) * dense(b), atol=1e-12)


def test_norms(rng):
    rbs = dt.random_block_sizes(20, [2, 5], rng)
    a = dt.random_matrix(rbs, rbs, 0.6, rng, dtype=np.float64)
    d = dense(a)
    assert dt.norm_frobenius(a) == pytest.approx(np.linalg.norm(d))
    assert dt.norm_maxabs(a) == pytest.approx(np.abs(d).max())
    assert dt.norm_gershgorin(a) == pytest.approx(np.abs(d).sum(axis=1).max())
    nsq = np.asarray(dt.block_norms_sq(a))
    # block norms are SINGLE precision like the reference's norms kernels
    # (f32 reduction order differs between backends) — f32-level tolerance
    for bid, (r, c, blk) in enumerate(a.iter_blocks()):
        assert nsq[bid] == pytest.approx(np.sum(blk * blk), rel=1e-3)


def test_filter_blocks(rng):
    rbs = np.array([3, 3, 3], dtype=np.int32)
    bld = dt.BCSRBuilder(rbs, rbs, dtype=np.float64)
    big = np.full((3, 3), 1.0)
    small = np.full((3, 3), 1e-8)
    bld.put_block(0, 0, big)
    bld.put_block(1, 1, small)
    bld.put_block(2, 0, big)
    m = bld.finalize()
    f = dt.filter_blocks(m, 1e-5)
    assert f.nblks == 2
    assert f.get_block(1, 1) is None
    np.testing.assert_allclose(f.get_block(2, 0), big)


def test_function_of_elements(mats):
    a, _ = mats
    sq = dt.function_of_elements(a, lambda x: x * x)
    np.testing.assert_allclose(dense(sq), dense(a) ** 2)


def test_triu_diag(rng):
    rbs = dt.random_block_sizes(15, [2, 3], rng)
    a = dt.random_matrix(rbs, rbs, 1.0, rng, dtype=np.float64)
    d = dense(a)
    np.testing.assert_allclose(dense(dt.triu(a)), np.triu(d))
    np.testing.assert_allclose(np.asarray(dt.get_diag(a)), np.diag(d))
    newdiag = np.arange(a.shape[0], dtype=np.float64)
    a2 = dt.set_diag(a, newdiag)
    np.testing.assert_allclose(np.diag(dense(a2)), newdiag)
    a3 = dt.add_on_diag(a, 2.5)
    np.testing.assert_allclose(np.diag(dense(a3)), np.diag(d) + 2.5)


def test_crop(mats):
    a, _ = mats
    c = dt.crop(a, row_range=(0, 3), col_range=(1, 4))
    ro = a.index.row_offsets
    co = a.index.col_offsets
    d = dense(c)
    ref = np.zeros_like(d)
    ref[ro[0]:ro[3], co[1]:co[4]] = dense(a)[ro[0]:ro[3], co[1]:co[4]]
    np.testing.assert_allclose(d, ref)


def test_transpose(mats):
    a, _ = mats
    np.testing.assert_allclose(dense(dt.transpose(a)), dense(a).T)
