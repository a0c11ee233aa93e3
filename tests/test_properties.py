"""Property-based invariants (hypothesis): algebraic identities that must
hold for ANY block structure, occupancy and tile size — the fuzzing
counterpart of the reference's randomized unittests.
"""
import numpy as np
from hypothesis import given, settings, strategies as st

import dbcsr_tpu as dt
from dbcsr_tpu.block.tileops import valid_mask
from dbcsr_tpu.core.config import config_override

SIZES = st.lists(st.integers(1, 9), min_size=1, max_size=8)


def _mk(rbs, cbs, occ, seed, tile):
    rng = np.random.default_rng(seed)
    with config_override(tile_size=tile):
        return dt.random_matrix(
            np.asarray(rbs, np.int32), np.asarray(cbs, np.int32),
            occ, rng, dtype=np.float64,
        )


@settings(max_examples=25, deadline=None)
@given(rbs=SIZES, cbs=SIZES, occ=st.floats(0.0, 1.0), seed=st.integers(0, 99),
       tile=st.sampled_from([4, 8, 16]))
def test_transpose_involution(rbs, cbs, occ, seed, tile):
    m = _mk(rbs, cbs, occ, seed, tile)
    tt = dt.transpose(dt.transpose(m))
    np.testing.assert_allclose(
        np.asarray(tt.to_dense()), np.asarray(m.to_dense()), atol=1e-12
    )


@settings(max_examples=25, deadline=None)
@given(rbs=SIZES, cbs=SIZES, occ=st.floats(0.0, 1.0), seed=st.integers(0, 99),
       tile=st.sampled_from([4, 8]))
def test_flat_store_roundtrip_and_padding(rbs, cbs, occ, seed, tile):
    m = _mk(rbs, cbs, occ, seed, tile)
    np.testing.assert_array_equal(
        np.asarray(m.with_flat(m.flat_host()).data), np.asarray(m.data)
    )
    vm = np.asarray(valid_mask(m.index, m.tile)) > 0.5
    assert np.all(np.asarray(m.data)[~vm] == 0)


@settings(max_examples=20, deadline=None)
@given(rbs=SIZES, cbs=SIZES, seed=st.integers(0, 99),
       alpha=st.floats(-3, 3), beta=st.floats(-3, 3),
       tile=st.sampled_from([4, 8]))
def test_add_linearity(rbs, cbs, seed, alpha, beta, tile):
    a = _mk(rbs, cbs, 0.6, seed, tile)
    b = _mk(rbs, cbs, 0.6, seed + 1, tile)
    out = dt.add(alpha, a, beta, b)
    ref = alpha * np.asarray(a.to_dense()) + beta * np.asarray(b.to_dense())
    np.testing.assert_allclose(np.asarray(out.to_dense()), ref, atol=1e-10)


@settings(max_examples=15, deadline=None)
@given(m_=SIZES, k_=SIZES, n_=SIZES, seed=st.integers(0, 99),
       tile=st.sampled_from([4, 8]))
def test_multiply_matches_dense(m_, k_, n_, seed, tile):
    a = _mk(m_, k_, 0.5, seed, tile)
    b = _mk(k_, n_, 0.5, seed + 1, tile)
    c = dt.multiply("N", "N", 1.0, a, b)
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    np.testing.assert_allclose(np.asarray(c.to_dense()), ref, atol=1e-10)


@settings(max_examples=15, deadline=None)
@given(m_=SIZES, k_=SIZES, n_=SIZES, seed=st.integers(0, 99),
       ta=st.booleans(), tb=st.booleans(), tile=st.sampled_from([4, 8]))
def test_multiply_transposes_match_dense(m_, k_, n_, seed, ta, tb, tile):
    a = _mk(k_ if ta else m_, m_ if ta else k_, 0.5, seed, tile)
    b = _mk(n_ if tb else k_, k_ if tb else n_, 0.5, seed + 1, tile)
    c = dt.multiply("T" if ta else "N", "T" if tb else "N", 1.0, a, b)
    da = np.asarray(a.to_dense())
    db = np.asarray(b.to_dense())
    ref = (da.T if ta else da) @ (db.T if tb else db)
    np.testing.assert_allclose(np.asarray(c.to_dense()), ref, atol=1e-10)


@settings(max_examples=15, deadline=None)
@given(n_=SIZES, seed=st.integers(0, 99), tile=st.sampled_from([4, 8]),
       sym=st.sampled_from(["S", "A"]))
def test_desymmetrize_fold_roundtrip(n_, seed, tile, sym):
    rng = np.random.default_rng(seed)
    with config_override(tile_size=tile):
        m = dt.random_matrix(
            np.asarray(n_, np.int32), np.asarray(n_, np.int32),
            0.6, rng, dtype=np.float64, sym=sym,
        )
    from dbcsr_tpu.ops.transform import fold_symmetric

    full = dt.desymmetrize(m)
    back = fold_symmetric(full, sym)
    np.testing.assert_allclose(
        np.asarray(back.to_dense()), np.asarray(m.to_dense()), atol=1e-12
    )


@settings(max_examples=15, deadline=None)
@given(n_=SIZES, seed=st.integers(0, 99), eps=st.floats(1e-6, 10.0),
       tile=st.sampled_from([4, 8]))
def test_filter_keeps_only_large_blocks(n_, seed, eps, tile):
    m = _mk(n_, n_, 0.7, seed, tile)
    f = dt.filter_blocks(m, eps)
    norms = np.asarray(dt.block_norms(f), np.float64)
    assert (norms >= eps * (1 - 1e-5)).all()
    # kept blocks unchanged
    for r, c, blk in f.iter_blocks():
        np.testing.assert_array_equal(blk, m.get_block(r, c))
