"""API-parity extras: block diagonal extraction, column norm, named element
functions, matrix verification, offsets/sizes converters."""
import numpy as np
import pytest

import dbcsr_tpu as dt


def test_get_block_diag(rng):
    rbs = dt.random_block_sizes(25, [2, 3], rng)
    m = dt.random_matrix(rbs, rbs, 0.6, rng, dtype=np.float64)
    d = dt.get_block_diag(m)
    ro = m.index.row_offsets
    dense = np.asarray(m.to_dense())
    got = np.asarray(d.to_dense())
    for i in range(m.nblkrows):
        sl = slice(int(ro[i]), int(ro[i + 1]))
        if m.index.block_id(i, i) >= 0:
            np.testing.assert_array_equal(got[sl, sl], dense[sl, sl])
    # everything off the block diagonal is zero
    mask = np.zeros_like(dense, dtype=bool)
    for i in range(m.nblkrows):
        sl = slice(int(ro[i]), int(ro[i + 1]))
        mask[sl, sl] = True
    assert np.all(got[~mask] == 0)


def test_norm_column(rng):
    rbs = dt.random_block_sizes(20, [2, 3], rng)
    cbs = dt.random_block_sizes(18, [1, 4], rng)
    m = dt.random_matrix(rbs, cbs, 0.5, rng, dtype=np.float64)
    ref = np.abs(np.asarray(m.to_dense())).sum(axis=0).max()
    assert dt.norm_column(m) == pytest.approx(ref, rel=1e-10)


def test_named_element_functions(rng):
    rbs = dt.random_block_sizes(10, [2], rng)
    m = dt.random_matrix(rbs, rbs, 0.8, rng, dtype=np.float64)
    t = dt.function_of_elements(m, "tanh")
    dense = np.asarray(m.to_dense())
    got = np.asarray(t.to_dense())
    # stored positions transformed; unstored remain zero (tanh(0)=0 anyway)
    np.testing.assert_allclose(got, np.tanh(dense), atol=1e-12)
    inv = dt.function_of_elements(m, "inverse")
    gi = np.asarray(inv.to_dense())
    nz = dense != 0
    np.testing.assert_allclose(gi[nz], 1.0 / dense[nz], atol=1e-12)
    with pytest.raises(Exception):
        dt.function_of_elements(m, "no_such_fn")


def test_verify_matrix(rng):
    rbs = dt.random_block_sizes(15, [2, 3], rng)
    m = dt.random_matrix(rbs, rbs, 0.5, rng, dtype=np.float64)
    assert dt.verify_matrix(m)
    # corrupt the padding -> must be detected
    import jax.numpy as jnp

    bad = m.with_data(m.data + 1e-3)  # pollutes padding positions
    if (np.asarray(dt.block_norms(m)) >= 0).all() and m.layout.n_tiles:
        with pytest.raises(Exception):
            dt.verify_matrix(bad)


def test_offsets_sizes_roundtrip():
    sizes = np.array([2, 5, 3], dtype=np.int32)
    off = dt.convert_sizes_to_offsets(sizes)
    np.testing.assert_array_equal(off, [0, 2, 7, 10])
    np.testing.assert_array_equal(dt.convert_offsets_to_sizes(off), sizes)
