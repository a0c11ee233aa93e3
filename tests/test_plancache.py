"""Plan cache: repeated unfiltered multiplies over identical patterns must
hit the cache and return identical results."""
import numpy as np

import dbcsr_tpu as dt
from dbcsr_tpu.mm.plancache import get_plan_cache, index_fingerprint


def test_fingerprint_stability_and_content(rng):
    bs = dt.random_block_sizes(20, [2, 3], rng)
    a = dt.random_matrix(bs, bs, 0.5, rng, dtype=np.float64)
    f1 = index_fingerprint(a.index)
    assert f1 == index_fingerprint(a.index)
    # same content, different object -> same fingerprint
    b = dt.BCSRMatrix.from_flat(a.index, a.flat_host(), name="b")
    assert index_fingerprint(b.index) == f1
    # different pattern -> different fingerprint
    c = dt.random_matrix(bs, bs, 0.3, rng, dtype=np.float64)
    assert index_fingerprint(c.index) != f1


def test_multiply_hits_cache(rng):
    cache = get_plan_cache()
    cache.clear()
    bs = dt.random_block_sizes(30, [2, 3], rng)
    a = dt.random_matrix(bs, bs, 0.4, rng, dtype=np.float64)
    b = dt.random_matrix(bs, bs, 0.4, rng, dtype=np.float64)
    c1 = dt.multiply("N", "N", 1.0, a, b)
    misses0 = cache.misses
    c2 = dt.multiply("N", "N", 1.0, a.with_data(a.data * 2.0), b)
    assert cache.hits >= 1 and cache.misses == misses0
    np.testing.assert_allclose(
        np.asarray(c2.to_dense()), 2.0 * np.asarray(c1.to_dense()), atol=1e-10
    )


def test_filtered_multiply_bypasses_cache(rng):
    cache = get_plan_cache()
    cache.clear()
    bs = dt.random_block_sizes(20, [2, 3], rng)
    a = dt.random_matrix(bs, bs, 0.4, rng, dtype=np.float64)
    b = dt.random_matrix(bs, bs, 0.4, rng, dtype=np.float64)
    dt.multiply("N", "N", 1.0, a, b, filter_eps=1e-3)
    dt.multiply("N", "N", 1.0, a, b, filter_eps=1e-3)
    assert cache.hits == 0
