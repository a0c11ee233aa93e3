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


def test_filtered_multiply_norms_never_stale_cached(rng):
    """The norms-dependent SYMBOLIC plan of a filtered multiply is never
    cached (the surviving pattern depends on data), while pattern-derived
    pieces (built product index, tile plan, mnk stats) ARE content-cached
    across identical calls (round-4: per-call host cost of the
    linear-scaling SCF loop). Correctness criterion: changing the data
    changes the filtered result — no stale pattern reuse."""
    cache = get_plan_cache()
    cache.clear()
    bs = dt.random_block_sizes(20, [2, 3], rng)
    a = dt.random_matrix(bs, bs, 0.4, rng, dtype=np.float64)
    b = dt.random_matrix(bs, bs, 0.4, rng, dtype=np.float64)
    c1 = dt.multiply("N", "N", 1.0, a, b, filter_eps=1e-3)
    c2 = dt.multiply("N", "N", 1.0, a, b, filter_eps=1e-3)
    # identical call: pattern-derived caches may hit, result identical
    np.testing.assert_array_equal(
        np.asarray(c1.to_dense()), np.asarray(c2.to_dense())
    )
    # the unfiltered-symbolic cache entry is never consulted: scaling the
    # data changes which blocks survive eps, and the result tracks it
    tiny = a.with_data(a.data * 1e-6)
    c3 = dt.multiply("N", "N", 1.0, tiny, b, filter_eps=1e-3)
    assert c3.nblks < c1.nblks
    ref = np.asarray(tiny.to_dense()) @ np.asarray(b.to_dense())
    got = np.asarray(c3.to_dense())
    # surviving blocks match the true product
    mask = got != 0
    np.testing.assert_allclose(got[mask], ref[mask], atol=1e-12)


def test_distributed_multiply_hits_plan_cache(rng):
    """Second same-pattern distributed multiply skips Cannon planning
    (round-2 criterion: content-keyed cache inside multiply(dist=...))."""
    from dbcsr_tpu.dist import Distribution, ProcessGrid, tile_aligned_dist

    cache = get_plan_cache()
    cache.clear()
    grid = ProcessGrid.make(2, 2)
    bs = dt.random_block_sizes(24, [3, 5], rng)
    dist = tile_aligned_dist(grid, bs, bs, 128)
    a = dt.random_matrix(bs, bs, 0.5, rng, dtype=np.float32)
    b = dt.random_matrix(bs, bs, 0.5, rng, dtype=np.float32)
    c1 = dt.multiply("N", "N", 1.0, a, b, dist=dist)
    h0, m0 = cache.hits, cache.misses
    c2 = dt.multiply("N", "N", 1.0, a.with_data(a.data * 3.0), b, dist=dist)
    # every plan lookup of the second call must hit (symbolic + cannon)
    assert cache.misses == m0 and cache.hits > h0
    np.testing.assert_allclose(
        np.asarray(c2.to_dense()), 3.0 * np.asarray(c1.to_dense()),
        atol=1e-4,
    )


def test_summa_hits_plan_cache(rng):
    from dbcsr_tpu.dist import Distribution, ProcessGrid, tile_aligned_dist

    cache = get_plan_cache()
    cache.clear()
    grid = ProcessGrid.make(2, 4)
    bs = dt.random_block_sizes(24, [3, 5], rng)
    dist = tile_aligned_dist(grid, bs, bs, 128)
    a = dt.random_matrix(bs, bs, 0.5, rng, dtype=np.float32)
    b = dt.random_matrix(bs, bs, 0.5, rng, dtype=np.float32)
    dt.multiply("N", "N", 1.0, a, b, dist=dist)
    m0 = cache.misses
    dt.multiply("N", "N", 1.0, a, b, dist=dist)
    assert cache.misses == m0


def test_panel_plan_cached(rng):
    """The O(S log S) panel planning is memoized (including the None
    "inadmissible" verdict) so iterative one-shot callers don't re-plan
    every step — round-3 advisor finding (engine._cached_panel_plan)."""
    from dbcsr_tpu.block.index import build_index
    from dbcsr_tpu.block.store import store_layout
    from dbcsr_tpu.core.config import get_config
    from dbcsr_tpu.mm.engine import _cached_panel_plan
    from dbcsr_tpu.mm.tileplan import plan_tile_stacks_stores

    cache = get_plan_cache()
    cache.clear()
    n = 60
    rbs = np.full(n, 23, np.int32)
    i = np.repeat(np.arange(n, dtype=np.int64), 5)
    j = i + np.tile(np.arange(-2, 3, dtype=np.int64), n)
    keep = (j >= 0) & (j < n)
    idx, _ = build_index(i[keep], j[keep], rbs, rbs)
    lay = store_layout(idx, 128)
    coords, (mt, kt) = lay.tile_coords, (lay.ntr, lay.ntc)
    tplan = plan_tile_stacks_stores(coords, (mt, kt), coords, (kt, mt))
    cfg = get_config()
    args = (
        cfg, tplan, idx, idx, False, False, False, False,
        lay.n_tiles, lay.n_tiles, "auto", None, coords,
    )
    p1 = _cached_panel_plan(*args)
    misses0, hits0 = cache.misses, cache.hits
    p2 = _cached_panel_plan(*args)
    assert cache.misses == misses0 and cache.hits == hits0 + 1
    assert p2 is p1  # cached object, not a re-plan
    # a knob change must invalidate (the key covers public config fields)
    from dbcsr_tpu.core.config import config_override

    with config_override(panel_c_win=max(4, cfg.panel_c_win // 2)):
        _cached_panel_plan(get_config(), *args[1:])
    assert cache.misses == misses0 + 1

    # pinning the knob at its DEFAULT VALUE must also invalidate: knob
    # resolution branches on D/E/U provenance (default defers to the
    # tuned table), so value-identical configs can resolve different
    # plans — the fingerprint covers provenance too
    with config_override(panel_c_win=cfg.panel_c_win):
        _cached_panel_plan(get_config(), *args[1:])
    assert cache.misses == misses0 + 2
