"""Tile-store layout invariants and indicator-machinery tests.

The padding-zero invariant (store positions not covered by a stored block
are exactly 0) is what makes tile-granular arithmetic equal matrix
arithmetic — every op must preserve it.
"""
import numpy as np
import pytest

import dbcsr_tpu as dt
from dbcsr_tpu.block.store import row_indicators, store_layout
from dbcsr_tpu.block.tileops import (
    block_mask_store,
    block_sums_sq,
    coord_mask,
    tile_align_map,
    transpose_store,
    valid_mask,
)
from dbcsr_tpu.core.config import config_override


def _mk(rng, n=40, occ=0.4, sizes=(2, 3, 5), dtype=np.float64, tile=16):
    with config_override(tile_size=tile):
        rbs = dt.random_block_sizes(n, list(sizes), rng)
        cbs = dt.random_block_sizes(n - 5, [1, 4], rng)
        return dt.random_matrix(rbs, cbs, occ, rng, dtype=dtype)


def _padding_is_zero(m):
    vm = np.asarray(valid_mask(m.index, m.tile)) > 0.5
    data = np.asarray(m.data)
    return np.all(data[~vm] == 0)


def test_roundtrip_flat_store(rng):
    m = _mk(rng)
    flat = m.flat_host()
    m2 = m.with_flat(flat)
    np.testing.assert_array_equal(np.asarray(m2.data), np.asarray(m.data))
    assert _padding_is_zero(m)


def test_store_layout_geometry(rng):
    m = _mk(rng, tile=16)
    lay = m.layout
    assert lay.ntr == -(-m.shape[0] // 16)
    assert lay.ntc == -(-m.shape[1] // 16)
    keys = lay.tile_keys()
    assert (np.diff(keys) > 0).all()  # row-major sorted, unique


def test_valid_mask_matches_dense_pattern(rng):
    m = _mk(rng, tile=16)
    vm = np.asarray(valid_mask(m.index, m.tile)) > 0.5
    # rebuild the dense coverage mask from the index
    cover = np.zeros(m.shape, dtype=bool)
    ro, co = m.index.row_offsets, m.index.col_offsets
    for r, c, blk in m.iter_blocks():
        cover[ro[r]:ro[r + 1], co[c]:co[c + 1]] = True
    lay = m.layout
    t = m.tile
    for slot, (tr, tc) in enumerate(np.asarray(lay.tile_coords)):
        sub = np.zeros((t, t), dtype=bool)
        r0, c0 = tr * t, tc * t
        r1, c1 = min(r0 + t, m.shape[0]), min(c0 + t, m.shape[1])
        sub[: r1 - r0, : c1 - c0] = cover[r0:r1, c0:c1]
        np.testing.assert_array_equal(vm[slot], sub)


def test_block_sums_sq_matches_blocks(rng):
    m = _mk(rng, tile=16)
    got = block_sums_sq(m.index, m.tile, m.data)
    ref = np.array(
        [float((blk.astype(np.float64) ** 2).sum()) for _, _, blk in m.iter_blocks()]
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_block_mask_keep_subset(rng):
    m = _mk(rng, tile=16)
    keep = np.zeros(m.nblks, dtype=np.float32)
    keep[::2] = 1.0
    mask = np.asarray(block_mask_store(m.index, m.tile, keep))
    masked = m.with_data(m.data * mask.astype(m.dtype))
    for i, (r, c, blk) in enumerate(masked.iter_blocks()):
        if i % 2 == 0:
            assert np.any(blk != 0) or np.allclose(blk, 0)  # untouched
        else:
            np.testing.assert_array_equal(blk, 0)


def test_transpose_store_matches_dense(rng):
    m = _mk(rng, tile=16)
    st, coords = transpose_store(m.index, m.tile, m.data)
    new_index, _ = m.index.transposed()
    lay_t = store_layout(new_index, m.tile)
    np.testing.assert_array_equal(lay_t.tile_coords, coords)
    mt = dt.BCSRMatrix(name="t", index=new_index, data=st)
    np.testing.assert_allclose(
        np.asarray(mt.to_dense()), np.asarray(m.to_dense()).T
    )


def test_coord_mask_triu(rng):
    m = _mk(rng, n=20, tile=8)
    mask = np.asarray(coord_mask(m.layout, lambda r, c: r <= c))
    lay = m.layout
    for slot, (tr, tc) in enumerate(np.asarray(lay.tile_coords)):
        r = tr * 8 + np.arange(8)[:, None]
        c = tc * 8 + np.arange(8)[None, :]
        np.testing.assert_array_equal(mask[slot], r <= c)


def test_tile_align_map():
    dst = np.array([1, 3, 5, 9])
    src = np.array([0, 3, 9])
    np.testing.assert_array_equal(tile_align_map(dst, src), [-1, 1, -1, 2])
    np.testing.assert_array_equal(
        tile_align_map(dst, np.array([], dtype=np.int64)), [-1, -1, -1, -1]
    )


@pytest.mark.parametrize(
    "op",
    [
        lambda m: dt.scale(m, 2.5),
        lambda m: dt.set_value(m, 3.0),
        lambda m: dt.function_of_elements(m, lambda x: x + 1.0),
        lambda m: dt.triu(m),
        lambda m: dt.add_on_diag(m, 1.0),
        lambda m: dt.filter_blocks(m, 0.5),
        lambda m: dt.crop(m, row_range=(1, 5)),
        lambda m: dt.scale_by_vector(
            m, np.arange(m.shape[1], dtype=np.float64), "right"
        ),
    ],
)
def test_ops_preserve_padding_invariant(rng, op):
    m = _mk(rng, tile=16)
    out = op(m)
    assert _padding_is_zero(out), "op leaked nonzeros into store padding"


def test_add_preserves_invariant_and_values(rng):
    m1 = _mk(rng, tile=16)
    with config_override(tile_size=16):
        m2 = dt.random_matrix(
            m1.row_block_sizes, m1.col_block_sizes, 0.3,
            rng, dtype=np.float64,
        )
    out = dt.add(2.0, m1, -1.0, m2)
    assert _padding_is_zero(out)
    np.testing.assert_allclose(
        np.asarray(out.to_dense()),
        2.0 * np.asarray(m1.to_dense()) - np.asarray(m2.to_dense()),
        atol=1e-12,
    )


def test_retile_roundtrip(rng):
    m = _mk(rng, tile=16)
    m2 = dt.retile(m, 32)
    assert m2.tile == 32
    np.testing.assert_allclose(
        np.asarray(m2.to_dense()), np.asarray(m.to_dense())
    )
    assert _padding_is_zero(m2)
    m3 = dt.retile(m2, 16)
    np.testing.assert_array_equal(np.asarray(m3.data), np.asarray(m.data))


def test_mixed_tile_operands_rejected(rng):
    m1 = _mk(rng, tile=16)
    m2 = dt.retile(m1, 32)
    sq1 = dt.retile(
        dt.random_matrix(m1.col_block_sizes, m1.col_block_sizes, 0.5,
                         rng, dtype=np.float64),
        16,
    )
    with pytest.raises(Exception):
        dt.multiply("N", "N", 1.0, m2, sq1)
    with pytest.raises(Exception):
        dt.dot(m1, m2)


def test_row_indicators_partition():
    sizes = np.array([3, 5, 2, 7, 4], dtype=np.int32)
    ind = row_indicators(sizes, 8)
    # every valid global row has exactly one segment
    total = int(sizes.sum())
    ntr = -(-total // 8)
    for tr in range(ntr):
        rows_here = min(8, total - tr * 8)
        s = ind.J[tr].sum(axis=1)
        np.testing.assert_array_equal(s[:rows_here], 1.0)
        np.testing.assert_array_equal(s[rows_here:], 0.0)


def test_multiply_result_padding_invariant(rng):
    m = _mk(rng, n=30, tile=16)
    with config_override(tile_size=16):
        sq = dt.random_matrix(
            m.col_block_sizes, m.col_block_sizes, 0.4, rng, dtype=np.float64
        )
    out = dt.multiply("N", "N", 1.0, m, sq, filter_eps=1e-3)
    assert _padding_is_zero(out)
