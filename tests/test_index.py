"""Index construction / merging / transposition unit tests."""
import numpy as np
import pytest

from dbcsr_tpu.block.index import build_index, merge_index


def test_build_index_canonical():
    rbs = np.array([2, 3, 4], dtype=np.int32)
    cbs = np.array([1, 2], dtype=np.int32)
    rows = [2, 0, 1, 0]
    cols = [1, 1, 0, 0]
    idx, order = build_index(rows, cols, rbs, cbs)
    assert idx.nblks == 4
    np.testing.assert_array_equal(idx.row_ptr, [0, 2, 3, 4])
    np.testing.assert_array_equal(idx.col_idx, [0, 1, 0, 1])
    # block sizes: (0,0)=2, (0,1)=4, (1,0)=3, (2,1)=8
    np.testing.assert_array_equal(np.diff(idx.blk_offset), [2, 4, 3, 8])
    assert idx.nelems == 17
    assert idx.block_id(0, 1) == 1
    assert idx.block_id(2, 0) == -1


def test_build_index_rejects_duplicates():
    rbs = np.array([2], dtype=np.int32)
    with pytest.raises(ValueError):
        build_index([0, 0], [0, 0], rbs, rbs)


def test_transposed_roundtrip():
    rng = np.random.default_rng(1)
    rbs = np.array([2, 3, 1, 4], dtype=np.int32)
    cbs = np.array([5, 2, 3], dtype=np.int32)
    mask = rng.random((4, 3)) < 0.6
    rows, cols = np.nonzero(mask)
    idx, _ = build_index(rows.astype(np.int32), cols.astype(np.int32), rbs, cbs)
    tidx, perm = idx.transposed()
    assert tidx.nblkrows == 3 and tidx.nblkcols == 4
    assert tidx.nblks == idx.nblks
    # permutation maps each transposed block to the original coordinates
    for bnew in range(tidx.nblks):
        bold = perm[bnew]
        assert idx.blk_rows[bold] == tidx.col_idx[bnew]
        assert idx.col_idx[bold] == tidx.blk_rows[bnew]


def test_merge_index_union():
    rbs = np.array([2, 2], dtype=np.int32)
    a, _ = build_index([0], [0], rbs, rbs)
    b, _ = build_index([0, 1], [1, 0], rbs, rbs)
    merged, a_map, b_map = merge_index(a, b)
    assert merged.nblks == 3
    assert merged.blk_rows[a_map[0]] == 0 and merged.col_idx[a_map[0]] == 0
    assert merged.blk_rows[b_map[1]] == 1 and merged.col_idx[b_map[1]] == 0
