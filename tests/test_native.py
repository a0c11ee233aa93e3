"""Native (C++) planner tests: results must match the numpy reference
planner bit-for-bit (same stacks, same slot assignment, same data layout).
"""
import numpy as np
import pytest

import dbcsr_tpu as dt
from dbcsr_tpu.core.config import config_override
from dbcsr_tpu.mm.tileplan import plan_tile_stacks_stores
from dbcsr_tpu.native import flatten_blocks, native_available, stack_build


pytestmark = pytest.mark.skipif(
    not native_available(), reason="native planner failed to build"
)


def _plans(seed, occ=0.25, tile=16):
    rng = np.random.default_rng(seed)
    rbs = dt.random_block_sizes(200, [5, 13, 23], rng)
    kbs = dt.random_block_sizes(150, [7, 11], rng)
    with config_override(tile_size=tile):
        a = dt.random_matrix(rbs, kbs, occ, rng, dtype=np.float32)
        b = dt.random_matrix(kbs, rbs, occ, rng, dtype=np.float32)
    la, lb = a.layout, b.layout
    args = (la.tile_coords, (la.ntr, la.ntc), lb.tile_coords, (lb.ntr, lb.ntc))
    with config_override(use_native_planner=True):
        p_nat = plan_tile_stacks_stores(*args)
    with config_override(use_native_planner=False):
        p_np = plan_tile_stacks_stores(*args)
    return p_nat, p_np


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_plan_matches_numpy(seed):
    p_nat, p_np = _plans(seed)
    assert p_nat.n_c_tiles == p_np.n_c_tiles
    np.testing.assert_array_equal(p_nat.c_tile_keys, p_np.c_tile_keys)
    assert len(p_nat.stack) == len(p_np.stack)
    # both sorted by c_slot; within a c group order may differ between the
    # stable sorts only if enumeration order differs — it must not:
    np.testing.assert_array_equal(p_nat.stack[:, 0], p_np.stack[:, 0])
    # the (a,b) pair multiset per C tile must agree exactly
    def keyed(p):
        return np.lexsort((p.stack[:, 2], p.stack[:, 1], p.stack[:, 0]))
    np.testing.assert_array_equal(
        p_nat.stack[keyed(p_nat)], p_np.stack[keyed(p_np)]
    )


def test_native_multiply_end_to_end():
    rng = np.random.default_rng(3)
    rbs = dt.random_block_sizes(100, [5, 13], rng)
    a = dt.random_matrix(rbs, rbs, 0.2, rng, dtype=np.float32)
    b = dt.random_matrix(rbs, rbs, 0.2, rng, dtype=np.float32)
    with config_override(use_native_planner=True, mm_driver="xla"):
        c1 = dt.multiply("N", "N", 1.0, a, b)
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    np.testing.assert_allclose(
        np.asarray(c1.to_dense()), ref, rtol=1e-4, atol=1e-4
    )


def test_stack_build_empty():
    out = stack_build(
        4, 4,
        np.zeros(5, dtype=np.int64), np.zeros(0, dtype=np.int64),
        np.zeros(0, dtype=np.int64),
        np.zeros(5, dtype=np.int64), np.zeros(0, dtype=np.int64),
        np.zeros(0, dtype=np.int64),
    )
    assert out is not None
    stack, keys = out
    assert len(stack) == 0 and len(keys) == 0


def test_flatten_blocks_matches_concatenate():
    rng = np.random.default_rng(4)
    blocks = [rng.standard_normal((rng.integers(1, 6), 3)) for _ in range(20)]
    order = rng.permutation(20).astype(np.int64)
    got = flatten_blocks(blocks, order, np.float64)
    assert got is not None
    ref = np.concatenate([blocks[int(o)].ravel() for o in order])
    np.testing.assert_array_equal(got, ref)


def test_flatten_blocks_falls_back_on_dtype_mismatch():
    blocks = [np.ones((2, 2), dtype=np.float64)]
    assert flatten_blocks(blocks, np.array([0]), np.float32) is None


def test_store_layout_native_matches_numpy():
    from dbcsr_tpu.block.index import build_index
    from dbcsr_tpu.mm.pack import tile_panel_maps
    from dbcsr_tpu.native import store_layout_native

    rng = np.random.default_rng(5)
    rbs = dt.random_block_sizes(300, [5, 13, 23], rng)
    cbs = dt.random_block_sizes(250, [2, 7], rng)
    mask = rng.random((len(rbs), len(cbs))) < 0.2
    rows, cols = np.nonzero(mask)
    idx, _ = build_index(rows, cols, rbs, cbs)
    nat = store_layout_native(idx, 16)
    assert nat is not None
    ed, tc, (ntr, ntc) = tile_panel_maps(idx, 16, False)
    np.testing.assert_array_equal(nat[0], tc)
    np.testing.assert_array_equal(nat[1], ed.astype(np.int64))
    assert (nat[2], nat[3]) == (ntr, ntc)
