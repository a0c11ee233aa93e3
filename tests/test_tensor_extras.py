"""Tensor extras: pgrids, contraction layouts, block splitting."""
import numpy as np
import pytest

import dbcsr_tpu as dt
from dbcsr_tpu.tensors import (
    NDMapping,
    TensorBuilder,
    TensorPGrid,
    contract,
    contraction_layouts,
    default_pgrid_dims,
    split_blocks,
)


def _rand(rng, block_sizes, occ=0.8, mapping=None):
    bs = [np.asarray(b, dtype=np.int32) for b in block_sizes]
    builder = TensorBuilder(bs, mapping, dtype=np.float64)
    nbpd = [len(b) for b in bs]
    for flat in np.flatnonzero(rng.random(int(np.prod(nbpd))) < occ):
        bi = np.unravel_index(flat, nbpd)
        shp = tuple(int(bs[d][bi[d]]) for d in range(len(bs)))
        builder.put_block(bi, rng.standard_normal(shp))
    return builder.finalize()


def test_default_pgrid_dims():
    assert default_pgrid_dims(8, 3) == (2, 2, 2)
    assert default_pgrid_dims(12, 2) == (4, 3)
    assert default_pgrid_dims(1, 4) == (1, 1, 1, 1)


def test_tensor_pgrid_consistency():
    from dbcsr_tpu.dist.grid import ProcessGrid

    pg = TensorPGrid.make(3, dims=(1, 1, 1))
    assert pg.grid.nprow == 1 and pg.grid.npcol == 1
    with pytest.raises(Exception):
        TensorPGrid(
            dims=(2, 2),
            mapping=NDMapping(2, (0,), (1,)),
            grid=ProcessGrid.make(1, 1),
        )


def test_contraction_layouts_make_refold_free():
    rng = np.random.default_rng(0)
    la, lb, lc = contraction_layouts(
        3, (2,), (0, 1), 2, (0,), (1,)
    )
    bs_i, bs_j, bs_k, bs_l = (
        np.array([2, 2]), np.array([3]), np.array([2, 1]), np.array([4])
    )
    a = _rand(rng, [bs_i, bs_j, bs_k], mapping=la)
    b = _rand(rng, [bs_k, bs_l], mapping=lb)
    # already aligned: with_layout must be the identity object
    assert a.with_layout(la) is a
    assert b.with_layout(lb) is b
    out = contract(
        1.0, a, b,
        contract_1=(2,), notcontract_1=(0, 1),
        contract_2=(0,), notcontract_2=(1,),
    )
    ref = np.einsum("ijk,kl->ijl", a.to_dense(), b.to_dense())
    np.testing.assert_allclose(out.to_dense(), ref, atol=1e-12)


def test_split_blocks_preserves_values():
    rng = np.random.default_rng(1)
    bs0 = [np.array([4, 2]), np.array([6])]
    t = _rand(rng, bs0, occ=1.0)
    fine = [np.array([2, 2, 2]), np.array([3, 3])]
    t2 = split_blocks(t, fine)
    np.testing.assert_allclose(t2.to_dense(), t.to_dense())
    assert t2.nblk_per_dim == (3, 2)


def test_split_blocks_rejects_misaligned():
    rng = np.random.default_rng(2)
    t = _rand(rng, [np.array([2, 2]), np.array([4])], occ=1.0)
    # new offsets {0,3,4} miss the old boundary at 2 -> not a refinement
    with pytest.raises(Exception):
        split_blocks(t, [np.array([3, 1]), np.array([4])])
    # total size differs
    with pytest.raises(Exception):
        split_blocks(t, [np.array([2, 2]), np.array([5])])
