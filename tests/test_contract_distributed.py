"""Distributed tensor contraction: contract → TAS → Cannon/SUMMA over the
mesh (the full vertical stack, folded dims distributed)."""
import numpy as np
import pytest

import dbcsr_tpu as dt
from dbcsr_tpu.core.config import config_override
from dbcsr_tpu.dist.distribution import tile_aligned_dist
from dbcsr_tpu.dist.grid import ProcessGrid
from dbcsr_tpu.tensors import NDMapping, TensorBuilder, contract

TILE = 8


def _tensors(rng):
    bs_i = np.asarray([4] * 24, np.int32)
    bs_j = np.asarray([4] * 4, np.int32)
    bs_k = np.asarray([4] * 20, np.int32)
    bs_l = np.asarray([4] * 16, np.int32)
    tb = TensorBuilder(
        [bs_i, bs_j, bs_k], NDMapping(3, (0, 1), (2,)), dtype=np.float64
    )
    for bi in np.ndindex(24, 4, 20):
        if rng.random() < 0.2:
            tb.put_block(bi, rng.standard_normal((4, 4, 4)))
    mb = TensorBuilder([bs_k, bs_l], dtype=np.float64)
    for bi in np.ndindex(20, 16):
        if rng.random() < 0.5:
            mb.put_block(bi, rng.standard_normal((4, 4)))
    return tb.finalize(), mb.finalize(), bs_l


@pytest.mark.parametrize("p,q", [(2, 2), (2, 4)])
def test_contract_over_mesh(rng, p, q):
    grid = ProcessGrid.make(p, q)
    with config_override(tile_size=TILE):
        t, m, bs_l = _tensors(rng)
        folded_rows = t.matrix.index.row_block_sizes
        dist = tile_aligned_dist(grid, folded_rows, bs_l, TILE)
        out = contract(
            1.0, t, m,
            contract_1=(2,), notcontract_1=(0, 1),
            contract_2=(0,), notcontract_2=(1,),
            dist=dist, nsplit=1,
        )
    ref = np.einsum("ijk,kl->ijl", t.to_dense(), m.to_dense())
    np.testing.assert_allclose(out.to_dense(), ref, atol=1e-12)
