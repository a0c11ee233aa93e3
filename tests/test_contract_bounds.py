"""Contraction bounds on non-contracted dims (the reference's bounds_2/3):
window products batched over output ranges must tile the full result.
"""
import numpy as np
import pytest

import dbcsr_tpu as dt
from dbcsr_tpu.tensors import TensorBuilder, contract


def _rand(rng, block_sizes, occ=0.9):
    bs = [np.asarray(b, dtype=np.int32) for b in block_sizes]
    builder = TensorBuilder(bs, dtype=np.float64)
    nbpd = [len(b) for b in bs]
    for flat in np.flatnonzero(rng.random(int(np.prod(nbpd))) < occ):
        bi = np.unravel_index(flat, nbpd)
        shp = tuple(int(bs[d][bi[d]]) for d in range(len(bs)))
        builder.put_block(bi, rng.standard_normal(shp))
    return builder.finalize()


def test_bounds_nc_windows_tile_the_result():
    rng = np.random.default_rng(0)
    bs_i = np.array([2, 3, 2, 3])
    bs_k = np.array([2, 2])
    bs_j = np.array([3, 3, 2])
    a = _rand(rng, [bs_i, bs_k])
    b = _rand(rng, [bs_k, bs_j])
    full = contract(
        1.0, a, b,
        contract_1=(1,), notcontract_1=(0,),
        contract_2=(0,), notcontract_2=(1,),
    ).to_dense()
    ioff = np.concatenate([[0], np.cumsum(bs_i)])
    acc = np.zeros_like(full)
    for b0, b1 in [(0, 2), (2, 4)]:
        w = contract(
            1.0, a, b,
            contract_1=(1,), notcontract_1=(0,),
            contract_2=(0,), notcontract_2=(1,),
            bounds={"nc1": {0: (int(ioff[b0]), int(ioff[b1]))}},
        )
        acc = acc + w.to_dense()
    np.testing.assert_allclose(acc, full, atol=1e-12)


def test_bounds_nc2_and_beta_accumulate():
    rng = np.random.default_rng(1)
    bs_i = np.array([2, 2])
    bs_k = np.array([3, 2])
    bs_j = np.array([2, 3, 2])
    a = _rand(rng, [bs_i, bs_k])
    b = _rand(rng, [bs_k, bs_j])
    c0 = _rand(rng, [bs_i, bs_j], occ=0.7)
    joff = np.concatenate([[0], np.cumsum(bs_j)])
    out = contract(
        2.0, a, b, beta=0.5, c=c0,
        contract_1=(1,), notcontract_1=(0,),
        contract_2=(0,), notcontract_2=(1,),
        bounds={"nc2": {1: (int(joff[0]), int(joff[2]))}},
    )
    da, db, dc = a.to_dense(), b.to_dense(), c0.to_dense()
    window = np.zeros((da.shape[0], db.shape[1]))
    window[:, : joff[2]] = 2.0 * (da @ db)[:, : joff[2]]
    ref = window + 0.5 * dc
    np.testing.assert_allclose(out.to_dense(), ref, atol=1e-12)


def test_bounds_combined_contract_and_nc():
    rng = np.random.default_rng(2)
    bs = np.array([2, 2, 2])
    a = _rand(rng, [bs, bs])
    b = _rand(rng, [bs, bs])
    koff = np.concatenate([[0], np.cumsum(bs)])
    out = contract(
        1.0, a, b,
        contract_1=(1,), notcontract_1=(0,),
        contract_2=(0,), notcontract_2=(1,),
        bounds={
            "contract": {1: (0, int(koff[2]))},
            "nc1": {0: (int(koff[1]), int(koff[3]))},
        },
    )
    da, db = a.to_dense(), b.to_dense()
    ref = np.zeros_like(da @ db)
    ref[koff[1]:, :] = da[koff[1]:, : koff[2]] @ db[: koff[2], :]
    np.testing.assert_allclose(out.to_dense(), ref, atol=1e-12)
