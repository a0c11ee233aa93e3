"""Mesh-parallel TAS group execution (the EP-like axis of SURVEY §2.9)."""
import numpy as np
import pytest

import dbcsr_tpu as dt
from dbcsr_tpu.core.config import config_override
from dbcsr_tpu.tas import tas_multiply_parallel

TILE = 8


def _mats(rng, m=200, k=20, n=24, occ=0.4):
    with config_override(tile_size=TILE):
        mbs = dt.random_block_sizes(m, [2, 3], rng)
        kbs = dt.random_block_sizes(k, [2], rng)
        nbs = dt.random_block_sizes(n, [3], rng)
        a = dt.random_matrix(mbs, kbs, occ, rng, dtype=np.float64)
        b = dt.random_matrix(kbs, nbs, 0.7, rng, dtype=np.float64)
    return a, b


@pytest.mark.parametrize("nsplit", [1, 2, 4, 8])
def test_parallel_groups_match_oracle(rng, nsplit):
    a, b = _mats(rng)
    with config_override(tile_size=TILE):
        out, fl = tas_multiply_parallel(a, b, nsplit=nsplit, return_flops=True)
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    np.testing.assert_allclose(
        np.asarray(out.to_dense()), ref, rtol=1e-10, atol=1e-10
    )
    assert fl > 0


def test_parallel_matches_sequential_tas(rng):
    from dbcsr_tpu.tas import tas_multiply

    a, b = _mats(rng, occ=0.3)
    with config_override(tile_size=TILE):
        par = tas_multiply_parallel(a, b, nsplit=4)
        seq = tas_multiply("N", "N", 1.0, a, b, nsplit=4).matrix
    np.testing.assert_allclose(
        np.asarray(par.to_dense()), np.asarray(seq.to_dense()), atol=1e-10
    )


def test_parallel_cyclic_split(rng):
    a, b = _mats(rng, m=80)
    with config_override(tile_size=TILE):
        out = tas_multiply_parallel(a, b, nsplit=3, split_kind="cyclic")
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    np.testing.assert_allclose(np.asarray(out.to_dense()), ref, atol=1e-10)


@pytest.mark.parametrize("nsplit", [2, 4])
def test_parallel_n_split(rng, nsplit):
    """Tall-N orientation: B's columns split, A replicated."""
    a, b = _mats(rng, m=20, k=24, n=200, occ=0.7)
    with config_override(tile_size=TILE):
        out, fl = tas_multiply_parallel(
            a, b, long_dim="n", nsplit=nsplit, return_flops=True
        )
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    np.testing.assert_allclose(np.asarray(out.to_dense()), ref, atol=1e-10)
    assert fl > 0


@pytest.mark.parametrize("nsplit,split_kind", [(2, "contiguous"),
                                               (4, "cyclic")])
def test_parallel_k_split(rng, nsplit, split_kind):
    """Deep-K orientation: contraction dim split, partial C psum'd."""
    a, b = _mats(rng, m=24, k=200, n=20, occ=0.4)
    with config_override(tile_size=TILE):
        out = tas_multiply_parallel(
            a, b, long_dim="k", nsplit=nsplit, split_kind=split_kind
        )
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    np.testing.assert_allclose(np.asarray(out.to_dense()), ref, atol=1e-10)


def test_parallel_auto_picks_long_dim(rng):
    """auto = the reference's max_mm_dim: splits whichever dim is largest."""
    a, b = _mats(rng, m=20, k=200, n=24, occ=0.4)  # k largest
    with config_override(tile_size=TILE):
        out = tas_multiply_parallel(a, b, long_dim="auto", nsplit=4)
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    np.testing.assert_allclose(np.asarray(out.to_dense()), ref, atol=1e-10)


@pytest.mark.parametrize("long_dim,nsplit,p,q", [
    ("m", 2, 2, 2),   # 2 groups x 2x2 sub-grid = 8 devices
    ("n", 2, 2, 2),
    ("m", 4, 1, 2),   # 4 groups x 1x2
])
def test_subgrid_groups(rng, long_dim, nsplit, p, q):
    """Each TAS group runs SUMMA on its own 2-D sub-mesh."""
    from dbcsr_tpu.tas import tas_multiply_subgrid

    if long_dim == "m":
        a, b = _mats(rng, m=160, k=24, n=20, occ=0.4)
    else:
        a, b = _mats(rng, m=20, k=24, n=160, occ=0.4)
    with config_override(tile_size=TILE):
        out, fl = tas_multiply_subgrid(
            a, b, long_dim=long_dim, nsplit=nsplit, subgrid=(p, q),
            return_flops=True,
        )
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    np.testing.assert_allclose(np.asarray(out.to_dense()), ref, atol=1e-10)
    assert fl > 0


def test_subgrid_matches_flat_parallel(rng):
    from dbcsr_tpu.tas import tas_multiply_subgrid

    a, b = _mats(rng, m=120, k=20, n=24, occ=0.3)
    with config_override(tile_size=TILE):
        sub = tas_multiply_subgrid(a, b, nsplit=2, subgrid=(2, 2))
        flat = tas_multiply_parallel(a, b, nsplit=2)
    np.testing.assert_allclose(
        np.asarray(sub.to_dense()), np.asarray(flat.to_dense()), atol=1e-10
    )


def test_parallel_k_split_matches_sequential(rng):
    from dbcsr_tpu.tas import tas_multiply

    a, b = _mats(rng, m=24, k=160, n=20, occ=0.3)
    with config_override(tile_size=TILE):
        par = tas_multiply_parallel(a, b, long_dim="k", nsplit=4)
        seq = tas_multiply("N", "N", 1.0, a, b, nsplit=4).matrix
    np.testing.assert_allclose(
        np.asarray(par.to_dense()), np.asarray(seq.to_dense()), atol=1e-10
    )
