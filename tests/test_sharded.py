"""Sharded at-rest storage: owner-partitioned stores round-trip, the
sharded executors agree with the local ones, outputs carry the owner
sharding, and iterative chains stay sharded end to end."""
import numpy as np
import pytest

import jax

import dbcsr_tpu as dt
from dbcsr_tpu.core.config import config_override
from dbcsr_tpu.dist.distribution import tile_aligned_dist
from dbcsr_tpu.dist.grid import ProcessGrid
from dbcsr_tpu.dist.sharded import (
    shard_layout,
    shard_store,
    shard_store_with_layout,
    unshard_store,
    unshard_store_with_layout,
)
from dbcsr_tpu.mm.engine import build_distributed_executor

TILE = 8


def _mats(rng, occ=0.5):
    with config_override(tile_size=TILE):
        rbs = dt.random_block_sizes(96, [2, 4], rng)
        kbs = dt.random_block_sizes(80, [4], rng)
        cbs = dt.random_block_sizes(88, [2], rng)
        a = dt.random_matrix(rbs, kbs, occ, rng, dtype=np.float32)
        b = dt.random_matrix(kbs, cbs, occ, rng, dtype=np.float32)
    return a, b


def test_shard_roundtrip(rng):
    grid = ProcessGrid.make(2, 2)
    with config_override(tile_size=TILE):
        rbs = dt.random_block_sizes(96, [2, 4], rng)
        a = dt.random_matrix(rbs, rbs, 0.5, rng, dtype=np.float32)
    dist = tile_aligned_dist(grid, a.row_block_sizes, a.col_block_sizes, TILE)
    sh = shard_store(a, dist)
    sl = shard_layout(a.index, TILE, dist)
    assert sh.shape == (4, sl.n_max, TILE, TILE)
    back = unshard_store(sh, a.index, TILE, dist)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a.data))


@pytest.mark.parametrize("p,q,algo", [(2, 2, "cannon"), (2, 4, "summa")])
def test_sharded_executor_matches_local(rng, p, q, algo):
    grid = ProcessGrid.make(p, q)
    a, b = _mats(rng)
    dist = tile_aligned_dist(grid, a.row_block_sizes, b.col_block_sizes, TILE)
    with config_override(tile_size=TILE):
        fn_l, c_index, _ = build_distributed_executor(
            "N", "N", a, b, dist, algo=algo
        )
        out_local = fn_l(a.data, b.data)
        fn_s, c_index2, _ = build_distributed_executor(
            "N", "N", a, b, dist, algo=algo, sharded=True
        )
        a_sh = shard_store_with_layout(a, fn_s.shard_a, grid.mesh)
        b_sh = shard_store_with_layout(b, fn_s.shard_b, grid.mesh)
        out_sh = jax.jit(fn_s)(a_sh, b_sh)
    assert c_index2.nblks == c_index.nblks
    back = unshard_store_with_layout(out_sh, fn_s.shard_c, TILE)
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(out_local), rtol=1e-5, atol=1e-5
    )
    # output is placed by owner over the mesh
    shards = {s.device for s in out_sh.addressable_shards}
    assert len(shards) == p * q


def test_sharded_chain_stays_sharded(rng):
    """C feeds back as A (same square pattern and bins) without ever
    unsharding — the at-rest memory-scaling loop."""
    grid = ProcessGrid.make(2, 2)
    with config_override(tile_size=TILE):
        rbs = dt.random_block_sizes(64, [4], rng)
        a = dt.random_matrix(rbs, rbs, 1.0, rng, dtype=np.float32)
        dist = tile_aligned_dist(grid, rbs, rbs, TILE)
        fn, c_index, _ = build_distributed_executor(
            "N", "N", a, a, dist, sharded=True
        )
        # dense square, symmetric bins: the chain is closed
        assert c_index.nblks == a.nblks
        assert fn.shard_a.pos_of_slot.tobytes() == fn.shard_c.pos_of_slot.tobytes()
        a_sh = shard_store_with_layout(a, fn.shard_a, grid.mesh)
        jfn = jax.jit(fn)
        x = jfn(a_sh, a_sh)         # A²
        y = jfn(x, a_sh)            # A³, consuming the sharded product
    ref = np.asarray(a.to_dense())
    ref3 = ref @ ref @ ref
    back = unshard_store_with_layout(y, fn.shard_c, TILE)
    c = dt.BCSRMatrix(name="c", index=c_index, data=back)
    np.testing.assert_allclose(
        np.asarray(c.to_dense()), ref3, rtol=1e-2, atol=1e-2 * np.abs(ref3).max()
    )


def test_sharded_loop_with_elementwise_ops(rng):
    """Elementwise math on matching sharded stores is plain array
    arithmetic (padding stays zero): a jitted sharded iteration mixing
    multiplies and scaling never leaves the sharded form."""
    import jax.numpy as jnp

    grid = ProcessGrid.make(2, 2)
    with config_override(tile_size=TILE):
        rbs = dt.random_block_sizes(64, [4], rng)
        a = dt.random_matrix(rbs, rbs, 1.0, rng, dtype=np.float32)
        dist = tile_aligned_dist(grid, rbs, rbs, TILE)
        fn, c_index, _ = build_distributed_executor(
            "N", "N", a, a, dist, sharded=True
        )
        a_sh = shard_store_with_layout(a, fn.shard_a, grid.mesh)

        @jax.jit
        def step(x):
            y = fn(x, a_sh)          # X·A, sharded
            return 0.5 * y + 0.25 * x  # elementwise on sharded stores

        x = step(a_sh)
        x = step(x)
    ref = np.asarray(a.to_dense())
    e1 = 0.5 * (ref @ ref) + 0.25 * ref
    e2 = 0.5 * (e1 @ ref) + 0.25 * e1
    back = unshard_store_with_layout(x, fn.shard_c, TILE)
    c = dt.BCSRMatrix(name="c", index=c_index, data=back)
    np.testing.assert_allclose(
        np.asarray(c.to_dense()), e2, rtol=1e-3,
        atol=1e-3 * np.abs(e2).max(),
    )


@pytest.mark.parametrize("transa,transb", [("T", "N"), ("N", "T")])
def test_sharded_executor_transposes(rng, transa, transb):
    grid = ProcessGrid.make(2, 2)
    with config_override(tile_size=TILE):
        rbs = dt.random_block_sizes(96, [2, 4], rng)
        kbs = dt.random_block_sizes(80, [4], rng)
        cbs = dt.random_block_sizes(88, [2], rng)
        a_shape = (rbs, kbs) if transa == "N" else (kbs, rbs)
        b_shape = (kbs, cbs) if transb == "N" else (cbs, kbs)
        a = dt.random_matrix(*a_shape, 0.5, rng, dtype=np.float32)
        b = dt.random_matrix(*b_shape, 0.5, rng, dtype=np.float32)
        dist = tile_aligned_dist(grid, rbs, cbs, TILE)
        fn, c_index, _ = build_distributed_executor(
            transa, transb, a, b, dist, sharded=True
        )
        a_sh = shard_store_with_layout(a, fn.shard_a, grid.mesh)
        b_sh = shard_store_with_layout(b, fn.shard_b, grid.mesh)
        out = jax.jit(fn)(a_sh, b_sh)
    da = np.asarray(a.to_dense())
    db = np.asarray(b.to_dense())
    if transa == "T":
        da = da.T
    if transb == "T":
        db = db.T
    back = unshard_store_with_layout(out, fn.shard_c, TILE)
    c = dt.BCSRMatrix(name="c", index=c_index, data=back)
    np.testing.assert_allclose(
        np.asarray(c.to_dense()), da @ db, rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("algo", ["cannon", "summa"])
def test_sharded_executor_25d_layers(rng, algo):
    """2.5D on the sharded at-rest path (round-2: layers lifted from the
    sharded executor): 2x2x2 mesh, owner-sharded stores in and out."""
    grid = ProcessGrid.make(2, 2, nlayer=2)
    p = q = 2
    with config_override(tile_size=TILE):
        rbs = dt.random_block_sizes(64, [4], rng)
        a = dt.random_matrix(rbs, rbs, 0.6, rng, dtype=np.float32)
        b = dt.random_matrix(rbs, rbs, 0.6, rng, dtype=np.float32)
        dist = tile_aligned_dist(grid, rbs, rbs, TILE)
        fn_l, c_index, _ = build_distributed_executor(
            "N", "N", a, b, dist, algo=algo
        )
        out_local = fn_l(a.data, b.data)
        fn_s, c_index2, _ = build_distributed_executor(
            "N", "N", a, b, dist, algo=algo, sharded=True
        )
        a_sh = shard_store_with_layout(a, fn_s.shard_a, grid.mesh)
        b_sh = shard_store_with_layout(b, fn_s.shard_b, grid.mesh)
        out_sh = jax.jit(fn_s)(a_sh, b_sh)
    assert c_index2.nblks == c_index.nblks
    back = unshard_store_with_layout(out_sh, fn_s.shard_c, TILE)
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(out_local), rtol=1e-5, atol=1e-5
    )
