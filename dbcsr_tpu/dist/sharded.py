"""Sharded at-rest storage: tile data partitioned across the mesh devices.

The local/replicated tile store (``block/store.py``) scales to one host's
memory. The sharded form reorders tiles by OWNER device (the distribution's
tile bins) and pads per device to the global max:

    [n_devices, n_max, T, T]  with  NamedSharding(mesh, P(('pr','pc'),))

Per-device tile lists are sorted by global (row-major) tile key — exactly
the per-device C ordering the distributed executors produce — so an
executor's sharded output IS the at-rest sharded form of its C matrix, and
iterative loops (SCF) keep every matrix sharded end to end. The host-side
block index stays replicated (it is small); only tile DATA shards.

This is the memory-scaling analog of the reference's distributed
``data_area`` residency; redistribution between at-rest ownership and the
multiply's panel images (the reference's ``make_images`` alltoall,
``src/mm/dbcsr_mm_cannon.F:146``) happens inside jit as the XLA collectives
implied by the cross-shard gathers.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

from ..block.index import BCSRIndex
from ..block.store import store_layout
from ..core.errors import dbcsr_assert
from .distribution import Distribution, dist_tile_bins
from .grid import AXIS_COL, AXIS_ROW

__all__ = [
    "ShardLayout",
    "shard_layout",
    "shard_layout_from_bins",
    "shard_store",
    "shard_store_with_layout",
    "unshard_store",
    "unshard_store_with_layout",
    "mesh_sharding",
]


@dataclass(frozen=True)
class ShardLayout:
    """Owner partition of one matrix's tile set over a (p, q) grid."""

    p: int
    q: int
    n_max: int  # padded tiles per device
    owner_of_slot: np.ndarray  # int32 [n_tiles] -> device (i*q+j)
    local_of_slot: np.ndarray  # int64 [n_tiles] -> local slot at its owner
    #: sharded position of every global slot: dev * n_max + local
    pos_of_slot: np.ndarray  # int64 [n_tiles]
    #: inverse: global slot per sharded position (-1 padding)
    slot_of_pos: np.ndarray  # int64 [p*q*n_max]
    #: O(1) fingerprint for cache keys / layout-equality checks (hash of
    #: the construction inputs — no per-call hashing of the big maps)
    token: str = ""

    @property
    def ndev(self) -> int:
        return self.p * self.q


def shard_layout_from_bins(
    index: BCSRIndex, tile: int, rowb: np.ndarray, colb: np.ndarray,
    p: int, q: int,
) -> ShardLayout:
    """Cached owner partition of ``index``'s tiles: tile (tr, tc) belongs to
    device ``rowb[tr] * q + colb[tc]`` (tiles sorted by global key within
    each owner). The bins are per-TILE maps — each matrix shards along its
    OWN dimensions (A (m,k): (row-bins, k-bins); B (k,n): (k-bins,
    col-bins); C (m,n): (row-bins, col-bins))."""
    key = (
        "shard_layout", tile, p, q,
        rowb.tobytes(), colb.tobytes(),
    )

    def mk():
        import hashlib

        token = hashlib.sha1(
            repr((tile, p, q, id(index))).encode()
            + rowb.tobytes() + colb.tobytes()
        ).hexdigest()[:16]
        lay = store_layout(index, tile)
        coords = lay.tile_coords
        owner = (rowb[coords[:, 0]] * q + colb[coords[:, 1]]).astype(np.int32)
        counts = np.bincount(owner, minlength=p * q)
        n_max = max(int(counts.max(initial=0)), 1)
        local = np.zeros(lay.n_tiles, dtype=np.int64)
        pos_in_dev = np.zeros(p * q, dtype=np.int64)
        for s in range(lay.n_tiles):  # global order = sorted keys per owner
            d = int(owner[s])
            local[s] = pos_in_dev[d]
            pos_in_dev[d] += 1
        pos = owner.astype(np.int64) * n_max + local
        inv = np.full(p * q * n_max, -1, dtype=np.int64)
        inv[pos] = np.arange(lay.n_tiles)
        return ShardLayout(
            p=p, q=q, n_max=n_max, owner_of_slot=owner,
            local_of_slot=local, pos_of_slot=pos, slot_of_pos=inv,
            token=token,
        )

    return index._cached(key, mk)


def shard_layout(
    index: BCSRIndex, tile: int, dist: Distribution
) -> ShardLayout:
    """Owner partition for a matrix whose dims match ``dist``'s (row, col)
    maps (e.g. C, or a square matrix)."""
    rowb = dist_tile_bins(
        dist.row_dist, index.row_block_sizes, tile, majority=True
    )
    colb = dist_tile_bins(
        dist.col_dist, index.col_block_sizes, tile, majority=True
    )
    return shard_layout_from_bins(
        index, tile, rowb, colb, dist.grid.nprow, dist.grid.npcol
    )


def mesh_sharding(mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec((AXIS_ROW, AXIS_COL)))


def put_global(arr, sharding: NamedSharding) -> jax.Array:
    """Place a (process-locally materialized, identical-everywhere) array
    onto a mesh that may span processes: plain ``device_put`` on a
    single-controller mesh; per-shard ``make_array_from_callback`` when the
    mesh contains non-addressable devices (multi-process ``jax.distributed``
    runs — each process materializes only its addressable shards)."""
    mesh_devs = sharding.mesh.devices.flat
    if all(d.process_index == jax.process_index() for d in mesh_devs):
        return jax.device_put(arr, sharding)
    arrnp = np.asarray(arr)
    return jax.make_array_from_callback(
        arrnp.shape, sharding, lambda idx: arrnp[idx]
    )


def shard_store_with_layout(m, sl: ShardLayout, mesh) -> jax.Array:
    """Local store -> owner-sharded array [ndev, n_max, T, T] placed on the
    mesh. (Single-controller: built locally then laid out; on multi-process
    meshes each process materializes only its addressable shards.)"""
    t = m.tile
    if m.data.shape[0] == 0:  # empty matrix: all positions are padding
        arr = jnp.zeros((sl.ndev, sl.n_max, t, t), dtype=m.data.dtype)
        return put_global(arr, mesh_sharding(mesh))
    take = np.where(
        sl.slot_of_pos >= 0, sl.slot_of_pos, np.iinfo(np.int32).max
    ).astype(np.int32)
    arr = jnp.take(m.data, jnp.asarray(take), axis=0, mode="fill", fill_value=0)
    arr = arr.reshape(sl.ndev, sl.n_max, t, t)
    return put_global(arr, mesh_sharding(mesh))


def shard_store(m, dist: Distribution) -> jax.Array:
    return shard_store_with_layout(
        m, shard_layout(m.index, m.tile, dist), dist.grid.mesh
    )


def unshard_store_with_layout(
    arr: jax.Array, sl: ShardLayout, tile: int
) -> jax.Array:
    """Sharded array -> local store [n_tiles, T, T] (a global gather)."""
    dbcsr_assert(
        arr.shape[:2] == (sl.ndev, sl.n_max), "shard layout mismatch"
    )
    flat = arr.reshape(sl.ndev * sl.n_max, tile, tile)
    return jnp.take(flat, jnp.asarray(sl.pos_of_slot.astype(np.int32)), axis=0)


def unshard_store(arr: jax.Array, index: BCSRIndex, tile: int,
                  dist: Distribution) -> jax.Array:
    return unshard_store_with_layout(
        arr, shard_layout(index, tile, dist), tile
    )