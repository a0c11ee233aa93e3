"""Tile-level stack planning for the sparse multiply path.

Replaces the reference's multrec + csr stack-builder
(``src/mm/dbcsr_mm_multrec.F``, ``dbcsr_mm_csr.F:178-360``): instead of a
recursive traversal with per-row hash tables at user-block granularity, the
planner enumerates (c_tile, a_tile, b_tile) triples over the T×T hardware
tile grids with vectorized numpy, sorts them by output tile (deterministic
accumulation) and emits static int32 stack arrays for the kernels in
``kernels.py``.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

from ..block.index import BCSRIndex
from .pack import tile_panel_maps

__all__ = [
    "TileStackPlan",
    "enumerate_tile_triples",
    "plan_tile_stacks",
    "tile_gather_map",
]


@dataclass
class TileStackPlan:
    """Static description of one tile-sparse multiply."""

    stack: np.ndarray  # int32 [S, 3] (c_slot, a_slot, b_slot), sorted by c
    a_dest: np.ndarray  # int32 [a nelems] scatter map into a tile store
    b_dest: np.ndarray  # int32 [b nelems]
    n_a_tiles: int
    n_b_tiles: int
    n_c_tiles: int
    c_tile_coords: np.ndarray  # int32 [n_c_tiles, 2] (trow, tcol)
    tile_grid: Tuple[int, int, int]  # (Mt, Kt, Nt)


def _tile_csr(coords: np.ndarray, shape: Tuple[int, int]) -> sp.csr_matrix:
    """CSR over the tile grid with values = slot + 1."""
    n = len(coords)
    return sp.csr_matrix(
        (
            np.arange(1, n + 1, dtype=np.int64),
            (coords[:, 0].astype(np.int64), coords[:, 1].astype(np.int64)),
        ),
        shape=shape,
    )


def enumerate_tile_triples(
    amat: sp.spmatrix, bmat: sp.spmatrix
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """All (c_row, c_col, a_slot, b_slot) triples of two tile patterns
    (values = slot + 1). Fully vectorized: for each tile-column k of A and
    tile-row k of B, the cartesian product of their nonzero tiles
    contributes triples — built with repeat/arange arithmetic, no Python
    loop over k."""
    amat = amat.tocsc()
    bmat = bmat.tocsr()
    na_k = np.diff(amat.indptr).astype(np.int64)  # A tiles in tile-col k
    nb_k = np.diff(bmat.indptr).astype(np.int64)  # B tiles in tile-row k
    counts = na_k * nb_k
    total = int(counts.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z
    kt = len(na_k)
    k_of_t = np.repeat(np.arange(kt, dtype=np.int64), counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    t_local = np.arange(total, dtype=np.int64) - starts[k_of_t]
    nb = nb_k[k_of_t]
    a_pos = amat.indptr[k_of_t] + t_local // nb
    b_pos = bmat.indptr[k_of_t] + t_local % nb
    a_slot = (amat.data[a_pos] - 1).astype(np.int64)
    b_slot = (bmat.data[b_pos] - 1).astype(np.int64)
    c_row = amat.indices[a_pos].astype(np.int64)
    c_col = bmat.indices[b_pos].astype(np.int64)
    return c_row, c_col, a_slot, b_slot


def plan_tile_stacks(
    a_index: BCSRIndex,
    ta: bool,
    b_index: BCSRIndex,
    tb: bool,
    tile: int,
) -> TileStackPlan:
    """Enumerate all tile triples of op(A)·op(B) for the local engine."""
    a_dest, a_coords, (mt, kt) = tile_panel_maps(a_index, tile, ta)
    b_dest, b_coords, (kt2, nt) = tile_panel_maps(b_index, tile, tb)
    assert kt == kt2, "tile grid K mismatch"

    amat = _tile_csr(a_coords, (mt, kt))
    bmat = _tile_csr(b_coords, (kt, nt))

    # native (C++) fused enumerate+sort+slot-assign path (the analog of the
    # reference's compiled stack builder, see native/stackbuild.cpp)
    from ..core.config import get_config

    if get_config().use_native_planner:
        from ..native import stack_build

        acsc = amat.tocsc()
        bcsr_ = bmat.tocsr()
        nat = stack_build(
            kt, nt,
            acsc.indptr.astype(np.int64), acsc.indices.astype(np.int64),
            (acsc.data - 1).astype(np.int64),
            bcsr_.indptr.astype(np.int64), bcsr_.indices.astype(np.int64),
            (bcsr_.data - 1).astype(np.int64),
        )
        if nat is not None:
            stack, c_keys = nat
            c_tile_coords = np.stack(
                [(c_keys // nt).astype(np.int32), (c_keys % nt).astype(np.int32)],
                axis=1,
            )
            return TileStackPlan(
                stack=stack,
                a_dest=a_dest,
                b_dest=b_dest,
                n_a_tiles=len(a_coords),
                n_b_tiles=len(b_coords),
                n_c_tiles=len(c_tile_coords),
                c_tile_coords=c_tile_coords,
                tile_grid=(mt, kt, nt),
            )

    c_row, c_col, a_slot, b_slot = enumerate_tile_triples(amat, bmat)

    if len(c_row) == 0:
        return TileStackPlan(
            stack=np.zeros((0, 3), dtype=np.int32),
            a_dest=a_dest,
            b_dest=b_dest,
            n_a_tiles=len(a_coords),
            n_b_tiles=len(b_coords),
            n_c_tiles=0,
            c_tile_coords=np.zeros((0, 2), dtype=np.int32),
            tile_grid=(mt, kt, nt),
        )

    # C tile slots: unique (c_row, c_col)
    c_key = c_row * nt + c_col
    uniq, c_slot = np.unique(c_key, return_inverse=True)
    c_tile_coords = np.stack(
        [(uniq // nt).astype(np.int32), (uniq % nt).astype(np.int32)], axis=1
    )

    order = np.argsort(c_slot, kind="stable")
    stack = np.stack(
        [c_slot[order], a_slot[order], b_slot[order]], axis=1
    ).astype(np.int32)
    return TileStackPlan(
        stack=stack,
        a_dest=a_dest,
        b_dest=b_dest,
        n_a_tiles=len(a_coords),
        n_b_tiles=len(b_coords),
        n_c_tiles=len(c_tile_coords),
        c_tile_coords=c_tile_coords,
        tile_grid=(mt, kt, nt),
    )


def tile_gather_map(
    c_index: BCSRIndex, c_tile_coords: np.ndarray, tile: int, nt_cols: int
) -> np.ndarray:
    """Gather positions of C's elements inside the product tile store
    ``[n_c_tiles, T, T]`` (flattened); elements in tiles the product never
    touched get an out-of-range index (gathered as 0)."""
    from .pack import elem_coords

    n_c = len(c_tile_coords)
    rows, cols = elem_coords(c_index)
    trow = rows // tile
    tcol = cols // tile
    key = trow * nt_cols + tcol
    tile_keys = (
        c_tile_coords[:, 0].astype(np.int64) * nt_cols
        + c_tile_coords[:, 1].astype(np.int64)
    )
    # tile_keys are sorted (np.unique); map each element's tile to its slot
    pos = np.searchsorted(tile_keys, key)
    pos_clip = np.minimum(pos, max(n_c - 1, 0))
    present = (
        (tile_keys[pos_clip] == key) if n_c > 0 else np.zeros(len(key), dtype=bool)
    )
    slot = np.where(present, pos_clip, n_c)  # n_c → OOB slot
    out = (
        slot.astype(np.int64) * (tile * tile)
        + (rows - trow * tile) * tile
        + (cols - tcol * tile)
    )
    if out.size and int(out.max()) >= np.iinfo(np.int32).max:
        raise OverflowError("tile store too large for int32 gather map")
    return out.astype(np.int32)
