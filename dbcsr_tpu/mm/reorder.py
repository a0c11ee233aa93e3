"""Locality-aware tile reordering for the multiply planners.

The reference serves linear-scaling SCF patterns whose blocks cluster
around a (possibly hidden) 1-D locality axis; its dense-limit path
(``dbcsr_may_be_dense``/``make_dense``, ``/root/reference/src/mm/
dbcsr_mm.F:771-810``) exploits such structure only when the numbering
already exposes it. Here the TPU-native panel kernel (``mm/panel.py``)
needs *contiguous slot spans* per group of consecutive C tiles — which a
clustered-but-scrambled numbering destroys. This module recovers the
hidden axis: a reverse-Cuthill-McKee bandwidth-reduction pass over the
**bipartite union tile graph** (m-, k- and n-tile nodes; edges = A and B
tiles) renumbers all three tile dimensions so coupled tiles get nearby
ids. The permutation acts at the TILE level, is invisible to the user's
block index, and in the plan-once executor it folds into the existing
store gather maps — the only runtime cost is one slot-gather per operand
store (already present for transposed operands).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

__all__ = ["ReorderPlan", "locality_reorder_plan", "tile_bandwidth"]


@dataclass
class ReorderPlan:
    """Tile-grid renumbering shared by A, B and C.

    ``pm/pk/pn`` map old tile row/inner/col ids to new ids; the coords
    arrays are the permuted op-tile coords in NEW store-slot order, and
    ``a_gather/b_gather`` map new store slots to old ones (feed to
    ``jnp.take``)."""

    pm: np.ndarray  # int64 [Mt] old m-tile -> new m-tile
    pk: np.ndarray  # int64 [Kt]
    pn: np.ndarray  # int64 [Nt]
    a_coords: np.ndarray  # int64 [nA, 2]
    b_coords: np.ndarray  # int64 [nB, 2]
    a_gather: np.ndarray  # int32 [nA] new slot -> old slot
    b_gather: np.ndarray  # int32 [nB]

    def c_slot_keys(self, c_keys: np.ndarray, nt: int) -> np.ndarray:
        """Row-major product keys of C's tiles under the new numbering."""
        r = c_keys // nt
        c = c_keys % nt
        return self.pm[r] * np.int64(nt) + self.pn[c]


def tile_bandwidth(coords: np.ndarray) -> int:
    """Max |new_row - new_col| proxy used only for diagnostics."""
    if len(coords) == 0:
        return 0
    return int(np.abs(coords[:, 0] - coords[:, 1]).max())


def _rank_of(perm_nodes: np.ndarray, lo: int, hi: int) -> np.ndarray:
    """old-id -> new-id for the nodes in [lo, hi) given the full RCM
    node order."""
    sel = perm_nodes[(perm_nodes >= lo) & (perm_nodes < hi)] - lo
    out = np.empty(hi - lo, dtype=np.int64)
    out[sel] = np.arange(hi - lo, dtype=np.int64)
    return out


def locality_reorder_plan(
    a_coords: np.ndarray,
    a_grid: Tuple[int, int],
    b_coords: np.ndarray,
    b_grid: Tuple[int, int],
) -> Optional[ReorderPlan]:
    """RCM renumbering of the three tile dimensions of op(A)·op(B).

    Returns None for degenerate inputs (empty patterns or tiny grids
    where reordering cannot pay)."""
    mt, kt = a_grid
    kt2, nt = b_grid
    assert kt == kt2
    if len(a_coords) == 0 or len(b_coords) == 0 or mt + kt + nt < 16:
        return None

    n_nodes = mt + kt + nt
    # bipartite union graph: A couples m<->k, B couples k<->n
    rows = np.concatenate(
        [a_coords[:, 0].astype(np.int64), mt + b_coords[:, 0].astype(np.int64)]
    )
    cols = np.concatenate(
        [
            mt + a_coords[:, 1].astype(np.int64),
            mt + kt + b_coords[:, 1].astype(np.int64),
        ]
    )
    data = np.ones(len(rows), dtype=np.int8)
    g = sp.csr_matrix(
        (data, (rows, cols)), shape=(n_nodes, n_nodes)
    )
    perm_nodes = np.asarray(
        reverse_cuthill_mckee(g, symmetric_mode=False), dtype=np.int64
    )
    pm = _rank_of(perm_nodes, 0, mt)
    pk = _rank_of(perm_nodes, mt, mt + kt)
    pn = _rank_of(perm_nodes, mt + kt, n_nodes)

    def permute(coords, prow, pcol, ncol):
        newc = np.stack(
            [prow[coords[:, 0].astype(np.int64)],
             pcol[coords[:, 1].astype(np.int64)]],
            axis=1,
        )
        order = np.argsort(newc[:, 0] * np.int64(ncol) + newc[:, 1])
        return newc[order], order.astype(np.int32)

    a_new, a_gather = permute(a_coords, pm, pk, kt)
    b_new, b_gather = permute(b_coords, pk, pn, nt)
    return ReorderPlan(
        pm=pm, pk=pk, pn=pn,
        a_coords=a_new, b_coords=b_new,
        a_gather=a_gather, b_gather=b_gather,
    )
