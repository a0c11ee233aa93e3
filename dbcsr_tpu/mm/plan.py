"""Host-side symbolic multiply planning.

TPU-native replacement for the reference's hash-table stack builder
(``dbcsr_mm_csr_multiply_low``, ``src/mm/dbcsr_mm_csr.F:178-360``) and the
multrec decomposition: instead of discovering C blocks block-by-block at run
time, the whole symbolic product C-pattern, the epsilon filtering decision
and the effective flop count are computed up front with vectorized sparse
matrix algebra (scipy CSR on block patterns). The device then executes a
fully static gather → GEMM → scatter program.

Filtering semantics follow the reference: with ``filter_eps`` given, the
per-row threshold is ``(eps / row_nk)²`` on the product of *squared*
single-precision block norms (``src/mm/dbcsr_mm_cannon.F:1042-1113``), and
the final result is pruned to blocks with Frobenius norm >= eps
(``multrec_filtering``, ``src/mm/dbcsr_mm_multrec.F:390``).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import scipy.sparse as sp

from ..block.index import BCSRIndex

__all__ = ["SymbolicProduct", "symbolic_product", "mnk_statistics"]


@dataclass
class SymbolicProduct:
    """Result pattern + accounting for C = op(A)·op(B)."""

    rows: np.ndarray  # int32 block rows of product C-blocks
    cols: np.ndarray  # int32 block cols
    eff_flops: float  # 2*sum(m*n*k) over contributing triples
    nnz_triples: int


def _weighted_pattern(
    index: BCSRIndex, transpose: bool, values: Optional[np.ndarray]
) -> sp.csr_matrix:
    vals = (
        np.ones(index.nblks, dtype=np.float64)
        if values is None
        else np.asarray(values, dtype=np.float64)
    )
    mat = sp.csr_matrix(
        (vals, index.col_idx.astype(np.int64), index.row_ptr.astype(np.int64)),
        shape=(index.nblkrows, index.nblkcols),
    )
    return (mat.T.tocsr() if transpose else mat)


def symbolic_product(
    a_index: BCSRIndex,
    transa: bool,
    b_index: BCSRIndex,
    transb: bool,
    *,
    a_norms_sq: Optional[np.ndarray] = None,
    b_norms_sq: Optional[np.ndarray] = None,
    filter_eps: Optional[float] = None,
    per_row_eps: bool = True,
) -> SymbolicProduct:
    """Compute the block pattern of op(A)·op(B) with optional filtering.

    With filtering, a C block survives when the *sum* of its contributions'
    norm products clears the threshold — a slight superset of the
    reference's "any single triple clears it" rule; the difference is blocks
    below eps which the mandatory post-multiply norm filter removes anyway.
    """
    pa = _weighted_pattern(a_index, transa, None)
    pb = _weighted_pattern(b_index, transb, None)

    # effective flop accounting: flops(i,j) = 2 * m_i * n_j * sum_k ksize
    m_sizes = (a_index.col_block_sizes if transa else a_index.row_block_sizes)
    k_sizes = (a_index.row_block_sizes if transa else a_index.col_block_sizes)
    n_sizes = (b_index.row_block_sizes if transb else b_index.col_block_sizes)
    ak = pa.multiply(k_sizes.astype(np.float64)[None, :]).tocsr()
    ksum = ak @ pb  # (i,j) -> sum over contributing k of ksize
    ntrip = pa.astype(np.float64) @ pb.astype(np.float64)

    if filter_eps is not None and a_norms_sq is not None and b_norms_sq is not None:
        na = _weighted_pattern(a_index, transa, np.maximum(a_norms_sq, 0.0))
        nb = _weighted_pattern(b_index, transb, np.maximum(b_norms_sq, 0.0))
        prod = (na @ nb).tocsr()
        if per_row_eps:
            # row k-count: number of potential contributions per C row,
            # reference uses the global row block count (dbcsr_mm_cannon.F:1045)
            row_nk = np.maximum(np.diff(pa.indptr), 1).astype(np.float64)
            thr = (filter_eps / row_nk) ** 2
            scale = sp.diags(1.0 / thr)
            survived = (scale @ prod).tocsr()
            survived.data = (survived.data >= 1.0).astype(np.float64)
            survived.eliminate_zeros()
        else:
            survived = prod.tocsr()
            survived.data = (survived.data >= filter_eps**2).astype(np.float64)
            survived.eliminate_zeros()
        keep = survived
    else:
        keep = ntrip.tocsr()

    keep = keep.tocsr()
    keep.sort_indices()
    coo = keep.tocoo()
    rows = coo.row.astype(np.int32)
    cols = coo.col.astype(np.int32)
    # flops restricted to surviving C blocks
    ksel = np.asarray(ksum.tocsr()[rows, cols]).ravel() if len(rows) else np.zeros(0)
    eff = float(
        2.0
        * np.sum(
            m_sizes.astype(np.float64)[rows]
            * n_sizes.astype(np.float64)[cols]
            * ksel
        )
    )
    tsel = np.asarray(ntrip.tocsr()[rows, cols]).ravel() if len(rows) else np.zeros(0)
    return SymbolicProduct(
        rows=rows, cols=cols, eff_flops=eff, nnz_triples=int(tsel.sum())
    )


def mnk_statistics(
    a_index: BCSRIndex,
    transa: bool,
    b_index: BCSRIndex,
    transb: bool,
    rows: np.ndarray,
    cols: np.ndarray,
    *,
    max_classes: int = 8,
) -> dict:
    """Per-(m,n,k) block-triple counts of the product restricted to the
    surviving C blocks — the reference's multiplication statistics
    (``src/mm/dbcsr_mm_sched.F:392-663``, STATISTICS report
    ``dbcsr_mm.F:214-305``). Computed with one pattern product per distinct
    k block size (skipped when any dimension has more than ``max_classes``
    distinct sizes — the table would be unreadable anyway)."""
    m_sizes = (a_index.col_block_sizes if transa else a_index.row_block_sizes)
    k_sizes = (a_index.row_block_sizes if transa else a_index.col_block_sizes)
    n_sizes = (b_index.row_block_sizes if transb else b_index.col_block_sizes)
    ku = np.unique(k_sizes)
    if (
        len(ku) > max_classes
        or len(np.unique(m_sizes)) > max_classes
        or len(np.unique(n_sizes)) > max_classes
        or len(rows) == 0
    ):
        return {}
    pa = _weighted_pattern(a_index, transa, None)
    pb = _weighted_pattern(b_index, transb, None)
    out: dict = {}
    mn_key = (
        m_sizes.astype(np.int64)[rows] << 32
    ) | n_sizes.astype(np.int64)[cols]
    for ks in ku:
        sel = np.flatnonzero(k_sizes == ks)
        cnt = (pa[:, sel] @ pb[sel, :]).tocsr()
        per_c = np.asarray(cnt[rows, cols]).ravel()
        nz = per_c > 0
        if not nz.any():
            continue
        # aggregate triple counts per (m, n) class for this k size
        uk, inv = np.unique(mn_key[nz], return_inverse=True)
        sums = np.bincount(inv, weights=per_c[nz])
        for key, s in zip(uk, sums):
            m = int(key >> 32)
            n = int(key & 0xFFFFFFFF)
            out[(m, n, int(ks))] = out.get((m, n, int(ks)), 0) + int(s)
    return out
