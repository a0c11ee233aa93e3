"""Structural transformations: transpose, desymmetrize, copy, redistribute.

Analog of ``src/ops/dbcsr_transformations.F:101-150`` (``dbcsr_new_transposed``,
``dbcsr_desymmetrize_deep``, ``dbcsr_complete_redistribute``). Every
transformation is a host-side index rebuild plus one device gather through a
host-built map (see ``block/gather.py``).
"""
from __future__ import annotations

from dataclasses import replace
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..block.bcsr import (
    BCSRMatrix,
    SYM_ANTISYMMETRIC,
    SYM_HERMITIAN,
    SYM_NONE,
    SYM_SYMMETRIC,
)
from ..block.gather import block_permutation_gather
from ..block.index import BCSRIndex, build_index
from ..core.errors import dbcsr_assert
from ..core.timing import timed

__all__ = [
    "transpose",
    "desymmetrize",
    "copy",
    "redistribute",
    "replicate_all",
    "distribute",
    "sum_replicated",
    "complete_redistribute",
    "make_dense",
    "make_undense",
    "may_be_dense",
]


def transpose(m: BCSRMatrix, *, conjugate: bool = False) -> BCSRMatrix:
    """Deep transpose (``dbcsr_new_transposed``). Symmetric inputs are
    expanded first; the result has symmetry 'N'."""
    if m.sym != SYM_NONE:
        m = desymmetrize(m)
    with timed("transpose"):
        new_index, perm = m.index.transposed()
        gmap = block_permutation_gather(
            new_index, m.index, perm,
            transpose_src=np.ones(new_index.nblks, dtype=bool),
        )
        data = jnp.take(m.data, jnp.asarray(gmap.astype(np.int32)))
        if conjugate and jnp.iscomplexobj(m.data):
            data = jnp.conj(data)
        return BCSRMatrix(
            name=m.name + "^T", index=new_index, data=data, sym=SYM_NONE,
            dist=None if m.dist is None else m.dist.transposed(),
        )


def desymmetrize(m: BCSRMatrix) -> BCSRMatrix:
    """Expand a symmetric/antisymmetric/hermitian matrix into full 'N'
    storage (``dbcsr_desymmetrize_deep``). The reference does this inside
    ``make_images`` before every multiply; we do the same in the engine."""
    if m.sym == SYM_NONE:
        return m
    with timed("desymmetrize"):
        rows_u = m.index.blk_rows
        cols_u = m.index.col_idx
        off_diag = rows_u != cols_u
        # upper blocks keep their place; mirrored copies go to (j, i)
        new_rows = np.concatenate([rows_u, cols_u[off_diag]])
        new_cols = np.concatenate([cols_u, rows_u[off_diag]])
        src_blks = np.concatenate(
            [
                np.arange(m.nblks, dtype=np.int64),
                np.flatnonzero(off_diag).astype(np.int64),
            ]
        )
        mirrored = np.concatenate(
            [np.zeros(m.nblks, dtype=bool), np.ones(int(off_diag.sum()), dtype=bool)]
        )
        new_index, order = build_index(
            new_rows, new_cols, m.index.row_block_sizes, m.index.col_block_sizes
        )
        src_of_new = src_blks[order]
        mirrored = mirrored[order]
        gmap = block_permutation_gather(
            new_index, m.index, src_of_new, transpose_src=mirrored
        )
        data = jnp.take(m.data, jnp.asarray(gmap.astype(np.int32)))
        if m.sym in (SYM_ANTISYMMETRIC, SYM_HERMITIAN):
            elem_mirrored = jnp.asarray(mirrored[new_index.elem_to_blk])
            if m.sym == SYM_ANTISYMMETRIC:
                data = jnp.where(elem_mirrored, -data, data)
            else:
                data = jnp.where(elem_mirrored, jnp.conj(data), data)
        return BCSRMatrix(
            name=m.name, index=new_index, data=data, sym=SYM_NONE, dist=m.dist
        )


def copy(m: BCSRMatrix, *, name: Optional[str] = None) -> BCSRMatrix:
    return replace(m, name=name or m.name)


def redistribute(m: BCSRMatrix, dist) -> BCSRMatrix:
    """Attach a new distribution (``dbcsr_redistribute``). Data movement is
    implicit: the engine packs per-device panels from the distribution maps,
    so changing distribution is metadata-only here."""
    dbcsr_assert(
        dist is None or dist.compatible_with(m.index),
        "distribution incompatible with block structure",
    )
    return replace(m, dist=dist)


def complete_redistribute(m: BCSRMatrix, dist) -> BCSRMatrix:
    """Arbitrary dist→dist move (``dbcsr_complete_redistribute``,
    ``src/ops/dbcsr_transformations.F:101``). In the TPU data model the flat
    buffer is layout-independent (per-device panels are packed from the
    distribution maps at multiply time), so this is :func:`redistribute`;
    kept as a separate name for API parity with the reference."""
    return redistribute(m, dist)


def replicate_all(m: BCSRMatrix) -> BCSRMatrix:
    """Full replication (``dbcsr_replicate_all``,
    ``src/ops/dbcsr_transformations.F:106``): every process holds the whole
    matrix. TPU-native form: drop the distribution → the engine treats the
    buffer as replicated (on a multi-host mesh this is the ``all_gather`` of
    the block panels, which packing performs implicitly)."""
    return replace(m, dist=None)


def distribute(m: BCSRMatrix, dist) -> BCSRMatrix:
    """Replicated → distributed (``dbcsr_distribute``): the inverse of
    :func:`replicate_all`; attaches ``dist`` so subsequent multiplies run
    the Cannon path over its mesh."""
    return redistribute(m, dist)


def may_be_dense(m: BCSRMatrix, threshold: float = 0.5) -> bool:
    """Occupancy heuristic for the dense fast path (``dbcsr_may_be_dense``,
    ``src/ops/dbcsr_operations.F``)."""
    return m.occupation() >= threshold


def make_dense(m: BCSRMatrix) -> BCSRMatrix:
    """Sparse-blocked → dense-blocked: one block holding the full matrix
    (``dbcsr_make_dense``, ``src/ops/dbcsr_transformations.F:107`` — the
    reference densifies per distribution bin to hit its dense fast path;
    the engine's dense driver packs panels anyway, so the API-level form
    densifies to a single block)."""
    if m.sym != SYM_NONE:
        m = desymmetrize(m)
    with timed("make_dense"):
        dense = m.to_dense()
        idx, _ = build_index(
            np.array([0]), np.array([0]),
            np.array([m.index.nfullrows], dtype=np.int32),
            np.array([m.index.nfullcols], dtype=np.int32),
        )
        return BCSRMatrix(
            name=m.name, index=idx, data=dense.reshape(-1), sym=SYM_NONE,
            dist=None,
        )


def make_undense(
    m: BCSRMatrix,
    row_block_sizes,
    col_block_sizes,
    *,
    tol: float = 0.0,
    keep_zero_blocks: bool = False,
) -> BCSRMatrix:
    """Dense-blocked → sparse-blocked re-blocking (``dbcsr_make_undense``):
    blocks with Frobenius norm <= ``tol`` are dropped unless
    ``keep_zero_blocks``."""
    with timed("make_undense"):
        return BCSRMatrix.from_dense(
            np.asarray(m.to_dense()),
            row_block_sizes,
            col_block_sizes,
            name=m.name,
            tol=tol,
            keep_zero_blocks=keep_zero_blocks,
            dist=m.dist,
        )


def sum_replicated(copies) -> BCSRMatrix:
    """Element-sum independently updated replicas
    (``dbcsr_sum_replicated``, ``src/ops/dbcsr_operations.F:118`` — the
    reference's ``psum`` over replica contributions). Index patterns may
    differ; the result is the merged pattern."""
    from .arithmetic import add

    copies = list(copies)
    dbcsr_assert(len(copies) > 0, "sum_replicated needs at least one matrix")
    out = copies[0]
    for nxt in copies[1:]:
        out = add(1.0, out, 1.0, nxt)
    return out
