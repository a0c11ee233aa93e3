"""Elementwise operations and reductions on BCSR matrices.

Analog of ``src/ops/dbcsr_operations.F:109-125``: add (index-merge), scale,
scale-by-vector, set/zero, trace, dot, hadamard product, epsilon filtering,
elementwise function application, triu, diagonal access. All data math runs
on device over the flat buffer; index work stays on host.
"""
from __future__ import annotations

from dataclasses import replace
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..block.bcsr import BCSRMatrix, SYM_NONE
from ..block.gather import block_subset_gather
from ..block.index import BCSRIndex, build_index, merge_index
from ..core.errors import dbcsr_assert
from ..core.timing import timed
from ..mm.pack import elem_coords
from .norms import block_norms_sq
from .transform import desymmetrize

__all__ = [
    "add",
    "scale",
    "scale_by_vector",
    "set_value",
    "zero",
    "trace",
    "dot",
    "hadamard_product",
    "filter_blocks",
    "function_of_elements",
    "triu",
    "get_diag",
    "set_diag",
    "add_on_diag",
    "crop",
]


def _same_structure(a: BCSRMatrix, b: BCSRMatrix) -> bool:
    return np.array_equal(a.row_block_sizes, b.row_block_sizes) and np.array_equal(
        a.col_block_sizes, b.col_block_sizes
    )


def add(alpha, a: BCSRMatrix, beta, b: BCSRMatrix) -> BCSRMatrix:
    """alpha*A + beta*B with index union (``dbcsr_add``)."""
    dbcsr_assert(_same_structure(a, b), "incompatible block structures")
    if a.sym != b.sym:
        a, b = desymmetrize(a), desymmetrize(b)
    with timed("add"):
        merged, a_map, b_map = merge_index(a.index, b.index)
        out = jnp.zeros((merged.nelems,), dtype=jnp.result_type(a.dtype, b.dtype))

        def positions(src: BCSRIndex, blk_map: np.ndarray) -> np.ndarray:
            if src.nblks == 0:
                return np.zeros(0, dtype=np.int64)
            eb = src.elem_to_blk.astype(np.int64)
            t = np.arange(src.nelems, dtype=np.int64) - src.blk_offset[eb]
            return merged.blk_offset[blk_map[eb]] + t

        out = out.at[jnp.asarray(positions(a.index, a_map).astype(np.int32))].add(
            jnp.asarray(alpha, out.dtype) * a.data.astype(out.dtype)
        )
        out = out.at[jnp.asarray(positions(b.index, b_map).astype(np.int32))].add(
            jnp.asarray(beta, out.dtype) * b.data.astype(out.dtype)
        )
        return BCSRMatrix(
            name=a.name, index=merged, data=out, sym=a.sym, dist=a.dist
        )


def scale(m: BCSRMatrix, alpha) -> BCSRMatrix:
    return m.with_data(m.data * jnp.asarray(alpha, m.dtype))


def scale_by_vector(m: BCSRMatrix, vec, side: str = "right") -> BCSRMatrix:
    """Scale columns (side='right': A·diag(v)) or rows (side='left':
    diag(v)·A) — ``dbcsr_scale_by_vector``."""
    dbcsr_assert(side in ("left", "right"), "side must be left|right")
    rows, cols = elem_coords(m.index)
    which = rows if side == "left" else cols
    n = m.index.nfullrows if side == "left" else m.index.nfullcols
    v = jnp.asarray(vec, dtype=m.dtype).reshape(n)
    return m.with_data(m.data * v[jnp.asarray(which.astype(np.int32))])


def set_value(m: BCSRMatrix, value) -> BCSRMatrix:
    """Set every stored element (``dbcsr_set``)."""
    return m.with_data(jnp.full_like(m.data, value))


def zero(m: BCSRMatrix) -> BCSRMatrix:
    return set_value(m, 0)


def trace(m: BCSRMatrix) -> float:
    """Sum of diagonal elements (``dbcsr_trace``)."""
    mm = desymmetrize(m)
    rows, cols = elem_coords(mm.index)
    on_diag = rows == cols
    if not on_diag.any():
        return 0.0
    sel = jnp.asarray(np.flatnonzero(on_diag).astype(np.int32))
    return complex(jnp.sum(jnp.take(mm.data, sel))) if jnp.iscomplexobj(
        mm.data
    ) else float(jnp.sum(jnp.take(mm.data, sel)))


def dot(a: BCSRMatrix, b: BCSRMatrix) -> float:
    """Frobenius inner product Tr(A^T B) over the shared pattern
    (``dbcsr_dot``)."""
    dbcsr_assert(_same_structure(a, b), "incompatible block structures")
    a = desymmetrize(a)
    b = desymmetrize(b)
    merged, a_map, b_map = merge_index(a.index, b.index)

    def spread(src: BCSRIndex, blk_map, data):
        eb = src.elem_to_blk.astype(np.int64)
        t = np.arange(src.nelems, dtype=np.int64) - src.blk_offset[eb]
        pos = merged.blk_offset[blk_map[eb]] + t
        return (
            jnp.zeros((merged.nelems,), dtype=data.dtype)
            .at[jnp.asarray(pos.astype(np.int32))]
            .set(data)
        )

    fa = spread(a.index, a_map, a.data)
    fb = spread(b.index, b_map, b.data)
    val = jnp.sum(jnp.conj(fa) * fb) if jnp.iscomplexobj(fa) else jnp.sum(fa * fb)
    return complex(val) if jnp.iscomplexobj(fa) else float(val)


def hadamard_product(a: BCSRMatrix, b: BCSRMatrix) -> BCSRMatrix:
    """Elementwise product on the pattern intersection
    (``dbcsr_hadamard_product``)."""
    dbcsr_assert(_same_structure(a, b), "incompatible block structures")
    a = desymmetrize(a)
    b = desymmetrize(b)
    pa = a.index.pattern()
    pb = b.index.pattern()
    inter = pa.astype(bool).multiply(pb.astype(bool)).tocsr()
    inter.sort_indices()
    coo = inter.tocoo()
    new_index, _ = build_index(
        coo.row.astype(np.int32), coo.col.astype(np.int32),
        a.row_block_sizes, a.col_block_sizes,
    )

    def gather_into(src: BCSRIndex, data):
        # block ids of the intersection inside src (patterns carry id+1)
        ids = np.asarray(
            src.pattern()[coo.row.astype(np.int64), coo.col.astype(np.int64)]
        ).ravel() - 1
        eb = new_index.elem_to_blk.astype(np.int64)
        t = np.arange(new_index.nelems, dtype=np.int64) - new_index.blk_offset[eb]
        pos = src.blk_offset[ids[eb]] + t
        return jnp.take(data, jnp.asarray(pos.astype(np.int32)))

    da = gather_into(a.index, a.data)
    db = gather_into(b.index, b.data)
    return BCSRMatrix(
        name=a.name, index=new_index, data=da * db, sym=SYM_NONE, dist=a.dist
    )


def filter_blocks(m: BCSRMatrix, eps: float) -> BCSRMatrix:
    """Drop blocks with Frobenius norm below eps (``dbcsr_filter``)."""
    if m.nblks == 0 or eps is None:
        return m
    with timed("filter"):
        nsq = np.asarray(block_norms_sq(m), dtype=np.float64)
        keep = nsq >= float(eps) ** 2
        if keep.all():
            return m
        rows = m.index.blk_rows[keep]
        cols = m.index.col_idx[keep]
        new_index, order = build_index(
            rows, cols, m.index.row_block_sizes, m.index.col_block_sizes
        )
        # canonical subset keeps order; gather kept elements
        gmap = block_subset_gather(m.index, keep)
        data = jnp.take(m.data, jnp.asarray(gmap.astype(np.int32)))
        return BCSRMatrix(
            name=m.name, index=new_index, data=data, sym=m.sym, dist=m.dist
        )


def function_of_elements(m: BCSRMatrix, fn: Callable[[jax.Array], jax.Array]) -> BCSRMatrix:
    """Apply an elementwise function to stored elements
    (``dbcsr_function_of_elements``; the reference enumerates 13 fixed
    functions at ``dbcsr_types.F:483-495`` — here any jax-traceable fn)."""
    return m.with_data(fn(m.data))


def triu(m: BCSRMatrix) -> BCSRMatrix:
    """Zero the strictly-lower triangle of stored data (``dbcsr_triu``)."""
    rows, cols = elem_coords(m.index)
    mask = jnp.asarray(rows <= cols)
    return m.with_data(jnp.where(mask, m.data, 0))


def get_diag(m: BCSRMatrix) -> jax.Array:
    """Dense diagonal vector (``dbcsr_get_diag``)."""
    dbcsr_assert(m.index.nfullrows == m.index.nfullcols, "diag needs square")
    mm = desymmetrize(m)
    rows, cols = elem_coords(mm.index)
    on = rows == cols
    out = jnp.zeros((mm.index.nfullrows,), dtype=mm.dtype)
    pos = rows[on].astype(np.int32)
    sel = np.flatnonzero(on).astype(np.int32)
    return out.at[jnp.asarray(pos)].set(jnp.take(mm.data, jnp.asarray(sel)))


def set_diag(m: BCSRMatrix, diag) -> BCSRMatrix:
    """Set stored diagonal elements from a dense vector (``dbcsr_set_diag``).
    Only elements inside stored blocks are set."""
    rows, cols = elem_coords(m.index)
    on = rows == cols
    sel = np.flatnonzero(on).astype(np.int32)
    vals = jnp.asarray(diag, dtype=m.dtype)[jnp.asarray(rows[on].astype(np.int32))]
    return m.with_data(m.data.at[jnp.asarray(sel)].set(vals))


def add_on_diag(m: BCSRMatrix, alpha) -> BCSRMatrix:
    """Add alpha to stored diagonal elements (``dbcsr_add_on_diag``)."""
    rows, cols = elem_coords(m.index)
    on = rows == cols
    sel = np.flatnonzero(on).astype(np.int32)
    return m.with_data(
        m.data.at[jnp.asarray(sel)].add(jnp.asarray(alpha, m.dtype))
    )


def crop(
    m: BCSRMatrix,
    row_range: Optional[tuple] = None,
    col_range: Optional[tuple] = None,
) -> BCSRMatrix:
    """Zero data outside a block-index window (``dbcsr_crop_matrix``;
    element positions and index retained)."""
    r0, r1 = row_range if row_range else (0, m.nblkrows)
    c0, c1 = col_range if col_range else (0, m.nblkcols)
    keep = (
        (m.index.blk_rows >= r0)
        & (m.index.blk_rows < r1)
        & (m.index.col_idx >= c0)
        & (m.index.col_idx < c1)
    )
    mask = jnp.asarray(keep[m.index.elem_to_blk])
    return m.with_data(jnp.where(mask, m.data, 0))
