"""Elementwise operations and reductions on BCSR matrices.

Analog of ``src/ops/dbcsr_operations.F:109-125``: add (index-merge), scale,
scale-by-vector, set/zero, trace, dot, hadamard product, epsilon filtering,
elementwise function application, triu, diagonal access, crop. All device
math runs at TILE granularity on the tile stores (block/store.py invariant:
padding positions are exactly 0); index work stays on host.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..block.bcsr import BCSRMatrix, SYM_NONE
from ..block.index import build_index, merge_index
from ..block.store import store_layout
from ..block.tileops import (
    block_mask_store,
    coord_mask,
    take_tiles,
    tile_align_map,
    valid_mask,
)
from ..core.errors import dbcsr_assert
from ..core.timing import timed
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
    "ELEMENT_FUNCTIONS",
    "get_block_diag",
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


def _align_to(keys: np.ndarray, m: BCSRMatrix) -> jax.Array:
    """m's store gathered onto the tile set ``keys`` (tile-level take)."""
    amap = tile_align_map(keys, m.layout.tile_keys())
    return take_tiles(m.data, amap, m.tile)


def add(alpha, a: BCSRMatrix, beta, b: BCSRMatrix) -> BCSRMatrix:
    """alpha*A + beta*B with index union (``dbcsr_add``). The tile stores
    are dense-on-tiles with zero padding, so the union-aligned element sum
    IS the matrix sum — one tile gather per operand, one add."""
    if a.is_complex_emulated or b.is_complex_emulated:
        from .complex_emu import emu_add

        return emu_add(alpha, a, beta, b)
    dbcsr_assert(_same_structure(a, b), "incompatible block structures")
    if a.sym != b.sym:
        a, b = desymmetrize(a), desymmetrize(b)
    dbcsr_assert(a.tile == b.tile, "tile sizes differ")
    with timed("add"):
        merged, _, _ = merge_index(a.index, b.index)
        keys = store_layout(merged, a.tile).tile_keys()
        dtype = jnp.result_type(a.dtype, b.dtype)
        out = jnp.asarray(alpha, dtype) * _align_to(keys, a).astype(dtype) + jnp.asarray(
            beta, dtype
        ) * _align_to(keys, b).astype(dtype)
        return BCSRMatrix(
            name=a.name, index=merged, data=out, sym=a.sym, dist=a.dist
        )


def scale(m: BCSRMatrix, alpha) -> BCSRMatrix:
    if m.is_complex_emulated:
        from .complex_emu import emu_scale

        return emu_scale(m, alpha)
    return m.with_data(m.data * jnp.asarray(alpha, m.dtype))


def scale_by_vector(m: BCSRMatrix, vec, side: str = "right") -> BCSRMatrix:
    """Scale columns (side='right': A·diag(v)) or rows (side='left':
    diag(v)·A) — ``dbcsr_scale_by_vector``. The vector is re-tiled to
    [n_tiles, T] by a tile-level gather and broadcast-multiplied."""
    dbcsr_assert(side in ("left", "right"), "side must be left|right")
    if m.is_complex_emulated:
        from .complex_emu import map_parts
        from .arithmetic import add as _add

        v = np.asarray(vec)
        re, im = m.parts()
        rr = scale_by_vector(re, v.real, side)
        ii = scale_by_vector(im, v.real, side)
        if np.iscomplexobj(v) and np.abs(v.imag).max() > 0:
            rr = _add(1.0, rr, -1.0, scale_by_vector(im, v.imag, side))
            ii = _add(1.0, ii, 1.0, scale_by_vector(re, v.imag, side))
        return BCSRMatrix.combine(rr, ii, m.dtype, name=m.name, sym=m.sym)
    lay = m.layout
    t = m.tile
    if side == "left":
        n, ntiles_dim, coord = m.index.nfullrows, lay.ntr, lay.tile_coords[:, 0]
    else:
        n, ntiles_dim, coord = m.index.nfullcols, lay.ntc, lay.tile_coords[:, 1]
    v = jnp.zeros((ntiles_dim * t,), dtype=m.dtype).at[:n].set(
        jnp.asarray(vec, dtype=m.dtype).reshape(n)
    )
    per_tile = jnp.take(v.reshape(ntiles_dim, t), jnp.asarray(coord), axis=0)
    if side == "left":
        return m.with_data(m.data * per_tile[:, :, None])
    return m.with_data(m.data * per_tile[:, None, :])


def set_value(m: BCSRMatrix, value) -> BCSRMatrix:
    """Set every stored element (``dbcsr_set``); padding stays zero via the
    validity mask."""
    if value == 0:
        return zero(m)
    if m.is_complex_emulated:
        value = complex(value)
        re, im = m.parts()
        return BCSRMatrix.combine(
            set_value(re, value.real), set_value(im, value.imag),
            m.dtype, name=m.name, sym=m.sym,
        )
    vm = valid_mask(m.index, m.tile).astype(m.dtype)
    return m.with_data(vm * jnp.asarray(value, m.dtype))


def zero(m: BCSRMatrix) -> BCSRMatrix:
    if m.is_complex_emulated:
        from .complex_emu import map_parts

        return map_parts(m, zero)
    return m.with_data(jnp.zeros_like(m.data))


def _diag_slots(m: BCSRMatrix) -> np.ndarray:
    lay = m.layout
    return np.flatnonzero(lay.tile_coords[:, 0] == lay.tile_coords[:, 1])


def trace(m: BCSRMatrix) -> float:
    """Sum of diagonal elements (``dbcsr_trace``). Only diagonal tiles
    (tr == tc) intersect the diagonal; padding zeros make the raw diagonal
    sum exact."""
    if m.is_complex_emulated:
        from .complex_emu import emu_trace

        return emu_trace(m)
    mm = desymmetrize(m)
    slots = _diag_slots(mm)
    if len(slots) == 0:
        return 0.0
    d = jnp.take(mm.data, jnp.asarray(slots.astype(np.int32)), axis=0)
    val = jnp.sum(jnp.diagonal(d, axis1=1, axis2=2))
    return complex(val) if jnp.iscomplexobj(d) else float(val)


def dot(a: BCSRMatrix, b: BCSRMatrix) -> float:
    """Frobenius inner product Tr(A^T B) (``dbcsr_dot``): elementwise on the
    tile intersection — positions where either operand stores nothing are 0."""
    dbcsr_assert(_same_structure(a, b), "incompatible block structures")
    dbcsr_assert(a.tile == b.tile, "tile sizes differ")
    if a.is_complex_emulated or b.is_complex_emulated:
        from .complex_emu import emu_dot

        return emu_dot(a, b)
    a = desymmetrize(a)
    b = desymmetrize(b)
    ka, kb = a.layout.tile_keys(), b.layout.tile_keys()
    keys = np.intersect1d(ka, kb)
    if len(keys) == 0:
        return 0.0
    fa = _align_to(keys, a)
    fb = _align_to(keys, b)
    val = jnp.sum(jnp.conj(fa) * fb) if jnp.iscomplexobj(fa) else jnp.sum(fa * fb)
    return complex(val) if jnp.iscomplexobj(fa) else float(val)


def hadamard_product(a: BCSRMatrix, b: BCSRMatrix) -> BCSRMatrix:
    """Elementwise product on the pattern intersection
    (``dbcsr_hadamard_product``). The store product is exact: positions
    covered by only one operand multiply against 0."""
    dbcsr_assert(_same_structure(a, b), "incompatible block structures")
    dbcsr_assert(a.tile == b.tile, "tile sizes differ")
    if a.is_complex_emulated or b.is_complex_emulated:
        from .complex_emu import emu_hadamard

        return emu_hadamard(a, b)
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
    keys = store_layout(new_index, a.tile).tile_keys()
    data = _align_to(keys, a) * _align_to(keys, b)
    return BCSRMatrix(
        name=a.name, index=new_index, data=data, sym=SYM_NONE, dist=a.dist
    )


def filter_blocks(m: BCSRMatrix, eps: float) -> BCSRMatrix:
    """Drop blocks with Frobenius norm below eps (``dbcsr_filter``).
    Tile-level gather onto the surviving tile set + a block mask (indicator
    matmul) zeroing dropped blocks that share tiles with survivors."""
    if m.nblks == 0 or eps is None:
        return m
    if m.is_complex_emulated:
        from .complex_emu import emu_filter

        return emu_filter(m, eps)
    with timed("filter"):
        nsq = block_norms_sq(m).astype(np.float64)
        keep = nsq >= float(eps) ** 2
        if keep.all():
            return m
        rows = m.index.blk_rows[keep]
        cols = m.index.col_idx[keep]
        # intern the filtered index by content: iterative filtered
        # multiplies re-derive the same surviving pattern every call,
        # and a shared index object carries its derived caches (store
        # layout keys, valid_mask) across calls
        from ..mm.plancache import (
            array_fingerprint, get_plan_cache, index_fingerprint,
        )

        _pc = get_plan_cache()
        _fk = (
            "filter_index", index_fingerprint(m.index),
            array_fingerprint(keep),
        )
        _fc = _pc.get(_fk)
        if _fc is not None:
            new_index = _fc[0]
        else:
            new_index, _ = build_index(
                rows, cols, m.index.row_block_sizes, m.index.col_block_sizes
            )
            _pc.put(_fk, (new_index,))
        keys = store_layout(new_index, m.tile).tile_keys()
        data = _align_to(keys, m) * valid_mask(new_index, m.tile).astype(m.dtype)
        return BCSRMatrix(
            name=m.name, index=new_index, data=data, sym=m.sym, dist=m.dist
        )


#: named element functions (the reference's ``dbcsr_func_*`` constants,
#: ``dbcsr_types.F:483-495``); ``function_of_elements`` also takes any
#: jax-traceable callable
ELEMENT_FUNCTIONS: dict = {
    "inverse": lambda x: jnp.where(x != 0, 1.0 / jnp.where(x != 0, x, 1), 0.0),
    "tanh": jnp.tanh,
    "dtanh": lambda x: 1.0 - jnp.tanh(x) ** 2,
    "ddtanh": lambda x: -2.0 * jnp.tanh(x) * (1.0 - jnp.tanh(x) ** 2),
    "artanh": jnp.arctanh,
    "dartanh": lambda x: 1.0 / (1.0 - x * x),
    "sin": jnp.sin,
    "cos": jnp.cos,
    "exp": jnp.exp,
    "log": lambda x: jnp.where(x > 0, jnp.log(jnp.where(x > 0, x, 1)), 0.0),
    "sqrt": lambda x: jnp.sqrt(jnp.abs(x)),
    "inverse_special": lambda x: 1.0 / jnp.where(x != 0, x, 1),
    "abs": jnp.abs,
}


def function_of_elements(m: BCSRMatrix, fn) -> BCSRMatrix:
    """Apply an elementwise function to stored elements
    (``dbcsr_function_of_elements``; the reference enumerates 13 fixed
    functions at ``dbcsr_types.F:483-495`` — here a name from
    :data:`ELEMENT_FUNCTIONS` or any jax-traceable fn). The validity mask
    keeps padding at zero for fn(0) != 0."""
    if isinstance(fn, str):
        dbcsr_assert(fn in ELEMENT_FUNCTIONS, f"unknown element function {fn!r}")
        fn = ELEMENT_FUNCTIONS[fn]
    out = fn(m.data)
    vm = valid_mask(m.index, m.tile)
    return m.with_data(jnp.where(vm > 0.5, out, jnp.zeros_like(out)))


def get_block_diag(m: BCSRMatrix) -> BCSRMatrix:
    """Matrix holding only the diagonal BLOCKS (``dbcsr_get_block_diag``)."""
    dbcsr_assert(m.index.nblkrows == m.index.nblkcols, "needs square blocking")
    keep = m.index.blk_rows == m.index.col_idx
    rows = m.index.blk_rows[keep]
    new_index, _ = build_index(
        rows, rows, m.index.row_block_sizes, m.index.col_block_sizes
    )
    keys = store_layout(new_index, m.tile).tile_keys()
    amap = tile_align_map(keys, m.layout.tile_keys())
    data = take_tiles(m.data, amap, m.tile) * valid_mask(
        new_index, m.tile
    ).astype(m.dtype)
    return BCSRMatrix(
        name=m.name + "_diag", index=new_index, data=data, sym=m.sym,
        dist=m.dist,
    )


def triu(m: BCSRMatrix) -> BCSRMatrix:
    """Zero the strictly-lower triangle of stored data (``dbcsr_triu``)."""
    mask = coord_mask(m.layout, lambda r, c: r <= c)
    return m.with_data(jnp.where(mask, m.data, 0))


def get_diag(m: BCSRMatrix) -> jax.Array:
    """Dense diagonal vector (``dbcsr_get_diag``)."""
    dbcsr_assert(m.index.nfullrows == m.index.nfullcols, "diag needs square")
    mm = desymmetrize(m)
    lay = mm.layout
    t = mm.tile
    n = mm.index.nfullrows
    slots = _diag_slots(mm)
    out = jnp.zeros((lay.ntr, t), dtype=mm.dtype)
    if len(slots):
        d = jnp.take(mm.data, jnp.asarray(slots.astype(np.int32)), axis=0)
        trs = lay.tile_coords[slots, 0]
        out = out.at[jnp.asarray(trs)].set(jnp.diagonal(d, axis1=1, axis2=2))
    return out.reshape(-1)[:n]


def _update_diag(m: BCSRMatrix, new_diag_tiles_fn) -> BCSRMatrix:
    """Shared scaffold for set_diag/add_on_diag: rewrite diagonal tiles."""
    slots = _diag_slots(m)
    if len(slots) == 0:
        return m
    lay = m.layout
    t = m.tile
    sl = jnp.asarray(slots.astype(np.int32))
    d = jnp.take(m.data, sl, axis=0)
    vm = jnp.take(valid_mask(m.index, m.tile), sl, axis=0)
    eye = jnp.eye(t, dtype=m.data.real.dtype if jnp.iscomplexobj(m.data) else m.dtype)
    diag_mask = (eye[None] * vm) > 0.5  # stored diagonal positions only
    trs = lay.tile_coords[slots, 0]
    new_d = new_diag_tiles_fn(d, diag_mask, trs)
    return m.with_data(m.data.at[sl].set(new_d))


def set_diag(m: BCSRMatrix, diag) -> BCSRMatrix:
    """Set stored diagonal elements from a dense vector (``dbcsr_set_diag``).
    Only elements inside stored blocks are set."""
    t = m.tile
    lay = m.layout
    n = m.index.nfullrows
    v = jnp.zeros((lay.ntr * t,), dtype=m.dtype).at[:n].set(
        jnp.asarray(diag, dtype=m.dtype).reshape(n)
    ).reshape(lay.ntr, t)

    def upd(d, diag_mask, trs):
        vals = jnp.take(v, jnp.asarray(trs), axis=0)  # [nd, T]
        vt = vals[:, :, None] * jnp.eye(t, dtype=m.dtype)
        return jnp.where(diag_mask, vt, d)

    return _update_diag(m, upd)


def add_on_diag(m: BCSRMatrix, alpha) -> BCSRMatrix:
    """Add alpha to stored diagonal elements (``dbcsr_add_on_diag``)."""
    def upd(d, diag_mask, trs):
        return jnp.where(diag_mask, d + jnp.asarray(alpha, m.dtype), d)

    return _update_diag(m, upd)


def crop(
    m: BCSRMatrix,
    row_range: Optional[tuple] = None,
    col_range: Optional[tuple] = None,
) -> BCSRMatrix:
    """Zero data outside a block-index window (``dbcsr_crop_matrix``;
    element positions and index retained). Block keep mask applied via the
    indicator matmul."""
    r0, r1 = row_range if row_range else (0, m.nblkrows)
    c0, c1 = col_range if col_range else (0, m.nblkcols)
    keep = (
        (m.index.blk_rows >= r0)
        & (m.index.blk_rows < r1)
        & (m.index.col_idx >= c0)
        & (m.index.col_idx < c1)
    )
    mask = block_mask_store(m.index, m.tile, keep.astype(np.float32))
    return m.with_data(m.data * mask.astype(m.dtype))
