"""Reference-parity C API implementation (Python side).

Backs the full ``c_dbcsr_*`` + ``c_dbcsr_t_*`` surface of the reference's
C bindings (``/root/reference/src/dbcsr.h:75-376`` — 100 matrix functions,
``src/tensors/dbcsr_tensor.h`` — 54 tensor functions) with the
reference's MUTATING handle semantics: a handle is a :class:`Cell` whose
contents the calls rebind (``c_dbcsr_multiply_d`` writes into the C
handle, ``c_dbcsr_add_d`` updates A in place, ...). The legacy
value-returning convenience surface in ``helpers.py`` coexists.

Typed families (``_d/_s/_z/_c``) share one implementation parameterized by
the type char; complex scalars arrive as (re, im) doubles from C.

Deviations from the reference, documented here once:
- communicator arguments are accepted and ignored (the device mesh comes
  from jax; ``dbcsr_tpu.dist`` attaches distributions);
- ``get_data``/``get_block_p``-style POINTER returns hand out a pointer
  into a per-handle host mirror refreshed by the call (device storage has
  no stable element addresses) — valid until the next call on the handle.
"""
from __future__ import annotations

import ctypes
from typing import Any, List, Optional, Tuple

import numpy as np

import dbcsr_tpu as dt
from dbcsr_tpu.block.bcsr import BCSRBuilder, BCSRMatrix
from dbcsr_tpu.core.errors import DbcsrError

# --- type classes ----------------------------------------------------------

_DTYPES = {
    "d": np.float64,
    "s": np.float32,
    "z": np.complex128,
    "c": np.complex64,
}
#: reference data_type constants (dbcsr.h:17-20)
_DTYPE_CONST = {1: np.float32, 3: np.float64, 5: np.complex64, 7: np.complex128}
_CONST_OF_DTYPE = {np.dtype(v): k for k, v in _DTYPE_CONST.items()}

_CTYPES = {
    "d": ctypes.c_double,
    "s": ctypes.c_float,
    # complex marshalled as interleaved re/im pairs of the base real type
    "z": ctypes.c_double,
    "c": ctypes.c_float,
}


def _scalar(typ: str, re: float, im: float):
    if typ in ("z", "c"):
        return complex(re, im)
    return float(re)


def _buf(typ: str, addr: int, n: int) -> np.ndarray:
    """View ``n`` elements of type class ``typ`` at ``addr``."""
    base = _CTYPES[typ]
    mult = 2 if typ in ("z", "c") else 1
    raw = (base * (n * mult)).from_address(addr)
    arr = np.frombuffer(raw, dtype=base)
    if mult == 2:
        return arr.view(_DTYPES[typ])
    return arr


def _i32buf(addr: int, n: int) -> np.ndarray:
    return np.frombuffer(
        (ctypes.c_int32 * n).from_address(addr), dtype=np.int32
    ).copy()


def _i32out(addr: int, n: int) -> np.ndarray:
    """WRITABLE int32 view of the caller's buffer (``_i32buf`` copies)."""
    return np.frombuffer(
        (ctypes.c_int32 * n).from_address(addr), dtype=np.int32
    )


class Cell:
    """Mutable handle target: matrices/tensors rebind ``obj`` in place."""

    __slots__ = ("obj", "aux", "mirror")

    def __init__(self, obj: Any = None, aux: Any = None):
        self.obj = obj
        self.aux = aux  # creation metadata (dist, sym, dtype, name...)
        self.mirror: Optional[np.ndarray] = None  # host mirror for *_p


def _mat(cell: Cell) -> BCSRMatrix:
    o = cell.obj
    if isinstance(o, BCSRBuilder):
        # implicit finalize mirrors the reference's forgiving access order
        cell.obj = o.finalize()
        return cell.obj
    if not isinstance(o, BCSRMatrix):
        raise DbcsrError("handle is not a matrix")
    return o


def _bld(cell: Cell) -> BCSRBuilder:
    o = cell.obj
    if isinstance(o, BCSRBuilder):
        return o
    if isinstance(o, BCSRMatrix):
        # reopen for mutation: seed a builder with the existing blocks
        b = BCSRBuilder(
            o.index.row_block_sizes, o.index.col_block_sizes, name=o.name,
            dtype=o.dtype, sym=o.sym, dist=o.dist, tile=o.tile,
        )
        for r, c, blk in o.iter_blocks():
            b.put_block(r, c, blk)
        cell.obj = b
        return b
    raise DbcsrError("handle is not a matrix")


# --- lifecycle -------------------------------------------------------------

def init_lib(comm: int, io_unit: int) -> None:
    del comm, io_unit  # mesh/io come from jax / python logging
    dt.init_lib()


def finalize_lib() -> None:
    dt.finalize_lib()


def clear_mempools() -> None:
    # XLA owns allocation; nothing to clear (parity no-op)
    return None


def mp_grid_setup(dist_cell: Cell) -> None:
    # grids are carried by the Distribution itself here
    del dist_cell


def print_statistics(print_timers: int, callgraph_filename: str) -> None:
    txt = dt.print_statistics()
    print(txt)
    if print_timers:
        from dbcsr_tpu.core.timing import timer_report

        print(timer_report())
    if callgraph_filename:
        from dbcsr_tpu.core.timing import timings_report_callgraph

        timings_report_callgraph(callgraph_filename)


# --- distribution ----------------------------------------------------------

def distribution_new(
    comm: int, rd_addr: int, n_rd: int, cd_addr: int, n_cd: int
) -> Cell:
    del comm
    from dbcsr_tpu.dist import Distribution, ProcessGrid

    row_dist = _i32buf(rd_addr, n_rd)
    col_dist = _i32buf(cd_addr, n_cd)
    p = int(row_dist.max(initial=0)) + 1
    q = int(col_dist.max(initial=0)) + 1
    import jax

    ndev = len(jax.devices())
    if p * q > ndev:
        # single-device fall-back keeps embedding apps runnable anywhere
        p = q = 1
        row_dist = np.zeros_like(row_dist)
        col_dist = np.zeros_like(col_dist)
    grid = ProcessGrid.make(p, q)
    return Cell(
        Distribution(grid=grid, row_dist=row_dist, col_dist=col_dist)
    )


def distribution_hold(cell: Cell) -> None:
    del cell  # handle table owns one reference; C-side hold is a no-op


def distribution_get(cell: Cell) -> Tuple[int, int, int, int]:
    d = cell.obj
    return (
        d.grid.nprow, d.grid.npcol, len(d.row_dist), len(d.col_dist)
    )


# --- create / assembly -----------------------------------------------------

def create_new(
    name: str,
    dist_cell: Optional[Cell],
    matrix_type: str,
    rs_addr: int,
    n_rs: int,
    cs_addr: int,
    n_cs: int,
    data_type: int,
) -> Cell:
    dtype = _DTYPE_CONST.get(data_type, np.float64)
    sym = matrix_type if matrix_type in ("N", "S", "A", "H") else "N"
    dist = dist_cell.obj if dist_cell is not None else None
    b = BCSRBuilder(
        _i32buf(rs_addr, n_rs), _i32buf(cs_addr, n_cs), name=name,
        dtype=dtype, sym=sym, dist=dist,
    )
    return Cell(b)


def create_template(
    template_cell: Cell,
    name: str,
    dist_cell: Optional[Cell],
    matrix_type: str,
    data_type: int,
) -> Cell:
    t = _mat(template_cell)
    dtype = _DTYPE_CONST.get(data_type, np.dtype(t.dtype).type)
    sym = matrix_type if matrix_type in ("N", "S", "A", "H") else t.sym
    dist = dist_cell.obj if dist_cell is not None else t.dist
    b = BCSRBuilder(
        t.index.row_block_sizes, t.index.col_block_sizes,
        name=name or t.name, dtype=dtype, sym=sym, dist=dist, tile=t.tile,
    )
    return Cell(b)


def finalize(cell: Cell) -> None:
    if isinstance(cell.obj, BCSRBuilder):
        cell.obj = cell.obj.finalize()


def put_block2d(
    cell: Cell, typ: str, row: int, col: int, addr: int, m: int, n: int,
    summation: int,
) -> None:
    blk = (
        _buf(typ, addr, m * n).reshape(m, n).astype(_DTYPES[typ]).copy()
    )
    _bld(cell).put_block(row, col, blk, sum=bool(summation))


def reserve_block2d(cell: Cell, row: int, col: int) -> None:
    _bld(cell).reserve_block(row, col)


def reserve_blocks(cell: Cell, rows_addr: int, cols_addr: int, n: int) -> None:
    _bld(cell).reserve_blocks(_i32buf(rows_addr, n), _i32buf(cols_addr, n))


def reserve_all_blocks(cell: Cell) -> None:
    _bld(cell).reserve_all_blocks()


def reserve_diag_blocks(cell: Cell) -> None:
    _bld(cell).reserve_diag_blocks()


# --- block access ----------------------------------------------------------

def get_block_p(
    cell: Cell, typ: str, row: int, col: int, out_addr: int
) -> Tuple[int, int, int]:
    """(found, m, n); copies into out_addr when nonzero."""
    blk = _mat(cell).get_block(row, col)
    if blk is None:
        return (0, 0, 0)
    blk = np.asarray(blk, dtype=_DTYPES[typ])
    if out_addr:
        _buf(typ, out_addr, blk.size)[:] = blk.reshape(-1)
    return (1, blk.shape[0], blk.shape[1])


def get_stored_coordinates(cell: Cell, row: int, col: int) -> int:
    from dbcsr_tpu.ops.io import get_stored_coordinates as gsc

    v = gsc(_mat(cell), row, col)
    return -1 if v is None else int(v)


def get_block_diag(cell: Cell) -> Cell:
    from dbcsr_tpu.ops.arithmetic import get_block_diag as gbd

    return Cell(gbd(_mat(cell)))


def get_diag(cell: Cell, typ: str, out_addr: int, n: int) -> None:
    from dbcsr_tpu.ops.arithmetic import get_diag

    d = np.asarray(get_diag(_mat(cell)), dtype=_DTYPES[typ])
    k = min(n, len(d))
    _buf(typ, out_addr, n)[:k] = d[:k]


def set_diag(cell: Cell, typ: str, addr: int, n: int) -> None:
    from dbcsr_tpu.ops.arithmetic import set_diag

    cell.obj = set_diag(
        _mat(cell), _buf(typ, addr, n).astype(_DTYPES[typ]).copy()
    )


def add_on_diag(cell: Cell, typ: str, re: float, im: float) -> None:
    from dbcsr_tpu.ops.arithmetic import add_on_diag

    cell.obj = add_on_diag(_mat(cell), _scalar(typ, re, im))


# --- iterators -------------------------------------------------------------

class _Iter:
    def __init__(self, m: BCSRMatrix):
        self.blocks = list(m.iter_blocks())
        self.pos = 0
        self.buf: Optional[np.ndarray] = None


def iterator_start(cell: Cell) -> Cell:
    return Cell(_Iter(_mat(cell)))


def iterator_blocks_left(it_cell: Cell) -> int:
    it = it_cell.obj
    return int(it.pos < len(it.blocks))


def iterator_next_block_index(it_cell: Cell) -> Tuple[int, int, int]:
    """(row, col, blk_size); advances."""
    it = it_cell.obj
    r, c, blk = it.blocks[it.pos]
    it.pos += 1
    return (int(r), int(c), int(blk.size))


def iterator_next_2d_block(
    it_cell: Cell, typ: str, out_addr: int
) -> Tuple[int, int, int, int]:
    """(row, col, m, n); copies block data when out_addr != 0."""
    it = it_cell.obj
    r, c, blk = it.blocks[it.pos]
    it.pos += 1
    blk = np.asarray(blk, dtype=_DTYPES[typ])
    if out_addr:
        _buf(typ, out_addr, blk.size)[:] = blk.reshape(-1)
    return (int(r), int(c), blk.shape[0], blk.shape[1])


def iterator_stop(it_cell: Cell) -> None:
    it_cell.obj = None


# --- info / properties -----------------------------------------------------

def get_info(cell: Cell) -> Tuple[int, int, int, int, int]:
    m = _mat(cell)
    return (m.nblkrows, m.nblkcols, m.shape[0], m.shape[1], m.nblks)


def get_name(cell: Cell) -> str:
    return _mat(cell).name


def setname(cell: Cell, name: str) -> None:
    from dataclasses import replace

    cell.obj = replace(_mat(cell), name=name)


def get_matrix_type(cell: Cell) -> str:
    return _mat(cell).sym


def has_symmetry(cell: Cell) -> int:
    return int(_mat(cell).sym != "N")


def get_data_type(cell: Cell) -> int:
    return _CONST_OF_DTYPE[np.dtype(_mat(cell).dtype)]


def get_data_size(cell: Cell) -> int:
    return int(_mat(cell).index.nelems)


def get_data(cell: Cell, typ: str, out_addr: int, n: int) -> int:
    """Copy the flat block data (reference data_area layout) into the
    caller's buffer; returns the element count."""
    flat = _mat(cell).flat_host().astype(_DTYPES[typ])
    if out_addr:
        _buf(typ, out_addr, min(n, flat.size))[:] = flat[:n]
    return int(flat.size)


def get_num_blocks(cell: Cell) -> int:
    return _mat(cell).nblks


def nblkrows_total(cell: Cell) -> int:
    return _mat(cell).nblkrows


def nblkcols_total(cell: Cell) -> int:
    return _mat(cell).nblkcols


def nblkrows_local(cell: Cell) -> int:
    return _mat(cell).nblkrows  # single-controller: local == total


def nblkcols_local(cell: Cell) -> int:
    return _mat(cell).nblkcols


def nfullrows_total(cell: Cell) -> int:
    return _mat(cell).shape[0]


def nfullcols_total(cell: Cell) -> int:
    return _mat(cell).shape[1]


def get_infovar(cell: Cell, which: str, out_addr: int, size: int) -> None:
    """One of the reference's ``c_dbcsr_get_${var}$`` info arrays
    (``/root/reference/src/dbcsr.h:282-287``) copied into the caller's
    int buffer (first ``min(size, len)`` entries). Conventions match the
    reference's C API exactly: its ``c_dbcsr_get_info`` converts
    ``local_rows``/``local_cols``/``row_blk_offset``/``col_blk_offset``
    to 0-based before returning them to C callers
    (``/root/reference/src/dbcsr_api_c.F:1373-1380``,
    ``f_var = var - 1``), so 0-based is the reference C convention, not
    a deviation from it. Local rows/cols == all rows/cols on one
    controller; proc dists are ranks (0-based in the reference too) and
    all-zero for undistributed matrices."""
    m = _mat(cell)
    ix = m.index
    if which == "local_rows":
        arr = np.arange(ix.nblkrows, dtype=np.int32)
    elif which == "local_cols":
        arr = np.arange(ix.nblkcols, dtype=np.int32)
    elif which == "proc_row_dist":
        arr = (
            m.dist.row_dist
            if m.dist is not None
            else np.zeros(ix.nblkrows, np.int32)
        )
    elif which == "proc_col_dist":
        arr = (
            m.dist.col_dist
            if m.dist is not None
            else np.zeros(ix.nblkcols, np.int32)
        )
    elif which == "row_blk_size":
        arr = ix.row_block_sizes
    elif which == "col_blk_size":
        arr = ix.col_block_sizes
    elif which == "row_blk_offset":
        arr = ix.row_offsets[:-1]
    elif which == "col_blk_offset":
        arr = ix.col_offsets[:-1]
    else:
        raise DbcsrError(f"unknown info var {which!r}")
    arr = np.asarray(arr, dtype=np.int32)
    n = min(int(size), len(arr))
    if n > 0:
        _i32out(out_addr, n)[:] = arr[:n]


def get_occupation(cell: Cell) -> float:
    return float(_mat(cell).occupation())


def valid_index(cell: Cell) -> int:
    return int(isinstance(cell.obj, BCSRMatrix))


def get_distribution(cell: Cell) -> Cell:
    return Cell(_mat(cell).dist)


def get_group(cell: Cell) -> int:
    return 0  # communicator handle: single jax controller


# --- primitive ops (typed) -------------------------------------------------

def set_value(cell: Cell, typ: str, re: float, im: float) -> None:
    from dbcsr_tpu.ops.arithmetic import set_value as sv

    cell.obj = sv(_mat(cell), _scalar(typ, re, im))


def clear(cell: Cell) -> None:
    from dbcsr_tpu.ops.arithmetic import zero

    cell.obj = zero(_mat(cell))


def add(cell_a: Cell, cell_b: Cell, typ: str, ar: float, ai: float,
        br: float, bi: float) -> None:
    """A <- alpha*A + beta*B (mutates A, the reference's signature)."""
    cell_a.obj = dt.add(
        _scalar(typ, ar, ai), _mat(cell_a), _scalar(typ, br, bi),
        _mat(cell_b),
    )


def scale(cell: Cell, typ: str, re: float, im: float) -> None:
    cell.obj = dt.scale(_mat(cell), _scalar(typ, re, im))


def scale_by_vector(
    cell: Cell, typ: str, addr: int, n: int, side: str
) -> None:
    from dbcsr_tpu.ops.arithmetic import scale_by_vector as sbv

    vec = _buf(typ, addr, n).astype(_DTYPES[typ]).copy()
    cell.obj = sbv(_mat(cell), vec, side)


def multiply(
    typ: str, transa: str, transb: str, ar: float, ai: float,
    cell_a: Cell, cell_b: Cell, br: float, bi: float, cell_c: Cell,
    retain_sparsity: int, filter_eps: float,
) -> float:
    """C <- alpha*op(A)op(B) + beta*C into the C handle; returns flops."""
    c_in = cell_c.obj if isinstance(cell_c.obj, BCSRMatrix) else None
    out, fl = dt.multiply(
        transa, transb, _scalar(typ, ar, ai), _mat(cell_a), _mat(cell_b),
        _scalar(typ, br, bi), c_in,
        filter_eps=None if filter_eps < 0 else filter_eps,
        retain_sparsity=bool(retain_sparsity), return_flops=True,
    )
    cell_c.obj = out
    return float(fl)


def trace(cell: Cell) -> complex:
    return complex(dt.trace(_mat(cell)))


def dot(cell_a: Cell, cell_b: Cell) -> complex:
    return complex(dt.dot(_mat(cell_a), _mat(cell_b)))


def filter_matrix(cell: Cell, eps: float) -> None:
    cell.obj = dt.filter_blocks(_mat(cell), eps)


def function_of_elements(cell: Cell, func: int, a0: float, a1: float,
                         a2: float) -> None:
    from dbcsr_tpu.ops.arithmetic import ELEMENT_FUNCTIONS, function_of_elements

    #: reference dbcsr_func_* constants (dbcsr.h:29-41)
    names = {
        0: "inverse", 1: "tanh", 2: "dtanh", 3: "ddtanh", 4: "artanh",
        5: "inverse_special", 7: "sin", 11: "cos",
    }
    if func not in names:
        raise DbcsrError(f"unsupported element function id {func}")
    del a0, a1, a2
    cell.obj = function_of_elements(_mat(cell), names[func])


def hadamard_product(cell_a: Cell, cell_b: Cell, cell_c: Cell) -> None:
    from dbcsr_tpu.ops.arithmetic import hadamard_product as hp

    cell_c.obj = hp(_mat(cell_a), _mat(cell_b))


def triu(cell: Cell) -> None:
    from dbcsr_tpu.ops.arithmetic import triu as tr

    cell.obj = tr(_mat(cell))


def init_random(cell: Cell, keep_sparsity: int) -> None:
    m = _mat(cell)
    rng = np.random.default_rng(dt.get_config().default_seed)
    if keep_sparsity and m.nblks:
        flat = rng.standard_normal(m.index.nelems)
        if np.issubdtype(np.dtype(m.dtype), np.complexfloating):
            flat = flat + 1j * rng.standard_normal(m.index.nelems)
        cell.obj = m.with_flat(flat.astype(m.dtype))
    else:
        cell.obj = dt.random_matrix(
            m.index.row_block_sizes, m.index.col_block_sizes, 0.5, rng,
            dtype=m.dtype, sym=m.sym,
        )


# --- transformations -------------------------------------------------------

def copy(cell_to: Cell, cell_from: Cell, name: str) -> None:
    from dataclasses import replace

    m = _mat(cell_from)
    cell_to.obj = replace(m, name=name or m.name)


def copy_into_existing(cell_to: Cell, cell_from: Cell) -> None:
    """Copy FROM's values into TO, RETAINING TO's sparsity
    (``dbcsr_copy_into_existing``, ``src/ops/dbcsr_operations.F:1335``):
    the result keeps exactly TO's block pattern, with values taken from
    FROM where it has blocks and zero elsewhere."""
    from dbcsr_tpu.ops.arithmetic import add, hadamard_product, set_value

    to = _mat(cell_to)
    frm = _mat(cell_from)
    inter = hadamard_product(frm, set_value(to, 1.0))
    # union with 0*TO restores TO-only blocks (as zeros) -> TO's pattern
    cell_to.obj = add(1.0, inter, 0.0, to)


def desymmetrize(cell: Cell) -> Cell:
    from dbcsr_tpu.ops.transform import desymmetrize as de

    return Cell(de(_mat(cell)))


def transposed(cell: Cell) -> Cell:
    return Cell(dt.transpose(_mat(cell)))


def complete_redistribute(cell: Cell, dist_cell: Cell) -> Cell:
    from dbcsr_tpu.ops.transform import complete_redistribute as cr

    return Cell(cr(_mat(cell), dist_cell.obj))


def distribute(cell: Cell, dist_cell: Optional[Cell]) -> None:
    from dbcsr_tpu.ops.transform import distribute as di

    cell.obj = di(
        _mat(cell), dist_cell.obj if dist_cell is not None else None
    )


def replicate_all(cell: Cell) -> None:
    from dbcsr_tpu.ops.transform import replicate_all as ra

    cell.obj = ra(_mat(cell))


def sum_replicated(cell: Cell) -> None:
    # single-controller: replicas are already one buffer (parity no-op)
    _mat(cell)


# --- norms / io ------------------------------------------------------------

def frobenius_norm(cell: Cell) -> float:
    return float(dt.norm_frobenius(_mat(cell)))


def gershgorin_norm(cell: Cell) -> float:
    from dbcsr_tpu.ops.norms import norm_gershgorin

    return float(norm_gershgorin(_mat(cell)))


def maxabs(cell: Cell) -> float:
    return float(dt.norm_maxabs(_mat(cell)))


def norm_scalar(cell: Cell, which: int) -> float:
    from dbcsr_tpu.ops.norms import (
        norm_column,
        norm_frobenius,
        norm_gershgorin,
        norm_maxabs,
    )

    fns = {1: norm_frobenius, 2: norm_maxabs, 3: norm_gershgorin,
           4: norm_column}
    if which not in fns:
        raise DbcsrError(f"unknown norm kind {which}")
    return float(fns[which](_mat(cell)))


def checksum(cell: Cell, pos: int) -> float:
    from dbcsr_tpu.ops.io import checksum as cks

    return float(cks(_mat(cell), pos=bool(pos)))


def print_matrix(cell: Cell) -> None:
    from dbcsr_tpu.ops.io import print_matrix as pm

    pm(_mat(cell))


def print_block_sum(cell: Cell) -> None:
    from dbcsr_tpu.ops.io import print_block_sum as pbs

    pbs(_mat(cell))


def binary_write(cell: Cell, path: str) -> None:
    dt.binary_write(_mat(cell), path)


def binary_read(path: str) -> Cell:
    return Cell(dt.binary_read(path))


# ===========================================================================
# tensor C API (c_dbcsr_t_*, src/tensors/dbcsr_tensor.h)
# ===========================================================================

from dbcsr_tpu.tensors import (  # noqa: E402
    NDMapping,
    Tensor,
    TensorBuilder,
    TensorPGrid,
    contract as t_contract_py,
    copy_tensor,
    matrix_from_tensor,
    split_blocks,
    tensor_from_matrix,
)


def t_pgrid_create(ndim: int, dims_addr: int) -> Cell:
    dims = _i32buf(dims_addr, ndim) if dims_addr else None
    if dims is None or (dims <= 0).any():
        g = TensorPGrid.make(ndim)
    else:
        g = TensorPGrid.make(ndim, dims=tuple(int(x) for x in dims))
    return Cell(g)


def t_pgrid_destroy(cell: Cell) -> None:
    cell.obj = None


def t_distribution_new(
    pgrid_cell: Optional[Cell], ndim: int
) -> Cell:
    # distribution vectors are derived per tensor here (load-balanced
    # default, dbcsr_t_default_distvec); the handle carries the pgrid
    return Cell(pgrid_cell.obj if pgrid_cell is not None else None)


def t_distribution_destroy(cell: Cell) -> None:
    cell.obj = None


class _TensorState:
    """Tensor handle contents: finalized Tensor or TensorBuilder."""

    def __init__(self, obj, name: str):
        self.obj = obj
        self.name = name


def t_create_new(
    name: str,
    ndim: int,
    nblk_addr: int,
    sizes_addrs: List[int],
    map1: List[int],
    map2: List[int],
    data_type: int,
) -> Cell:
    nblk = _i32buf(nblk_addr, ndim)
    block_sizes = [
        _i32buf(sizes_addrs[d], int(nblk[d])) for d in range(ndim)
    ]
    mapping = NDMapping(ndim=ndim, map1=tuple(map1), map2=tuple(map2))
    tb = TensorBuilder(
        block_sizes, mapping, name=name,
        dtype=_DTYPE_CONST.get(data_type, np.float64),
    )
    return Cell(tb)


def t_create_template(template_cell: Cell, name: str, data_type: int) -> Cell:
    t = _tensor(template_cell)
    tb = TensorBuilder(
        list(t.block_sizes), t.mapping, name=name,
        dtype=_DTYPE_CONST.get(data_type, np.dtype(t.dtype).type),
    )
    return Cell(tb)


def t_create_matrix(mat_cell: Cell, name: str) -> Cell:
    return Cell(tensor_from_matrix(_mat(mat_cell), name=name or None))


def _tensor(cell: Cell) -> Tensor:
    o = cell.obj
    if isinstance(o, TensorBuilder):
        cell.obj = o.finalize()
        return cell.obj
    if not isinstance(o, Tensor):
        raise DbcsrError("handle is not a tensor")
    return o


def _tbld(cell: Cell) -> TensorBuilder:
    o = cell.obj
    if isinstance(o, TensorBuilder):
        return o
    if isinstance(o, Tensor):
        tb = TensorBuilder(
            list(o.block_sizes), o.mapping, name=o.name, dtype=o.dtype
        )
        for bi, blk in o.iter_blocks():
            tb.put_block(bi, blk)
        cell.obj = tb
        return tb
    raise DbcsrError("handle is not a tensor")


def t_destroy(cell: Cell) -> None:
    cell.obj = None


def t_finalize(cell: Cell) -> None:
    if isinstance(cell.obj, TensorBuilder):
        cell.obj = cell.obj.finalize()


def t_put_block(
    cell: Cell, typ: str, ndim: int, index_addr: int, sizes_addr: int,
    data_addr: int, summation: int,
) -> None:
    bi = tuple(int(x) for x in _i32buf(index_addr, ndim))
    shp = tuple(int(x) for x in _i32buf(sizes_addr, ndim))
    n = int(np.prod(shp)) if shp else 1
    blk = _buf(typ, data_addr, n).reshape(shp).astype(_DTYPES[typ]).copy()
    _tbld(cell).put_block(bi, blk, sum=bool(summation))


def t_get_block(
    cell: Cell, typ: str, ndim: int, index_addr: int, out_addr: int
) -> Tuple[int, List[int]]:
    bi = tuple(int(x) for x in _i32buf(index_addr, ndim))
    blk = _tensor(cell).get_block(bi)
    if blk is None:
        return (0, [0] * ndim)
    blk = np.asarray(blk, dtype=_DTYPES[typ])
    if out_addr:
        _buf(typ, out_addr, blk.size)[:] = blk.reshape(-1)
    return (1, list(blk.shape))


def t_reserve_blocks_index(
    cell: Cell, n: int, index_addrs: List[int]
) -> None:
    tb = _tbld(cell)
    ndim = len(index_addrs)
    cols = [_i32buf(index_addrs[d], n) for d in range(ndim)]
    for i in range(n):
        tb.reserve_block(tuple(int(cols[d][i]) for d in range(ndim)))


def t_reserve_blocks_template(cell_from: Cell, cell_to: Cell) -> None:
    src = _tensor(cell_from)
    tb = _tbld(cell_to)
    for bi in src.block_indices:
        tb.reserve_block(tuple(int(x) for x in bi))


def t_contract(
    typ: str, ar: float, ai: float, cell_a: Cell, cell_b: Cell,
    br: float, bi_: float, cell_c: Cell,
    contract_1: List[int], notcontract_1: List[int],
    contract_2: List[int], notcontract_2: List[int],
    map_1: List[int], map_2: List[int],
    filter_eps: float,
    bounds_1: Optional[List[int]] = None,
    bounds_2: Optional[List[int]] = None,
    bounds_3: Optional[List[int]] = None,
) -> float:
    """C <- alpha*contract(A,B) + beta*C; returns effective flops.

    ``bounds_1/2/3`` follow the reference's batched-contraction ranges
    (contracted dims / notcontract_1 / notcontract_2), flattened
    [lo0, hi0, lo1, hi1, ...] with 0-based half-open element ranges."""
    del map_1, map_2  # result layout is derived (optimize_dist analog)
    alpha = _scalar(typ, ar, ai)
    beta = _scalar(typ, br, bi_)
    c_in = cell_c.obj if isinstance(cell_c.obj, Tensor) else None

    def unflatten(dims, flat):
        if not flat:
            return None
        out = {}
        for i, d in enumerate(dims):
            lo, hi = int(flat[2 * i]), int(flat[2 * i + 1])
            if (lo, hi) != (0, -1):
                out[int(d)] = (lo, hi)
        return out or None

    bounds = {}
    b1 = unflatten(contract_1, bounds_1)
    b2 = unflatten(notcontract_1, bounds_2)
    b3 = unflatten(notcontract_2, bounds_3)
    if b1:
        bounds["contract"] = b1
    if b2:
        bounds["nc1"] = b2
    if b3:
        bounds["nc2"] = b3
    out = t_contract_py(
        alpha, _tensor(cell_a), _tensor(cell_b),
        contract_1=tuple(contract_1), notcontract_1=tuple(notcontract_1),
        contract_2=tuple(contract_2), notcontract_2=tuple(notcontract_2),
        beta=beta, c=c_in,
        filter_eps=None if filter_eps < 0 else filter_eps,
        bounds=bounds or None,
        return_flops=True,
    )
    if isinstance(out, tuple):
        out, fl = out
    else:
        fl = 0.0
    cell_c.obj = out
    return float(fl)


def t_contract_index(
    cell_a: Cell, cell_b: Cell, cell_c: Cell,
    contract_1: List[int], notcontract_1: List[int],
    contract_2: List[int], notcontract_2: List[int],
) -> int:
    """Number of result blocks the contraction would produce (the
    reference's index-only estimate, c_dbcsr_t_contract_index)."""
    a = _tensor(cell_a)
    b = _tensor(cell_b)
    out = t_contract_py(
        1.0, a, b,
        contract_1=tuple(contract_1), notcontract_1=tuple(notcontract_1),
        contract_2=tuple(contract_2), notcontract_2=tuple(notcontract_2),
    )
    del cell_c
    return int(out.nblks)


def t_contract_index_typed(
    typ: str, ar: float, ai: float, cell_a: Cell, cell_b: Cell,
    br: float, bi_: float, cell_c: Cell,
    contract_1: List[int], notcontract_1: List[int],
    contract_2: List[int], notcontract_2: List[int],
    filter_eps: float, result_index_addr: int, result_index_size: int,
) -> int:
    """Typed index-only contraction estimate (the reference's
    ``c_dbcsr_t_contract_index_${dsuffix}$``,
    ``src/tensors/dbcsr_tensor.h:82-87``): returns the result block count
    and writes the block coordinates (row-major ``[nblks, ndim_c]``,
    0-based) into the caller's int buffer, truncated to
    ``result_index_size`` ints."""
    # the result INDEX is dtype- and scale-independent; the typed alpha /
    # beta arguments exist only for reference signature parity
    del typ, ar, ai, br, bi_
    a = _tensor(cell_a)
    b = _tensor(cell_b)
    out = t_contract_py(
        1.0, a, b,
        contract_1=tuple(contract_1), notcontract_1=tuple(notcontract_1),
        contract_2=tuple(contract_2), notcontract_2=tuple(notcontract_2),
        filter_eps=None if filter_eps < 0 else filter_eps,
    )
    del cell_c
    idx = np.asarray(out.block_indices(), dtype=np.int32)
    if result_index_addr and result_index_size > 0:
        flat = idx.ravel()[: int(result_index_size)]
        if len(flat):
            _i32out(result_index_addr, len(flat))[:] = flat
    return int(out.nblks)


def t_copy(cell_from: Cell, cell_to: Cell, summation: int) -> None:
    src = _tensor(cell_from)
    dst = _tensor(cell_to)
    out = copy_tensor(src, mapping=dst.mapping)
    if summation:
        tb = _tbld(cell_to)
        for bi, blk in out.iter_blocks():
            tb.put_block(tuple(int(x) for x in bi), blk, sum=True)
        cell_to.obj = tb.finalize()
    else:
        cell_to.obj = out


def t_copy_matrix_to_tensor(mat_cell: Cell, t_cell: Cell) -> None:
    t_cell.obj = tensor_from_matrix(_mat(mat_cell))


def t_copy_tensor_to_matrix(t_cell: Cell, mat_cell: Cell) -> None:
    mat_cell.obj = matrix_from_tensor(_tensor(t_cell))


def t_filter(
    cell: Cell, eps: float, method: int = 1, use_absolute: int = 0
) -> None:
    """Frobenius block filter. ``method`` must be 1 (the reference's
    ``dbcsr_filter_frobenius``, its only supported method); passing
    ``use_absolute`` nonzero scales ``eps`` by the tensor's maxabs norm —
    the reference applies that scaling whenever the argument is PRESENT
    (``src/ops/dbcsr_operations.F:1912``)."""
    if method != 1:
        raise DbcsrError("only Frobenius filtering (method=1) is supported")
    t = _tensor(cell)
    # filter the folded 2-D representation: its blocks ARE the tensor
    # blocks element-for-element, so Frobenius norms agree at any rank
    m = t.matrix
    if use_absolute:
        eps = eps * dt.norm_maxabs(m)
    m = dt.filter_blocks(m, eps)
    # rebuild preserving the nd layout
    cell.obj = Tensor(
        name=t.name, block_sizes=t.block_sizes, mapping=t.mapping, matrix=m
    )


def t_scale(cell: Cell, typ: str, re: float, im: float) -> None:
    t = _tensor(cell)
    cell.obj = Tensor(
        name=t.name, block_sizes=t.block_sizes, mapping=t.mapping,
        matrix=dt.scale(t.matrix, _scalar(typ, re, im)),
    )


def t_set(cell: Cell, typ: str, re: float, im: float) -> None:
    from dbcsr_tpu.ops.arithmetic import set_value as sv

    t = _tensor(cell)
    cell.obj = Tensor(
        name=t.name, block_sizes=t.block_sizes, mapping=t.mapping,
        matrix=sv(t.matrix, _scalar(typ, re, im)),
    )


def t_clear(cell: Cell) -> None:
    from dbcsr_tpu.ops.arithmetic import zero

    t = _tensor(cell)
    cell.obj = Tensor(
        name=t.name, block_sizes=t.block_sizes, mapping=t.mapping,
        matrix=zero(t.matrix),
    )


class _TIter:
    def __init__(self, t: Tensor):
        self.blocks = list(t.iter_blocks())
        self.pos = 0


def t_iterator_start(cell: Cell) -> Cell:
    return Cell(_TIter(_tensor(cell)))


def t_iterator_blocks_left(it_cell: Cell) -> int:
    it = it_cell.obj
    return int(it.pos < len(it.blocks))


def t_iterator_next_block(
    it_cell: Cell, typ: str, out_addr: int
) -> Tuple[List[int], List[int]]:
    """(block index, block shape); copies data when out_addr != 0."""
    it = it_cell.obj
    bi, blk = it.blocks[it.pos]
    it.pos += 1
    blk = np.asarray(blk, dtype=_DTYPES[typ])
    if out_addr:
        _buf(typ, out_addr, blk.size)[:] = blk.reshape(-1)
    return (list(int(x) for x in bi), list(blk.shape))


def t_iterator_stop(it_cell: Cell) -> None:
    it_cell.obj = None


# --- tensor info -----------------------------------------------------------

def t_ndims(cell: Cell) -> int:
    return _tensor(cell).ndim


def t_dims(cell: Cell) -> List[int]:
    return [int(x) for x in _tensor(cell).shape]


def t_nblks_total(cell: Cell, dim: int) -> int:
    return int(_tensor(cell).nblk_per_dim[dim])


def t_nblks_local(cell: Cell, dim: int) -> int:
    return int(_tensor(cell).nblk_per_dim[dim])


def t_max_nblks_local(cell: Cell) -> int:
    return int(max(_tensor(cell).nblk_per_dim))


def t_get_num_blocks(cell: Cell) -> int:
    return int(_tensor(cell).nblks)


def t_get_num_blocks_total(cell: Cell) -> int:
    return int(_tensor(cell).nblks)


def t_get_nze(cell: Cell) -> int:
    return int(_tensor(cell).matrix.index.nelems)


def t_get_nze_total(cell: Cell) -> int:
    return int(_tensor(cell).matrix.index.nelems)


def t_get_stored_coordinates(cell: Cell, ndim: int, index_addr: int) -> int:
    t = _tensor(cell)
    bi = tuple(int(x) for x in _i32buf(index_addr, ndim))
    rows, cols = t.mapping.fold(
        np.asarray([bi], dtype=np.int64),
        np.asarray([len(b) for b in t.block_sizes], dtype=np.int64),
    )
    m = t.matrix
    if m.dist is None:
        return 0
    from dbcsr_tpu.ops.io import get_stored_coordinates as gsc

    v = gsc(m, int(rows[0]), int(cols[0]))
    return -1 if v is None else int(v)


def t_get_mapping_info(cell: Cell) -> Tuple[List[int], List[int]]:
    mp = _tensor(cell).mapping
    return (list(mp.map1), list(mp.map2))


def t_ndims_matrix_row(cell: Cell) -> int:
    return len(_tensor(cell).mapping.map1)


def t_ndims_matrix_column(cell: Cell) -> int:
    return len(_tensor(cell).mapping.map2)


def t_get_nd_index(cell: Cell) -> List[int]:
    return [int(x) for x in _tensor(cell).shape]


def t_get_nd_index_blk(cell: Cell) -> List[int]:
    return [int(x) for x in _tensor(cell).nblk_per_dim]


def t_split_blocks(cell: Cell, ndim: int, factors_addr: int) -> None:
    t = _tensor(cell)
    facs = _i32buf(factors_addr, ndim)
    new_sizes = []
    for d in range(ndim):
        f = max(int(facs[d]), 1)
        out = []
        for s in t.block_sizes[d]:
            s = int(s)
            base = s // f
            rests = s - base * f
            parts = [base + (1 if i < rests else 0) for i in range(f)]
            out.extend(p for p in parts if p > 0)
        new_sizes.append(np.asarray(out, dtype=np.int32))
    cell.obj = split_blocks(t, new_sizes)


def t_batched_contract_init(cell: Cell) -> Cell:
    from dbcsr_tpu.tensors import BatchedContract

    del cell
    return Cell(BatchedContract())


def t_batched_contract_finalize(state_cell: Cell) -> None:
    if state_cell.obj is not None:
        state_cell.obj.finalize()
        state_cell.obj = None


def t_get_info(cell: Cell) -> Tuple[int, List[int], List[int], int]:
    t = _tensor(cell)
    return (
        t.ndim,
        [int(x) for x in t.shape],
        [int(x) for x in t.nblk_per_dim],
        _CONST_OF_DTYPE[np.dtype(t.dtype)],
    )


def t_get_data_p(cell: Cell, typ: str, out_addr: int, n: int) -> int:
    flat = _tensor(cell).matrix.flat_host().astype(_DTYPES[typ])
    if out_addr:
        _buf(typ, out_addr, min(n, flat.size))[:] = flat[:n]
    return int(flat.size)
