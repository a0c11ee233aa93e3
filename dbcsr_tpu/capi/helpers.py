"""Python side of the C API shim (see ``capi.c`` / ``dbcsr_tpu.h``).

The C layer passes raw buffer ADDRESSES (int64) plus shapes; this module
marshals them to/from numpy and calls the public dbcsr_tpu API. It is the
analog of the reference's ``src/dbcsr_api_c.F`` glue (Fortran side of the
C bindings), with ctypes standing in for ISO_C_BINDING.
"""
from __future__ import annotations

import ctypes

import numpy as np

import dbcsr_tpu as dt
from dbcsr_tpu.capi.himpl import Cell, _mat


def _i32(addr: int, n: int) -> np.ndarray:
    buf = (ctypes.c_int32 * n).from_address(addr)
    return np.frombuffer(buf, dtype=np.int32).copy()


def _f64(addr: int, n: int) -> np.ndarray:
    buf = (ctypes.c_double * n).from_address(addr)
    return np.frombuffer(buf, dtype=np.float64)


def init_lib():
    dt.init_lib()


def finalize_lib():
    dt.finalize_lib()


def create(name: str, rs_addr: int, nbr: int, cs_addr: int, nbc: int):
    return Cell(dt.BCSRBuilder(
        _i32(rs_addr, nbr), _i32(cs_addr, nbc), name=name, dtype=np.float64
    ))


def put_block(builder, row: int, col: int, addr: int, m: int, n: int,
              sum: int):
    builder = builder.obj
    builder.put_block(
        row, col, _f64(addr, m * n).reshape(m, n).copy(), sum=bool(sum)
    )


def reserve_diag_blocks(builder):
    builder.obj.reserve_diag_blocks()


def finalize(builder):
    return Cell(builder.obj.finalize())


def get_block(matrix, row: int, col: int, out_addr: int):
    blk = _mat(matrix).get_block(row, col)
    if blk is None:
        return (0, 0, 0)
    blk = np.asarray(blk, dtype=np.float64)
    if out_addr:
        _f64(out_addr, blk.size)[:] = blk.reshape(-1)
    return (1, blk.shape[0], blk.shape[1])


def get_nblks(matrix) -> int:
    return int(_mat(matrix).nblks)


def get_occupation(matrix) -> float:
    return float(_mat(matrix).occupation())


def multiply(transa: str, transb: str, alpha: float, a, b, beta: float,
             c, filter_eps: float, retain_sparsity: int):
    return Cell(dt.multiply(
        transa, transb, alpha, _mat(a), _mat(b), beta,
        None if c is None else _mat(c),
        filter_eps=None if filter_eps < 0 else filter_eps,
        retain_sparsity=bool(retain_sparsity),
    ))


def add(alpha: float, a, beta: float, b):
    return Cell(dt.add(alpha, _mat(a), beta, _mat(b)))


def scale(a, alpha: float):
    return Cell(dt.scale(_mat(a), alpha))


def filter_blocks(a, eps: float):
    return Cell(dt.filter_blocks(_mat(a), eps))


def transpose(a):
    return Cell(dt.transpose(_mat(a)))


def trace(a) -> float:
    return float(dt.trace(_mat(a)))


def dot(a, b) -> float:
    return float(dt.dot(_mat(a), _mat(b)))


def norm_frobenius(a) -> float:
    return float(dt.norm_frobenius(_mat(a)))


def maxabs(a) -> float:
    return float(dt.norm_maxabs(_mat(a)))


def checksum(a) -> float:
    return float(dt.checksum(_mat(a)))


def binary_write(a, path: str):
    dt.binary_write(_mat(a), path)


def binary_read(path: str):
    return Cell(dt.binary_read(path))
