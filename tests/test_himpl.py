"""Python-level sweep of the reference-parity C API implementation
(`capi/himpl.py`): exercises the mutating-handle surface directly, without
the C layer, so the full function set stays covered on every CPU run
(the C drivers in test_capi_v2 cover the ABI/marshalling layer)."""
import ctypes

import numpy as np
import pytest

import dbcsr_tpu as dt
from dbcsr_tpu.capi import himpl as H


def _addr(arr):
    return arr.ctypes.data


def _mk(typ="d", sym="N", n=4):
    rbs = np.array([2, 3, 2, 3][:n], dtype=np.int32)
    cell = H.create_new(
        "m", None, sym, _addr(rbs), n, _addr(rbs), n,
        {"s": 1, "d": 3, "c": 5, "z": 7}[typ],
    )
    dt_np = H._DTYPES[typ]
    rng = np.random.default_rng(0)
    for i in range(n):
        for j in range(i if sym != "N" else 0, n):
            m, k = int(rbs[i]), int(rbs[j])
            blk = rng.standard_normal((m, k))
            if typ in ("z", "c"):
                blk = blk + 1j * rng.standard_normal((m, k))
            blk = np.ascontiguousarray(blk.astype(dt_np))
            H.put_block2d(cell, typ, i, j, _addr(blk), m, k, 0)
    H.finalize(cell)
    return cell, rbs


@pytest.mark.parametrize("typ", ["d", "s", "z", "c"])
def test_himpl_typed_roundtrip(typ):
    cell, rbs = _mk(typ)
    m = H._mat(cell)
    dm = np.asarray(m.to_dense())
    # info surface
    assert H.get_data_type(cell) == {"s": 1, "d": 3, "c": 5, "z": 7}[typ]
    assert H.nblkrows_total(cell) == 4
    assert H.nfullrows_total(cell) == int(rbs.sum())
    assert H.valid_index(cell) == 1
    assert H.get_matrix_type(cell) == "N"
    # trace/dot vs dense
    tr = H.trace(cell)
    assert tr == pytest.approx(complex(np.trace(dm)), rel=1e-5)
    d = H.dot(cell, cell)
    assert d == pytest.approx(complex(np.vdot(dm, dm)), rel=1e-5)
    # mutating multiply into a template-created C
    c_cell = H.create_template(cell, "C", None, "N", 0)
    H.finalize(c_cell)
    fl = H.multiply(typ, "N", "T", 1.0, 0.0, cell, cell, 0.0, 0.0, c_cell,
                    0, -1.0)
    assert fl > 0
    ref = dm @ (dm.T if typ in ("d", "s") else dm.T)
    got = np.asarray(H._mat(c_cell).to_dense())
    tol = 1e-4 if typ in ("s", "c") else 1e-10
    np.testing.assert_allclose(got, ref, atol=tol * max(1, abs(ref).max()))
    # mutating scale + add
    H.scale(c_cell, typ, 2.0, 0.0)
    H.add(c_cell, c_cell, typ, 0.5, 0.0, 0.0, 0.0)  # C <- 0.5*C
    got2 = np.asarray(H._mat(c_cell).to_dense())
    np.testing.assert_allclose(got2, ref, atol=2 * tol * max(1, abs(ref).max()))


def test_himpl_diag_and_vectors():
    cell, rbs = _mk("d")
    n = int(rbs.sum())
    dm = np.asarray(H._mat(cell).to_dense())
    out = np.zeros(n, dtype=np.float64)
    H.get_diag(cell, "d", _addr(out), n)
    np.testing.assert_allclose(out, np.diag(dm))
    newdiag = np.arange(1.0, n + 1.0)
    H.set_diag(cell, "d", _addr(newdiag), n)
    np.testing.assert_allclose(
        np.diag(np.asarray(H._mat(cell).to_dense())), newdiag
    )
    H.add_on_diag(cell, "d", 1.0, 0.0)
    np.testing.assert_allclose(
        np.diag(np.asarray(H._mat(cell).to_dense())), newdiag + 1.0
    )
    vec = np.linspace(1.0, 2.0, n)
    before = np.asarray(H._mat(cell).to_dense())
    H.scale_by_vector(cell, "d", _addr(vec), n, "right")
    np.testing.assert_allclose(
        np.asarray(H._mat(cell).to_dense()), before * vec[None, :]
    )


def test_himpl_copy_into_existing_keeps_pattern():
    rbs = np.array([2, 3, 2, 3], dtype=np.int32)
    # A: diagonal blocks only
    a_cell = H.create_new("A", None, "N", _addr(rbs), 4, _addr(rbs), 4, 3)
    rng = np.random.default_rng(1)
    for i in range(4):
        s = int(rbs[i])
        blk = np.ascontiguousarray(rng.standard_normal((s, s)))
        H.put_block2d(a_cell, "d", i, i, _addr(blk), s, s, 0)
    H.finalize(a_cell)
    # B: blocks (0,0) [shared with A] and (1,3) [absent in A]
    b_cell = H.create_template(a_cell, "B", None, "N", 3)
    blk = np.ones((2, 2), dtype=np.float64)
    H.put_block2d(b_cell, "d", 0, 0, _addr(blk), 2, 2, 0)
    blk2 = np.ascontiguousarray(np.full((3, 3), 7.0))
    H.put_block2d(b_cell, "d", 1, 3, _addr(blk2), 3, 3, 0)
    H.finalize(b_cell)
    nb_before = H.get_num_blocks(b_cell)
    H.copy_into_existing(b_cell, a_cell)
    b = H._mat(b_cell)
    assert b.nblks == nb_before  # pattern retained
    a = H._mat(a_cell)
    np.testing.assert_allclose(
        np.asarray(b.get_block(0, 0)), np.asarray(a.get_block(0, 0))
    )
    # block (1,3) exists in B only -> zeroed values, still present
    assert np.allclose(np.asarray(b.get_block(1, 3)), 0.0)


def test_himpl_iterators_and_misc():
    cell, rbs = _mk("d")
    it = H.iterator_start(cell)
    count = 0
    while H.iterator_blocks_left(it):
        r, c, sz = H.iterator_next_block_index(it)
        count += 1
    assert count == H.get_num_blocks(cell)
    H.iterator_stop(it)
    # filter / hadamard / triu / clear / init_random / function_of_elements
    H.filter_matrix(cell, 1e-12)
    other, _ = _mk("d")
    prod = H.create_template(cell, "P", None, "N", 3)
    H.hadamard_product(cell, other, prod)
    H.triu(prod)
    H.function_of_elements(prod, 1, 0, 0, 0)  # tanh
    H.clear(prod)
    assert H.frobenius_norm(prod) == 0.0
    H.init_random(cell, 1)
    assert H.get_num_blocks(cell) > 0
    # transforms
    t = H.transposed(cell)
    np.testing.assert_allclose(
        np.asarray(H._mat(t).to_dense()),
        np.asarray(H._mat(cell).to_dense()).T,
    )
    # norms by kind
    for kind in (1, 2, 3, 4):
        assert H.norm_scalar(cell, kind) >= 0
    assert H.checksum(cell, 0) > 0
    H.setname(cell, "renamed")
    assert H.get_name(cell) == "renamed"


def test_himpl_tensor_surface():
    bs_i = np.array([2, 3], dtype=np.int32)
    bs_k = np.array([2, 2], dtype=np.int32)
    nblk = np.array([2, 2], dtype=np.int32)
    t_cell = H.t_create_new(
        "T", 2, _addr(nblk),
        [_addr(bs_i), _addr(bs_k)], [0], [1], 3,
    )
    blk = np.ascontiguousarray(np.arange(4, dtype=np.float64).reshape(2, 2))
    idx = np.array([0, 0], dtype=np.int32)
    shp = np.array([2, 2], dtype=np.int32)
    H.t_put_block(t_cell, "d", 2, _addr(idx), _addr(shp), _addr(blk), 0)
    H.t_finalize(t_cell)
    assert H.t_ndims(t_cell) == 2
    assert H.t_get_num_blocks(t_cell) == 1
    out = np.zeros(4, dtype=np.float64)
    found, shape = H.t_get_block(t_cell, "d", 2, _addr(idx), _addr(out))
    assert found == 1 and shape == [2, 2]
    np.testing.assert_allclose(out.reshape(2, 2), blk)
    # scale + nze + info
    H.t_scale(t_cell, "d", 3.0, 0.0)
    found, _ = H.t_get_block(t_cell, "d", 2, _addr(idx), _addr(out))
    np.testing.assert_allclose(out.reshape(2, 2), 3.0 * blk)
    nd, dims, nblks, dtp = H.t_get_info(t_cell)
    assert nd == 2 and dtp == 3


def test_himpl_infovar_arrays():
    """Round-3 info getters: the reference's c_dbcsr_get_${var}$ family
    (dbcsr.h:282-287)."""
    cell, rbs = _mk("d")
    n = len(rbs)
    out = np.zeros(n, dtype=np.int32)
    H.get_infovar(cell, "row_blk_size", _addr(out), n)
    np.testing.assert_array_equal(out, rbs)
    H.get_infovar(cell, "col_blk_size", _addr(out), n)
    np.testing.assert_array_equal(out, rbs)
    offs = np.concatenate(([0], np.cumsum(rbs[:-1]))).astype(np.int32)
    H.get_infovar(cell, "row_blk_offset", _addr(out), n)
    np.testing.assert_array_equal(out, offs)
    H.get_infovar(cell, "col_blk_offset", _addr(out), n)
    np.testing.assert_array_equal(out, offs)
    H.get_infovar(cell, "local_rows", _addr(out), n)
    np.testing.assert_array_equal(out, np.arange(n, dtype=np.int32))
    H.get_infovar(cell, "local_cols", _addr(out), n)
    np.testing.assert_array_equal(out, np.arange(n, dtype=np.int32))
    H.get_infovar(cell, "proc_row_dist", _addr(out), n)
    np.testing.assert_array_equal(out, np.zeros(n, dtype=np.int32))
    H.get_infovar(cell, "proc_col_dist", _addr(out), n)
    np.testing.assert_array_equal(out, np.zeros(n, dtype=np.int32))
    # short buffer: only min(size, len) entries written
    short = np.full(n, -1, dtype=np.int32)
    H.get_infovar(cell, "row_blk_size", _addr(short), 2)
    np.testing.assert_array_equal(short[:2], rbs[:2])
    assert (short[2:] == -1).all()
    with pytest.raises(Exception):
        H.get_infovar(cell, "bogus", _addr(out), n)


def _mk_rank2_tensor(name, bs_a, bs_b, blocks, dtype_const=3):
    nblk = np.array([len(bs_a), len(bs_b)], dtype=np.int32)
    cell = H.t_create_new(
        name, 2, _addr(nblk), [_addr(bs_a), _addr(bs_b)], [0], [1],
        dtype_const,
    )
    for (i, j), blk in blocks.items():
        idx = np.array([i, j], dtype=np.int32)
        shp = np.array(blk.shape, dtype=np.int32)
        blk = np.ascontiguousarray(blk.astype(np.float64))
        H.t_put_block(cell, "d", 2, _addr(idx), _addr(shp), _addr(blk), 0)
    H.t_finalize(cell)
    return cell


def test_himpl_typed_contract_index():
    """c_dbcsr_t_contract_index_<t>: block count + coordinates of the
    result index (reference dbcsr_tensor.h:82-87)."""
    rng = np.random.default_rng(3)
    bs_i = np.array([2, 3], dtype=np.int32)
    bs_k = np.array([2, 2], dtype=np.int32)
    bs_j = np.array([3, 2], dtype=np.int32)
    a_blocks = {
        (i, k): rng.standard_normal((bs_i[i], bs_k[k]))
        for i in range(2) for k in range(2)
    }
    b_blocks = {
        (k, j): rng.standard_normal((bs_k[k], bs_j[j]))
        for k in range(2) for j in range(2)
    }
    a_cell = _mk_rank2_tensor("A", bs_i, bs_k, a_blocks)
    b_cell = _mk_rank2_tensor("B", bs_k, bs_j, b_blocks)
    c_cell = _mk_rank2_tensor("C", bs_i, bs_j, {})
    ridx = np.full(16, -7, dtype=np.int32)
    nblks = H.t_contract_index_typed(
        "d", 1.0, 0.0, a_cell, b_cell, 0.0, 0.0, c_cell,
        [1], [0], [0], [1], -1.0, _addr(ridx), 16,
    )
    assert nblks == 4  # full 2x2 result pattern
    got = set(map(tuple, ridx[: 2 * nblks].reshape(nblks, 2).tolist()))
    assert got == {(0, 0), (0, 1), (1, 0), (1, 1)}
    # buffer truncation honored
    short = np.full(3, -7, dtype=np.int32)
    nblks2 = H.t_contract_index_typed(
        "d", 1.0, 0.0, a_cell, b_cell, 0.0, 0.0, c_cell,
        [1], [0], [0], [1], -1.0, _addr(short), 3,
    )
    assert nblks2 == 4  # full count even when the buffer truncates
    # exactly result_index_size ints written: the first 3 of the
    # row-major (row, col) coordinate stream (0,0), (0,1), ...
    assert short.tolist() == [0, 0, 0]


def test_himpl_typed_filter():
    """c_dbcsr_t_filter_<t>: Frobenius-only, use_absolute scales eps by
    the tensor maxabs norm (reference dbcsr_operations.F:1910-1912)."""
    bs = np.array([2, 2], dtype=np.int32)
    blocks = {
        (0, 0): np.full((2, 2), 10.0),
        (1, 1): np.full((2, 2), 1e-6),
    }
    cell = _mk_rank2_tensor("F", bs, bs, blocks)
    H.t_filter(cell, 1e-3, 1, 0)  # absolute threshold: drops tiny block
    assert H.t_get_num_blocks(cell) == 1
    # relative mode: eps * maxabs(=10) -> 1e-4*10 = 1e-3 drops the tiny
    cell2 = _mk_rank2_tensor("F2", bs, bs, blocks)
    H.t_filter(cell2, 1e-4, 1, 1)
    assert H.t_get_num_blocks(cell2) == 1
    # huge relative eps drops everything except nothing above it
    cell3 = _mk_rank2_tensor("F3", bs, bs, blocks)
    H.t_filter(cell3, 1e-9, 1, 0)  # below both norms: keeps both
    assert H.t_get_num_blocks(cell3) == 2
    with pytest.raises(Exception):
        H.t_filter(cell, 1e-3, 2, 0)  # only Frobenius supported
