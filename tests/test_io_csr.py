"""Checkpoint I/O and CSR-conversion tests.

Mirrors the reference's ``dbcsr_test_binary_io`` (``src/ops/dbcsr_tests.F``)
and ``tests/dbcsr_test_csr_conversions.F``: random matrices round-trip
through the binary checkpoint and through scalar CSR, with and without
filtering.
"""
import io

import numpy as np
import pytest
import scipy.sparse as sp

import dbcsr_tpu as dt


def _rand(rng, occ=0.3, sym="N", dtype=np.float64):
    rbs = dt.random_block_sizes(20, [2, 3, 5], rng)
    cbs = rbs if sym != "N" else dt.random_block_sizes(17, [1, 4], rng)
    return dt.random_matrix(rbs, cbs, occ, rng, dtype=dtype, sym=sym)


def test_binary_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    m = _rand(rng)
    path = str(tmp_path / "m.dbcsr")
    dt.binary_write(m, path)
    m2 = dt.binary_read(path)
    assert m2.name == m.name
    assert m2.sym == m.sym
    assert m2.nblks == m.nblks
    np.testing.assert_array_equal(m2.index.col_idx, m.index.col_idx)
    np.testing.assert_allclose(
        np.asarray(m2.to_dense()), np.asarray(m.to_dense())
    )
    assert dt.checksum(m2) == pytest.approx(dt.checksum(m))


def test_binary_roundtrip_symmetric_complex(tmp_path):
    rng = np.random.default_rng(1)
    m = _rand(rng, sym="S", dtype=np.complex64)
    path = str(tmp_path / "m.dbcsr")
    dt.binary_write(m, path)
    m2 = dt.binary_read(path)
    assert m2.sym == "S"
    assert m2.dtype == m.dtype
    np.testing.assert_allclose(
        np.asarray(m2.to_dense()), np.asarray(m.to_dense())
    )


def test_binary_read_rejects_garbage(tmp_path):
    path = tmp_path / "junk.bin"
    path.write_bytes(b"not a checkpoint at all")
    with pytest.raises(Exception):
        dt.binary_read(str(path))


def test_csr_roundtrip():
    rng = np.random.default_rng(2)
    m = _rand(rng)
    csr = dt.to_csr(m)
    dense = np.asarray(m.to_dense())
    np.testing.assert_allclose(csr.toarray(), dense)
    # re-block: every occupied block recovered
    m2 = dt.from_csr(csr, m.row_block_sizes, m.col_block_sizes)
    np.testing.assert_allclose(np.asarray(m2.to_dense()), dense)


def test_csr_roundtrip_symmetric():
    rng = np.random.default_rng(3)
    m = _rand(rng, sym="S")
    dense = np.asarray(m.to_dense())
    np.testing.assert_allclose(dense, dense.T)  # sanity
    np.testing.assert_allclose(dt.to_csr(m).toarray(), dense)


def test_to_csr_filter_drops_small_blocks():
    rbs = np.array([2, 2], dtype=np.int32)
    big = np.full((2, 2), 10.0)
    tiny = np.full((2, 2), 1e-12)
    m = dt.BCSRMatrix.from_blocks(
        [0, 1], [0, 1], [big, tiny], rbs, rbs, dtype=np.float64
    )
    csr = dt.to_csr_filter(m, 1e-6)
    assert csr[0, 0] == 10.0
    assert csr[2, 2] == 0.0


def test_csr_write_format():
    csr = sp.csr_matrix(np.array([[1.5, 0.0], [0.0, -2.0]]))
    buf = io.StringIO()
    dt.csr_write(csr, buf)
    lines = buf.getvalue().strip().splitlines()
    assert lines[0] == "% 2 2 2"
    assert lines[1].split() == ["1", "1", "1.5"]
    assert lines[2].split() == ["2", "2", "-2"]


def test_get_info_and_stored_coordinates():
    rng = np.random.default_rng(5)
    m = _rand(rng)
    info = dt.get_info(m)
    assert info["nblks"] == m.nblks
    assert info["nfullrows"] == m.shape[0]
    assert 0.0 < info["occupation"] <= 1.0
    assert not info["distributed"]
    assert dt.get_stored_coordinates(m, 0, 0) is None

    from dbcsr_tpu.dist.distribution import block_cyclic_dist
    from dbcsr_tpu.dist.grid import ProcessGrid

    grid = ProcessGrid.make(1, 1)
    d = block_cyclic_dist(grid, m.nblkrows, m.nblkcols)
    dm = dt.distribute(m, d)
    assert dt.get_stored_coordinates(dm, 0, 0) == 0


def test_print_matrix_and_block_sum():
    rng = np.random.default_rng(4)
    m = _rand(rng, occ=0.2)
    buf = io.StringIO()
    dt.print_matrix(m, buf, max_blocks=3)
    out = buf.getvalue()
    assert m.name in out and "occupation" in out
    buf2 = io.StringIO()
    dt.print_block_sum(m, buf2)
    assert len(buf2.getvalue().splitlines()) == m.nblks
