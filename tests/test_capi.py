"""C API shim: compile the embedding library and a C driver program, run
the reference's C-binding usage pattern end to end (the analog of the
reference's C API smoke test, ``tests/dbcsr_test.cpp``)."""
import os
import shutil
import subprocess
import sys
import sysconfig

import numpy as np
import pytest

import dbcsr_tpu as dt
from dbcsr_tpu.capi import build_capi, header_path

pytestmark = pytest.mark.skipif(
    shutil.which("gcc") is None, reason="no C compiler"
)

C_PROGRAM = r"""
#include <stdio.h>
#include <stdlib.h>
#include "dbcsr_tpu.h"

#define CHECK(call)                                                   \
  do {                                                                \
    if (call) {                                                       \
      fprintf(stderr, "FAIL %s: %s\n", #call, c_dbcsr_last_error());  \
      return 1;                                                       \
    }                                                                 \
  } while (0)

int main(void) {
  CHECK(c_dbcsr_init_lib());

  int rbs[4] = {2, 3, 2, 3};
  int64_t bld_a, bld_b, A, B, C;
  CHECK(c_dbcsr_create(&bld_a, "A", rbs, 4, rbs, 4));
  CHECK(c_dbcsr_create(&bld_b, "B", rbs, 4, rbs, 4));
  /* deterministic blocks: a[i][j] = i + j/10 pattern per block */
  for (int i = 0; i < 4; ++i) {
    for (int j = 0; j < 4; ++j) {
      if ((i + j) % 2 == 0) {
        double blk[9];
        int m = rbs[i], n = rbs[j];
        for (int k = 0; k < m * n; ++k) blk[k] = 0.01 * (i + 1) + 0.001 * (j + 1) + 0.0001 * k;
        CHECK(c_dbcsr_put_block_d(bld_a, i, j, blk, m, n, 0));
        CHECK(c_dbcsr_put_block_d(bld_b, i, j, blk, m, n, 0));
      }
    }
  }
  CHECK(c_dbcsr_finalize_builder(bld_a, &A));
  CHECK(c_dbcsr_finalize_builder(bld_b, &B));

  int64_t nblks;
  CHECK(c_dbcsr_get_nblks(A, &nblks));
  printf("nblks_a %lld\n", (long long)nblks);

  /* round-3 info arrays (the reference's ${var}$ getters) */
  int rbsz[4], roff[4], prd[4], lrow[4];
  CHECK(c_dbcsr_get_row_blk_size(A, rbsz, 4));
  CHECK(c_dbcsr_get_row_blk_offset(A, roff, 4));
  CHECK(c_dbcsr_get_proc_row_dist(A, prd, 4));
  CHECK(c_dbcsr_get_local_rows(A, lrow, 4));
  int expoff[4] = {0, 2, 5, 7};
  for (int i = 0; i < 4; ++i) {
    if (rbsz[i] != rbs[i] || roff[i] != expoff[i] || prd[i] != 0 ||
        lrow[i] != i) {
      fprintf(stderr, "info arrays wrong at %d\n", i);
      return 1;
    }
  }

  /* reference-shaped v2 multiply: result goes INTO the C handle */
  double flop;
  CHECK(c_dbcsr_create_template(&C, "C", A, 0, 'N', dbcsr_type_real_8));
  CHECK(c_dbcsr_finalize(C));
  CHECK(c_dbcsr_multiply_d('N', 'T', 1.0, 0.0, A, B, 0.0, 0.0, C, 0, -1.0,
                           &flop));
  double tr, fro, cks;
  CHECK(c_dbcsr_trace_d(C, &tr, NULL));
  CHECK(c_dbcsr_norm_frobenius(C, &fro));
  CHECK(c_dbcsr_checksum(C, 0, &cks));
  printf("trace %.12e\n", tr);
  printf("frobenius %.12e\n", fro);
  printf("checksum %.12e\n", cks);
  if (!(flop > 0)) { fprintf(stderr, "no flops reported\n"); return 1; }

  /* block fetch: query dims then read */
  int m, n, found;
  CHECK(c_dbcsr_get_block_d(C, 0, 0, NULL, &m, &n, &found));
  if (!found) { fprintf(stderr, "block (0,0) missing\n"); return 1; }
  double *blk = (double *)malloc(sizeof(double) * m * n);
  CHECK(c_dbcsr_get_block_d(C, 0, 0, blk, &m, &n, &found));
  printf("c00 %.12e\n", blk[0]);
  free(blk);

  /* mutating add + scale + dot round trip (reference semantics) */
  int64_t D;
  CHECK(c_dbcsr_create_template(&D, "D", C, 0, 'N', dbcsr_type_real_8));
  CHECK(c_dbcsr_copy(D, C, "D"));
  CHECK(c_dbcsr_add_d(D, C, 1.0, 0.0, -0.5, 0.0)); /* D <- D - C/2 */
  CHECK(c_dbcsr_scale_d(D, 2.0, 0.0));             /* D <- 2D = C   */
  double dot_cd;
  CHECK(c_dbcsr_dot_d(C, D, &dot_cd, NULL));
  double fro2;
  CHECK(c_dbcsr_frobenius_norm(D, &fro2));
  if (!(fro2 > 0.999 * fro && fro2 < 1.001 * fro)) {
    fprintf(stderr, "2*(C - C/2) != C: %e vs %e\n", fro2, fro);
    return 1;
  }

  CHECK(c_dbcsr_release(A));
  CHECK(c_dbcsr_release(B));
  CHECK(c_dbcsr_release(C));
  CHECK(c_dbcsr_release(D));
  CHECK(c_dbcsr_finalize_lib());
  printf("OK\n");
  return 0;
}
"""


def _oracle():
    """The same computation through the Python API."""
    rbs = np.array([2, 3, 2, 3], dtype=np.int32)
    bld = dt.BCSRBuilder(rbs, rbs, dtype=np.float64)
    for i in range(4):
        for j in range(4):
            if (i + j) % 2 == 0:
                m, n = rbs[i], rbs[j]
                blk = (
                    0.01 * (i + 1) + 0.001 * (j + 1)
                    + 0.0001 * np.arange(m * n)
                ).reshape(m, n)
                bld.put_block(i, j, blk)
    a = bld.finalize()
    c = dt.multiply("N", "T", 1.0, a, a)
    return a, c


def test_capi_end_to_end(tmp_path):
    so = build_capi()
    if so is None:
        pytest.skip("could not build C shim (no shared libpython?)")
    src = tmp_path / "driver.c"
    src.write_text(C_PROGRAM)
    exe = tmp_path / "driver"
    subprocess.run(
        ["gcc", "-O1", str(src), so, f"-I{os.path.dirname(header_path())}",
         f"-Wl,-rpath,{os.path.dirname(so)}", "-o", str(exe)],
        check=True, capture_output=True,
    )
    env = dict(os.environ)
    # embedded interpreter: stdlib from the base python; packages from this
    # venv; the repo itself; deliberately NO sitecustomize pinning so jax
    # picks the CPU backend
    site = sysconfig.get_paths()["purelib"]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join([repo, site])
    env["JAX_PLATFORMS"] = "cpu"  # honored: no sitecustomize pin here
    out = subprocess.run(
        [str(exe)], capture_output=True, text=True, env=env, timeout=300
    )
    assert out.returncode == 0, out.stderr + out.stdout
    assert out.stdout.strip().endswith("OK"), out.stdout
    lines = dict(
        l.split() for l in out.stdout.strip().splitlines() if " " in l
    )

    a, c = _oracle()
    assert int(lines["nblks_a"]) == a.nblks
    np.testing.assert_allclose(float(lines["trace"]), dt.trace(c), rtol=1e-10)
    np.testing.assert_allclose(
        float(lines["frobenius"]), dt.norm_frobenius(c), rtol=1e-10
    )
    np.testing.assert_allclose(
        float(lines["checksum"]), dt.checksum(c), rtol=1e-10
    )
    np.testing.assert_allclose(
        float(lines["c00"]), np.asarray(c.get_block(0, 0))[0, 0], rtol=1e-10
    )
