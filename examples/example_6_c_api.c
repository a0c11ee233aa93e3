/* Example 6: using dbcsr_tpu from C through the embedding shim.
 *
 * The analog of linking the reference's C bindings (`src/dbcsr.h`,
 * exercised by `examples/dbcsr_example_3.cpp`). Build:
 *
 *   python -c "from dbcsr_tpu.capi import build_capi; print(build_capi())"
 *   gcc example_6_c_api.c <printed .so> -I../dbcsr_tpu/capi \
 *       -Wl,-rpath,<dir of .so> -o example_6
 *   PYTHONPATH=<repo>:<site-packages> ./example_6
 */
#include <stdio.h>
#include <stdlib.h>

#include "dbcsr_tpu.h"

#define CHECK(call)                                                  \
  do {                                                               \
    if (call) {                                                      \
      fprintf(stderr, "error: %s\n", c_dbcsr_last_error());          \
      return 1;                                                      \
    }                                                                \
  } while (0)

int main(void) {
  CHECK(c_dbcsr_init_lib());

  /* 10x10 block grid, 5x5 blocks, ~30% occupancy (dbcsr_example_3's
   * shape at toy size) */
  enum { NB = 10, BS = 5 };
  int sizes[NB];
  for (int i = 0; i < NB; ++i) sizes[i] = BS;

  int64_t bld, A, B, C;
  CHECK(c_dbcsr_create(&bld, "A", sizes, NB, sizes, NB));
  unsigned seed = 42;
  for (int i = 0; i < NB; ++i)
    for (int j = 0; j < NB; ++j) {
      seed = seed * 1103515245u + 12345u;
      if ((seed >> 16) % 10 < 3) {
        double blk[BS * BS];
        for (int k = 0; k < BS * BS; ++k) {
          seed = seed * 1103515245u + 12345u;
          blk[k] = ((seed >> 16) % 1000) / 1000.0 - 0.5;
        }
        CHECK(c_dbcsr_put_block_d(bld, i, j, blk, BS, BS, 0));
      }
    }
  CHECK(c_dbcsr_finalize_builder(bld, &A));
  CHECK(c_dbcsr_transpose(A, &B));

  /* C = A * A^T with on-the-fly filtering */
  CHECK(c_dbcsr_create_template(&C, "C", A, 0, 'N', dbcsr_type_real_8));
  CHECK(c_dbcsr_finalize(C));
  CHECK(c_dbcsr_multiply_d('N', 'N', 1.0, 0.0, A, B, 0.0, 0.0, C, 0, 1e-9,
                           NULL));

  int64_t nblks;
  double tr, fro, occ;
  CHECK(c_dbcsr_get_nblks(C, &nblks));
  CHECK(c_dbcsr_trace_d(C, &tr, NULL));
  CHECK(c_dbcsr_norm_frobenius(C, &fro));
  CHECK(c_dbcsr_get_occupation(C, &occ));
  printf("C = A*A^T: %lld blocks, occupation %.2f, trace %.6f, ||C||_F %.6f\n",
         (long long)nblks, occ, tr, fro);

  CHECK(c_dbcsr_release(A));
  CHECK(c_dbcsr_release(B));
  CHECK(c_dbcsr_release(C));
  CHECK(c_dbcsr_finalize_lib());
  return 0;
}
