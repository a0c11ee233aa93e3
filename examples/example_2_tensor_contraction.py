"""Example 2: 3-index block-sparse tensor contraction.

Analog of the reference's tensor example usage
(``tests/dbcsr_tensor_unittest.F`` workloads): contract a rank-3 tensor
with a rank-2 tensor over one index, validated against a dense einsum.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import dbcsr_tpu as dt
from dbcsr_tpu.tensors import NDMapping, TensorBuilder, contract


def main():
    dt.init_lib()
    rng = np.random.default_rng(0)

    bs_i = np.array([3, 2], dtype=np.int32)
    bs_j = np.array([2, 2], dtype=np.int32)
    bs_k = np.array([4, 3], dtype=np.int32)
    bs_l = np.array([5], dtype=np.int32)

    # T[i,j,k], 60% occupied; folded with (i,j) as matrix rows
    tb = TensorBuilder([bs_i, bs_j, bs_k], NDMapping(3, (0, 1), (2,)),
                       name="T", dtype=np.float64)
    for bi in np.ndindex(2, 2, 2):
        if rng.random() < 0.6:
            shp = (bs_i[bi[0]], bs_j[bi[1]], bs_k[bi[2]])
            tb.put_block(bi, rng.standard_normal(shp))
    t = tb.finalize()

    mb = TensorBuilder([bs_k, bs_l], name="M", dtype=np.float64)
    for bi in np.ndindex(2, 1):
        mb.put_block(bi, rng.standard_normal((bs_k[bi[0]], bs_l[bi[1]])))
    m = mb.finalize()

    # C[i,j,l] = sum_k T[i,j,k] M[k,l]
    c = contract(
        1.0, t, m,
        contract_1=(2,), notcontract_1=(0, 1),
        contract_2=(0,), notcontract_2=(1,),
    )
    ref = np.einsum("ijk,kl->ijl", t.to_dense(), m.to_dense())
    err = np.abs(c.to_dense() - ref).max()
    print(f"contraction C[i,j,l]: shape={c.shape} blocks={c.nblks} "
          f"max_err={err:.2e}")
    dt.finalize_lib()


if __name__ == "__main__":
    main()
