"""Example 3: the reference's canonical workload — 1000x1000 matrices with
uniform 5x5 blocks at ~10% occupancy (``examples/dbcsr_example_3.F:89-167``),
multiplied with filtering; then the plan-once executor for iterative reuse.
"""
import time

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import dbcsr_tpu as dt
from dbcsr_tpu.mm.engine import build_multiply_executor


def main():
    dt.init_lib()
    rng = np.random.default_rng(0)
    sizes = np.full(200, 5, dtype=np.int32)  # 200 x 5 = 1000

    a = dt.random_matrix(sizes, sizes, 0.10, rng, dtype=np.float64, name="A")
    b = dt.random_matrix(sizes, sizes, 0.10, rng, dtype=np.float64, name="B")

    c, flops = dt.multiply("N", "N", 1.0, a, b, filter_eps=1e-12,
                           return_flops=True)
    print(f"C: {c.nblks} blocks, occupation {c.occupation():.3f}, "
          f"effective flops {flops:.3e}")

    # iterative callers plan once and execute many times
    fn, c_index, _ = build_multiply_executor("N", "N", a, b)
    out = fn(a.data, b.data)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(a.data, b.data)
    out.block_until_ready()
    dtm = (time.perf_counter() - t0) / 10
    print(f"steady-state multiply: {dtm * 1e3:.2f} ms "
          f"({flops / dtm / 1e9:.1f} effective GFLOP/s)")
    dt.finalize_lib()


if __name__ == "__main__":
    main()
