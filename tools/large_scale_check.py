"""Large-scale smoke check: 100k-block-row banded BCSR multiply
(BASELINE config #5's single-chip form) — exercises the native planners,
store layout and engine at production scale and reports phase timings.

Usage: python tools/large_scale_check.py [nrows] [bandwidth]
"""
import os
import sys
import time

import _bootstrap  # noqa: F401  (repo-root sys.path + JAX_PLATFORMS honor)

import numpy as np


def run(nrows: int = 100000, bandwidth: int = 8) -> dict:
    import jax
    import jax.numpy as jnp

    import dbcsr_tpu as dt
    from dbcsr_tpu.block.bcsr import BCSRMatrix
    from dbcsr_tpu.block.index import build_index
    from dbcsr_tpu.block.store import store_layout
    from dbcsr_tpu.block.tileops import valid_mask
    from dbcsr_tpu.mm.engine import build_multiply_executor

    dt.init_lib(enable_x64=False)
    rng = np.random.default_rng(0)
    out = {}

    t0 = time.perf_counter()
    rbs = dt.random_block_sizes(nrows, [5, 13, 23], rng)
    n = len(rbs)
    rows, cols = [], []
    for i in range(n):
        for j in range(max(0, i - bandwidth), min(n, i + bandwidth + 1)):
            if rng.random() < 0.5:
                rows.append(i)
                cols.append(j)
    idx, _ = build_index(np.asarray(rows), np.asarray(cols), rbs, rbs)
    out["setup_s"] = round(time.perf_counter() - t0, 2)
    out["blocks"] = idx.nblks

    t0 = time.perf_counter()
    lay = store_layout(idx, 128)
    out["store_layout_s"] = round(time.perf_counter() - t0, 2)
    out["n_tiles"] = lay.n_tiles
    out["store_mb"] = round(lay.n_tiles * 128 * 128 * 4 / 1e6)

    # random data directly in store form (construction shortcut for scale)
    data = jax.random.normal(
        jax.random.PRNGKey(0), (lay.n_tiles, 128, 128), jnp.float32
    )
    data = (data * valid_mask(idx, 128)).block_until_ready()
    a = BCSRMatrix(name="A", index=idx, data=data)
    b = BCSRMatrix(name="B", index=idx, data=data * 0.5)

    t0 = time.perf_counter()
    c, fl = dt.multiply("N", "N", 1.0, a, b, return_flops=True)
    c.data.block_until_ready()
    out["first_multiply_s"] = round(time.perf_counter() - t0, 2)
    out["eff_flops"] = fl
    out["c_blocks"] = c.nblks

    t0 = time.perf_counter()
    fn, _, _ = build_multiply_executor("N", "N", a, b)
    o = fn(a.data, b.data)
    o.block_until_ready()
    out["executor_build_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    o = fn(a.data, b.data)
    o.block_until_ready()
    steady = time.perf_counter() - t0
    out["executor_steady_s"] = round(steady, 4)
    out["eff_tflops"] = round(fl / steady / 1e12, 2)
    print(out)
    return out


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    run(*args)
