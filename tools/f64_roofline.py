"""f64 roofline measurement (round-3 VERDICT item 6).

fp64 is the reference GPU backend's primary data type
(``/root/reference/src/acc/libsmm_acc/libsmm_acc.cpp:92-150``); TPUs have
no f64 MXU mode, so any f64 path here rides XLA's software emulation.
This tool measures, on the real chip:

  1. dense f64 matmul rate at several sizes — the HARDWARE ceiling for
     any f64 tile path (XLA's double-double emulation of the dot);
  2. dense f32 matmul rate at precision="highest" (6-pass bf16) — the
     ceiling for a hypothetical f32x2 split-precision path, whose THREE
     HIGHEST products per f64 product put its best case at 1/3 of this;
  3. the f64 tile-stack executor (the engine's XLA fallback) on the
     H2O-like 23-block class — the number docs/performance.md reports;
  4. the same workload with f32 storage at highest precision, the
     accuracy-trading alternative a user can select today.

Prints one JSON dict; paste the numbers into ARCHITECTURE.md "f64 on
TPU". Usage: python tools/f64_roofline.py [reps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def median_time(fn, reps=5):
    fn()  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def run(reps: int = 5) -> dict:
    import jax
    import jax.numpy as jnp

    import dbcsr_tpu as dt

    dt.init_lib(enable_x64=True)
    out = {"platform": jax.devices()[0].platform}

    # 1 + 2: dense matmul ceilings
    for n in (1024, 2048):
        for dtype, prec, key in (
            (jnp.float64, "highest", f"dense_f64_{n}"),
            (jnp.float32, "highest", f"dense_f32_highest_{n}"),
            (jnp.float32, "default", f"dense_f32_default_{n}"),
        ):
            x = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)), dtype)
            f = jax.jit(
                lambda a: jnp.matmul(
                    a, a, precision=jax.lax.Precision.HIGHEST
                    if prec == "highest" else jax.lax.Precision.DEFAULT,
                ).ravel()[0]
            )
            t = median_time(lambda: jax.block_until_ready(f(x)), reps)
            out[key] = round(2 * n**3 / t / 1e12, 2)  # TFLOP/s

    # 3 + 4: the stack executor on an H2O-like 23-block 20%-occupancy class
    from dbcsr_tpu.mm.engine import build_multiply_executor

    rng = np.random.default_rng(1)
    rbs = np.full(96, 23, dtype=np.int32)  # 2208 elements
    for dtype, key in (
        (np.float64, "stack_f64_h2o_tflops"),
        (np.float32, "stack_f32_highest_h2o_tflops"),
    ):
        a = dt.random_matrix(rbs, rbs, 0.2, rng, dtype=dtype, name="A")
        b = dt.random_matrix(rbs, rbs, 0.2, rng, dtype=dtype, name="B")
        from dbcsr_tpu.core.config import config_override

        with config_override(matmul_precision="highest"):
            fn, c_index, eff = build_multiply_executor("N", "N", a, b)
            t = median_time(
                lambda: jax.block_until_ready(fn(a.data, b.data)), reps
            )
        out[key] = round(eff / t / 1e12, 3)
        out[key.replace("_tflops", "_ms")] = round(t * 1e3, 3)

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    run(*[int(a) for a in sys.argv[1:]])
