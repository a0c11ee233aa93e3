#!/usr/bin/env python
"""Headline benchmark: batched 23x23x23 block multiply throughput.

BASELINE.md target #1: >= 70% of MXU peak on 23-cubed block stacks.
Workload: dense-blocked BCSR matrices with uniform 23x23 blocks (128 block
rows/cols -> 2944x2944), C = A*B through the engine's plan-once executor
(``build_multiply_executor`` — the steady-state form every iterative
caller uses). Effective flops are counted at USER-BLOCK granularity
(2*sum(m*n*k) over block triples), exactly the reference's flop accounting
(``src/mm/dbcsr_mm.F`` flop counters).

Timing methodology (this chip sits behind a tunnel whose dispatch adds
~30ms and whose block_until_ready is a no-op): run the executor inside a
jitted dependent fori_loop at two trip counts, force a value readback, and
take the marginal time per iteration — pure device steady-state time.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = achieved effective GFLOP/s / (0.70 * chip peak GFLOP/s),
so >= 1.0 means the BASELINE target is met.
"""
import json
import time
from functools import partial

import numpy as np


def _chip_peak_flops() -> float:
    """Nominal dense matmul peak (bf16 MXU) per chip, by device kind."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = {
        "v6e": 918e12,
        "v6": 918e12,
        "v5p": 459e12,
        "v5 lite": 197e12,  # v5e
        "v5litepod": 197e12,
        "v4": 275e12,
    }
    for key, val in table.items():
        if key in kind:
            return val
    return 197e12  # conservative default


def main():
    import jax
    import jax.numpy as jnp

    import dbcsr_tpu as dt
    from dbcsr_tpu.mm.engine import build_multiply_executor

    dt.init_lib()
    # single-pass MXU precision for the throughput benchmark (documented
    # TPU-native tradeoff; 'highest' = bf16x3 is the accuracy default)
    dt.set_config(matmul_precision="default")

    rng = np.random.default_rng(0)
    nblk = 128
    rbs = np.full(nblk, 23, dtype=np.int32)
    a = dt.random_matrix(rbs, rbs, 1.0, rng, dtype=np.float32, name="A")
    b = dt.random_matrix(rbs, rbs, 1.0, rng, dtype=np.float32, name="B")

    fn, c_index, eff_flops = build_multiply_executor("N", "N", a, b)

    @partial(jax.jit, static_argnames="n")
    def loop(a_data, b_data, n):
        # C := A·B, A ← C each iteration (square dense-blocked pattern, so
        # C's store layout equals A's): the real iterative-caller shape
        # (SCF / matrix powers) and a true loop-carried dependency.
        def body(i, a_data):
            return fn(a_data, b_data)

        return jax.lax.fori_loop(0, n, body, a_data)

    def run(n):
        t0 = time.perf_counter()
        out = loop(a.data, b.data, n)
        _ = float(jnp.asarray(out).ravel()[0])  # force full execution
        return time.perf_counter() - t0

    # warm both trip counts (compile), then take medians; trip counts high
    # enough that the marginal time dwarfs tunnel dispatch jitter
    n_lo, n_hi = 10, 210
    run(n_lo)
    run(n_hi)
    lo = float(np.median([run(n_lo) for _ in range(5)]))
    hi = float(np.median([run(n_hi) for _ in range(5)]))
    per_iter = (hi - lo) / (n_hi - n_lo)

    gflops = eff_flops / per_iter / 1e9
    peak = _chip_peak_flops() / 1e9
    vs = gflops / (0.70 * peak)
    print(
        json.dumps(
            {
                "metric": "block23_mm_throughput",
                "value": round(gflops, 1),
                "unit": "GFLOP/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
