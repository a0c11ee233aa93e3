#!/usr/bin/env python
"""Measure the f64 roofline on this chip (VERDICT r2 item 6).

TPU has no native f64 MXU path; XLA emulates f64 dots (multi-pass
split-precision). This tool pins down, with the marginal-time
methodology:

  1. dense f64 matmul hardware rate vs f32 (default/highest) — the
     emulation's achievable ceiling on this chip;
  2. the engine's f64 paths against that ceiling: dense-path multiply
     (H2O-like tile-dense) and the stack-XLA fallback (banded sparse);
  3. the df32 (double-float) alternative's bound: 3 f32 products at
     HIGHEST precision (error-compensated accumulation NOT included —
     this is an upper bound on any hi/lo Pallas scheme).

Prints JSON lines; the ARCHITECTURE "f64 on TPU" entry records the
results. Reference analog: fp64 is the reference GPU backend's primary
type (/root/reference/src/acc/libsmm_acc/libsmm_acc.cpp:92-150).
"""
import sys

import _bootstrap  # noqa: F401  (repo-root sys.path + JAX_PLATFORMS honor)
import json

import numpy as np


def main():
    import functools

    import jax
    import jax.numpy as jnp

    import dbcsr_tpu as dt
    from dbcsr_tpu.autotune import steady_state_time as _sst
    from dbcsr_tpu.core.config import config_override
    from dbcsr_tpu.mm.engine import build_multiply_executor

    # `quick`: small shapes + light timing loops — a CPU-feasible smoke of
    # every code path (the chip numbers come from the full run)
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    steady_state_time = (
        functools.partial(_sst, n_lo=2, n_hi=6, reps=2) if quick else _sst
    )

    dt.init_lib()  # x64 on

    n = 512 if quick else 2304  # 18 tiles of 128 (H2O padded dims)
    key = jax.random.PRNGKey(0)
    flops = 2.0 * n**3

    def rate(dtype, precision):
        x = jax.random.normal(key, (n, n), jnp.float32).astype(dtype)

        def fn(a):
            return jnp.matmul(a, a, precision=precision)

        per = steady_state_time(fn, (x,))
        return flops / per / 1e12

    for dtype, prec, label in [
        (jnp.float64, "highest", "dense_f64"),
        (jnp.float32, "highest", "dense_f32_highest"),
        (jnp.float32, "default", "dense_f32_default"),
        (jnp.bfloat16, "default", "dense_bf16"),
    ]:
        try:
            r = rate(dtype, prec)
            print(json.dumps({"kernel": label, "tflops_hw": round(r, 2)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"kernel": label,
                              "error": f"{type(e).__name__}: {e}"[:160]}),
                  flush=True)

    # df32 bound: hi/lo split, 3 products at f32-HIGHEST (no compensation)
    x = jax.random.normal(key, (n, n), jnp.float32)

    def df32(hi, lo):
        p = "highest"
        return (
            jnp.matmul(hi, hi, precision=p)
            + jnp.matmul(hi, lo, precision=p)
            + jnp.matmul(lo, hi, precision=p)
        )

    per = steady_state_time(df32, (x, x * 1e-8))
    print(json.dumps({"kernel": "df32_3prod_bound",
                      "tflops_hw": round(flops / per / 1e12, 2)}), flush=True)

    # true-f64 ozaki slice product (ops/f64_emu.py): exact bf16 slices,
    # S(S+1)/2 MXU passes + fused f64 combine — the engine's f64 default
    from dbcsr_tpu.ops.f64_emu import ozaki_matmul

    for s in (7, 6):
        try:
            xd = jax.random.normal(key, (n, n), jnp.float32).astype(
                jnp.float64
            )

            def oz(a_):
                return ozaki_matmul(a_, a_, n_slices=s)

            per = steady_state_time(oz, (xd,))
            print(json.dumps({"kernel": f"ozaki_dense_s{s}",
                              "tflops_hw": round(flops / per / 1e12, 2)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"kernel": f"ozaki_dense_s{s}",
                              "error": f"{type(e).__name__}: {e}"[:160]}),
                  flush=True)

    # engine f64 paths: tile-dense (H2O-like) and banded sparse, each
    # under both f64 methods (native XLA f64 vs ozaki slices)
    rng = np.random.default_rng(0)
    rbs = np.full(8 if quick else 96, 23, dtype=np.int32)  # tile-dense (H2O dims)
    for method in ("native", "ozaki"):
        try:
            a = dt.random_matrix(rbs, rbs, 0.8, rng, dtype=np.float64,
                                 name="A")
            b = dt.random_matrix(rbs, rbs, 0.8, rng, dtype=np.float64,
                                 name="B")
            with config_override(matmul_precision="highest",
                                 f64_method=method):
                fn, _, eff = build_multiply_executor("N", "N", a, b)
                per = steady_state_time(fn, (a.data, b.data))
            print(json.dumps({"kernel": f"engine_dense_f64_eff_{method}",
                              "tflops": round(eff / per / 1e12, 2)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"kernel": f"engine_dense_f64_eff_{method}",
                              "error": f"{type(e).__name__}: {e}"[:160]}),
                  flush=True)

    from dbcsr_tpu.block.bcsr import BCSRMatrix
    from dbcsr_tpu.block.index import build_index
    from dbcsr_tpu.block.store import store_layout
    from dbcsr_tpu.block.tileops import valid_mask

    rbs = dt.random_block_sizes(800 if quick else 40000, [5, 13, 23], rng)
    nb = len(rbs)
    i = np.repeat(np.arange(nb, dtype=np.int64), 25)
    j = i + np.tile(np.arange(-12, 13, dtype=np.int64), nb)
    keep = (j >= 0) & (j < nb) & (rng.random(len(j)) < 0.5)
    idx, _ = build_index(i[keep], j[keep], rbs, rbs)
    lay = store_layout(idx, 128)
    data = (
        jax.random.normal(jax.random.PRNGKey(0), (lay.n_tiles, 128, 128),
                          jnp.float32) * valid_mask(idx, 128)
    ).astype(jnp.float64)
    for method in ("native", "ozaki"):
        try:
            a = BCSRMatrix(name="A", index=idx, data=data)
            b = BCSRMatrix(name="B", index=idx, data=data * 0.5)
            with config_override(matmul_precision="highest",
                                 f64_method=method):
                fn, _, eff = build_multiply_executor("N", "N", a, b)
                per = steady_state_time(fn, (a.data, b.data))
            print(json.dumps({"kernel": f"engine_banded_f64_eff_{method}",
                              "gflops": round(eff / per / 1e9, 1),
                              "ms": round(per * 1e3, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"kernel": f"engine_banded_f64_eff_{method}",
                              "error": f"{type(e).__name__}: {e}"[:160]}),
                  flush=True)


if __name__ == "__main__":
    main()
