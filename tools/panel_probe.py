#!/usr/bin/env python
"""On-chip panel-kernel knob probe on the bench.py `banded` workload.

Measures the engine-level steady-state rate (bench.py methodology) of the
panel kernel across its launch knobs (unroll, bf16 slabs, window/cache
geometry) against the flat stack kernel, printing one JSON line per
variant. Run on the real chip; used to pick the tuned-table entries and
to verify the VERDICT r2 banded bar (>=1.3 TFLOP/s effective).

Usage: python tools/panel_probe.py [quick]
"""
import _bootstrap  # noqa: F401  (repo-root sys.path + JAX_PLATFORMS honor)
import json
import sys

import numpy as np


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    import jax
    import jax.numpy as jnp

    import dbcsr_tpu as dt
    from dbcsr_tpu.autotune import steady_state_time
    from dbcsr_tpu.block.bcsr import BCSRMatrix
    from dbcsr_tpu.block.index import build_index
    from dbcsr_tpu.block.store import store_layout
    from dbcsr_tpu.block.tileops import valid_mask
    from dbcsr_tpu.core.config import config_override
    from dbcsr_tpu.mm.engine import build_multiply_executor

    dt.init_lib(enable_x64=False)
    dt.set_config(matmul_precision="default")

    # exactly the bench.py banded workload
    rng = np.random.default_rng(0)
    rbs = dt.random_block_sizes(40000, [5, 13, 23], rng)
    n = len(rbs)
    i = np.repeat(np.arange(n, dtype=np.int64), 25)
    j = i + np.tile(np.arange(-12, 13, dtype=np.int64), n)
    keep = (j >= 0) & (j < n) & (rng.random(len(j)) < 0.5)
    idx, _ = build_index(i[keep], j[keep], rbs, rbs)
    lay = store_layout(idx, 128)
    data = jax.random.normal(
        jax.random.PRNGKey(0), (lay.n_tiles, 128, 128), jnp.float32
    ) * valid_mask(idx, 128)
    a = BCSRMatrix(name="A", index=idx, data=data)
    b = BCSRMatrix(name="B", index=idx, data=data * 0.5)

    variants = [
        # label, config overrides
        ("flat_bf16_e4", dict(mm_driver="stack", stack_e_batch=4)),
        ("panel_base", dict(mm_driver="panel")),
        ("panel_u4", dict(mm_driver="panel", panel_unroll=4)),
        ("panel_bf16", dict(mm_driver="panel", panel_bf16_inputs=True)),
        ("panel_u4_bf16", dict(mm_driver="panel", panel_unroll=4,
                               panel_bf16_inputs=True)),
        ("panel_u8_bf16", dict(mm_driver="panel", panel_unroll=8,
                               panel_bf16_inputs=True)),
        ("panel_u4_bf16_c64", dict(mm_driver="panel", panel_unroll=4,
                                   panel_bf16_inputs=True,
                                   panel_cache=64)),
        ("panel_u4_bf16_w32", dict(mm_driver="panel", panel_unroll=4,
                                   panel_bf16_inputs=True,
                                   panel_c_win=32, panel_cache=96,
                                   panel_chunk=16)),
        ("panel_u4_bf16_ch16", dict(mm_driver="panel", panel_unroll=4,
                                    panel_bf16_inputs=True,
                                    panel_chunk=16)),
        # k-run fusion (mm/panel.py): R consecutive (A,B) pairs per MXU
        # issue over flat transposed-A / col-major-B slabs
        ("panelrun_r2", dict(mm_driver="panel", panel_runlen=2)),
        ("panelrun_r3", dict(mm_driver="panel", panel_runlen=3)),
        ("panelrun_r4", dict(mm_driver="panel", panel_runlen=4)),
        ("panelrun_r3_bf16", dict(mm_driver="panel", panel_runlen=3,
                                  panel_bf16_inputs=True)),
        ("panelrun_r3_bf16_c64", dict(mm_driver="panel", panel_runlen=3,
                                      panel_bf16_inputs=True,
                                      panel_cache=64)),
        ("panelrun_r3_w8", dict(mm_driver="panel", panel_runlen=3,
                                panel_c_win=8)),
        ("panelrun_r6_bf16", dict(mm_driver="panel", panel_runlen=6,
                                  panel_bf16_inputs=True)),
        # round-4 large-envelope frontier: the old cache<=48-f32 ceiling
        # was XLA's DEFAULT ~32MiB scoped-vmem stack, not the chip (v5e:
        # 128 MiB/core); the kernel now requests its own limit
        # (panel._vmem_limit_bytes) and big windows cut bench-shape plan
        # traffic 0.538 (c_win16) -> 0.451 (c_win32) -> 0.324 (c_win64)
        ("panel_w32_c192", dict(mm_driver="panel", panel_c_win=32,
                                panel_cache=192, panel_chunk=16)),
        ("panel_w64_c320", dict(mm_driver="panel", panel_c_win=64,
                                panel_cache=320, panel_chunk=16)),
        ("panel_w64_c320_u4", dict(mm_driver="panel", panel_c_win=64,
                                   panel_cache=320, panel_chunk=16,
                                   panel_unroll=4)),
        ("panel_w64_bf16", dict(mm_driver="panel", panel_c_win=64,
                                panel_cache=320, panel_chunk=16,
                                panel_bf16_inputs=True)),
        ("panelrun_r3_w32_c192", dict(mm_driver="panel", panel_runlen=3,
                                      panel_c_win=32, panel_cache=192,
                                      panel_chunk=16)),
        ("panelrun_r3_w64_bf16", dict(mm_driver="panel", panel_runlen=3,
                                      panel_c_win=64, panel_cache=320,
                                      panel_chunk=16,
                                      panel_bf16_inputs=True)),
    ]
    if quick:
        variants = variants[:5]

    results = {}
    for label, ov in variants:
        try:
            with config_override(**ov):
                fn, c_index, eff = build_multiply_executor("N", "N", a, b)
                from dbcsr_tpu.mm.engine import last_panel_plan_kind

                kind = last_panel_plan_kind()
                per = steady_state_time(fn, (a.data, b.data))
            gflops = eff / per / 1e9
            results[label] = round(gflops, 1)
            print(json.dumps({"variant": label, "ms": round(per * 1e3, 3),
                              "gflops": round(gflops, 1),
                              "plan": kind}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": label,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
    best = max(results, key=results.get) if results else None
    print(json.dumps({"best": best, "gflops": results.get(best),
                      "bar_1300_met": bool(results.get(best, 0) >= 1300)}))


if __name__ == "__main__":
    main()
