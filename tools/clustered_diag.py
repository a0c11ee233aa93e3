#!/usr/bin/env python
"""Diagnose the clustered↔banded gap (round-4 verdict Next #4).

RCM-recovered clustered numbering measured 788 GFLOP/s where the
natively-banded classes run 1.88-2.47 TFLOP/s on closely related
patterns. This tool answers, with numbers, WHICH of the candidate
explanations holds:

  (a) the recovered pattern's tile band is WIDER / less regular than the
      native band (pattern statistics: tile counts, bandedness feature,
      per-tile-row span distribution);
  (b) the workload resolves to a mis-tuned class (which tuned class the
      feature lookup picks, and with what launch knobs / plan kind);
  (c) the executor leaves a faster kernel on the table (on the chip:
      a mini-sweep over forced drivers on the SAME recovered pattern).

Host parts always run; the driver sweep needs the real chip (skipped
elsewhere). Workload generation mirrors ``bench.py clustered`` exactly
(24k rows, exp-decay chain couplings, scrambled then RCM-recovered).

Usage: python tools/clustered_diag.py [--sweep] [rows]
"""
import json
import sys
import time
from functools import partial

import _bootstrap  # noqa: F401

import numpy as np


def build_workloads(n_rows: int):
    import jax
    import jax.numpy as jnp

    import dbcsr_tpu as dt
    from dbcsr_tpu.block.bcsr import BCSRMatrix
    from dbcsr_tpu.block.index import build_index
    from dbcsr_tpu.block.store import store_layout
    from dbcsr_tpu.block.tileops import valid_mask
    from dbcsr_tpu.mm.reorder import locality_block_permutation

    rng = np.random.default_rng(0)
    rbs = dt.random_block_sizes(n_rows, [5, 13, 23], rng)
    n = len(rbs)
    dmax = 15
    i = np.repeat(np.arange(n, dtype=np.int64), 2 * dmax + 1)
    off = np.tile(np.arange(-dmax, dmax + 1, dtype=np.int64), n)
    j = i + off
    keep = (
        (j >= 0) & (j < n)
        & (rng.random(len(j)) < np.exp(-np.abs(off) / 4.0))
    )
    sig = rng.permutation(n).astype(np.int64)
    rbs_s = np.empty(n, np.int32)
    rbs_s[sig] = rbs

    def store_mat(rows, cols, sizes, name, scale=1.0):
        idx, _ = build_index(rows, cols, sizes, sizes)
        lay = store_layout(idx, 128)
        data = jax.random.normal(
            jax.random.PRNGKey(0), (lay.n_tiles, 128, 128), jnp.float32
        ) * scale * valid_mask(idx, 128)
        return BCSRMatrix(name=name, index=idx, data=data)

    sr, sc = sig[i[keep]], sig[j[keep]]
    a0 = store_mat(sr, sc, rbs_s, "A0")
    perm = locality_block_permutation(a0.index)
    assert perm is not None, "generator must produce a reorderable pattern"
    pm, _, _ = perm
    rbs_r = np.empty(n, np.int32)
    rbs_r[pm[sig]] = rbs
    a = store_mat(pm[sr], pm[sc], rbs_r, "A")
    b = store_mat(pm[sr], pm[sc], rbs_r, "B", 0.5)

    # the native-band comparison workload (bench.py banded, same row count)
    i2 = np.repeat(np.arange(n, dtype=np.int64), 25)
    j2 = i2 + np.tile(np.arange(-12, 13, dtype=np.int64), n)
    keep2 = (j2 >= 0) & (j2 < n) & (rng.random(len(j2)) < 0.5)
    an = store_mat(i2[keep2], j2[keep2], rbs, "Aband")
    return a, b, an


def pattern_stats(name: str, m) -> dict:
    from dbcsr_tpu.autotune import (
        coords_bandedness, nearest_class, workload_features, _cached_table,
    )

    lay = m.layout
    tc = lay.tile_coords.astype(np.int64)
    span = np.abs(tc[:, 0] - tc[:, 1])
    # per-tile-row width: how many tile-cols each tile-row touches
    widths = np.bincount(tc[:, 0], minlength=lay.ntr)
    feats = workload_features(m.index, m.index)
    table = _cached_table() if _cached_table else None
    hit = nearest_class(feats, table) if table else None
    rec = {
        "pattern": name,
        "n_tiles": int(lay.n_tiles),
        "tile_grid": [int(lay.ntr), int(lay.ntc)],
        "tile_fill": round(lay.n_tiles / (lay.ntr * lay.ntc), 4),
        "bandedness": round(
            coords_bandedness(tc[:, 0], tc[:, 1], max(lay.ntr, 1)), 4
        ),
        "tile_span_p50_p90_max": [
            int(np.percentile(span, 50)),
            int(np.percentile(span, 90)),
            int(span.max()),
        ],
        "tiles_per_row_p50_p90_max": [
            int(np.percentile(widths, 50)),
            int(np.percentile(widths, 90)),
            int(widths.max()),
        ],
        "features": [round(float(f), 4) for f in feats],
        "tuned_class": None if hit is None else [hit[0], round(hit[1], 3)],
    }
    print(json.dumps(rec))
    return rec


def sweep(a, b):
    """[CHIP] forced-driver mini-sweep on the recovered pattern."""
    import jax
    import jax.numpy as jnp

    from dbcsr_tpu.core.config import config_override
    from dbcsr_tpu.core.errors import DbcsrError
    from dbcsr_tpu.mm.engine import build_multiply_executor, last_panel_plan

    for driver in ("auto", "panel", "band", "grouped", "stack"):
        try:
            with config_override(mm_driver=driver):
                fn, c_index, eff = build_multiply_executor("N", "N", a, b)
                plan_kind = type(last_panel_plan()).__name__ if \
                    last_panel_plan() is not None else None

                @partial(jax.jit, static_argnames="n")
                def loop(ad, bd, n):
                    def body(t, carry):
                        ad, acc = carry
                        c = fn(ad, bd)
                        return (ad + c.reshape(-1)[0] * 1e-30,
                                acc + c.reshape(-1)[1])

                    return jax.lax.fori_loop(
                        0, n, body, (ad, jnp.float32(0))
                    )[1]

                def run(n):
                    t0 = time.perf_counter()
                    out = loop(a.data, b.data, n)
                    _ = float(jnp.asarray(out))
                    return time.perf_counter() - t0

                run(2)
                run(12)
                lo = float(np.median([run(2) for _ in range(3)]))
                hi = float(np.median([run(12) for _ in range(3)]))
                per = max((hi - lo) / 10, 1e-9)
                print(json.dumps({
                    "driver": driver,
                    "gflops": round(eff / per / 1e9, 1),
                    "ms": round(per * 1e3, 2),
                    "panel_plan": plan_kind,
                }))
        except DbcsrError as e:
            print(json.dumps({"driver": driver, "rejected": str(e)[:80]}))


def main():
    args = [a for a in sys.argv[1:]]
    do_sweep = "--sweep" in args
    if do_sweep:
        args.remove("--sweep")
    n_rows = int(args[0]) if args else 24000
    a, b, an = build_workloads(n_rows)
    pattern_stats("rcm_recovered", a)
    pattern_stats("native_band", an)
    if do_sweep:
        sweep(a, b)


if __name__ == "__main__":
    main()
