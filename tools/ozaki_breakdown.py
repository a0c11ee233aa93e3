#!/usr/bin/env python
"""Phase breakdown of the fused ozaki-panel f64 path on the banded
roofline workload: slicing pre-pass vs kernel vs f64 assembly — decides
where the remaining headroom toward the 150 GFLOP/s banded-f64 target
lives (window 2026-08-19 measured the composed path at 75.1 GFLOP/s).

Usage: python tools/ozaki_breakdown.py [rows]
"""
import json
import sys
import time
from functools import partial

import _bootstrap  # noqa: F401

import numpy as np


def _marg(loop, args, n_lo=5, n_hi=25, reps=5):
    import jax
    import jax.numpy as jnp

    def run(n):
        t0 = time.perf_counter()
        out = loop(*args, n)
        _ = float(jnp.asarray(out).ravel()[0])
        return time.perf_counter() - t0

    run(n_lo)
    run(n_hi)
    lo = float(np.median([run(n_lo) for _ in range(reps)]))
    hi = float(np.median([run(n_hi) for _ in range(reps)]))
    return max((hi - lo) / (n_hi - n_lo), 1e-9)


def main(rows=40000):
    import jax
    import jax.numpy as jnp

    import dbcsr_tpu as dt
    from dbcsr_tpu.block.bcsr import BCSRMatrix
    from dbcsr_tpu.block.index import build_index
    from dbcsr_tpu.block.store import store_layout
    from dbcsr_tpu.block.tileops import valid_mask
    from dbcsr_tpu.mm.ozaki_panel import (
        N_SLICES,
        _global_scales,
        _ozaki_panel_launch,
        _slice_scaled,
        plan_ozaki_panel,
    )
    from dbcsr_tpu.mm.tileplan import plan_tile_stacks_stores

    dt.init_lib()
    rng = np.random.default_rng(0)
    rbs = dt.random_block_sizes(rows, [5, 13, 23], rng)
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
    tp = plan_tile_stacks_stores(
        lay.tile_coords, (lay.ntr, lay.ntc), lay.tile_coords,
        (lay.ntr, lay.ntc),
    )
    plan = plan_ozaki_panel(tp.stack, tp.n_c_tiles, lay.n_tiles,
                            lay.n_tiles)
    assert plan is not None
    rows_t = jnp.asarray(lay.tile_coords[:, 0].astype(np.int64))
    cols_t = jnp.asarray(lay.tile_coords[:, 1].astype(np.int64))
    ntr, ntc = lay.ntr, lay.ntc
    from dbcsr_tpu.mm.plan import symbolic_product

    eff = symbolic_product(idx, False, idx, False).eff_flops

    # --- phase 1: scales + slicing (per operand) -----------------------
    @partial(jax.jit, static_argnames="n")
    def loop_slice(d, n):
        def body(t, carry):
            d, acc = carry
            sa = _global_scales(d, rows_t, n_seg=ntr, axis=-1)
            sl = _slice_scaled(d, jnp.take(sa, rows_t, axis=0), axis=-1)
            return (d + sl[0, 0, 0, 0].astype(jnp.float64) * 1e-30,
                    acc + sl.reshape(-1)[1].astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, (d, jnp.float32(0)))[1]

    per_slice = _marg(loop_slice, (data,))
    print(json.dumps({"phase": "scale+slice one operand",
                      "ms": round(per_slice * 1e3, 2)}))

    # --- phase 2: kernel on pre-sliced inputs ---------------------------
    sa = _global_scales(data, rows_t, n_seg=ntr, axis=-1)
    sb = _global_scales(data, cols_t, n_seg=ntc, axis=-2)
    a_sl = _slice_scaled(data, jnp.take(sa, rows_t, axis=0), axis=-1)
    b_sl = _slice_scaled(data, jnp.take(sb, cols_t, axis=0), axis=-2)
    pargs = (
        jnp.asarray(plan.gstart), jnp.asarray(plan.a_lo),
        jnp.asarray(plan.a_nch), jnp.asarray(plan.b_lo),
        jnp.asarray(plan.b_nch), jnp.asarray(plan.obounds),
        jnp.asarray(plan.entries),
    )

    @partial(jax.jit, static_argnames="n")
    def loop_kernel(a_sl, b_sl, n):
        def body(t, carry):
            a_sl, acc = carry
            s, es, ee = _ozaki_panel_launch(
                a_sl, b_sl, *pargs,
                n_groups=plan.n_groups, c_win=plan.c_win,
                a_cap=plan.a_cap, b_cap=plan.b_cap, chunk=plan.chunk,
                tile=128, n_c_tiles=plan.n_c_tiles, interpret=False,
                loaded_tiles=plan.loaded_tiles,
            )
            bump = (s.reshape(-1)[0] * 1e-30).astype(jnp.bfloat16)
            return (a_sl.at[0, 0, 0, 0].add(bump), acc + s.reshape(-1)[1])

        return jax.lax.fori_loop(0, n, body, (a_sl, jnp.float32(0)))[1]

    per_kernel = _marg(loop_kernel, (a_sl, b_sl))
    hw = 2.0 * 36 * len(tp.stack) * 128**3
    print(json.dumps({
        "phase": "fused kernel (36 pair dots + cascade)",
        "ms": round(per_kernel * 1e3, 2),
        "tflops_hw": round(hw / per_kernel / 1e12, 1),
    }))

    # --- phase 3: f64 assembly + unscale --------------------------------
    s0, es0, ee0 = _ozaki_panel_launch(
        a_sl, b_sl, *pargs,
        n_groups=plan.n_groups, c_win=plan.c_win, a_cap=plan.a_cap,
        b_cap=plan.b_cap, chunk=plan.chunk, tile=128,
        n_c_tiles=plan.n_c_tiles, interpret=False,
        loaded_tiles=plan.loaded_tiles,
    )
    keys = tp.c_tile_keys.astype(np.int64)
    cc = np.stack([keys // ntc, keys % ntc], axis=1)
    sa_c = jnp.take(sa, jnp.asarray(cc[:, 0]), axis=0)
    sb_c = jnp.take(sb, jnp.asarray(cc[:, 1]), axis=0)

    @partial(jax.jit, static_argnames="n")
    def loop_asm(s, es, ee, n):
        def body(t, carry):
            s, acc = carry
            tot = (
                s.astype(jnp.float64) + es.astype(jnp.float64)
                + ee.astype(jnp.float64)
            ) * sa_c[:, :, None] * sb_c[:, None, :]
            return (s + tot.reshape(-1)[0].astype(jnp.float32) * 1e-30,
                    acc + tot.reshape(-1)[1].astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, (s, jnp.float32(0)))[1]

    per_asm = _marg(loop_asm, (s0, es0, ee0))
    print(json.dumps({"phase": "f64 assemble+unscale",
                      "ms": round(per_asm * 1e3, 2)}))
    total = 2 * per_slice + per_kernel + per_asm
    print(json.dumps({
        "phase": "sum of phases (2x slice + kernel + assemble)",
        "ms": round(total * 1e3, 2),
        "eff_gflops": round(eff / total / 1e9, 1),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40000)
