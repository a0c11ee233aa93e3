"""Kernel-level A/B bench: flat scalar-prefetch stack kernel vs the panel
(supertile A+B-caching slab-DMA) kernel, on the banded BASELINE shape.

Marginal-time methodology (see bench.py); run on the real chip.
Usage: python tools/bench_panel_kernel.py [nrows] [c_win] [cap] [chunk]
"""
import _bootstrap  # noqa: F401  (repo-root sys.path + JAX_PLATFORMS honor)
import sys
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import dbcsr_tpu as dt
    from dbcsr_tpu.block.index import build_index
    from dbcsr_tpu.block.store import store_layout
    from dbcsr_tpu.mm.tileplan import plan_tile_stacks_stores
    from dbcsr_tpu.mm.kernels import (
        tile_stack_matmul_pallas,
        tile_stack_matmul_xla,
    )
    from dbcsr_tpu.mm.panel import plan_panel_stack, tile_stack_matmul_panel

    nrows = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    c_win = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    rng = np.random.default_rng(0)
    rbs = dt.random_block_sizes(nrows, [5, 13, 23], rng)
    n = len(rbs)
    i = np.repeat(np.arange(n, dtype=np.int64), 25)
    j = i + np.tile(np.arange(-12, 13, dtype=np.int64), n)
    keep = (j >= 0) & (j < n) & (rng.random(len(j)) < 0.5)
    idx, _ = build_index(i[keep], j[keep], rbs, rbs)
    lay = store_layout(idx, 128)
    print(f"rows={n} tiles={lay.n_tiles}")
    tplan = plan_tile_stacks_stores(
        lay.tile_coords, (lay.ntr, lay.ntc), lay.tile_coords,
        (lay.ntr, lay.ntc),
    )
    S = len(tplan.stack)
    uniq_a = len(np.unique(tplan.stack[:, 1]))
    print(
        f"S={S} n_c={tplan.n_c_tiles} distinct a={uniq_a} "
        f"avg A reuse={S/max(uniq_a,1):.1f}"
    )
    pplan = plan_panel_stack(
        tplan.stack, tplan.n_c_tiles, lay.n_tiles, lay.n_tiles,
        c_win=c_win, a_cap=cap, b_cap=cap, chunk=chunk,
    )
    if pplan is None:
        raise SystemExit("panel plan inadmissible for this shape/caps")
    print(
        f"panel: groups={pplan.n_groups} loaded={pplan.loaded_tiles} "
        f"traffic_ratio={pplan.traffic_ratio:.2f} "
        f"(flat pays {2*S} input tiles)"
    )

    data = jax.random.normal(
        jax.random.PRNGKey(0), (lay.n_tiles, 128, 128), jnp.float32
    )
    b = data * 0.5
    hw_flops = 2.0 * S * 128**3

    def bench(fn_of_x, label):
        @partial(jax.jit, static_argnames="n")
        def loop(x, n):
            def body(i, x):
                out = fn_of_x(x)
                return x + out.reshape(-1)[0] * 1e-30

            return jax.lax.fori_loop(0, n, body, x)

        def run(n):
            t0 = time.perf_counter()
            out = loop(data, n)
            _ = float(jnp.asarray(out).ravel()[0])
            return time.perf_counter() - t0

        n_lo, n_hi = 5, 55
        run(n_lo); run(n_hi)
        lo = float(np.median([run(n_lo) for _ in range(5)]))
        hi = float(np.median([run(n_hi) for _ in range(5)]))
        per = (hi - lo) / (n_hi - n_lo)
        print(
            f"{label}: {per*1e3:.3f} ms/iter, hw {hw_flops/per/1e12:.2f} "
            f"TFLOP/s",
            flush=True,
        )
        return per

    # correctness first (f32 highest vs XLA twin)
    got = tile_stack_matmul_panel(
        data, b, tplan.stack, n_c_tiles=tplan.n_c_tiles, plan=pplan,
        precision="highest",
    )
    ref = tile_stack_matmul_xla(
        data, b, jnp.asarray(tplan.stack), n_c_tiles=tplan.n_c_tiles,
        precision="highest",
    )
    err = float(jnp.max(jnp.abs(got - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    print(f"panel vs xla maxdiff {err:.3e} (scale {scale:.1f})")
    assert err <= 1e-3 * max(scale, 1.0)

    bench(
        lambda x: tile_stack_matmul_pallas(
            x, b, tplan.stack, n_c_tiles=tplan.n_c_tiles,
            precision="default", e_batch=4,
        ),
        "flat f32 e4       ",
    )
    bf_a = data.astype(jnp.bfloat16)
    bf_b = b.astype(jnp.bfloat16)
    bench(
        lambda x: tile_stack_matmul_pallas(
            x.astype(jnp.bfloat16), bf_b, tplan.stack,
            n_c_tiles=tplan.n_c_tiles, precision="default",
            out_dtype=jnp.float32, e_batch=4,
        ),
        "flat bf16 e4      ",
    )
    bench(
        lambda x: tile_stack_matmul_panel(
            x, b, tplan.stack, n_c_tiles=tplan.n_c_tiles, plan=pplan,
            precision="default",
        ),
        f"panel f32 w{c_win} c{cap} k{chunk}",
    )
    # bf16 slabs halve the tile footprint, so a bigger cache fits the
    # VMEM budget (the autotune sweep pairs cache 64 with bf16 only);
    # fall back to the f32 plan if the bigger caps are inadmissible
    bf_cap = max(cap, 64)
    pplan2 = plan_panel_stack(
        tplan.stack, tplan.n_c_tiles, lay.n_tiles, lay.n_tiles,
        c_win=c_win, a_cap=bf_cap, b_cap=bf_cap, chunk=chunk,
    )
    if pplan2 is None:
        bf_cap, pplan2 = cap, pplan
    bench(
        lambda x: tile_stack_matmul_panel(
            x.astype(jnp.bfloat16), bf_b, tplan.stack,
            n_c_tiles=tplan.n_c_tiles, plan=pplan2, precision="default",
            out_dtype=jnp.float32,
        ),
        f"panel bf16 w{c_win} c{bf_cap} k{chunk}",
    )


if __name__ == "__main__":
    main()
