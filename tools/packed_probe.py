#!/usr/bin/env python
"""Measure the primitive rates a PACKED fine-block multiply path would be
built from — the round-5 answer to SURVEY §7's "multiple blocks per MXU
tile" risk (BASELINE configs 1-2, sparse5/mixed, stuck at 0.7-3% of peak
for three rounds on the dense-path density² bound).

Candidate formulation (the only one whose arithmetic intensity clears
HBM): per k-block GEMM — gather A's column-k blocks into an [M_k*s, s]
panel, B's row-k blocks into [s, N_k*s], multiply (every output element
is a useful C contribution, so eff == hw), scatter-add into C. Its
ceiling on v5e is ``peak * s/128`` (the MXU loads s of 128 K-lanes):
~7.2 TFLOP/s for s=5 — ~5x the measured sparse5 dense-path rate. Whether
that ceiling is reachable depends entirely on the data-movement
primitives, which this probe measures on the real chip:

  k5_gemm      — batched [G, M, 5] x [G, 5, N] GEMM rate (the compute
                 ceiling itself, no gathers)
  blockrow_gather — axis-0 jnp.take on [nblks, 5, 5] (block-array form)
                 and on [nblks, 32] row-padded form, GB/s
  extract_mm   — two-sided indicator-matmul extraction of 5x5 blocks out
                 of 128-tile stores (pack-by-MXU instead of gathers)
  tiny_einsum  — per-triple batched 5x5x5 einsum + f32 segment_sum (the
                 reference-style stack at TRUE block granularity)

Decision rule (recorded in ARCHITECTURE "fine-block density bound"):
adopt a packed driver iff the end-to-end composition of measured rates
beats the dense-path rate on sparse5's shape by >= 2x; otherwise record
the measured dead-end. Reference analog: the tuned parameter tables pick
per-(m,n,k) algorithms from measured sweeps
(``src/acc/libsmm_acc/tune/``).

Usage: python tools/packed_probe.py [s]   (block edge, default 5)
Prints one JSON line per probe.
"""
import json
import sys
import time
from functools import partial

import _bootstrap  # noqa: F401

import numpy as np


def _marginal(loop, n_lo=5, n_hi=45, reps=5):
    import jax
    import jax.numpy as jnp

    def run(n):
        t0 = time.perf_counter()
        out = loop(n)
        _ = float(jnp.asarray(out).ravel()[0])
        return time.perf_counter() - t0

    run(n_lo)
    run(n_hi)
    lo = float(np.median([run(n_lo) for _ in range(reps)]))
    hi = float(np.median([run(n_hi) for _ in range(reps)]))
    return max((hi - lo) / (n_hi - n_lo), 1e-9)


def main(s: int = 5):
    import os

    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)

    # workload scale mirrors bench sparse5: 1600 block rows, 10% occ.
    # DBCSR_BENCH_TINY=1 = CPU rehearsal of the code paths, never a rate.
    tiny = os.environ.get("DBCSR_BENCH_TINY") == "1"
    nblk = 160 if tiny else 1600
    occ = 0.10
    mk = max(int(nblk * occ), 4)  # blocks per k-panel (~160)
    nnz = int(nblk * nblk * occ)  # stored blocks (~256k)

    # ---- 1. k-GEMM ceiling: batched [G, mk*s, s] x [G, s, mk*s] -------
    G = 4 if tiny else 64  # k-blocks per batch chunk
    a_pan = jax.random.normal(key, (G, mk * s, s), jnp.float32)
    b_pan = jax.random.normal(key, (G, s, mk * s), jnp.float32)

    @partial(jax.jit, static_argnames="n")
    def loop_gemm(a, b, n):
        def body(i, carry):
            a, acc = carry
            p = jnp.einsum("gms,gsn->gmn", a, b)
            return (a + p[0, 0, 0] * 1e-30, acc + p[0, 0, 1])

        return jax.lax.fori_loop(0, n, body, (a, jnp.float32(0)))[1]

    per = _marginal(lambda n: loop_gemm(a_pan, b_pan, n))
    fl = 2.0 * G * (mk * s) ** 2 * s
    print(json.dumps({
        "probe": "k5_gemm", "s": s, "batch": G, "m": mk * s,
        "tflops": round(fl / per / 1e12, 3),
        "note": "compute ceiling of the per-k formulation (eff == hw)",
    }))

    # ---- 2. block-array gathers ---------------------------------------
    for form, shape, width in (
        ("blk_s_x_s", (nnz, s, s), s * s),
        ("blk_row32", (nnz, 32), 32),
        ("blk_row128", (nnz, 128), 128),
    ):
        src = jax.random.normal(key, shape, jnp.float32)
        idx = jnp.asarray(
            np.random.default_rng(0).integers(0, nnz, nnz, dtype=np.int32)
        )

        @partial(jax.jit, static_argnames="n")
        def loop_take(src, idx, n):
            def body(i, carry):
                src, acc = carry
                g = jnp.take(src, idx, axis=0)
                return (src + g.reshape(-1)[0] * 1e-30, acc + g.reshape(-1)[1])

            return jax.lax.fori_loop(0, n, body, (src, jnp.float32(0)))[1]

        per = _marginal(lambda n: loop_take(src, idx, n))
        bts = nnz * width * 4
        print(json.dumps({
            "probe": "blockrow_gather", "form": form,
            "GBps": round(bts / per / 1e9, 2),
            "ms": round(per * 1e3, 3),
        }))

    # ---- 3. extraction by indicator matmul ----------------------------
    # [nt, 128, 128] store -> per-tile [blocks_per_tile, s, s] via two
    # batched selection matmuls (sel_r [nt, bpt, s, 128], sel_c
    # [nt, 128, bpt, s] as dense bf16 constants)
    nt = 32 if tiny else 1024
    bpt = 62  # ~blocks landing in one 128-tile at sparse5 occupancy
    store = jax.random.normal(key, (nt, 128, 128), jnp.float32)
    sel_r = (jax.random.normal(key, (nt, bpt, s, 128), jnp.bfloat16) > 1.2)
    sel_r = sel_r.astype(jnp.bfloat16)
    sel_c = (jax.random.normal(key, (nt, 128, bpt, s), jnp.bfloat16) > 1.2)
    sel_c = sel_c.astype(jnp.bfloat16)

    @partial(jax.jit, static_argnames="n")
    def loop_ext(store, n):
        def body(i, carry):
            store, acc = carry
            t1 = jnp.einsum(
                "tbsk,tkl->tbsl", sel_r, store.astype(jnp.bfloat16),
            )
            # per-block column selection: b is a shared batch index
            d = jnp.einsum("tbsl,tlbu->tbsu", t1, sel_c)
            return (store + d.reshape(-1)[0] * 1e-30, acc + d.reshape(-1)[1])

        return jax.lax.fori_loop(0, n, body, (store, jnp.float32(0)))[1]

    per = _marginal(lambda n: loop_ext(store, n), n_lo=3, n_hi=13)
    fl = 2.0 * nt * bpt * s * 128 * 128 + 2.0 * nt * bpt * s * 128 * s
    print(json.dumps({
        "probe": "extract_mm", "tiles": nt, "blocks_per_tile": bpt,
        "tflops_hw": round(fl / per / 1e12, 3),
        "ms": round(per * 1e3, 3),
        "note": "pack 5x5 blocks out of 128-tile stores via MXU selection",
    }))

    # ---- 4. per-triple tiny einsum + segment_sum ----------------------
    S = 20_000 if tiny else 1_000_000  # triples per chunk (sparse5: ~41M total)
    ga = jax.random.normal(key, (S, s, s), jnp.float32)
    gb = jax.random.normal(key, (S, s, s), jnp.float32)
    nseg = 2_000 if tiny else 200_000
    seg = jnp.asarray(np.sort(
        np.random.default_rng(0).integers(0, nseg, S)
    ).astype(np.int32))

    @partial(jax.jit, static_argnames="n")
    def loop_tiny(ga, gb, n):
        def body(i, carry):
            ga, acc = carry
            p = jnp.einsum("sab,sbc->sac", ga, gb)
            c = jax.ops.segment_sum(p, seg, num_segments=nseg + 1)
            return (ga + c.reshape(-1)[0] * 1e-30, acc + c.reshape(-1)[1])

        return jax.lax.fori_loop(0, n, body, (ga, jnp.float32(0)))[1]

    per = _marginal(lambda n: loop_tiny(ga, gb, n), n_lo=2, n_hi=8)
    fl = 2.0 * S * s**3
    print(json.dumps({
        "probe": "tiny_einsum_segment", "triples": S,
        "gflops": round(fl / per / 1e9, 1),
        "ms": round(per * 1e3, 3),
        "note": "reference-style stack at true block granularity",
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
