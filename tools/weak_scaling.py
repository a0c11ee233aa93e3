"""Weak-scaling harness for the distributed multiply (BASELINE metric #2).

Runs the Cannon (square grids) or SUMMA (any grid) multiply on 1 device
and on the full mesh with the per-device problem size held constant, and
reports the weak-scaling efficiency (target: >= 80% at 2+ hosts).

On a single-chip environment this exercises the virtual CPU mesh
(set ``XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu``)
— the timing there measures the orchestration, not ICI; on a real pod slice
run it as-is under ``jax.distributed`` (init via ``dt.init_lib``).

Measurement protocol (round 4 — the round-3 numbers had a 1.6× 2-run
spread): this host's memory bandwidth swings up to ~20× on a timescale
of seconds-to-minutes, so timing the 1-device baseline and the N-device
leg in two separate phases corrupts their RATIO with drift. Instead the
two executors are timed back-to-back within each of R rounds
(min-of-k inner reps per executor per round, to shed scheduler noise),
the efficiency is formed per-round from same-round times — slow drift
cancels in the ratio — and the report is the MEDIAN efficiency with the
IQR across rounds. Reference analog: the reference's perf driver
likewise reports mean/std over in-process repetitions
(tests/dbcsr_performance_multiply.F:452-640).

Usage: python tools/weak_scaling.py [blocks_per_device] [rounds] [reps]
"""
import sys
import time

import _bootstrap  # noqa: F401  (repo-root sys.path + JAX_PLATFORMS honor)

import numpy as np


def run(blocks_per_dev: int = 64, rounds: int = 7, reps: int = 3) -> dict:
    import jax

    import dbcsr_tpu as dt
    from dbcsr_tpu.dist.distribution import tile_aligned_dist
    from dbcsr_tpu.dist.grid import ProcessGrid

    dt.init_lib(enable_x64=False)
    devs = jax.devices()
    n = len(devs)
    p = int(np.sqrt(n))
    while p > 1 and n % p:
        p -= 1
    q = n // p

    from dbcsr_tpu.mm.engine import build_distributed_executor

    def build(grid, nblk):
        rng = np.random.default_rng(0)
        rbs = np.full(nblk, 23, dtype=np.int32)
        a = dt.random_matrix(rbs, rbs, 0.25, rng, dtype=np.float32, name="A")
        b = dt.random_matrix(rbs, rbs, 0.25, rng, dtype=np.float32, name="B")
        dist = tile_aligned_dist(grid, rbs, rbs, a.tile)
        fn, _, fl = build_distributed_executor("N", "N", a, b, dist)
        fn(a.data, b.data).block_until_ready()  # plan + compile
        return fn, (a.data, b.data), fl

    def time_min(fn, args):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(*args).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    # per-device problem held constant: nblk scales with sqrt(devices)
    g1 = ProcessGrid.make(1, 1, devices=devs[:1])
    gn = ProcessGrid.make(p, q, devices=devs)
    fn1, args1, fl1 = build(g1, blocks_per_dev)
    fnn, argsn, fln = build(gn, int(blocks_per_dev * np.sqrt(n)))

    effs, t1s, tns = [], [], []
    for _ in range(rounds):
        t1 = time_min(fn1, args1)   # back-to-back: drift cancels in
        tn = time_min(fnn, argsn)   # the same-round ratio below
        ideal_tn = t1 * (fln / (n * fl1))
        effs.append(ideal_tn / tn if tn > 0 else 0.0)
        t1s.append(t1)
        tns.append(tn)
    effs_a = np.asarray(effs)
    q25, q50, q75 = np.percentile(effs_a, [25, 50, 75])
    virtual = devs[0].platform == "cpu"
    out = {
        "devices": n,
        "grid": [p, q],
        "blocks_per_device": blocks_per_dev,
        "rounds": rounds,
        "reps_per_round": reps,
        "t_1dev_median_s": round(float(np.median(t1s)), 5),
        "t_ndev_median_s": round(float(np.median(tns)), 5),
        "flops_1": fl1,
        "flops_n": fln,
        "weak_scaling_efficiency_median": round(float(q50), 3),
        "efficiency_iqr": [round(float(q25), 3), round(float(q75), 3)],
        "efficiency_rounds": [round(float(e), 3) for e in effs],
        # an N-device CPU mesh timeshares ONE host's cores, so the
        # efficiency number only measures orchestration overhead there
        # (perfect timeshare = 1/N; report the xN-normalized view too);
        # the >=80% BASELINE target applies to real chips over ICI
        "virtual_mesh": virtual,
    }
    if virtual:
        out["efficiency_x_n_median"] = round(float(q50) * n, 3)
        out["efficiency_x_n_iqr"] = [
            round(float(q25) * n, 3), round(float(q75) * n, 3)
        ]
    print(out)
    return out


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    run(*args)
