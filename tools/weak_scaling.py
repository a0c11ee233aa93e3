"""Weak-scaling harness for the distributed multiply (BASELINE metric #2).

Runs the Cannon (square grids) or SUMMA (any grid) multiply on 1 device and
on the full mesh with the per-device problem size held constant, and
reports the weak-scaling efficiency (target: >= 80% at 2+ hosts).

On a single-chip environment this exercises the virtual CPU mesh
(set ``XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu``)
— the timing there measures the orchestration, not ICI; on a real pod slice
run it as-is under ``jax.distributed`` (init via ``dt.init_lib``).

Usage: python tools/weak_scaling.py [blocks_per_device] [reps]
"""
import os
import sys
import time

import _bootstrap  # noqa: F401  (repo-root sys.path + JAX_PLATFORMS honor)

import numpy as np


def run(blocks_per_dev: int = 64, reps: int = 5) -> dict:
    import jax

    import jax.numpy as jnp

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

    def bench(grid, nblk):
        rng = np.random.default_rng(0)
        rbs = np.full(nblk, 23, dtype=np.int32)
        a = dt.random_matrix(rbs, rbs, 0.25, rng, dtype=np.float32, name="A")
        b = dt.random_matrix(rbs, rbs, 0.25, rng, dtype=np.float32, name="B")
        dist = tile_aligned_dist(grid, rbs, rbs, a.tile)
        fn, _, fl = build_distributed_executor("N", "N", a, b, dist)
        out = fn(a.data, b.data)
        out.block_until_ready()  # plan + compile
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(a.data, b.data)
            out.block_until_ready()
            times.append(time.perf_counter() - t0)
        return float(np.min(times)), fl

    # per-device problem held constant: nblk scales with sqrt(devices)
    nblk_1 = blocks_per_dev
    nblk_n = int(blocks_per_dev * np.sqrt(n))
    g1 = ProcessGrid.make(1, 1, devices=devs[:1])
    gn = ProcessGrid.make(p, q, devices=devs)

    t1, fl1 = bench(g1, nblk_1)
    tn, fln = bench(gn, nblk_n)
    # weak scaling: ideal time_n == time_1 * (work_n / (n * work_1))
    ideal_tn = t1 * (fln / (n * fl1))
    eff = ideal_tn / tn if tn > 0 else 0.0
    virtual = devs[0].platform == "cpu"
    out = {
        "devices": n,
        "grid": [p, q],
        "t_1dev_s": t1,
        "t_ndev_s": tn,
        "flops_1": fl1,
        "flops_n": fln,
        "weak_scaling_efficiency": round(eff, 3),
        # an N-device CPU mesh timeshares ONE host's cores, so the
        # efficiency number only measures orchestration overhead there;
        # the >=80% BASELINE target applies to real chips over ICI
        "virtual_mesh": virtual,
    }
    print(out)
    return out


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    run(*args)
