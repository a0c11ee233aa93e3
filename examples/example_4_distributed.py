"""Example 4: distributed multiply over a device mesh.

Cannon ring-shift multiply on a square grid (with optional 2.5D layer axis)
and SUMMA on arbitrary grids. On a single chip this runs trivially; to see
real sharding locally, run with a virtual CPU mesh:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/example_4_distributed.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import dbcsr_tpu as dt
    from dbcsr_tpu.dist.distribution import tile_aligned_dist
    from dbcsr_tpu.dist.grid import ProcessGrid
    from dbcsr_tpu.mm.engine import build_distributed_executor

    dt.init_lib()
    n = len(jax.devices())
    p = int(np.sqrt(n))
    while p > 1 and n % (p * p):
        p -= 1

    rng = np.random.default_rng(0)
    rbs = dt.random_block_sizes(600, [5, 13, 23], rng)
    a = dt.random_matrix(rbs, rbs, 0.2, rng, dtype=np.float32, name="A")
    b = dt.random_matrix(rbs, rbs, 0.2, rng, dtype=np.float32, name="B")

    # square grid -> Cannon (ppermute ring shifts over ICI)
    grid = ProcessGrid.make(p, p)
    dist = tile_aligned_dist(grid, rbs, rbs, a.tile)
    c = dt.multiply("N", "N", 1.0, a, b, dist=dist, filter_eps=1e-9)
    err = np.abs(
        np.asarray(c.to_dense())
        - np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    ).max()
    print(f"Cannon on {p}x{p}: C blocks={c.nblks}, max err={err:.2e}")

    # steady-state distributed executor (plan once)
    fn, c_index, fl = build_distributed_executor("N", "N", a, b, dist)
    out = fn(a.data, b.data)
    out.block_until_ready()
    print(f"distributed executor: eff flops/mult {fl:.3e}")

    # non-square grid -> SUMMA (all_gather panels)
    if n >= 2:
        q = 2 if n % 2 == 0 else 1
        grid2 = ProcessGrid.make(n // q, q)
        dist2 = tile_aligned_dist(grid2, rbs, rbs, a.tile)
        c2 = dt.multiply("N", "N", 1.0, a, b, dist=dist2)
        err2 = np.abs(np.asarray(c2.to_dense()) - np.asarray(c.to_dense())).max()
        print(f"SUMMA on {n // q}x{q}: max diff vs Cannon = {err2:.2e}")

    dt.finalize_lib()


if __name__ == "__main__":
    main()
