"""Analytic ICI weak-scaling model for the distributed Cannon multiply.

BASELINE metric #2 (>=80% weak-scaling efficiency at 2+ hosts) cannot be
timed in this environment: there is one chip behind a tunnel, and the
virtual CPU mesh measures host orchestration on a machine whose memory
bandwidth swings ~20x run to run (docs/performance.md [PROXY] table,
round-3 verdict Weak #4). This tool supplies the complementary [DESIGN]
number: it builds the REAL tile-level Cannon plan for the weak-scaling
workload (pure host-side planning — ``mm/cannon.py:plan_cannon_tiled``,
no device needed) and computes per-tick compute and communication times
from published TPU constants, with Cannon's double buffering overlapping
the two — the same bound discipline as ARCHITECTURE's banded-kernel
roofline entries.

Model (per tick, per device):

  t_comm    = max(bytes_A_panel, bytes_B_panel) / ICI_ONEWAY_LINK_BW
              A panels shift along mesh rows (x links), B panels along
              mesh columns (y links): both are neighbor-only ppermutes on
              a torus, the two directions do not share a link, and each
              panel moves exactly once per tick (``mm/cannon.py``
              double-buffered loop; reference analog: the isend/irecv
              metronome, ``src/mm/dbcsr_mm_cannon.F:1344-1721``).
  t_compute = 2 * s_max * T^3 / PEAK
              s_max = padded stack entries the kernel executes per tick
              (the padded bound IS the device work; pad entries multiply
              zeros but still occupy the MXU).
  t_tick    = max(t_comm, t_compute)      (double-buffered overlap)
  efficiency = t_compute / t_tick         (vs the same per-device work
              with communication fully hidden — the weak-scaling ideal)

This ignores the one-time pack/unpack and the final 2.5D psum (both
amortized over ticks) and assumes the ppermute achieves link speed —
i.e. it is an UPPER bound on efficiency; the >=80% target is met in the
model iff it could be met in principle at these panel sizes.

Chip constants (bf16 peak, ICI one-way per link; from the public
"How to Scale Your Model" book, jax-ml.github.io/scaling-book):
  v5e: 197 TFLOP/s, 4.5e10 B/s (2D torus, 4 links/chip)
  v5p: 459 TFLOP/s, 9.0e10 B/s (3D torus, 6 links/chip)

Usage: python tools/ici_model.py [blocks_per_device] [occupancy] [f32|bf16]
Prints one JSON line per (chip, grid) combination.
"""
import json
import sys

import _bootstrap  # noqa: F401  (repo-root sys.path + JAX_PLATFORMS honor)

import numpy as np

CHIPS = {
    "v5e": {"peak_flops": 197e12, "ici_oneway_Bps": 4.5e10},
    "v5p": {"peak_flops": 459e12, "ici_oneway_Bps": 9.0e10},
}


def model(blocks_per_dev: int = 64, occupancy: float = 0.25,
          grids=(2, 4, 8), dtype_bytes: int = 4) -> list:
    """Plan the weak-scaling workload on p x p grids and evaluate the
    per-tick roofline. Same workload as tools/weak_scaling.py: uniform
    23-blocks, per-device block count held constant (nblk scales with
    sqrt(devices)).

    ``dtype_bytes`` sets the PANEL dtype: 4 = f32 at rest with
    matmul_precision="default" (the bench configuration — single MXU
    pass at bf16 internally, so the bf16 peak applies while HBM/ICI
    traffic is 4 bytes/elt), 2 = bf16 panels (panel_bf16_inputs — same
    peak, half the ICI traffic, so the comm/compute crossover halves).
    Keep bytes and peak consistent when adding other precisions:
    f32-HIGHEST would be peak/3 (bf16x3 passes)."""
    # pure host-side: index + plan math only, no jax, no device arrays
    from dbcsr_tpu.block.index import build_index
    from dbcsr_tpu.block.store import store_layout
    from dbcsr_tpu.mm.cannon import plan_cannon_tiled
    from dbcsr_tpu.mm.plan import symbolic_product

    tile = 128
    results = []
    for p in grids:
        n_dev = p * p
        nblk = int(blocks_per_dev * np.sqrt(n_dev))
        rng = np.random.default_rng(0)
        rbs = np.full(nblk, 23, dtype=np.int32)
        # uniform-random block pattern at the given occupancy (the
        # weak_scaling.py workload), as a bare index
        mask = rng.random((nblk, nblk)) < occupancy
        rows, cols = np.nonzero(mask)
        a_index, _ = build_index(rows, cols, rbs, rbs)
        a_lay = store_layout(a_index, tile)
        symb = symbolic_product(a_index, False, a_index, False)
        c_index, _ = build_index(symb.rows, symb.cols, rbs, rbs)
        # block-cyclic tile-aligned row/col -> grid bins, exactly what
        # tile_aligned_dist produces (host math only; no mesh/devices).
        # rowb is over the M tile-rows, colb/kb over the N/K tile-COLS —
        # equal here (square workload) but keep the roles straight for
        # non-square extensions (cf. tas/parallel.py's use of lb.ntc)
        rowb = np.arange(a_lay.ntr, dtype=np.int64) % p
        colb = np.arange(a_lay.ntc, dtype=np.int64) % p
        kb = np.arange(a_lay.ntc, dtype=np.int64) % p
        plan = plan_cannon_tiled(
            a_lay.tile_coords, a_lay.tile_coords,
            store_layout(c_index, tile),
            rowb, colb, kb, p, 1,
        )
        if plan is None:
            raise SystemExit(f"planning failed on {p}x{p}")
        bytes_a = plan.n_a * tile * tile * dtype_bytes
        bytes_b = plan.n_b * tile * tile * dtype_bytes
        flops_tick = 2.0 * plan.s_max * tile**3
        for chip, c in CHIPS.items():
            t_comm = max(bytes_a, bytes_b) / c["ici_oneway_Bps"]
            t_comp = flops_tick / c["peak_flops"]
            eff = t_comp / max(t_comp, t_comm)
            rec = {
                "chip": chip,
                "grid": f"{p}x{p}",
                "devices": n_dev,
                "nblk": nblk,
                "panel_dtype_bytes": dtype_bytes,
                "panel_MiB_a": round(bytes_a / 2**20, 2),
                "panel_MiB_b": round(bytes_b / 2**20, 2),
                "s_max_per_tick": int(plan.s_max),
                "t_comm_us": round(t_comm * 1e6, 1),
                "t_compute_us": round(t_comp * 1e6, 1),
                "weak_scaling_efficiency_model": round(eff, 3),
                "status": "DESIGN (analytic bound, not a timing)",
            }
            results.append(rec)
            print(json.dumps(rec))
    return results


if __name__ == "__main__":
    args = sys.argv[1:]
    kw = {}
    if len(args) >= 1:
        kw["blocks_per_dev"] = int(args[0])
    if len(args) >= 2:
        kw["occupancy"] = float(args[1])
    if len(args) >= 3:  # panel dtype: f32 | bf16
        kw["dtype_bytes"] = {"f32": 4, "bf16": 2}[args[2]]
    model(**kw)
