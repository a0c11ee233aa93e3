"""Autotuning: sweep engine/kernel configs per workload class, store the
winners in a JSON parameter table keyed by device kind.

Analog of the reference's autotuning pipeline
(``src/acc/libsmm_acc/tune/tune_setup.py`` + per-GPU
``parameters/parameters_*.json``, selection logic
``kernels/smm_acc_predict.py``): the reference sweeps CUDA launch
parameters per (m,n,k) triplet and records GFLOP/s; here the sweep covers
the TPU engine's knobs — hardware tile size, driver choice, dense-path
threshold, Pallas chunk size, matmul precision — per *workload class*
(block-size profile × occupancy bucket), because the two-level design makes
per-triplet kernels unnecessary (every stack entry is an MXU-native T×T×T
matmul regardless of user block sizes).

Usage:
  python -m dbcsr_tpu.autotune --out dbcsr_tpu/params/<device>.json
  dbcsr_tpu.autotune.apply_tuned()   # adopt stored winners at runtime
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import time
from functools import partial
from typing import Callable, Dict, List, Optional

import numpy as np

__all__ = [
    "WORKLOADS",
    "steady_state_time",
    "sweep",
    "save_params",
    "load_params",
    "apply_tuned",
    "workload_class",
]

PARAMS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "params")

# knobs swept per workload class (the TPU analog of the reference's
# threads/grouping/minblocks/tile_m/tile_n/w/v template space)
DEFAULT_GRID = {
    "tile_size": [128, 256],
    "mm_driver": ["dense", "stack"],
    "max_stack_size": [8192, 32768],
    "matmul_precision": ["default", "highest"],
    "stack_bf16_inputs": [False, True],
    "stack_e_batch": [1, 4, 8],
}

#: default sweep: per-driver sub-grids (a flat cartesian product would
#: waste most of its combos on knobs the driver ignores). Keys mirror the
#: config parameters; every row records its ``mm_driver``.
DRIVER_GRIDS = {
    "dense": {
        "tile_size": [128, 256],
        "matmul_precision": ["default", "highest"],
    },
    "stack": {
        "max_stack_size": [32768],
        "matmul_precision": ["default", "highest"],
        "stack_bf16_inputs": [False, True],
        "stack_e_batch": [1, 4, 8],
    },
    "panel": {
        # VMEM budget: v5e has 128 MiB/core, and the kernel requests its
        # own scoped-vmem limit (panel._vmem_limit_bytes — round 4; the
        # old cache<=48 ceiling was XLA's ~32 MiB DEFAULT scoped limit,
        # not the chip). Footprint rule: 2 double-buffered caches of
        # panel_cache tiles (65KB each f32, 32KB bf16) + the 2 x c_win
        # f32 C window <= PANEL_VMEM_BUDGET (see panel_vmem_footprint /
        # _combo_ok). Large c_win is the point: bench-shape plan traffic
        # drops 0.538 (c_win 16) -> 0.324 (c_win 64). The planner shrinks
        # launch caps to the realized span, so a generous cache only
        # gates ADMISSION — the sweep dedups combos that realize the
        # same plan.
        "panel_c_win": [8, 16, 32, 64],
        "panel_cache": [48, 96, 192, 320],
        "panel_chunk": [8, 16],
        "panel_unroll": [1, 4],
        # k-run fusion length (0 = per-entry loop); fused rows ignore
        # unroll (see _combo_ok)
        "panel_runlen": [0, 3],
        "panel_bf16_inputs": [False, True],
        "matmul_precision": ["default", "highest"],
    },
    "grouped": {
        "matmul_precision": ["default", "highest"],
        "stack_bf16_inputs": [False, True],
    },
    "band": {
        "matmul_precision": ["default", "highest"],
    },
}


#: scoped-VMEM budget the panel caches may request (the kernel asks for
#: its own limit via ``panel._vmem_limit_bytes``; v5e has 128 MiB/core —
#: compiler-verified, tests/test_mosaic_compile.py — and this budget
#: leaves headroom for Mosaic internals and the +16 MiB pipeline margin
#: the kernel adds on top of the cache footprint)
PANEL_VMEM_BUDGET = 100 << 20


def panel_vmem_footprint(cache: int, c_win: int,
                         bf16_inputs: bool = False,
                         tile: int = 128) -> int:
    """Bytes of VMEM the panel kernel's scratch needs at these knobs: two
    double-buffered operand caches of ``cache`` tiles each + the
    double-buffered ``c_win`` f32 output window."""
    in_item = 2 if bf16_inputs else 4
    return (
        2 * 2 * cache * tile * tile * in_item
        + 2 * c_win * tile * tile * 4
    )


def panel_cache_cap(c_win: int, bf16_inputs: bool = False,
                    tile: int = 128) -> int:
    """Largest admission cache (tiles) whose footprint fits the budget."""
    in_item = 2 if bf16_inputs else 4
    left = PANEL_VMEM_BUDGET - 2 * c_win * tile * tile * 4
    return max(1, left // (2 * 2 * tile * tile * in_item))


def panel_plan_fingerprint(plan) -> Optional[tuple]:
    """Launch-shape fingerprint of a realized panel plan (None = the
    panel family was not admitted and a fallback executor ran).

    For a fixed set of non-cache knobs, planning is deterministic and
    ``panel_cache`` enters only as the admission cap (plus the
    chunk-halving rescue in ``pad_spans``), so two plans agreeing on
    this tuple are bit-identical: the sweep measures each distinct
    fingerprint once per cache-free knob key."""
    if plan is None:
        return None
    return (
        type(plan).__name__,
        int(plan.chunk),
        int(plan.a_cap),
        int(plan.b_cap),
        int(plan.c_win),
        int(plan.n_groups),
        int(getattr(plan, "runlen", 0)),
        int(getattr(plan, "loaded_tiles", getattr(plan, "loaded", 0))),
    )


def _combo_ok(combo: dict) -> bool:
    """Prune sweep points that are invalid or provably redundant: bf16
    kernel inputs only take effect at matmul_precision='default' (at
    'highest' the knob is a no-op — measuring it twice wastes chip time),
    and panel cache/c_win combos whose scratch exceeds the VMEM budget."""
    prec = combo.get("matmul_precision", "default")
    for knob in ("panel_bf16_inputs", "stack_bf16_inputs"):
        if combo.get(knob) and prec != "default":
            return False
    cache = combo.get("panel_cache")
    if cache is not None and panel_vmem_footprint(
        cache, combo.get("panel_c_win", 16),
        bool(combo.get("panel_bf16_inputs")),
    ) > PANEL_VMEM_BUDGET:
        return False
    # the fused-run kernel has no per-entry dot loop to unroll, so
    # unroll>1 under runlen>0 is redundant when fusion admits. When a
    # class's run plan FALLS BACK to the per-entry kernel, unroll>1 is
    # live again — but the runlen=0 rows sweep unroll on that identical
    # fallback executor, so the optimum is still discovered; only the
    # (runlen>0, unroll>1) duplicate measurements are pruned.
    if combo.get("panel_runlen", 0) > 0 and combo.get("panel_unroll", 1) > 1:
        return False
    return True


def _mk_workload(block_sizes, occupancy):
    def build(rng):
        import dbcsr_tpu as dt

        rbs = dt.random_block_sizes(1500, block_sizes, rng)
        a = dt.random_matrix(rbs, rbs, occupancy, rng, dtype=np.float32, name="A")
        b = dt.random_matrix(rbs, rbs, occupancy, rng, dtype=np.float32, name="B")
        return a, b

    return build


def _mk_banded(nrows: int = 12000, bandwidth: int = 12):
    """Banded fine-blocked pattern (the linear-scaling SCF shape; too many
    block rows for the dense driver — exercises the stack path). Data is
    built directly in store form for construction speed."""

    def build(rng):
        import jax
        import jax.numpy as jnp

        import dbcsr_tpu as dt
        from dbcsr_tpu.block.bcsr import BCSRMatrix
        from dbcsr_tpu.block.index import build_index
        from dbcsr_tpu.block.store import store_layout
        from dbcsr_tpu.block.tileops import valid_mask
        from dbcsr_tpu.core.config import get_config

        rbs = dt.random_block_sizes(nrows, [5, 13, 23], rng)
        n = len(rbs)
        w = 2 * bandwidth + 1
        i = np.repeat(np.arange(n, dtype=np.int64), w)
        j = i + np.tile(np.arange(-bandwidth, bandwidth + 1, dtype=np.int64), n)
        keep = (j >= 0) & (j < n) & (rng.random(len(j)) < 0.5)
        idx, _ = build_index(i[keep], j[keep], rbs, rbs)
        t = get_config().tile_size
        lay = store_layout(idx, t)
        data = jax.random.normal(
            jax.random.PRNGKey(0), (lay.n_tiles, t, t), jnp.float32
        ) * valid_mask(idx, t)
        a = BCSRMatrix(name="A", index=idx, data=data)
        b = BCSRMatrix(name="B", index=idx, data=data * 0.5)
        return a, b

    return build


#: workload classes mirroring BASELINE.md configs: uniform 23³ dense-blocked,
#: uniform 5×5 sparse (dbcsr_example_3), mixed 5/13/23 (perf-driver recipe),
#: banded fine-blocked at scale (stack path)
WORKLOADS: Dict[str, Callable] = {
    "block23_dense": _mk_workload([23], 1.0),
    "block5_sparse10": _mk_workload([5], 0.10),
    "mixed_5_13_23_sparse20": _mk_workload([5, 13, 23], 0.20),
    "banded_fine": _mk_banded(),
    # same shape at ~3.3x the scale: the winning driver flips (band at
    # 12k, stack at 40k — measured round 2); the log_nblkrows feature
    # separates the two classes at lookup time
    "banded_fine_large": _mk_banded(40000),
}


def workload_class(block_sizes, occupancy: float) -> str:
    """Coarse rule-based classification (fallback when the parameter table
    carries no feature vectors — pre-round-2 tables)."""
    mean_bs = float(np.mean(block_sizes))
    if occupancy > 0.6:
        return "block23_dense"
    if occupancy < 0.02:
        return "banded_fine"
    if mean_bs <= 8:
        return "block5_sparse10"
    return "mixed_5_13_23_sparse20"


# --- feature-based classification (smm_acc_predict analog) -----------------
#
# The reference trains a decision tree over derived kernel features to pick
# launch parameters for UNTUNED (m,n,k) triplets
# (``src/acc/libsmm_acc/kernels/smm_acc_predict.py:23-60``). Here every
# tuned workload class stores a FEATURE VECTOR of the swept workload;
# untuned shapes look up the nearest class in normalized feature space.

#: feature names, scales chosen so one unit ~ one "meaningful" step
_FEATURES = (
    "log_mean_bs",      # log2 mean block edge
    "bs_cv",            # block-size coefficient of variation
    "log_occupancy",    # log10 block-level occupancy
    "bandedness",       # 1 - normalized mean |i - j| spread of blocks
    "log_nblkrows",     # log10 problem scale
)


#: bandedness below this can never make the panel kernel admissible —
#: shared by every panel-admission gate (see _maybe_panel_plan and the
#: engine's post-RCM gate) so the threshold is tuned in one place
BANDED_GATE = 0.05


def coords_bandedness(rows, cols, n: int) -> float:
    """``1 - 3 * normalized mean |i - j|`` of a coordinate pattern:
    ~1 for banded/clustered, ~0 for uniform-random (whose spread is
    ~n/3). The single definition behind the ``bandedness`` feature and
    the engine's panel-admission gates. Empty patterns score 1.0
    (spread 0) — the value index_features always produced, kept so
    nearest-class lookups for degenerate operands are unchanged."""
    if len(rows) == 0:
        return 1.0
    spread = float(
        np.abs(
            np.asarray(rows, dtype=np.float64)
            - np.asarray(cols, dtype=np.float64)
        ).mean()
    ) / max(n, 1)
    return max(0.0, 1.0 - 3.0 * spread)


def index_features(index) -> np.ndarray:
    """Feature vector of one matrix index (pure metadata, O(nblks))."""
    sizes = np.concatenate(
        [index.row_block_sizes, index.col_block_sizes]
    ).astype(np.float64)
    mean_bs = max(float(sizes.mean()), 1.0)
    cv = float(sizes.std() / mean_bs)
    occ = index.nblks / max(index.nblkrows * index.nblkcols, 1)
    bandedness = coords_bandedness(
        index.blk_rows, index.col_idx,
        max(index.nblkrows, index.nblkcols, 1),
    )
    return np.array(
        [
            np.log2(mean_bs),
            cv,
            np.log10(max(occ, 1e-6)),
            bandedness,
            np.log10(max(index.nblkrows, 1)),
        ]
    )


def workload_features(a_index, b_index) -> np.ndarray:
    return 0.5 * (index_features(a_index) + index_features(b_index))


#: per-feature normalization: one unit of distance per entry
_FEATURE_SCALE = np.array([1.0, 0.3, 0.7, 0.35, 0.8])


def nearest_class(features: np.ndarray, table: dict):
    """(class name, distance) of the nearest tuned class by normalized
    feature distance; None if the table has no feature vectors."""
    best = None
    best_d = np.inf
    for cls, res in table.get("results", {}).items():
        fv = res.get("features")
        if fv is None:
            continue
        d = float(
            np.linalg.norm((np.asarray(fv) - features) / _FEATURE_SCALE)
        )
        if d < best_d:
            best, best_d = cls, d
    if best is None:
        return None
    return best, best_d


_TABLE_CACHE: dict = {}


def _cached_table() -> Optional[dict]:
    import jax

    kind = jax.devices()[0].device_kind
    if _TABLE_CACHE.get("kind") != kind:
        _TABLE_CACHE["kind"] = kind
        _TABLE_CACHE["table"] = load_params(kind)
    return _TABLE_CACHE["table"]


def tuned_stack_params(a_index, b_index) -> Optional[dict]:
    """Per-workload-class tuned config for the current device — the runtime
    analog of the reference's per-(m,n,k) parameter lookup at kernel launch
    (``libsmm_acc.cpp`` parameter hash table). The engine consults this for
    PERF-ONLY knobs (``stack_e_batch``, ``max_stack_size``) on parameters
    the user left at their defaults; accuracy-affecting knobs (precision,
    bf16 inputs) are never auto-applied."""
    table = _cached_table()
    if table is None:
        return None
    hit = nearest_class(workload_features(a_index, b_index), table)
    if hit is not None:
        cls, _ = hit
    else:  # legacy table without feature vectors
        occ_a = a_index.nblks / max(a_index.nblkrows * a_index.nblkcols, 1)
        occ_b = b_index.nblks / max(b_index.nblkrows * b_index.nblkcols, 1)
        sizes = np.concatenate(
            [a_index.row_block_sizes, b_index.col_block_sizes]
        )
        cls = workload_class(sizes, 0.5 * (occ_a + occ_b))
    return table["results"].get(cls, {}).get("best")


def steady_state_time(fn, args, *, n_lo: int = 4, n_hi: int = 44,
                      reps: int = 5) -> float:
    """Marginal per-iteration device time of ``fn(*args)`` via a jitted
    dependent fori_loop at two trip counts (tunnel-robust methodology, see
    bench.py). The trip-count spread is grown adaptively until the marginal
    time clears the dispatch jitter — otherwise fast configs produce
    garbage rates."""
    import jax
    import jax.numpy as jnp

    a_data = args[0]

    @partial(jax.jit, static_argnames="n")
    def loop(a_data, rest, n):
        out0 = fn(a_data, *rest)  # fixes the carry shape (output != input)

        def body(i, carry):
            a_data, out = carry
            out = fn(a_data, *rest)
            a_data = a_data + out.reshape(-1)[0] * 1e-30
            return (a_data, out)

        return jax.lax.fori_loop(0, n, body, (a_data, out0))[1]

    rest = tuple(args[1:])

    def run(n):
        t0 = time.perf_counter()
        out = loop(a_data, rest, n)
        _ = float(jnp.asarray(out).ravel()[0])
        return time.perf_counter() - t0

    for attempt in range(4):
        run(n_lo)
        run(n_hi)
        los = sorted(run(n_lo) for _ in range(reps))
        his = sorted(run(n_hi) for _ in range(reps))
        lo = los[len(los) // 2]
        hi = his[len(his) // 2]
        jitter = (los[-1] - los[0]) + (his[-1] - his[0])
        delta = hi - lo
        if delta > max(2.0 * jitter, 1e-4):
            return delta / (n_hi - n_lo)
        n_hi = n_hi * 4  # too fast to resolve: widen the spread
    # still jitter-bound: report the resolution floor, not a garbage rate
    return max(delta, 1e-4) / (n_hi // 4 - n_lo)


def sweep(
    *,
    grid: Optional[Dict[str, list]] = None,
    workloads: Optional[List[str]] = None,
    drivers: Optional[List[str]] = None,
    seed: int = 0,
    verbose: bool = True,
) -> dict:
    """Time every config combo on every workload class; returns
    ``{device_kind, results: {class: {best: {...}, all: [...]}}}``."""
    import jax

    import dbcsr_tpu as dt
    from dbcsr_tpu.core.config import config_override
    from dbcsr_tpu.mm.engine import build_multiply_executor, last_panel_plan

    from dbcsr_tpu.core.config import get_config

    if grid is not None:
        names = list(grid)
        combos = [
            dict(zip(names, c))
            for c in itertools.product(*(grid[n] for n in names))
        ]
    else:  # default: per-driver sub-grids
        combos = []
        for drv, g in DRIVER_GRIDS.items():
            if drivers is not None and drv not in drivers:
                continue
            names = list(g)
            for c in itertools.product(*(g[n] for n in names)):
                combo = {"mm_driver": drv, **dict(zip(names, c))}
                if _combo_ok(combo):
                    combos.append(combo)
    # panel_cache only gates ADMISSION (the planner shrinks the launch
    # caps to the realized span), so different cache values usually
    # realize the IDENTICAL executor: iterate caches ascending and skip a
    # combo whose cache-free key already measured the same REALIZED plan
    # (planning is cheap host work; the chip measurement is what the
    # dedup saves). Keyed on the plan fingerprint, not mere admission —
    # a small cache can admit with a HALVED chunk (pad_spans shrinks the
    # chunk when the padded span busts the cap) where a larger cache
    # admits at full chunk, a genuinely different launch that must still
    # be measured. A declined plan fingerprints as None: the fallback
    # executor ignores panel_cache entirely, so it too is measured once
    # per cache-free key.
    combos.sort(key=lambda c: c.get("panel_cache") or 0)

    def _panel_dedup_key(cfg):
        if cfg.get("mm_driver") != "panel":
            return None
        return tuple(
            (k, v) for k, v in sorted(cfg.items()) if k != "panel_cache"
        )
    device_kind = jax.devices()[0].device_kind
    results: Dict[str, dict] = {}
    for wname in workloads or list(WORKLOADS):
        # tile_size binds at CONSTRUCTION (the matrix's store layout), so
        # the workload must be rebuilt per swept tile size — same seed so
        # every tile size sees the same logical matrices
        built: Dict[int, tuple] = {}

        def mats(ts):
            if ts not in built:
                with config_override(tile_size=ts):
                    built[ts] = WORKLOADS[wname](np.random.default_rng(seed))
            return built[ts]

        rows = []
        measured: Dict[tuple, set] = {}
        for cfg in combos:
            dkey = _panel_dedup_key(cfg)
            try:
                a, b = mats(cfg.get("tile_size", get_config().tile_size))
                with config_override(**cfg):
                    fn, _, eff_flops = build_multiply_executor(
                        "N", "N", a, b, driver=cfg.get("mm_driver")
                    )
                    if dkey is not None:
                        fp = panel_plan_fingerprint(last_panel_plan())
                        seen = measured.setdefault(dkey, set())
                        if fp in seen:
                            continue  # identical realized launch measured
                        seen.add(fp)
                    dt_per = steady_state_time(fn, (a.data, b.data))
            except Exception as e:  # config invalid for this workload
                if verbose:
                    print(f"  {wname} {cfg}: failed ({type(e).__name__})")
                continue
            gflops = eff_flops / dt_per / 1e9
            rows.append({**cfg, "gflops": round(gflops, 2)})
            if verbose:
                print(f"  {wname} {cfg}: {gflops:9.1f} GFLOP/s")
        rows.sort(key=lambda r: -r["gflops"])
        # feature vector of the swept workload: the key for nearest-class
        # lookup at runtime (the smm_acc_predict analog)
        try:
            fa, fb = mats(get_config().tile_size)
            feats = [
                round(float(x), 4)
                for x in workload_features(fa.index, fb.index)
            ]
        except Exception:
            feats = None
        results[wname] = {
            "best": rows[0] if rows else None,
            "features": feats,
            "all": rows,
        }
    return {"device_kind": device_kind, "results": results}


def save_params(table: dict, path: Optional[str] = None) -> str:
    os.makedirs(PARAMS_DIR, exist_ok=True)
    if path is None:
        safe = table["device_kind"].replace(" ", "_").replace("/", "_")
        path = os.path.join(PARAMS_DIR, f"{safe}.json")
    with open(path, "w") as f:
        json.dump(table, f, indent=1)
    return path


def load_params(device_kind: Optional[str] = None) -> Optional[dict]:
    """Load the stored parameter table for this (or the given) device."""
    if device_kind is None:
        import jax

        device_kind = jax.devices()[0].device_kind
    safe = device_kind.replace(" ", "_").replace("/", "_")
    path = os.path.join(PARAMS_DIR, f"{safe}.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def apply_tuned(
    workload: Optional[str] = None, *, table: Optional[dict] = None
) -> bool:
    """Adopt the stored winner config (the reference's runtime parameter
    lookup, ``libsmm_acc_init.cpp`` parameter-table load). Returns True if
    a tuned config was applied."""
    from dbcsr_tpu.core.config import set_config

    table = table or load_params()
    if table is None:
        return False
    classes = table["results"]
    w = workload or next(iter(classes))
    best = classes.get(w, {}).get("best")
    if not best:
        return False
    set_config(
        **{k: v for k, v in best.items() if k != "gflops"}
    )
    return True


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="dbcsr_tpu autotuner")
    p.add_argument("--out", default=None, help="output JSON path")
    p.add_argument("--workloads", nargs="*", default=None)
    p.add_argument("--drivers", nargs="*", default=None)
    p.add_argument(
        "--merge", action="store_true",
        help="merge swept classes into the existing device table",
    )
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    table = sweep(
        workloads=args.workloads, drivers=args.drivers, seed=args.seed
    )
    if args.merge:
        old = load_params(table["device_kind"])
        if old is not None:
            merged = dict(old["results"])
            for cls, res in table["results"].items():
                # a class whose sweep produced NO successful measurement
                # (tunnel drop mid-window, every combo failed) must not
                # clobber a previously MEASURED entry with best=None —
                # stale-but-real beats fresh-but-empty
                if res.get("best") is None and merged.get(cls, {}).get(
                    "best"
                ) is not None:
                    print(f"merge: keeping existing {cls} entry "
                          "(new sweep has no successful measurement)")
                    continue
                merged[cls] = res
            table = {**old, **table, "results": merged}
    path = save_params(table, args.out)
    print(f"wrote {path}")
    for wname, res in table["results"].items():
        print(f"{wname}: best = {res['best']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
