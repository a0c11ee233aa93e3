#!/usr/bin/env python
"""Pre-compile the chip-window autotune sweep, device-less.

Enumerates exactly the panel combos ``python -m dbcsr_tpu.autotune
--workloads banded_fine banded_fine_large --drivers panel`` will measure
(post-prune, post cache-axis dedup), plans each against the real
workload, and compiles every DISTINCT realized launch through the
compile-only v5e PJRT topology (``dt.testing.tpu_compile_topology`` —
the same Mosaic pass pipeline + XLA-TPU backend the chip runs). A combo
that would die in Mosaic mid-window is found HERE, on the CPU host.

Exit 0 = every admitted combo compiles; 1 = at least one failure
(printed). Combos the planner declines are reported as 'declined' —
that is an admission outcome, not an error (the sweep skips them too).
"""
import _bootstrap  # noqa: F401  (repo-root sys.path + platform honor)
import sys
import time


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import SingleDeviceSharding

    import dbcsr_tpu as dt
    from dbcsr_tpu.autotune import DRIVER_GRIDS, WORKLOADS, _combo_ok
    from dbcsr_tpu.block.store import store_layout
    from dbcsr_tpu.core.config import config_override, get_config
    from dbcsr_tpu.mm.engine import _maybe_panel_plan
    from dbcsr_tpu.mm.panel import (
        PanelRunPlan,
        tile_stack_matmul_panel,
        tile_stack_matmul_panel_runs,
    )
    from dbcsr_tpu.mm.tileplan import plan_tile_stacks_stores

    topo = dt.testing.tpu_compile_topology()
    if topo is None:
        print("no local TPU compiler (libtpu) — nothing to verify")
        return 0
    sh = SingleDeviceSharding(topo.devices[0])

    import itertools

    g = DRIVER_GRIDS["panel"]
    names = list(g)
    combos = []
    for c in itertools.product(*(g[n] for n in names)):
        combo = {"mm_driver": "panel", **dict(zip(names, c))}
        if _combo_ok(combo):
            combos.append(combo)
    combos.sort(key=lambda c: c.get("panel_cache") or 0)

    n_fail = 0
    for wname in ("banded_fine", "banded_fine_large"):
        a, b = WORKLOADS[wname](np.random.default_rng(0))
        lay_a, lay_b = a.layout, b.layout
        tplan = plan_tile_stacks_stores(
            lay_a.tile_coords, (lay_a.ntr, lay_a.ntc),
            lay_b.tile_coords, (lay_b.ntr, lay_b.ntc),
        )
        compiled_fp = set()
        n_new = n_dup = n_decl = 0
        for combo in combos:
            # no admission-keyed skip here: a small cache can admit with
            # a HALVED chunk where a larger cache admits at full chunk
            # (pad_spans), so every combo is planned and the dedup keys
            # on the realized launch fingerprint below — exactly the
            # sweep's dedup rule (autotune.panel_plan_fingerprint)
            with config_override(**combo):
                plan = _maybe_panel_plan(
                    get_config(), tplan, a.index, b.index,
                    lay_a.n_tiles, lay_b.n_tiles, "panel", None,
                    b_coords=lay_b.tile_coords,
                )
            if plan is None:
                n_decl += 1
                continue
            is_runs = isinstance(plan, PanelRunPlan)
            in_dt = (
                "bfloat16" if combo.get("panel_bf16_inputs") else "float32"
            )
            fp = (
                is_runs, plan.n_groups, plan.c_win, plan.a_cap,
                plan.b_cap, plan.chunk,
                getattr(plan, "runlen", 0), getattr(plan, "unroll", 1),
                in_dt, combo.get("matmul_precision", "default"),
            )
            if fp in compiled_fp:
                n_dup += 1
                continue
            compiled_fp.add(fp)
            import jax.numpy as jnp

            aval = jax.ShapeDtypeStruct(
                (lay_a.n_tiles, 128, 128), getattr(jnp, in_dt)
            )
            bval = jax.ShapeDtypeStruct(
                (lay_b.n_tiles, 128, 128), getattr(jnp, in_dt)
            )
            kern = (
                tile_stack_matmul_panel_runs if is_runs
                else tile_stack_matmul_panel
            )
            out_dt = jnp.float32 if in_dt == "bfloat16" else None

            def f(x, y, *, _k=kern, _p=plan, _o=out_dt,
                  _prec=combo.get("matmul_precision", "default")):
                return _k(x, y, tplan.stack, n_c_tiles=tplan.n_c_tiles,
                          plan=_p, precision=_prec, out_dtype=_o)

            t0 = time.perf_counter()
            try:
                jax.jit(f, out_shardings=sh).trace(aval, bval).lower(
                ).compile()
                print(f"{wname} {combo}: OK "
                      f"({time.perf_counter() - t0:.1f}s, "
                      f"caps {plan.a_cap}/{plan.b_cap})", flush=True)
            except Exception as e:
                n_fail += 1
                print(f"{wname} {combo}: COMPILE FAIL "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            n_new += 1
        print(f"== {wname}: {n_new} distinct launches compiled, "
              f"{n_dup} duplicate plans, {n_decl} declined", flush=True)
    print(f"sweep_precompile: {'FAILURES ' + str(n_fail) if n_fail else 'all ok'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
