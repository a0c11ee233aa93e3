"""Panel (supertile) stack kernel: planner admission rules and
interpret-mode numerics vs the XLA twin (see mm/panel.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

from dbcsr_tpu.mm.kernels import _HAVE_PALLAS, tile_stack_matmul_xla
from dbcsr_tpu.mm.panel import plan_panel_stack, tile_stack_matmul_panel

# curated real-chip battery (make tpu-check)
pytestmark = [
    pytest.mark.skipif(not _HAVE_PALLAS, reason="no pallas"),
    pytest.mark.tpu_battery,
]

T = 8


def _random_case(rng, n_tiles=40, n_c=30, s=200):
    a = jnp.asarray(rng.standard_normal((n_tiles, T, T)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n_tiles, T, T)), jnp.float32)
    c_col = np.sort(rng.integers(0, n_c, s)).astype(np.int32)
    stack = np.stack(
        [c_col, rng.integers(0, n_tiles, s).astype(np.int32),
         rng.integers(0, n_tiles, s).astype(np.int32)], axis=1
    )
    stack[:n_c, 0] = np.arange(n_c, dtype=np.int32)
    stack = stack[np.argsort(stack[:, 0], kind="stable")]
    return a, b, stack


def _banded_case(rng, mt=24, w=2):
    """Banded tile pattern: A/B/C tile stores in row-major order, stack =
    the band product — the panel kernel's home turf."""
    coords = np.array(
        [(r, c) for r in range(mt) for c in range(mt) if abs(r - c) <= w],
        dtype=np.int64,
    )
    n = len(coords)
    slot = {(r, c): i for i, (r, c) in enumerate(coords)}
    trip = []
    for (r, k), sa in slot.items():
        for c in range(max(0, k - w, r - w), min(mt, k + w + 1, r + w + 1)):
            trip.append((slot[(r, c)], sa, slot[(k, c)]))
    trip.sort()
    stack = np.asarray(trip, dtype=np.int32)
    a = jnp.asarray(rng.standard_normal((n, T, T)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, T, T)), jnp.float32)
    return a, b, stack, n


@pytest.mark.parametrize(
    "c_win,cap,chunk", [(4, 48, 4), (8, 64, 8), (16, 64, 4)]
)
def test_interpret_panel_matches_xla(rng, c_win, cap, chunk):
    a, b, stack = _random_case(rng)
    n_c = 30
    plan = plan_panel_stack(
        stack, n_c, a.shape[0], b.shape[0], c_win=c_win, a_cap=cap,
        b_cap=cap, chunk=chunk,
    )
    assert plan is not None
    ref = tile_stack_matmul_xla(
        a, b, jnp.asarray(stack), n_c_tiles=n_c, precision="highest"
    )
    got = tile_stack_matmul_panel(
        a, b, stack, n_c_tiles=n_c, plan=plan, interpret=True,
        precision="highest",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_interpret_panel_banded(rng):
    a, b, stack, n = _banded_case(rng)
    plan = plan_panel_stack(
        stack, n, n, n, c_win=8, a_cap=32, b_cap=32, chunk=4,
        admit_ratio=0.9,
    )
    # banded patterns must pass the traffic admission with real savings
    assert plan is not None and plan.traffic_ratio < 0.9
    ref = tile_stack_matmul_xla(
        a, b, jnp.asarray(stack), n_c_tiles=n, precision="highest"
    )
    got = tile_stack_matmul_panel(
        a, b, stack, n_c_tiles=n, plan=plan, interpret=True,
        precision="highest",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_interpret_panel_bf16_inputs_f32_out(rng):
    a, b, stack = _random_case(rng, s=120)
    n_c = 30
    got = tile_stack_matmul_panel(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), stack,
        n_c_tiles=n_c, c_win=8, a_cap=48, b_cap=48, chunk=4,
        interpret=True, out_dtype=jnp.float32,
    )
    assert got.dtype == jnp.float32
    ref = tile_stack_matmul_xla(
        a, b, jnp.asarray(stack), n_c_tiles=n_c, precision="highest"
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0.1, atol=0.5
    )


def test_panel_admission_rejects_wide_spans(rng):
    """A group whose A/B span exceeds the cache is inadmissible, as is a
    pattern whose slab traffic loses to the flat kernel."""
    a, b, stack = _random_case(rng, n_tiles=400, n_c=12, s=60)
    # spans ~400 >> cap
    assert (
        plan_panel_stack(stack, 12, 400, 400, c_win=4, a_cap=64, b_cap=64)
        is None
    )
    # fits the cache of a bigger cap, but traffic loses to flat 2S
    plan = plan_panel_stack(
        stack, 12, 400, 400, c_win=4, a_cap=512, b_cap=512,
        admit_ratio=0.85,
    )
    assert plan is None


def test_panel_empty_slots_and_tail(rng):
    """C slots with no entries and a padded final group produce zeros."""
    a, b, stack = _random_case(rng, n_tiles=20, n_c=9, s=40)
    # drop all entries for slot 4 (slot stays in [0, n_c) but empty)
    stack = stack[stack[:, 0] != 4]
    ref = tile_stack_matmul_xla(
        a, b, jnp.asarray(stack), n_c_tiles=9, precision="highest"
    )
    got = tile_stack_matmul_panel(
        a, b, stack, n_c_tiles=9, c_win=4, a_cap=32, b_cap=32, chunk=4,
        interpret=True, precision="highest",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    assert np.allclose(np.asarray(got[4]), 0.0)


def test_engine_panel_driver_cpu_fallback(rng):
    """mm_driver='panel' without a TPU runs the XLA twin (same semantics as
    the 'stack' driver's CPU path); results match the dense oracle."""
    import dbcsr_tpu as dt

    from dbcsr_tpu.core.config import config_override

    rbs = dt.random_block_sizes(60, [5, 13], rng)
    a = dt.random_matrix(rbs, rbs, 0.3, rng, dtype=np.float32, name="A")
    b = dt.random_matrix(rbs, rbs, 0.3, rng, dtype=np.float32, name="B")
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    with config_override(mm_driver="panel"):
        c = dt.multiply("N", "N", 1.0, a, b)
    np.testing.assert_allclose(np.asarray(c.to_dense()), ref, atol=1e-4)

    from dbcsr_tpu.mm.engine import build_multiply_executor

    with config_override(mm_driver="panel"):
        fn, c_index, _ = build_multiply_executor("N", "N", a, b)
        out = fn(a.data, b.data)
    from dbcsr_tpu.block.bcsr import BCSRMatrix

    c2 = BCSRMatrix(name="C", index=c_index, data=out)
    np.testing.assert_allclose(np.asarray(c2.to_dense()), ref, atol=1e-4)


def test_engine_panel_bf16_knob_gating():
    """panel_bf16_inputs converts slabs only at default precision on f32."""
    import jax.numpy as jnp

    from dbcsr_tpu.core.config import config_override, get_config
    from dbcsr_tpu.mm.engine import _maybe_panel_bf16

    a = jnp.ones((3, 8, 8), jnp.float32)
    b = jnp.ones((3, 8, 8), jnp.float32)
    with config_override(panel_bf16_inputs=True):
        cfg = get_config()
        ai, bi, out_dt = _maybe_panel_bf16(a, b, "default", cfg)
        assert ai.dtype == jnp.bfloat16 and bi.dtype == jnp.bfloat16
        assert out_dt == jnp.float32
        ai, bi, out_dt = _maybe_panel_bf16(a, b, "highest", cfg)
        assert ai.dtype == jnp.float32 and out_dt is None
    with config_override(panel_bf16_inputs=False):
        ai, bi, out_dt = _maybe_panel_bf16(a, b, "default", get_config())
        assert ai.dtype == jnp.float32 and out_dt is None


def test_panel_plan_fingerprint_dedup_rule():
    """The sweep dedups cache-axis combos by REALIZED plan fingerprint
    (autotune.panel_plan_fingerprint), not by admission: a small cache
    can admit with a HALVED chunk (pad_spans shrinks the chunk when the
    chunk-padded span busts the cap) where a larger cache admits at
    full chunk — a genuinely different launch that must be measured."""
    from dbcsr_tpu.autotune import panel_plan_fingerprint

    assert panel_plan_fingerprint(None) is None

    # one group (c_win covers all slots) whose A span is 34 tiles:
    # chunk 16 pads to 48 (> cap 40 -> halves to 8, pads to 40 <= 40);
    # cap 96 keeps chunk 16
    n_c, n_ab = 4, 64
    ent = []
    for c in range(n_c):
        for ai in (0, 33):  # span [0, 34)
            ent.append((c, ai, c))
    stack = np.asarray(sorted(ent), dtype=np.int32)
    mk = lambda cap: plan_panel_stack(
        stack, n_c, n_ab, n_ab, c_win=4, a_cap=cap, b_cap=cap, chunk=16
    )
    small, big, bigger = mk(40), mk(96), mk(320)
    assert small.chunk == 8 and big.chunk == 16
    fps = list(map(panel_plan_fingerprint, (small, big, bigger)))
    assert fps[0] != fps[1], "halved-chunk launch must not be deduped"
    assert fps[1] == fps[2], "caps past admission realize one launch"


def test_autotune_combo_pruning():
    """The sweep grid prunes bf16-at-highest (no-op) and cache/c_win
    combos whose scratch footprint exceeds the scoped-VMEM budget
    (PANEL_VMEM_BUDGET — v5e has 128 MiB/core and the kernel requests
    its own limit; the old f32-cache-48 ceiling was XLA's default
    scoped-vmem stack, see tests/test_mosaic_compile.py)."""
    from dbcsr_tpu.autotune import (
        PANEL_VMEM_BUDGET,
        _combo_ok,
        panel_cache_cap,
        panel_vmem_footprint,
    )

    # f32 cache 64 is well inside the real budget (round 3 pruned it)
    assert _combo_ok({"mm_driver": "panel", "panel_cache": 64,
                      "panel_bf16_inputs": False,
                      "matmul_precision": "default"})
    # past the budget: f32 cache 400 @ c_win 16 is ~107 MB of scratch
    assert panel_vmem_footprint(400, 16, False) > PANEL_VMEM_BUDGET
    assert not _combo_ok({"mm_driver": "panel", "panel_cache": 400,
                          "panel_bf16_inputs": False,
                          "matmul_precision": "default"})
    # bf16 slabs halve the footprint: the same cache fits
    assert _combo_ok({"mm_driver": "panel", "panel_cache": 400,
                      "panel_bf16_inputs": True,
                      "matmul_precision": "default"})
    # the engine's tuned-cache clamp and the sweep agree on the boundary
    assert panel_vmem_footprint(
        panel_cache_cap(16, False), 16, False
    ) <= PANEL_VMEM_BUDGET
    assert not _combo_ok({"mm_driver": "panel", "panel_cache": 32,
                          "panel_bf16_inputs": True,
                          "matmul_precision": "highest"})
    assert not _combo_ok({"mm_driver": "stack", "stack_bf16_inputs": True,
                          "matmul_precision": "highest"})
    assert _combo_ok({"mm_driver": "stack", "stack_bf16_inputs": True,
                      "matmul_precision": "default"})


@pytest.mark.skipif(not _HAVE_PALLAS, reason="pallas unavailable")
def test_interpret_panel_unroll(rng):
    """unroll>1 is numerically identical (same dots, pipelined issue)."""
    a, b, stack, n = _banded_case(rng)
    ref = tile_stack_matmul_xla(a, b, jnp.asarray(stack), n_c_tiles=n,
                                precision="highest")
    for unroll in (2, 4):
        out = tile_stack_matmul_panel(
            a, b, stack, n_c_tiles=n, interpret=True,
            precision="highest", c_win=8, a_cap=32, b_cap=32, chunk=4,
            unroll=unroll,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)


# --- k-run fusion (plan_panel_runs / tile_stack_matmul_panel_runs) ---------


def _cm_perm_of(coords):
    n = int(coords[:, 0].max()) + 1 if len(coords) else 1
    return np.argsort(
        coords[:, 1].astype(np.int64) * n + coords[:, 0]
    ).astype(np.int32)


def test_run_plan_covers_stack_exactly(rng):
    """Quads + singles reproduce every stack entry exactly once per
    (group, slot) cell (overlap duplicates of the clamped last group
    aside), with locals consistent with the slabs."""
    from dbcsr_tpu.mm.panel import plan_panel_runs

    a, b, stack, n = _banded_case(rng)
    coords = None
    # reconstruct coords of the banded store (row-major order)
    mt, w = 24, 2
    coords = np.array(
        [(r, c) for r in range(mt) for c in range(mt) if abs(r - c) <= w],
        dtype=np.int64,
    )
    cm = _cm_perm_of(coords)
    R = 3
    plan = plan_panel_runs(
        stack, n, n, n, b_cm_perm=cm, c_win=8, a_cap=32, b_cap=32,
        chunk=4, runlen=R,
    )
    assert plan is not None
    assert (
        plan.n_quads * R + plan.n_pairs * 2 + plan.n_singles >= len(stack)
    )
    pos_of = np.empty(n, dtype=np.int64)
    pos_of[cm] = np.arange(n)
    ncell = plan.n_groups * plan.c_win
    got_cells = []
    for cell in range(ncell):
        g = cell // plan.c_win
        ents = []
        for e in range(plan.obq[cell], plan.obq[cell + 1]):
            p = int(plan.qent[e])
            sa, sb = p >> 16, p & 0xFFFF
            for r in range(R):
                ents.append((plan.a_lo[g] + sa + r, plan.b_lo[g] + sb + r))
        for e in range(plan.obp[cell], plan.obp[cell + 1]):
            p = int(plan.pent[e])
            sa, sb = p >> 16, p & 0xFFFF
            for r in range(2):
                ents.append((plan.a_lo[g] + sa + r, plan.b_lo[g] + sb + r))
        for e in range(plan.obs[cell], plan.obs[cell + 1]):
            p = int(plan.sent[e])
            ents.append((plan.a_lo[g] + (p >> 16), plan.b_lo[g] + (p & 0xFFFF)))
        got_cells.append(sorted(ents))
    # compare against the stack's per-slot entries (col-major b)
    for g in range(plan.n_groups):
        for l in range(plan.c_win):
            slot = plan.gstart[g] + l
            rows = stack[stack[:, 0] == slot]
            want = sorted(
                (int(r[1]), int(pos_of[r[2]])) for r in rows
            )
            assert got_cells[g * plan.c_win + l] == want, (g, l)


@pytest.mark.parametrize("runlen", [2, 3, 4])
def test_interpret_panel_runs_matches_xla(rng, runlen):
    from dbcsr_tpu.mm.panel import (
        plan_panel_runs,
        tile_stack_matmul_panel_runs,
    )

    a, b, stack, n = _banded_case(rng)
    mt, w = 24, 2
    coords = np.array(
        [(r, c) for r in range(mt) for c in range(mt) if abs(r - c) <= w],
        dtype=np.int64,
    )
    plan = plan_panel_runs(
        stack, n, n, n, b_cm_perm=_cm_perm_of(coords), c_win=8,
        a_cap=32, b_cap=32, chunk=4, runlen=runlen, admit_ratio=0.9,
    )
    assert plan is not None
    # fusion must actually find runs on a banded pattern
    assert plan.n_quads > 0 and plan.issue_ratio < 0.8
    ref = tile_stack_matmul_xla(
        a, b, jnp.asarray(stack), n_c_tiles=n, precision="highest"
    )
    got = tile_stack_matmul_panel_runs(
        a, b, stack, n_c_tiles=n, plan=plan, interpret=True,
        precision="highest",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_interpret_panel_runs_random_and_bf16(rng):
    """Random patterns (no runs without col-major locality) still compute
    correctly — everything lands in the singles loop; bf16-in/f32-out
    matches within bf16 tolerance."""
    from dbcsr_tpu.mm.panel import (
        plan_panel_runs,
        tile_stack_matmul_panel_runs,
    )

    a, b, stack = _random_case(rng, s=150)
    n_c = 30
    plan = plan_panel_runs(
        stack, n_c, a.shape[0], b.shape[0], b_cm_perm=None, c_win=8,
        a_cap=48, b_cap=48, chunk=4, runlen=4,
    )
    assert plan is not None
    ref = tile_stack_matmul_xla(
        a, b, jnp.asarray(stack), n_c_tiles=n_c, precision="highest"
    )
    got = tile_stack_matmul_panel_runs(
        a, b, stack, n_c_tiles=n_c, plan=plan, interpret=True,
        precision="highest",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    got16 = tile_stack_matmul_panel_runs(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), stack,
        n_c_tiles=n_c, plan=plan, interpret=True, out_dtype=jnp.float32,
    )
    assert got16.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(got16), np.asarray(ref), rtol=0.1, atol=0.5
    )


def test_engine_prefers_run_plan_with_knob(rng):
    """cfg.panel_runlen >= 2 makes _maybe_panel_plan return a PanelRunPlan
    (falling back to PanelPlan when b_coords are unavailable)."""
    from dbcsr_tpu.core.config import config_override, get_config
    from dbcsr_tpu.mm.engine import _maybe_panel_plan
    from dbcsr_tpu.mm.panel import PanelPlan, PanelRunPlan
    from dbcsr_tpu.mm.tileplan import plan_tile_stacks_stores

    mt, w = 24, 2
    coords = np.array(
        [(r, c) for r in range(mt) for c in range(mt) if abs(r - c) <= w],
        dtype=np.int64,
    )
    tplan = plan_tile_stacks_stores(coords, (mt, mt), coords, (mt, mt))
    n = len(coords)
    # NOTE cache 64: column-major B slabs span ~c_win * band-height tiles
    # (larger than the row-major panel plan's spans), so run plans need
    # roomier caches — the autotune sweep pairs runlen rows accordingly
    # pin every panel knob (user provenance) so _panel_knobs skips the
    # tuned-table lookup — this unit test passes no real indexes
    with config_override(
        mm_driver="panel", panel_runlen=3, panel_c_win=8, panel_cache=64,
        panel_chunk=4, panel_unroll=1,
    ):
        cfg = get_config()
        p = _maybe_panel_plan(
            cfg, tplan, None, None, n, n, "panel", None, b_coords=coords
        )
        assert isinstance(p, PanelRunPlan) and p.runlen == 3
        p2 = _maybe_panel_plan(
            cfg, tplan, None, None, n, n, "panel", None, b_coords=None
        )
        assert isinstance(p2, PanelPlan)
    with config_override(
        mm_driver="panel", panel_c_win=8, panel_cache=32, panel_chunk=4,
        panel_unroll=1, panel_runlen=0,
    ):
        p3 = _maybe_panel_plan(
            get_config(), tplan, None, None, n, n, "panel", None,
            b_coords=coords,
        )
        assert isinstance(p3, PanelPlan)  # runlen defaults to 0
