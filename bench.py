#!/usr/bin/env python
"""Headline benchmark: batched 23x23x23 block multiply throughput.

BASELINE.md target #1: >= 70% of MXU peak on 23-cubed block stacks.
Default workload (``python bench.py`` = what the driver records):
dense-blocked BCSR matrices with uniform 23x23 blocks (128 block
rows/cols -> 2944x2944), C = A*B through the engine's plan-once executor
(``build_multiply_executor`` — the steady-state form every iterative
caller uses). Effective flops are counted at USER-BLOCK granularity
(2*sum(m*n*k) over block triples), exactly the reference's flop accounting
(``src/mm/dbcsr_mm.F`` flop counters).

Secondary configs (``python bench.py sparse5|mixed|banded``) cover the
other BASELINE workload shapes (10%-occupancy 5x5 blocks, mixed 5/13/23
at 20%, banded 40k-block-row linear-scaling SCF shape); their
``vs_baseline`` is a regression ratio against recorded v5e numbers.
``filtered`` (BASELINE config 3: eps-filtered multiply with on-the-fly
truncation, per-call end-to-end accounting) and ``tensor`` (config 4:
tall 3-index contraction through BatchedContract) complete the BASELINE
config set; their refs are pinned from the first chip capture.

Timing methodology (this chip sits behind a tunnel whose dispatch adds
~30ms and whose block_until_ready is a no-op): run the executor inside a
jitted dependent fori_loop at two trip counts, force a value readback, and
take the marginal time per iteration — pure device steady-state time.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = achieved effective GFLOP/s / (0.70 * chip peak GFLOP/s),
so >= 1.0 means the BASELINE target is met.
"""
import json
import os
import subprocess
import sys
import time
from functools import partial

import numpy as np

_METRIC_BY_CONFIG = {
    "block23": "block23_mm_throughput",
    "sparse5": "sparse5_mm_throughput",
    "mixed": "mixed_mm_throughput",
    "clustered": "clustered_mm_throughput",
    "banded": "banded_mm_throughput",
    "filtered": "filtered_mm_throughput",
    "tensor": "tensor_contract_throughput",
}


def _backend_reachable(timeout_s: float = 90.0) -> bool:
    """Probe the JAX backend in a THROWAWAY subprocess before committing
    this process to it.

    Two axon failure modes make an in-process probe unusable (memory
    notes axon-complex-unsupported / axon-tunnel-serialization): a failed
    backend init poisons the process for good, and a down tunnel hangs
    ``jax.devices()`` forever rather than erroring. A subprocess under a
    hard timeout converts both into a clean boolean. The subprocess
    inherits the environment, so JAX_PLATFORMS overrides (including the
    CPU test configuration) probe exactly what the benchmark would use.
    """
    code = (
        "import os, jax\n"
        # honor the platform selection EXPLICITLY: the axon sitecustomize
        # registers its backend regardless of JAX_PLATFORMS, so the env
        # var alone is silently ignored (a misset platform probed 'ok'
        # whenever the chip was up). jax.config wins over registration.
        "_p = os.environ.get('DBCSR_PLATFORM')"
        " or os.environ.get('JAX_PLATFORMS')\n"
        "if _p:\n"
        "    jax.config.update('jax_platforms', _p)\n"
        "import jax.numpy as jnp\n"
        "x = jnp.ones((8, 8), jnp.bfloat16)\n"
        "print(jax.devices()[0].platform, float((x @ x).sum()))\n"
    )
    # 3 attempts: the tunnel briefly refuses a new device grant right
    # after the previous chip process exits, which read as a false
    # outage mid-window (r4: bench_clustered skipped between two green
    # bench steps). A real outage costs 3 timeouts; a release-latency
    # blip costs one short retry. Per-attempt outcomes are recorded in
    # ``_PROBE_ATTEMPTS`` and emitted with any skip record, so a lost
    # step is diagnosable from the window log (r4 verdict Weak #7).
    del _PROBE_ATTEMPTS[:]
    for attempt in range(3):
        if attempt:
            time.sleep(10.0)
        t0 = time.perf_counter()
        try:
            res = subprocess.run(
                [sys.executable, "-c", code],
                timeout=timeout_s,
                capture_output=True,
            )
            dt_s = round(time.perf_counter() - t0, 1)
            if res.returncode == 0:
                _PROBE_ATTEMPTS.append(f"ok after {dt_s}s")
                return True
            err = res.stderr.decode(errors="replace")
            lines = [ln for ln in err.strip().splitlines() if ln.strip()]
            tail = next(
                (ln for ln in reversed(lines)
                 if ("rror" in ln or "nable" in ln)
                 and "For simplicity" not in ln),
                lines[-1] if lines else "",
            )[:120]
            _PROBE_ATTEMPTS.append(f"rc={res.returncode} in {dt_s}s: {tail}")
            # a backend that ERRORS fast (unknown platform, unregistered
            # backend) is a configuration outage, not release latency —
            # retrying cannot fix it
            if "nable to initialize backend" not in err:
                return False
        except subprocess.TimeoutExpired:
            _PROBE_ATTEMPTS.append(f"timeout after {timeout_s}s")
        except OSError as e:
            _PROBE_ATTEMPTS.append(f"oserror: {e}")
    return False


#: per-attempt probe outcomes of the last _backend_reachable call
_PROBE_ATTEMPTS: list = []


def _emit_skip(config: str, reason: str) -> None:
    """One structured JSON line so a capture harness can tell an outage
    from a regression (an rc!=0 BENCH record should always mean the
    latter). Mirrors the normal record's shape; ``value`` 0.0 plus the
    ``skipped`` key marks it unusable as a perf number."""
    print(
        json.dumps(
            {
                "metric": _METRIC_BY_CONFIG.get(config, config),
                "value": 0.0,
                "unit": "GFLOP/s",
                "vs_baseline": 0.0,
                "skipped": reason,
                "probe_attempts": list(_PROBE_ATTEMPTS),
            }
        )
    )


def _chip_peak_flops() -> float:
    """Nominal dense matmul peak (bf16 MXU) per chip, by device kind."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = {
        "v6e": 918e12,
        "v6": 918e12,
        "v5p": 459e12,
        "v5 lite": 197e12,  # v5e
        "v5litepod": 197e12,
        "v4": 275e12,
    }
    for key, val in table.items():
        if key in kind:
            return val
    return 197e12  # conservative default


# DBCSR_BENCH_TINY=1 shrinks every workload ~20x and the timing loops to
# a few reps: a CPU-feasible smoke of each config's full code path (the
# suite runs all of them), never a perf number. _sz scales a row count
# with a floor that keeps the pattern's character (bands, tile packing).
_TINY = os.environ.get("DBCSR_BENCH_TINY") == "1"


def _sz(n, floor=64):
    return max(floor, n // 20) if _TINY else n


def _per_call_median(call, sync, warmup=2, reps=9):
    """Median END-TO-END per-call wall time: host planning + dispatch +
    compute. The one-shot configs below replan every call by design
    (filtered patterns depend on data norms; that IS the workload), so
    the marginal-time loop methodology does not apply — this mirrors the
    reference perf driver's per-rep accounting, which likewise includes
    MPI and index assembly (``tests/dbcsr_performance_multiply.F``)."""
    if _TINY:
        warmup, reps = 1, 3
    for _ in range(warmup):
        sync(call())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(call())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _emit(metric, gflops, vs, **extra):
    print(json.dumps({
        "metric": metric,
        "value": round(gflops, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(vs, 3),
        **extra,
    }))


def _bench_filtered(rng):
    """BASELINE config 3: epsilon-filtered multiply — the linear-scaling
    SCF pattern — measured the way the SCF loop actually runs: operand
    DATA CHANGES EVERY CALL over a fixed pattern. Banded operands whose
    block magnitudes decay away from the diagonal, so ``filter_eps``
    genuinely truncates the product's far-band tail.

    Headline: the device-resident ``FilteredExecutor`` (mm/filtered.py —
    superset product + on-device norms/threshold/mask, zero host work
    per call) in a jitted loop cycling 4 independent data variants, so
    no content cache can flatter the number (round-4 Weak #3).
    ``vs_baseline`` is the FILTERING OVERHEAD FACTOR: executor rate /
    unfiltered plan-once executor rate on the SAME pattern (round-4
    Next #7 — externally meaningful, not a self-referential ratio).
    Extra fields record the one-shot ``dt.multiply`` end-to-end path,
    both data-static (the round-4 metric) and data-varying (the honest
    naive-caller cost). Reference analog: ``dbcsr_multiply(...,
    filter_eps)`` inside CP2K's linear-scaling SCF
    (``src/mm/dbcsr_mm_cannon.F:1042-1113`` per-row thresholds)."""
    import jax
    import jax.numpy as jnp

    import dbcsr_tpu as dt
    from dbcsr_tpu.block.bcsr import BCSRMatrix
    from dbcsr_tpu.block.index import build_index
    from dbcsr_tpu.block.store import store_layout
    from dbcsr_tpu.block.tileops import valid_mask

    rbs = dt.random_block_sizes(_sz(12000), [5, 13, 23], rng)
    n = len(rbs)
    i = np.repeat(np.arange(n, dtype=np.int64), 25)
    j = i + np.tile(np.arange(-12, 13, dtype=np.int64), n)
    keep = (j >= 0) & (j < n) & (rng.random(len(j)) < 0.5)
    idx, _ = build_index(i[keep], j[keep], rbs, rbs)
    lay = store_layout(idx, 128)
    data = jax.random.normal(
        jax.random.PRNGKey(0), (lay.n_tiles, 128, 128), jnp.float32
    ) * valid_mask(idx, 128)
    n_var = 4  # independent A-data variants cycled per iteration
    # block-granular off-diagonal decay exp(-1.5*|bi-bj|), applied
    # element-wise through the block-of-element-row maps: eps then sets
    # an effective bandwidth — calibrated so ~20% of product flops are
    # skipped on the fly and ~half of C's far-band blocks fall to the
    # final Frobenius filter (the linear-scaling density-matrix shape)
    offs = np.concatenate(([0], np.cumsum(rbs.astype(np.int64))))
    nelem = int(offs[-1])
    blk_of = np.searchsorted(offs, np.arange(nelem), side="right") - 1
    tc = lay.tile_coords
    er = np.minimum(
        tc[:, 0, None].astype(np.int64) * 128 + np.arange(128), nelem - 1
    )
    ec = np.minimum(
        tc[:, 1, None].astype(np.int64) * 128 + np.arange(128), nelem - 1
    )
    bi, bj = blk_of[er], blk_of[ec]
    decay = jnp.exp(
        -1.5
        * jnp.abs(
            jnp.asarray(bi)[:, :, None] - jnp.asarray(bj)[:, None, :]
        ).astype(jnp.float32)
    )
    data = data * decay
    a = BCSRMatrix(name="A", index=idx, data=data)
    b = BCSRMatrix(name="B", index=idx, data=data * 0.5)
    eps = 1e-5

    # ---- headline: FilteredExecutor, data varying every call ----------
    ex = dt.build_filtered_executor("N", "N", a, b, eps)
    vmask = valid_mask(idx, 128)
    decay_d = jnp.asarray(decay)
    a_vars = jnp.stack([
        jax.random.normal(
            jax.random.PRNGKey(100 + v), (lay.n_tiles, 128, 128),
            jnp.float32,
        ) * vmask * decay_d
        for v in range(n_var)
    ])

    # the variants must produce genuinely different keep sets, or the
    # "data-varying" label is hollow — assert it before timing
    keeps = [np.asarray(ex.step(a_vars[v], b.data)[1]) for v in range(2)]
    assert not np.array_equal(keeps[0], keeps[1]), (
        "filtered bench: data variants produced identical keep sets"
    )
    kept_frac = float(np.mean([k.mean() for k in keeps]))

    @partial(jax.jit, static_argnames="n")
    def loop_step(a_stack, b_data, n):
        def body(it, carry):
            a_stack, acc = carry
            a_i = jax.lax.dynamic_index_in_dim(
                a_stack, it % n_var, axis=0, keepdims=False
            )
            c, k, _ = ex.step(a_i, b_data)
            # fold a result-dependent epsilon back into the carry so no
            # iteration can be elided
            return (a_stack + c.reshape(-1)[0] * 1e-30, acc + jnp.sum(k))

        return jax.lax.fori_loop(0, n, body, (a_stack, jnp.float32(0)))[1]

    def run(fn, n, *args):
        t0 = time.perf_counter()
        out = fn(*args, n)
        _ = float(jnp.asarray(out).ravel()[0])
        return time.perf_counter() - t0

    n_lo, n_hi = (2, 8) if _TINY else (5, 45)
    run(loop_step, n_lo, a_vars, b.data)
    run(loop_step, n_hi, a_vars, b.data)
    lo = float(np.median([run(loop_step, n_lo, a_vars, b.data) for _ in range(5)]))
    hi = float(np.median([run(loop_step, n_hi, a_vars, b.data) for _ in range(5)]))
    # clamp: at TINY scale the marginal time is noise-dominated and can
    # come out <= 0; TINY is a code-path smoke, never a perf number
    per = max((hi - lo) / (n_hi - n_lo), 1e-7)
    gflops = ex.eff_flops / per / 1e9

    # ---- baseline: the UNFILTERED plan-once executor, same pattern ----
    from dbcsr_tpu.mm.engine import build_multiply_executor

    fn_plain, _, _ = build_multiply_executor("N", "N", a, b)

    @partial(jax.jit, static_argnames="n")
    def loop_plain(a_stack, b_data, n):
        def body(it, carry):
            a_stack, acc = carry
            a_i = jax.lax.dynamic_index_in_dim(
                a_stack, it % n_var, axis=0, keepdims=False
            )
            c = fn_plain(a_i, b_data)
            return (a_stack + c.reshape(-1)[0] * 1e-30, acc + c.reshape(-1)[0])

        return jax.lax.fori_loop(0, n, body, (a_stack, jnp.float32(0)))[1]

    run(loop_plain, n_lo, a_vars, b.data)
    run(loop_plain, n_hi, a_vars, b.data)
    lo_p = float(np.median([run(loop_plain, n_lo, a_vars, b.data) for _ in range(5)]))
    hi_p = float(np.median([run(loop_plain, n_hi, a_vars, b.data) for _ in range(5)]))
    per_plain = max((hi_p - lo_p) / (n_hi - n_lo), 1e-7)

    # ---- extras: the one-shot dt.multiply end-to-end path -------------
    # the varying leg sees a DISTINCT matrix on every call (warmup
    # included) so no content-keyed cache can absorb the host work —
    # this is the true naive-caller cold cost (round-4 Weak #3)
    n_one = 2 if _TINY else 6
    a_mats = [
        BCSRMatrix(
            name=f"A{v}",
            index=idx,
            data=(
                a_vars[v] if v < n_var else
                jax.random.normal(
                    jax.random.PRNGKey(200 + v),
                    (lay.n_tiles, 128, 128), jnp.float32,
                ) * vmask * decay_d
            ),
        )
        for v in range(n_one)
    ]
    state = {"i": 0}

    def call_varying():
        m = a_mats[state["i"] % len(a_mats)]
        state["i"] += 1
        return dt.multiply("N", "N", 1.0, m, b, filter_eps=eps,
                           return_flops=True)

    def call_static():
        return dt.multiply("N", "N", 1.0, a, b, filter_eps=eps,
                           return_flops=True)

    def sync(out):
        jax.block_until_ready(out[0].data)

    per_one_var = _per_call_median(
        call_varying, sync, warmup=1, reps=n_one - 1
    )
    per_one_static = _per_call_median(call_static, sync, warmup=1, reps=5)
    _, flops_host = call_static()

    _emit(
        "filtered_mm_throughput", gflops,
        per_plain / per,  # filtering overhead factor (<= ~1)
        ms_per_call=round(per * 1e3, 2),
        ms_per_call_unfiltered=round(per_plain * 1e3, 2),
        c_blocks_kept=round(kept_frac, 3),
        filtered_flop_fraction=round(flops_host / ex.eff_flops, 3),
        oneshot_ms_data_varying=round(per_one_var * 1e3, 1),
        oneshot_ms_data_static=round(per_one_static * 1e3, 1),
    )


def _bench_tensor(rng):
    """BASELINE config 4: 3-index contraction on a tall-and-skinny
    block-sparse tensor — C(i,j,l) = sum_k A(i,j,k) * B(k,l), long i
    (the ``dbcsr_tensor_unittest`` shape class). Steady state through
    ``BatchedContract`` (the reference's ``dbcsr_t_batched_contract_*``
    state machine): layout alignment + TAS split decisions are cached,
    each call pays fold + per-subgroup multiply dispatch."""
    import jax

    import dbcsr_tpu as dt
    from dbcsr_tpu.mm.plan import symbolic_product
    from dbcsr_tpu.tensors import BatchedContract, NDMapping, TensorBuilder

    def rand_tensor(block_sizes, occ, name, mapping=None):
        bs = [np.asarray(v, dtype=np.int32) for v in block_sizes]
        builder = TensorBuilder(bs, mapping, name=name, dtype=np.float32)
        nbpd = [len(v) for v in bs]
        total = int(np.prod(nbpd))
        for flat in np.flatnonzero(rng.random(total) < occ):
            bi = np.unravel_index(flat, nbpd)
            shp = tuple(int(bs[d][bi[d]]) for d in range(len(bs)))
            builder.put_block(bi, rng.standard_normal(shp))
        return builder.finalize()

    i_bs = dt.random_block_sizes(_sz(2000), [5, 13], rng)  # tall axis
    j_bs = np.full(10, 8, dtype=np.int32)
    k_bs = np.full(10, 8, dtype=np.int32)
    l_bs = np.full(10, 8, dtype=np.int32)

    kw = dict(
        contract_1=(2,), notcontract_1=(0, 1),
        contract_2=(0,), notcontract_2=(1,),
    )
    # operands built IN the contraction layouts (`contraction_layouts` —
    # the documented batched-contraction workflow, the analog of the
    # reference's cached mm_storage in dbcsr_tas_batched_mm): the
    # steady-state loop then runs refold-free. Tensors left in other
    # layouts pay an element-granular refold gather PER OPERAND PER CALL
    # (~140 ms each through the tunnel at this size — the store.py
    # gather-granularity wall); that cost is reported separately below.
    from dbcsr_tpu.tensors import contraction_layouts

    la, lb, _ = contraction_layouts(3, kw["contract_1"],
                                    kw["notcontract_1"], 2,
                                    kw["contract_2"], kw["notcontract_2"])
    a = rand_tensor([i_bs, j_bs, k_bs], 0.15, "T3", mapping=la)
    b = rand_tensor([k_bs, l_bs], 0.6, "M2", mapping=lb)
    # effective flops from the folded 2-D symbolic product (block
    # granularity is preserved by the fold); pure host metadata, unlike
    # a one-shot contract() whose TAS split estimation is setup-heavy
    a2 = a.with_layout(NDMapping(3, (0, 1), (2,)))
    b2 = b.with_layout(NDMapping(2, (0,), (1,)))
    am = getattr(a2.matrix, "matrix", a2.matrix)
    bm = getattr(b2.matrix, "matrix", b2.matrix)
    flops = symbolic_product(am.index, False, bm.index, False).eff_flops

    # baseline: the SAME product as a plain folded-2D plan-once executor
    # (round-4 Next #7: vs_baseline becomes the TENSOR-LAYER OVERHEAD
    # FACTOR — what fraction of the raw folded multiply's rate survives
    # the nd fold/alignment machinery — instead of a self-referential
    # first-capture ratio). Measured with the jitted marginal-time loop
    # + forced readback: the axon tunnel's block_until_ready is a no-op,
    # so a per-call measurement would time DISPATCH ONLY and overstate
    # the baseline rate (first chip capture did exactly that).
    import jax.numpy as jnp

    from dbcsr_tpu.mm.engine import build_multiply_executor

    fn2d, _, _ = build_multiply_executor("N", "N", am, bm)

    @partial(jax.jit, static_argnames="n")
    def loop_2d(ad, bd, n):
        def body(i, carry):
            ad, acc = carry
            cd = fn2d(ad, bd)
            return (ad + cd.reshape(-1)[0] * 1e-30, acc + cd.reshape(-1)[1])

        return jax.lax.fori_loop(0, n, body, (ad, jnp.float32(0)))[1]

    def run_2d(n):
        t0 = time.perf_counter()
        out = loop_2d(am.data, bm.data, n)
        _ = float(jnp.asarray(out))
        return time.perf_counter() - t0

    n2_lo, n2_hi = (2, 8) if _TINY else (10, 110)
    run_2d(n2_lo)
    run_2d(n2_hi)
    lo2 = float(np.median([run_2d(n2_lo) for _ in range(5)]))
    hi2 = float(np.median([run_2d(n2_hi) for _ in range(5)]))
    per_2d = max((hi2 - lo2) / (n2_hi - n2_lo), 1e-7)

    # batch-amortized end-to-end timing: block_until_ready is a no-op
    # through the tunnel, so per-call sync points measure dispatch-queue
    # state, not work (0.41 vs 198 ms across two otherwise-identical
    # captures). Timing N back-to-back calls with ONE forced readback at
    # the end amortizes the tunnel readback while keeping every call's
    # host work in the measurement — the batched-contraction usage
    # pattern itself (``dbcsr_t_batched_contract_*``).
    with BatchedContract() as bc:
        def readback(out):
            m = out.matrix
            m = getattr(m, "matrix", m)  # TAS wrapper or plain BCSR
            return float(np.asarray(jax.device_get(m.data)).ravel()[0])

        def run_batch(ncalls):
            t0 = time.perf_counter()
            out = None
            for _ in range(ncalls):
                out = bc.contract(a, b, **kw)
            readback(out)
            return time.perf_counter() - t0

        # wide spread: after the round-5 executor-jit + refold-free
        # fixes a call submits in ~0.3-1 ms, so the batch delta must
        # dwarf the single readback's ~±30 ms tunnel noise
        n_lo, n_hi = (1, 3) if _TINY else (10, 210)
        run_batch(n_lo)
        run_batch(n_hi)
        lo = float(np.median([run_batch(n_lo) for _ in range(5)]))
        hi = float(np.median([run_batch(n_hi) for _ in range(5)]))
        per = max((hi - lo) / (n_hi - n_lo), 1e-7)
    gflops = flops / per / 1e9

    # the cost a NON-prepared layout would add per operand per call: one
    # element-granular refold gather (the store.py granularity wall)
    def time_refold():
        flip = NDMapping(3, (2,), (0, 1))
        t0 = time.perf_counter()
        af = a.with_layout(flip)
        m = getattr(af.matrix, "matrix", af.matrix)
        _ = float(np.asarray(jax.device_get(m.data)).ravel()[0])
        return time.perf_counter() - t0

    time_refold()  # warm (host map build + compile)
    per_refold = min(time_refold() for _ in range(3))

    _emit(
        "tensor_contract_throughput", gflops,
        per_2d / per,  # tensor-layer overhead factor (<= ~1)
        ms_per_call=round(per * 1e3, 2),
        ms_per_call_folded2d=round(per_2d * 1e3, 2),
        ms_refold_per_operand=round(per_refold * 1e3, 2),
    )


def main():
    config = sys.argv[1] if len(sys.argv) > 1 else "block23"
    # 400s default: the 2026-08-19 window measured ~130s tunnel GRANT
    # latency on a healthy chip — the old 90s default skipped two bench
    # steps mid-window (their probe_attempts telemetry showed three
    # clean 90s timeouts). A genuinely-down tunnel now costs 3x400s,
    # which the window orchestrator's own step timeout bounds.
    probe_timeout = float(os.environ.get("DBCSR_BENCH_PROBE_TIMEOUT", "400"))
    if not _backend_reachable(probe_timeout):
        _emit_skip(config, "tpu unreachable")
        return

    import jax
    import jax.numpy as jnp

    import dbcsr_tpu as dt
    from dbcsr_tpu.mm.engine import build_multiply_executor

    dt.init_lib(enable_x64=False)
    # single-pass MXU precision for the throughput benchmark (documented
    # TPU-native tradeoff; 'highest' = bf16x3 is the accuracy default)
    dt.set_config(matmul_precision="default")

    rng = np.random.default_rng(0)
    if config == "filtered":
        _bench_filtered(rng)
        return
    if config == "tensor":
        _bench_tensor(rng)
        return
    metric = "block23_mm_throughput"
    if config == "block23":
        # BASELINE config: dense-blocked 23^3 (the headline MXU target)
        rbs = np.full(_sz(128, 16), 23, dtype=np.int32)
        a = dt.random_matrix(rbs, rbs, 1.0, rng, dtype=np.float32, name="A")
        b = dt.random_matrix(rbs, rbs, 1.0, rng, dtype=np.float32, name="B")
    elif config == "sparse5":
        # BASELINE config 1: 1000x1000, 5x5 blocks, ~10% occupancy scaled 8x
        metric = "sparse5_mm_throughput"
        rbs = np.full(_sz(1600), 5, dtype=np.int32)
        a = dt.random_matrix(rbs, rbs, 0.10, rng, dtype=np.float32, name="A")
        b = dt.random_matrix(rbs, rbs, 0.10, rng, dtype=np.float32, name="B")
    elif config == "mixed":
        # BASELINE config 2: mixed 5/13/23 blocks, 20% occupancy
        metric = "mixed_mm_throughput"
        rbs = dt.random_block_sizes(_sz(6000), [5, 13, 23], rng)
        a = dt.random_matrix(rbs, rbs, 0.2, rng, dtype=np.float32, name="A")
        b = dt.random_matrix(rbs, rbs, 0.2, rng, dtype=np.float32, name="B")
    elif config == "clustered":
        # linear-scaling SCF shape #2: near-sighted exponential-decay
        # coupling along a hidden 1-D chain, block numbering SCRAMBLED by
        # a random permutation (the atom numbering does not expose the
        # locality). The engine's RCM reorder pre-pass (mm/reorder.py)
        # must recover the hidden axis to make the panel kernel
        # admissible; vs_baseline here is the measured speedup over the
        # same workload with reorder disabled (flat stack kernel) —
        # VERDICT r2 target: >= 2.
        metric = "clustered_mm_throughput"
        from dbcsr_tpu.block.bcsr import BCSRMatrix
        from dbcsr_tpu.block.index import build_index
        from dbcsr_tpu.block.store import store_layout
        from dbcsr_tpu.block.tileops import valid_mask
        from dbcsr_tpu.mm.reorder import locality_block_permutation

        # 24k rows: the scrambled leg's tile blow-up peaks ~6GB on-chip
        # (40k would peak ~16GB = the whole HBM and OOM in the timing loop)
        rbs = dt.random_block_sizes(_sz(24000), [5, 13, 23], rng)
        n = len(rbs)
        dmax = 15
        i = np.repeat(np.arange(n, dtype=np.int64), 2 * dmax + 1)
        off = np.tile(np.arange(-dmax, dmax + 1, dtype=np.int64), n)
        j = i + off
        # P(coupling at chain distance d) = exp(-d/4), diagonal always
        keep = (
            (j >= 0)
            & (j < n)
            & (rng.random(len(j)) < np.exp(-np.abs(off) / 4.0))
        )
        sig = rng.permutation(n).astype(np.int64)
        rbs_s = np.empty(n, np.int32)
        rbs_s[sig] = rbs  # sizes follow their blocks through the scramble

        def store_mat(rows, cols, sizes, name, scale=1.0):
            idx, _ = build_index(rows, cols, sizes, sizes)
            lay = store_layout(idx, 128)
            data = jax.random.normal(
                jax.random.PRNGKey(0), (lay.n_tiles, 128, 128), jnp.float32
            )
            data = data * scale * valid_mask(idx, 128)
            return BCSRMatrix(name=name, index=idx, data=data)

        sr, sc = sig[i[keep]], sig[j[keep]]
        a0 = store_mat(sr, sc, rbs_s, "A0")  # scrambled numbering
        b0 = store_mat(sr, sc, rbs_s, "B0", 0.5)
        perm = locality_block_permutation(a0.index)
        if perm is None:
            raise SystemExit(
                "clustered bench: locality_block_permutation declined the "
                "pattern (degenerate input) — the workload generator is "
                "supposed to produce a reorderable banded structure"
            )
        pm, _, _ = perm
        rbs_r = np.empty(n, np.int32)
        rbs_r[pm[sig]] = rbs
        a = store_mat(pm[sr], pm[sc], rbs_r, "A")  # RCM-recovered numbering
        b = store_mat(pm[sr], pm[sc], rbs_r, "B", 0.5)
    elif config == "banded":
        # linear-scaling SCF shape: banded 40k block rows (stack path);
        # data built directly in store form (construction shortcut)
        metric = "banded_mm_throughput"
        from dbcsr_tpu.block.bcsr import BCSRMatrix
        from dbcsr_tpu.block.index import build_index
        from dbcsr_tpu.block.store import store_layout
        from dbcsr_tpu.block.tileops import valid_mask

        rbs = dt.random_block_sizes(_sz(40000), [5, 13, 23], rng)
        n = len(rbs)
        i = np.repeat(np.arange(n, dtype=np.int64), 25)
        j = i + np.tile(np.arange(-12, 13, dtype=np.int64), n)
        keep = (j >= 0) & (j < n) & (rng.random(len(j)) < 0.5)
        idx, _ = build_index(i[keep], j[keep], rbs, rbs)
        lay = store_layout(idx, 128)
        data = jax.random.normal(
            jax.random.PRNGKey(0), (lay.n_tiles, 128, 128), jnp.float32
        )
        data = data * valid_mask(idx, 128)
        a = BCSRMatrix(name="A", index=idx, data=data)
        b = BCSRMatrix(name="B", index=idx, data=data * 0.5)
    else:
        raise SystemExit(f"unknown bench config {config!r}")

    def measure(fn, c_index, ma, mb, n_lo=10, n_hi=210):
        if _TINY:
            n_lo, n_hi = 2, 8
        from dbcsr_tpu.block.store import store_layout

        chain = np.array_equal(
            store_layout(c_index, ma.tile).tile_keys(),
            ma.layout.tile_keys(),
        )

        @partial(jax.jit, static_argnames="n")
        def loop(a_data, b_data, n):
            if chain:
                # C := A·B, A ← C each iteration (C's store layout equals
                # A's): the real iterative-caller shape (SCF / matrix
                # powers) with a true loop-carried dependency.
                def body(i, a_data):
                    return fn(a_data, b_data)

                return jax.lax.fori_loop(0, n, body, a_data)

            out0 = fn(a_data, b_data)

            def body(i, carry):
                a_data, out = carry
                out = fn(a_data, b_data)
                return (a_data + out.reshape(-1)[0] * 1e-30, out)

            return jax.lax.fori_loop(0, n, body, (a_data, out0))[1]

        def run(n):
            t0 = time.perf_counter()
            out = loop(ma.data, mb.data, n)
            _ = float(jnp.asarray(out).ravel()[0])  # force full execution
            return time.perf_counter() - t0

        # warm both trip counts (compile), then take medians; trip counts
        # high enough that the marginal time dwarfs tunnel dispatch jitter
        run(n_lo)
        run(n_hi)
        lo = float(np.median([run(n_lo) for _ in range(5)]))
        hi = float(np.median([run(n_hi) for _ in range(5)]))
        return (hi - lo) / (n_hi - n_lo)

    fn, c_index, eff_flops = build_multiply_executor("N", "N", a, b)
    per_iter = measure(fn, c_index, a, b)
    gflops = eff_flops / per_iter / 1e9

    # BASELINE metric 3 block-granularity throughput: block-matmuls/s is
    # the reference STATISTICS "marketing matmuls" counter per second
    # (one entry per contributing (C,A,B) block triple,
    # docs/guide/.../4-performance/1-insights.md), block-nnz/s the C
    # blocks produced per second. Host-side recompute of the symbolic
    # product (setup cost, not timed).
    from dbcsr_tpu.mm.plan import symbolic_product

    n_triples = symbolic_product(a.index, False, b.index, False).nnz_triples

    if config == "block23":
        # headline BASELINE target: fraction of 70% MXU peak
        vs = gflops / (0.70 * _chip_peak_flops() / 1e9)
    elif config == "clustered":
        # vs_baseline = speedup of the RCM-recovered numbering (compact
        # tiles + panel kernel) over the scrambled numbering with
        # reordering disabled, same blocks/flops (target >= 2). The a0
        # leg uses fewer iterations: its plan is ~100x more device work.
        from dbcsr_tpu.core.config import config_override

        with config_override(reorder="off"):
            fn0, c_index0, _ = build_multiply_executor("N", "N", a0, b0)
            per0 = measure(fn0, c_index0, a0, b0, n_lo=2, n_hi=12)
        vs = per0 / per_iter
    else:
        # secondary configs: regression ratio vs recorded v5e reference
        refs = {"sparse5": 1478.5, "mixed": 6039.5, "banded": 665.1}
        vs = gflops / refs[config]
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(gflops, 1),
                "unit": "GFLOP/s",
                "vs_baseline": round(vs, 3),
                "block_matmuls_per_s": round(n_triples / per_iter),
                "block_nnz_per_s": round(len(c_index.col_idx) / per_iter),
            }
        )
    )


if __name__ == "__main__":
    main()
