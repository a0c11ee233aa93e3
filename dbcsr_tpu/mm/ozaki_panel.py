"""Fused f64 stack kernel: Ozaki bf16 slices at panel-kernel speed.

The XLA stack-ozaki path (``ops/f64_emu.tile_stack_matmul_ozaki``) is
combine-bound: per stack entry it materializes f64 partial products and
pays ~5-10 emulated-f64 elementwise ops per element (measured ladder on
the banded 40k f64 workload: 7.4 GFLOP/s native -> 15.6 (round-4 ozaki)
-> 22.1 (round-5 store slicing) — all far below the panel kernel's
1.88-2.47 TFLOP/s f32 rate on the same pattern). This kernel removes the
f64 emulation from the hot path entirely; every in-kernel op is native
bf16 MXU or f32 VPU:

1. **Global power-of-two scales** per matrix row of op(A) / column of
   op(B) (not per K-chunk): all contributions to one C element then
   share one slice grid, so f32 accumulation ACROSS stack entries can be
   exact. Scales live outside the kernel (f64, applied once at the end).
2. **7-bit slices, 8 slices** (56 >= 53 mantissa bits), kept pairs
   ``i + j < 8`` = 36 bf16 MXU dots per entry. Each slice value is an
   integer multiple of its grid with <= 2^7 units, so a pair dot over
   K = T <= 128 is <= 2^(14+7) = 2^21 grid units — EXACT in f32 — and a
   per-pair accumulator over a C slot's w <= 8 entries stays <= 2^24:
   still exact (the admission bound ``w_max <= 8``; wider-k patterns
   fall back to the XLA path).
3. **Per-slot two-sum cascade** over the 36 exact pair accumulators:
   the s-chain is error-free (TwoSum), its error terms are accumulated
   in a second TwoSum chain whose own residuals sum in plain f32 — the
   dropped third-order term is O(2^-57) relative. The kernel emits
   THREE f32 planes (s, es, ee) whose f64 sum reproduces the exact
   pair-sum to ~2^-53-class error.
4. One final XLA pass assembles ``(s + es + ee)`` in f64 and applies the
   row/column scales — the only f64 arithmetic in the pipeline,
   O(n_c_tiles) elements.

Slab orchestration (groups, double-buffered chunked DMA, window output)
reuses the panel planner (``panel.plan_panel_stack``); the slice stores
are stacked ``[n_tiles, 8, T, T]`` bf16 so one chunk DMA moves all eight
slices of a tile span.

Error model: per C element,
``|err| <= ~2^-53 * max_k|A(row,:)| * max_k|B(:,col)| * K + dropped-pair
tail (~9 * 2^-56)`` — the standard Ozaki bound with per-row scaling,
comparable to (for long K better than) a sequentially accumulated native
f64 GEMM. Non-finite inputs do not propagate IEEE-correctly (as with the
XLA ozaki path); scales are exact powers of two in f64, so there is no
f32 range restriction on the data.

Reference analog: fp64 is the reference accelerator backend's PRIMARY
type (``/root/reference/src/acc/libsmm_acc/libsmm_acc.cpp:92-150``); its
largeDB kernels stage slabs in shared memory the same way
(``kernels/smm_acc_dnt_largeDB1.h``).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # pragma: no cover - exercised only on pallas-capable builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

__all__ = [
    "N_SLICES",
    "SLICE_BITS",
    "N_PAIRS",
    "plan_ozaki_panel",
    "tile_stack_matmul_ozaki_panel",
]

SLICE_BITS = 7
N_SLICES = 8
#: kept pairs (i, j) with i + j < N_SLICES, ordered by anti-diagonal
#: (descending magnitude — the cascade consumes them in this order)
PAIRS = tuple(
    (i, d - i) for d in range(N_SLICES) for i in range(d + 1)
)
N_PAIRS = len(PAIRS)  # 36
#: pairs with i + j >= TAIL_D have magnitude <= 2^(-7*TAIL_D) = 2^-35
#: relative: their plain-f32 accumulation (no TwoSum, one shared
#: accumulator) adds <= ~20 * 2^-24 * 2^-35 ~= 2^-55 relative error —
#: below the scheme's 2^-53-class budget — while cutting the per-slot
#: accumulator count 36 -> 16 and the exact cascade length by ~55%
#: (measured ~half the kernel's non-MXU time).
TAIL_D = 5
N_EXACT = sum(1 for (i, j) in PAIRS if i + j < TAIL_D)  # 15
N_ACC = N_EXACT + 1  # + the shared f32 tail accumulator
#: exactness bound on per-pair f32 accumulation across one C slot's
#: entries: 2^(2*7) * 128 * w <= 2^24  =>  w <= 8
MAX_ENTRIES_PER_SLOT = 8


# ---------------------------------------------------------------------------
# pre/post passes (XLA)
# ---------------------------------------------------------------------------

def _pow2_vec_scale(m: jax.Array) -> jax.Array:
    """Per-position power-of-two >= m (1.0 where m is 0/non-finite)."""
    m = jnp.where(jnp.isfinite(m) & (m > 0), m, 1.0)
    e = jnp.ceil(jnp.log2(m))
    s = jnp.exp2(e)
    return jnp.where(s < m, s * 2.0, s)


@partial(jax.jit, static_argnames=("n_seg", "axis"))
def _global_scales(tiles: jax.Array, seg: jax.Array, *, n_seg: int,
                   axis: int) -> jax.Array:
    """[n_seg, T] f64 power-of-two scales: max |value| per matrix
    row/column, reduced across every tile sharing that tile-row (A,
    axis=-1) or tile-column (B, axis=-2)."""
    per_tile = jnp.max(jnp.abs(tiles), axis=axis)  # [n_tiles, T]
    mx = jax.ops.segment_max(per_tile, seg, num_segments=n_seg)
    return _pow2_vec_scale(mx)


@partial(jax.jit, static_argnames=("axis",))
def _slice_scaled(tiles: jax.Array, scale_rows: jax.Array, *, axis: int):
    """bf16 slice stack [n_tiles, N_SLICES, T, T] of ``tiles / scale``
    (scale broadcast along ``axis``).

    Telescoping z-form, tuned for EMULATED f64 on the VPU (the slicing
    pre-pass measured 54% of the whole f64 pipeline, window 2026-08-19):

      z_k     = round(tiles * inv_scale * 2^(7(k+1)))   (k = 0..7)
      slice_k = (z_k - 2^7 * z_{k-1}) * 2^(-7(k+1))

    vs the remainder chain it replaces: the per-ELEMENT power-of-two
    divide becomes one reciprocal on the [n, T] scale vector (~128x
    fewer emulated divisions), every step is an exact f64 op (power-of-
    two multiplies, round, a Sterbenz-range subtract), and the z_k are
    computed from ``tiles`` directly — no sequential data dependence
    between slices. Values telescope to ``z_7 * 2^-56``; z_7 may round
    at the f64 integer limit, a <= 2^-54-relative residual shared with
    the dropped-pair tail. Slice units stay <= 65 < 2^7 (round-to-
    nearest differences), preserving every exactness bound downstream.
    """
    inv = 1.0 / scale_rows  # exact: power-of-two reciprocal, [n, T] only
    if axis == -1:
        c = inv[:, :, None]
    else:
        c = inv[:, None, :]
    y = tiles * c  # exact power-of-two multiply
    out = []
    z_prev = None
    for k in range(N_SLICES):
        z = jnp.round(y * np.float64(2.0 ** (SLICE_BITS * (k + 1))))
        d = z if z_prev is None else z - np.float64(2.0**SLICE_BITS) * z_prev
        step = np.float64(2.0 ** (-SLICE_BITS * (k + 1)))
        out.append((d * step).astype(jnp.bfloat16))
        z_prev = z
    return jnp.stack(out, axis=1)


# ---------------------------------------------------------------------------
# plan
# ---------------------------------------------------------------------------

#: (c_win, cap) ladder tried in order: larger windows amortize slab
#: traffic best; smaller ones admit tighter VMEM. Slice caches cost
#: ``2 buf x cap x 8 slices x T² x 2 B`` per operand — cap 64 = 64 MiB
#: of the 126 MiB scoped-VMEM ceiling, the largest safe rung.
_PLAN_LADDER = ((16, 32), (8, 32), (8, 16), (16, 64), (4, 24), (4, 48))


def plan_ozaki_panel(
    stack_np: np.ndarray,
    n_c_tiles: int,
    n_a_tiles: int,
    n_b_tiles: int,
    *,
    chunk: int = 4,
):
    """Panel plan for the ozaki kernel, or None when inadmissible.

    On top of the panel planner's span/VMEM admission (tried over the
    ``_PLAN_LADDER`` launch shapes): the per-pair f32 accumulators are
    exact only while a C slot sees at most ``MAX_ENTRIES_PER_SLOT``
    stack entries."""
    from .panel import plan_panel_stack

    S = len(stack_np)
    if S == 0 or n_c_tiles == 0:
        return None
    counts = np.bincount(
        stack_np[:, 0].astype(np.int64), minlength=n_c_tiles
    )
    if counts.max(initial=0) > MAX_ENTRIES_PER_SLOT:
        return None
    for c_win, cap in _PLAN_LADDER:
        plan = plan_panel_stack(
            stack_np, n_c_tiles, n_a_tiles, n_b_tiles,
            c_win=c_win, a_cap=cap, b_cap=cap, chunk=chunk,
            # the slice slabs carry 8 x bf16 per tile = 4x the f32 panel
            # kernel's bytes/tile; its traffic-vs-flat admission ratio is
            # not meaningful here (the alternative path is the far slower
            # XLA ozaki, not the flat f32 kernel) — only the hard
            # VMEM/span limits apply
            admit_ratio=None,
        )
        if plan is not None:
            return plan
    return None


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _two_sum(x, y):
    """Knuth TwoSum (branch-free, exact): returns (s, e), s + e == x + y."""
    s = x + y
    bb = s - x
    e = (x - (s - bb)) + (y - bb)
    return s, e


def _ozaki_panel_kernel(
    # scalar prefetch
    gstart_ref, a_lo_ref, a_nch_ref, b_lo_ref, b_nch_ref, ob_ref, ent_ref,
    # tensor inputs (HBM)
    a_hbm, b_hbm,  # [n, N_SLICES, T, T] bf16
    # outputs (HBM)
    s_hbm, es_hbm, ee_hbm,  # [n_c, T, T] f32 each
    # scratch
    a_cache, b_cache, acc, c_s, c_es, c_ee, a_sems, b_sems, c_sems,
    *, c_win: int, chunk: int, n_groups: int,
):
    i32 = jnp.int32
    one = np.int32(1)
    two = np.int32(2)
    chunk_c = np.int32(chunk)
    cwin_c = np.int32(c_win)
    bmask = np.int32(0xFFFF)
    g = pl.program_id(0).astype(i32)
    buf = jnp.remainder(g, two)

    def a_dma(grp, slot, i):
        return pltpu.make_async_copy(
            a_hbm.at[pl.ds(a_lo_ref[grp].astype(i32) + i * chunk_c, chunk)],
            a_cache.at[slot, pl.ds(i * chunk_c, chunk)],
            a_sems.at[slot, i],
        )

    def b_dma(grp, slot, i):
        return pltpu.make_async_copy(
            b_hbm.at[pl.ds(b_lo_ref[grp].astype(i32) + i * chunk_c, chunk)],
            b_cache.at[slot, pl.ds(i * chunk_c, chunk)],
            b_sems.at[slot, i],
        )

    def issue(grp, slot):
        def a_body(i, _):
            a_dma(grp, slot, i.astype(i32)).start()
            return 0

        jax.lax.fori_loop(np.int32(0), a_nch_ref[grp].astype(i32), a_body, 0)

        def b_body(i, _):
            b_dma(grp, slot, i.astype(i32)).start()
            return 0

        jax.lax.fori_loop(np.int32(0), b_nch_ref[grp].astype(i32), b_body, 0)

    @pl.when(g == 0)
    def _():
        issue(g, buf)

    @pl.when(g + one < np.int32(n_groups))
    def _():
        issue(g + one, jnp.remainder(g + one, two))

    def a_wait(i, _):
        a_dma(g, buf, i.astype(i32)).wait()
        return 0

    jax.lax.fori_loop(np.int32(0), a_nch_ref[g].astype(i32), a_wait, 0)

    def b_wait(i, _):
        b_dma(g, buf, i.astype(i32)).wait()
        return 0

    jax.lax.fori_loop(np.int32(0), b_nch_ref[g].astype(i32), b_wait, 0)

    def out_dmas(grp, slot):
        # semaphore indices pinned i32: a bare python literal becomes an
        # i64 index under jax_enable_x64 and trips Mosaic's memref_slice
        # verifier (the kernels.py `zero` trap, same class)
        dst = pl.ds(gstart_ref[grp].astype(i32), c_win)
        return (
            pltpu.make_async_copy(
                c_s.at[slot], s_hbm.at[dst], c_sems.at[slot, np.int32(0)]
            ),
            pltpu.make_async_copy(
                c_es.at[slot], es_hbm.at[dst], c_sems.at[slot, np.int32(1)]
            ),
            pltpu.make_async_copy(
                c_ee.at[slot], ee_hbm.at[dst], c_sems.at[slot, np.int32(2)]
            ),
        )

    @pl.when(g >= two)
    def _():
        for d in out_dmas(g - two, buf):
            d.wait()

    tile = acc.shape[-1]

    def l_body(_, li):
        l = li
        e0 = ob_ref[g * cwin_c + l].astype(i32)
        e1 = ob_ref[g * cwin_c + l + one].astype(i32)

        # zero the 36 per-pair accumulators for this C slot
        acc[...] = jnp.zeros(acc.shape, jnp.float32)

        def ent_body(e, _):
            packed = ent_ref[e.astype(i32)].astype(i32)
            sa = jax.lax.shift_right_logical(packed, np.int32(16))
            sb = jnp.bitwise_and(packed, bmask)
            # 36 bf16 pair dots, statically unrolled: slice indices are
            # compile-time, only (sa, sb) are dynamic. Pairs with
            # i + j < TAIL_D keep a private EXACT f32 accumulator; the
            # low-significance tail shares one plain-f32 accumulator
            # (error budget: see TAIL_D).
            # precision PINNED to DEFAULT: bf16 inputs are already exact
            # on the slice grid, and an ambient
            # jax_default_matmul_precision=highest (init_lib sets it)
            # would otherwise reach Mosaic as contract_precision<fp32>
            # on bf16 operands — "Bad lhs type" on the real chip
            # compiler (caught by the round-5 window's x64 validate).
            eidx = 0
            for (si, sj) in PAIRS:
                slot = eidx if si + sj < TAIL_D else N_EXACT
                acc[slot] = acc[slot] + jnp.dot(
                    a_cache[buf, sa, si],
                    b_cache[buf, sb, sj],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                if si + sj < TAIL_D:
                    eidx += 1
            return 0

        jax.lax.fori_loop(e0, e1, ent_body, 0)

        # two-sum cascade over the exact pair sums (+ the f32 tail):
        # s-chain error-free, its residuals collected in a second chain
        # (es), whose own residuals sum in plain f32 (ee; O(2^-57))
        s = acc[0]
        es = jnp.zeros((tile, tile), jnp.float32)
        ee = jnp.zeros((tile, tile), jnp.float32)
        for pidx in range(1, N_ACC):
            s, e1_ = _two_sum(s, acc[pidx])
            es, e2_ = _two_sum(es, e1_)
            ee = ee + e2_
        c_s[buf, pl.ds(l, 1)] = s[None]
        c_es[buf, pl.ds(l, 1)] = es[None]
        c_ee[buf, pl.ds(l, 1)] = ee[None]
        return li + one

    jax.lax.fori_loop(np.int32(0), cwin_c, l_body, np.int32(0))

    # clamped-last-group overlap: drain the previous output before ours
    @pl.when((g == np.int32(n_groups) - one) & (g >= one))
    def _():
        for d in out_dmas(g - one, jnp.remainder(g + one, two)):
            d.wait()

    dmas = out_dmas(g, buf)
    for d in dmas:
        d.start()

    @pl.when(g == np.int32(n_groups) - one)
    def _():
        for d in dmas:
            d.wait()


@partial(
    jax.jit,
    static_argnames=(
        "n_groups", "c_win", "a_cap", "b_cap", "chunk", "tile",
        "n_c_tiles", "interpret", "loaded_tiles",
    ),
)
def _ozaki_panel_launch(
    a_sl, b_sl, gstart, a_lo, a_nch, b_lo, b_nch, obounds, entries, *,
    n_groups: int, c_win: int, a_cap: int, b_cap: int, chunk: int,
    tile: int, n_c_tiles: int, interpret: bool, loaded_tiles: int,
):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, a_cap, N_SLICES, tile, tile), jnp.bfloat16),
            pltpu.VMEM((2, b_cap, N_SLICES, tile, tile), jnp.bfloat16),
            pltpu.VMEM((N_ACC, tile, tile), jnp.float32),
            pltpu.VMEM((2, c_win, tile, tile), jnp.float32),
            pltpu.VMEM((2, c_win, tile, tile), jnp.float32),
            pltpu.VMEM((2, c_win, tile, tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2, a_cap // chunk)),
            pltpu.SemaphoreType.DMA((2, b_cap // chunk)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    s = int(entries.shape[0])
    shape = jax.ShapeDtypeStruct((n_c_tiles, tile, tile), jnp.float32)
    vmem = (
        2 * (a_cap + b_cap) * N_SLICES * tile * tile * 2
        + (N_ACC + 6 * c_win) * tile * tile * 4
    )
    return pl.pallas_call(
        partial(
            _ozaki_panel_kernel,
            c_win=c_win, chunk=chunk, n_groups=n_groups,
        ),
        grid_spec=grid_spec,
        out_shape=[shape, shape, shape],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=min(max(32 << 20, vmem + (16 << 20)), 126 << 20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * N_PAIRS * tile * tile * tile,
            bytes_accessed=(
                loaded_tiles * N_SLICES * tile * tile * 2
                + 3 * n_groups * c_win * tile * tile * 4
            ),
            transcendentals=0,
        ),
    )(gstart, a_lo, a_nch, b_lo, b_nch, obounds, entries, a_sl, b_sl)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def tile_stack_matmul_ozaki_panel(
    a_tiles: jax.Array,  # [nA, T, T] float64
    b_tiles: jax.Array,  # [nB, T, T] float64
    stack_np: np.ndarray,  # int32 [S, 3] (c, a, b) sorted by c
    *,
    n_c_tiles: int,
    a_rows: np.ndarray,   # int [nA] tile-row of each A store tile
    b_cols: np.ndarray,   # int [nB] tile-col of each B store tile
    c_coords: np.ndarray,  # int [n_c, 2] (tile-row, tile-col) per C slot
    plan=None,
    interpret: bool = False,
) -> jax.Array:
    """f64 stack product through the fused ozaki panel kernel.

    Raises ValueError when the pattern is inadmissible (plan first with
    :func:`plan_ozaki_panel` for a graceful fallback)."""
    tile = int(a_tiles.shape[-1])
    if tile > 128:
        raise ValueError("tile > 128 breaks the exact-f32 pair-dot bound")
    if len(stack_np) == 0:
        return jnp.zeros((n_c_tiles, tile, tile), jnp.float64)
    if plan is None:
        plan = plan_ozaki_panel(
            stack_np, n_c_tiles, a_tiles.shape[0], b_tiles.shape[0]
        )
    if plan is None:
        raise ValueError("pattern not ozaki-panel admissible")

    a_rows = np.asarray(a_rows, dtype=np.int64)
    b_cols = np.asarray(b_cols, dtype=np.int64)
    ntr = int(a_rows.max(initial=0)) + 1
    ntc = int(b_cols.max(initial=0)) + 1
    sa = _global_scales(
        jnp.asarray(a_tiles, jnp.float64), jnp.asarray(a_rows),
        n_seg=ntr, axis=-1,
    )  # [ntr, T] f64
    sb = _global_scales(
        jnp.asarray(b_tiles, jnp.float64), jnp.asarray(b_cols),
        n_seg=ntc, axis=-2,
    )  # [ntc, T]
    a_sl = _slice_scaled(
        jnp.asarray(a_tiles, jnp.float64),
        jnp.take(sa, jnp.asarray(a_rows), axis=0), axis=-1,
    )
    b_sl = _slice_scaled(
        jnp.asarray(b_tiles, jnp.float64),
        jnp.take(sb, jnp.asarray(b_cols), axis=0), axis=-2,
    )

    s, es, ee = _ozaki_panel_launch(
        a_sl, b_sl, jnp.asarray(plan.gstart),
        jnp.asarray(plan.a_lo), jnp.asarray(plan.a_nch),
        jnp.asarray(plan.b_lo), jnp.asarray(plan.b_nch),
        jnp.asarray(plan.obounds), jnp.asarray(plan.entries),
        n_groups=plan.n_groups, c_win=plan.c_win, a_cap=plan.a_cap,
        b_cap=plan.b_cap, chunk=plan.chunk, tile=tile,
        n_c_tiles=plan.n_c_tiles, interpret=interpret,
        loaded_tiles=plan.loaded_tiles,
    )
    # the only f64 arithmetic in the pipeline: assemble and unscale
    cc = np.asarray(c_coords, dtype=np.int64)
    sa_c = jnp.take(sa, jnp.asarray(cc[:, 0]), axis=0)  # [n_c, T]
    sb_c = jnp.take(sb, jnp.asarray(cc[:, 1]), axis=0)  # [n_c, T]
    total = (
        s.astype(jnp.float64)
        + es.astype(jnp.float64)
        + ee.astype(jnp.float64)
    )
    return total * sa_c[:, :, None] * sb_c[:, None, :]
