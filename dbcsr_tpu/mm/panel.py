"""Panel (supertile) stack kernel — A+B-caching slab-DMA stack processor.

The flat stack kernel (``kernels.tile_stack_matmul_pallas``) pays full HBM
traffic for every stack entry (2 input tiles/entry): the Pallas pipeline
cannot elide DMAs for repeated tile indices under scalar-prefetch index
maps, and the round-2 grouped kernel recovered only the A-side reuse while
paying a ~460 ns/entry DMA control path. This kernel is the round-3 answer,
the TPU-native form of the reference's double-buffered slab kernels
(``src/acc/libsmm_acc/kernels/smm_acc_dnt_largeDB1.h`` stages P_A/P_B slabs
in shared memory while accumulating a C tile in registers):

- the host cuts the c-sorted stack into **groups of exactly ``c_win``
  consecutive C store slots**. The C store is row-major, so a group's C
  tiles span a contiguous range of tile-rows; its A tiles therefore live in
  one contiguous slot span of the (row-major) A store, and the k-window's
  B tiles in one contiguous span of the B store;
- per group, the A span and B span are DMA'd HBM→VMEM as **chunked slab
  copies** (``chunk`` tiles per DMA) into double-buffered caches — group
  g+1's slabs load while group g computes. Each A/B tile moves once per
  group it participates in: full in-group A AND B reuse, and the per-DMA
  issue cost amortizes over ``chunk`` tiles instead of one;
- the inner loop is **pure compute**: per output tile, a register-resident
  f32 accumulator sums ``dot(a_cache[sa], b_cache[sb])`` over that tile's
  entries (packed one int32 each) — no DMAs, no output revisiting;
- each group's finished ``[c_win, T, T]`` window is written back with a
  single slab DMA into its contiguous C-slot range (the output IS the C
  store; no post-gather).

Admissibility is a host-side decision (``plan_panel_stack`` returns None):
the spans must fit the VMEM caches and the slab traffic must beat the flat
kernel's 2-tiles/entry. Banded / clustered / RCM-reordered patterns pass;
uniform-random fine-block patterns don't (their spans are the whole store)
and keep using the flat kernel.
"""
from __future__ import annotations

from dataclasses import dataclass
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
    "PanelPlan",
    "PanelRunPlan",
    "plan_panel_stack",
    "plan_panel_runs",
    "tile_stack_matmul_panel",
    "tile_stack_matmul_panel_runs",
]

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _vmem_limit_bytes(a_cap, b_cap, c_win, tile, in_itemsize, out_itemsize):
    """Per-kernel scoped-VMEM limit for the slab caches.

    XLA's default scoped-vmem stack for custom calls is ~32 MiB — it was
    the binding constraint on ``panel_cache`` (f32 cache 48 fits, 64 does
    not), NOT the chip's VMEM: v5e has 128 MiB/core (compiler-verified —
    a 655 MB scratch fails RESOURCE_EXHAUSTED against size=134217728,
    and cache-256 launches compile once the scoped limit is raised; see
    tests/test_mosaic_compile.py). Request exactly what the caches need
    plus pipeline headroom, never less than the default, capped under
    the physical bound."""
    footprint = (
        2 * (a_cap + b_cap) * tile * tile * in_itemsize
        + 2 * c_win * tile * tile * out_itemsize
    )
    return min(max(32 << 20, footprint + (16 << 20)), 126 << 20)


@dataclass
class PanelPlan:
    """Host plan for one panel-kernel launch sequence."""

    gstart: np.ndarray      # int32 [n_groups] first C store slot of the group
    a_lo: np.ndarray        # int32 [n_groups] first A slot of the group slab
    a_nch: np.ndarray       # int32 [n_groups] A slab length in chunks
    b_lo: np.ndarray        # int32 [n_groups]
    b_nch: np.ndarray       # int32 [n_groups]
    obounds: np.ndarray     # int32 [n_groups*c_win+1] entry offsets per slot
    entries: np.ndarray     # int32 [S'] packed (a_local<<16 | b_local)
    n_groups: int
    c_win: int
    a_cap: int
    b_cap: int
    chunk: int
    n_c_tiles: int
    loaded_tiles: int       # slab traffic in tiles (for admission/stats)
    stack_size: int         # original S (entries may exceed it: the
                            # clamped last group recomputes overlap slots)
    unroll: int = 1         # entry-loop unroll factor (launch knob)

    @property
    def traffic_ratio(self) -> float:
        """Slab input traffic relative to the flat kernel's 2 tiles/entry,
        over the ORIGINAL stack size — the same quantity the
        ``admit_ratio`` test in :func:`plan_panel_stack` enforces."""
        return self.loaded_tiles / (2.0 * max(self.stack_size, 1))


@dataclass
class _SlabGroups:
    """Shared group-window/span/slab computation for both panel planners
    (the c_win grouping, ragged per-group entry gather, chunk-padded A/B
    slab spans with the chunk-halving fallback, and the traffic
    admission). ``b_map``, when given, remaps B slots (e.g. to the
    column-major numbering) BEFORE spans and locals are computed."""

    gstart: np.ndarray      # int64 [n_groups]
    slot_bounds: np.ndarray  # int64 [n_c_tiles+1]
    e0: np.ndarray          # int64 [n_groups]
    glens: np.ndarray       # int64 [n_groups]
    base: np.ndarray        # int64 [n_groups+1]
    idx: np.ndarray         # int64 [tot] global stack row per entry
    g_of_entry: np.ndarray  # int64 [tot]
    a_col: np.ndarray       # int64 [tot]
    b_col: np.ndarray       # int64 [tot] (remapped when b_map given)
    a_lo: np.ndarray        # int64 [n_groups]
    a_nch: np.ndarray       # int32 [n_groups]
    b_lo: np.ndarray        # int64 [n_groups]
    b_nch: np.ndarray       # int32 [n_groups]
    chunk: int
    c_win: int
    n_groups: int
    loaded: int


def _plan_slab_groups(
    stack_np, n_c_tiles, n_a_tiles, n_b_tiles, *,
    c_win, a_cap, b_cap, chunk, admit_ratio, b_map=None,
):
    S = len(stack_np)
    if S == 0 or n_c_tiles == 0:
        return None
    # small stores: a slab is chunk-padded, so the DMA chunk must fit the
    # store (and, after ceil-rounding, the padded span must too) — shrink
    # the chunk rather than reject (single-tile matrices stay admissible)
    chunk = max(1, min(chunk, n_a_tiles, n_b_tiles))
    c_col = stack_np[:, 0].astype(np.int64)
    c_win = min(c_win, n_c_tiles)
    n_groups = -(-n_c_tiles // c_win)

    # group windows: group g owns C store slots [gstart[g], gstart[g]+c_win).
    # The LAST group is clamped to end exactly at n_c_tiles, overlapping its
    # predecessor — overlapped slots are computed by both groups (identical
    # values, so the two output DMAs racing is benign) and the kernel output
    # is exactly the C store, no post-slice.
    gstart = np.minimum(
        np.arange(n_groups, dtype=np.int64) * c_win, n_c_tiles - c_win
    )

    # entry offsets per C slot (c_col is sorted)
    slot_bounds = np.searchsorted(c_col, np.arange(n_c_tiles + 1)).astype(
        np.int64
    )
    e0 = slot_bounds[gstart]
    e1 = slot_bounds[gstart + c_win]
    glens = e1 - e0  # per-group entry counts (overlap duplicates allowed)
    tot = int(glens.sum())
    base = np.concatenate(([0], np.cumsum(glens)))  # [n_groups+1]
    # ragged gather: global stack row index of every per-group entry
    offs = np.arange(tot, dtype=np.int64) - np.repeat(base[:-1], glens)
    idx = np.repeat(e0, glens) + offs
    g_of_entry = np.repeat(np.arange(n_groups, dtype=np.int64), glens)

    a_col = stack_np[idx, 1].astype(np.int64)
    b_col = stack_np[idx, 2].astype(np.int64)
    if b_map is not None:
        b_col = b_map[b_col]

    def spans(col):
        lo = np.zeros(n_groups, dtype=np.int64)
        hi = np.zeros(n_groups, dtype=np.int64)
        nz = glens > 0
        if nz.any():
            starts = base[:-1][nz]
            lo[nz] = np.minimum.reduceat(col, starts)
            hi[nz] = np.maximum.reduceat(col, starts) + 1
        return lo, hi

    a_min, a_hi = spans(a_col)
    b_min, b_hi = spans(b_col)

    def pad_spans(mn, hi, cap, n_store, ch):
        span = hi - mn
        spn = -(-span // ch) * ch  # chunk-padded slab length
        spn = np.maximum(spn, ch)
        if spn.max(initial=0) > cap or n_store < int(spn.max(initial=0)):
            return None, None
        # shift starts down so the padded slab stays inside the store
        lo = np.maximum(0, np.minimum(mn, n_store - spn))
        return lo.astype(np.int64), (spn // ch).astype(np.int32)

    # ceil-rounding can push a padded span past a small store (e.g. span
    # 13, chunk 4 -> 16 > 13 tiles): halve the chunk until the slabs fit;
    # at chunk=1 the padded span equals the true span, so only genuinely
    # cache-exceeding spans remain inadmissible
    a_lo = b_lo = None
    while chunk >= 1:
        a_lo, a_nch = pad_spans(a_min, a_hi, a_cap, n_a_tiles, chunk)
        if a_lo is not None:
            b_lo, b_nch = pad_spans(b_min, b_hi, b_cap, n_b_tiles, chunk)
        if a_lo is not None and b_lo is not None:
            break
        if chunk == 1:
            return None
        chunk //= 2
    if a_lo is None or b_lo is None:
        return None

    loaded = int((a_nch.astype(np.int64) + b_nch).sum()) * chunk
    if admit_ratio is not None and loaded > admit_ratio * 2.0 * S:
        return None
    return _SlabGroups(
        gstart=gstart, slot_bounds=slot_bounds, e0=e0, glens=glens,
        base=base, idx=idx, g_of_entry=g_of_entry, a_col=a_col,
        b_col=b_col, a_lo=a_lo, a_nch=a_nch, b_lo=b_lo, b_nch=b_nch,
        chunk=chunk, c_win=c_win, n_groups=n_groups, loaded=loaded,
    )



def plan_panel_stack(
    stack_np: np.ndarray,  # int32 [S, 3] (c, a, b) sorted by c
    n_c_tiles: int,
    n_a_tiles: int,
    n_b_tiles: int,
    *,
    c_win: int = 16,
    a_cap: int = 64,
    b_cap: int = 64,
    chunk: int = 8,
    admit_ratio: Optional[float] = None,
    unroll: int = 1,
) -> Optional[PanelPlan]:
    """Group the stack into ``c_win``-slot panels; None if inadmissible
    (a group's A/B span exceeds the cache, the store is too small for the
    chunk-padded slabs, or slab traffic does not beat the flat kernel)."""
    S = len(stack_np)
    sg = _plan_slab_groups(
        stack_np, n_c_tiles, n_a_tiles, n_b_tiles, c_win=c_win,
        a_cap=a_cap, b_cap=b_cap, chunk=chunk, admit_ratio=admit_ratio,
    )
    if sg is None:
        return None

    a_local = sg.a_col - sg.a_lo[sg.g_of_entry]
    b_local = sg.b_col - sg.b_lo[sg.g_of_entry]
    assert a_local.min(initial=0) >= 0 and b_local.min(initial=0) >= 0
    entries = ((a_local << 16) | b_local).astype(np.int32)

    # per (group, local slot) entry offsets into the regrouped entry array
    l_idx = sg.gstart[:, None] + np.arange(sg.c_win, dtype=np.int64)[None, :]
    ob = sg.base[:-1, None] + sg.slot_bounds[l_idx] - sg.e0[:, None]
    obounds = np.append(ob.ravel(), len(sg.idx)).astype(np.int32)

    # shrink the launch caps to the REALIZED max span (chunk-padded): the
    # requested a_cap/b_cap only gate admission, while the VMEM scratch is
    # sized from the plan's caps — a generous cap therefore costs nothing
    # once the pattern's true spans are known
    return PanelPlan(
        gstart=sg.gstart.astype(np.int32),
        a_lo=sg.a_lo.astype(np.int32),
        a_nch=sg.a_nch,
        b_lo=sg.b_lo.astype(np.int32),
        b_nch=sg.b_nch,
        obounds=obounds,
        entries=entries,
        n_groups=sg.n_groups,
        c_win=sg.c_win,
        a_cap=int(sg.a_nch.max(initial=1)) * sg.chunk,
        b_cap=int(sg.b_nch.max(initial=1)) * sg.chunk,
        chunk=sg.chunk,
        n_c_tiles=n_c_tiles,
        loaded_tiles=sg.loaded,
        stack_size=S,
        unroll=unroll,
    )


def _panel_kernel(
    # scalar prefetch
    gstart_ref, a_lo_ref, a_nch_ref, b_lo_ref, b_nch_ref, ob_ref, ent_ref,
    # tensor inputs (HBM-resident)
    a_hbm, b_hbm,
    # output (HBM-resident)
    out_hbm,
    # scratch
    a_cache, b_cache, c_buf, a_sems, b_sems, c_sems,
    *, c_win: int, chunk: int, n_groups: int, precision, unroll: int,
):
    # all scalar index math pinned i32 (x64 mixed-width traps, see
    # kernels.py `zero` note)
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

    # wait for this group's slabs
    def a_wait(i, _):
        a_dma(g, buf, i.astype(i32)).wait()
        return 0

    jax.lax.fori_loop(np.int32(0), a_nch_ref[g].astype(i32), a_wait, 0)

    def b_wait(i, _):
        b_dma(g, buf, i.astype(i32)).wait()
        return 0

    jax.lax.fori_loop(np.int32(0), b_nch_ref[g].astype(i32), b_wait, 0)

    def out_dma(grp, slot):
        return pltpu.make_async_copy(
            c_buf.at[slot],
            out_hbm.at[pl.ds(gstart_ref[grp].astype(i32), c_win)],
            c_sems.at[slot],
        )

    # the out DMA issued two steps ago used this c_buf slot: wait before
    # overwriting
    @pl.when(g >= two)
    def _():
        out_dma(g - two, buf).wait()

    tile = c_buf.shape[-1]

    # STATIC-bound fori_loop: under jax_enable_x64 the induction variable
    # is int64 regardless of the bounds' dtype, and a 64->32 narrowing
    # convert inside a Mosaic kernel recurses forever in the lowering
    # (JAX 0.9 _convert_helper). Carry our own i32 counter instead and
    # ignore the induction variable.
    def l_body(_, li):
        l = li
        e0 = ob_ref[g * cwin_c + l].astype(i32)
        e1 = ob_ref[g * cwin_c + l + one].astype(i32)

        def dot_at(e, acc):
            packed = ent_ref[e.astype(i32)].astype(i32)
            sa = jax.lax.shift_right_logical(packed, np.int32(16))
            sb = jnp.bitwise_and(packed, bmask)
            return acc + jnp.dot(
                a_cache[buf, sa],
                b_cache[buf, sb],
                preferred_element_type=jnp.float32,
                precision=precision,
            )

        zero_acc = jnp.zeros((tile, tile), jnp.float32)
        if unroll <= 1:
            acc = jax.lax.fori_loop(e0, e1, dot_at, zero_acc)
        else:
            # bounds are dynamic per slot, so lax's own `unroll` is
            # unavailable: strip-mine by hand — a chunked loop whose body
            # issues `unroll` consecutive dots (letting Mosaic pipeline
            # the MXU: the per-entry loop is issue-bound), then a
            # remainder loop
            u = np.int32(unroll)

            def chunk_body(t, acc):
                base = e0 + t.astype(i32) * u
                for uu in range(unroll):
                    acc = dot_at(base + np.int32(uu), acc)
                return acc

            n_full = jax.lax.div(e1 - e0, u)
            acc = jax.lax.fori_loop(np.int32(0), n_full, chunk_body, zero_acc)
            acc = jax.lax.fori_loop(e0 + n_full * u, e1, dot_at, acc)
        c_buf[buf, pl.ds(l, 1)] = acc.astype(c_buf.dtype)[None]
        return li + one

    jax.lax.fori_loop(np.int32(0), cwin_c, l_body, np.int32(0))

    # the clamped last group's C window may overlap group g-1's (gstart is
    # clamped so gstart + c_win <= n_c_tiles): drain the previous output
    # DMA BEFORE starting ours so two in-flight DMAs never target the same
    # HBM addresses — concurrent same-address writes are not guaranteed
    # benign even when the data is bit-identical
    @pl.when((g == np.int32(n_groups) - one) & (g >= one))
    def _():
        out_dma(g - one, jnp.remainder(g + one, two)).wait()

    dma = out_dma(g, buf)
    dma.start()

    # drain our own output DMA at the last step
    @pl.when(g == np.int32(n_groups) - one)
    def _():
        dma.wait()


@partial(
    jax.jit,
    static_argnames=(
        "n_groups", "c_win", "a_cap", "b_cap", "chunk", "tile",
        "n_c_tiles", "interpret", "precision", "out_dtype", "loaded_tiles",
        "unroll",
    ),
)
def _panel_launch(
    a_tiles, b_tiles, gstart, a_lo, a_nch, b_lo, b_nch, obounds, entries, *,
    n_groups: int, c_win: int, a_cap: int, b_cap: int, chunk: int,
    tile: int, n_c_tiles: int, interpret: bool, precision: str, out_dtype,
    loaded_tiles: int, unroll: int = 1,
):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, a_cap, tile, tile), a_tiles.dtype),
            pltpu.VMEM((2, b_cap, tile, tile), b_tiles.dtype),
            pltpu.VMEM((2, c_win, tile, tile), out_dtype),
            pltpu.SemaphoreType.DMA((2, a_cap // chunk)),
            pltpu.SemaphoreType.DMA((2, b_cap // chunk)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    s = int(entries.shape[0])
    return pl.pallas_call(
        partial(
            _panel_kernel,
            c_win=c_win,
            chunk=chunk,
            n_groups=n_groups,
            precision=_PRECISIONS[precision],
            unroll=unroll,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_c_tiles, tile, tile), out_dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_vmem_limit_bytes(
                a_cap, b_cap, c_win, tile, a_tiles.dtype.itemsize,
                jnp.dtype(out_dtype).itemsize,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * tile * tile * tile,
            bytes_accessed=(
                loaded_tiles
                * tile * tile * a_tiles.dtype.itemsize
                + n_groups * c_win * tile * tile
                * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
    )(gstart, a_lo, a_nch, b_lo, b_nch, obounds, entries, a_tiles, b_tiles)


def tile_stack_matmul_panel(
    a_tiles: jax.Array,
    b_tiles: jax.Array,
    stack_np: np.ndarray,
    *,
    n_c_tiles: int,
    plan: Optional[PanelPlan] = None,
    c_win: int = 16,
    a_cap: int = 64,
    b_cap: int = 64,
    chunk: int = 8,
    interpret: bool = False,
    precision: str = "highest",
    out_dtype=None,
    unroll: int = 1,
) -> jax.Array:
    """Panel-kernel stack processor. Raises ValueError if the pattern is
    inadmissible (callers that want a fallback should plan first with
    ``plan_panel_stack`` and check for None)."""
    tile = a_tiles.shape[1]
    out_dtype = out_dtype or a_tiles.dtype
    if len(stack_np) == 0:
        return jnp.zeros((n_c_tiles, tile, tile), dtype=out_dtype)
    if plan is None:
        plan = plan_panel_stack(
            stack_np, n_c_tiles, a_tiles.shape[0], b_tiles.shape[0],
            c_win=c_win, a_cap=a_cap, b_cap=b_cap, chunk=chunk,
            unroll=unroll,
        )
    if plan is None:
        raise ValueError("pattern not panel-admissible")
    return _panel_launch(
        a_tiles, b_tiles, jnp.asarray(plan.gstart),
        jnp.asarray(plan.a_lo), jnp.asarray(plan.a_nch),
        jnp.asarray(plan.b_lo), jnp.asarray(plan.b_nch),
        jnp.asarray(plan.obounds), jnp.asarray(plan.entries),
        n_groups=plan.n_groups, c_win=plan.c_win, a_cap=plan.a_cap,
        b_cap=plan.b_cap, chunk=plan.chunk, tile=tile,
        n_c_tiles=plan.n_c_tiles, interpret=interpret,
        precision=precision, out_dtype=out_dtype,
        loaded_tiles=plan.loaded_tiles, unroll=plan.unroll,
    )


# ---------------------------------------------------------------------------
# k-run fusion: merge runs of consecutive (A, B) tile pairs into long-K dots
# ---------------------------------------------------------------------------
#
# The panel kernel above issues one 128-K `jnp.dot` per stack entry; on
# banded patterns the measured cost is dominated by the per-entry issue
# path (scalar decode + dynamic cache indexing + MXU start/drain), not by
# slab traffic. But a banded C slot's contraction Sum_k A(r,k)·B(k,c) walks
# k CONSECUTIVELY: in a row-major A store the A tiles of row r are adjacent
# slots, and in a COLUMN-major B store the B tiles of column c are adjacent
# slots. Storing the A slab as stacked TRANSPOSED tiles (rows r*T+j hold
# A_r[:, j]) and the B slab as stacked tiles in column-major slot order
# makes a length-R run one contiguous (R*T, T) slice of each cache, and
#
#     Sum_r A_r @ B_r  ==  dot_general(a_slice, b_slice,
#                                      contracting lhs dim 0 with rhs dim 0)
#
# one MXU issue of K = R*T instead of R issues of K = T — R× fewer issue
# slots AND a deeper MXU pipeline per issue. The reference's largeDB
# kernels make the same move in registers: double-buffered slabs feed one
# long accumulation loop (`src/acc/libsmm_acc/kernels/smm_acc_dnt_largeDB1.h`).
# Runs are detected by the host planner on actual slot numbers (quantized
# to fixed R + per-entry remainder, keeping every dot shape static);
# patterns with no runs degrade to the per-entry loop and lose nothing.


@dataclass
class PanelRunPlan:
    """Host plan for the run-fused panel kernel launch sequence."""

    gstart: np.ndarray      # int32 [n_groups] first C store slot of the group
    a_lo: np.ndarray        # int32 [n_groups] first A slab tile
    a_nch: np.ndarray       # int32 [n_groups] A slab length in chunks
    b_lo: np.ndarray        # int32 [n_groups] (column-major B positions)
    b_nch: np.ndarray       # int32 [n_groups]
    obq: np.ndarray         # int32 [n_groups*c_win+1] quad offsets per slot
    qent: np.ndarray        # int32 [nQ] packed (a_local<<16 | b_local)
    obp: np.ndarray         # int32 [n_groups*c_win+1] pair offsets per slot
    pent: np.ndarray        # int32 [nP] packed pair entries (K = 2T)
    obs: np.ndarray         # int32 [n_groups*c_win+1] single offsets per slot
    sent: np.ndarray        # int32 [nS'] packed remainder entries
    cm_perm: Optional[np.ndarray]  # int32 [n_b] new b slot -> old (take map)
    n_groups: int
    c_win: int
    a_cap: int
    b_cap: int
    chunk: int
    runlen: int
    n_c_tiles: int
    loaded_tiles: int
    stack_size: int
    n_quads: int
    n_pairs: int
    n_singles: int

    @property
    def traffic_ratio(self) -> float:
        """Slab input traffic vs the flat kernel's 2 tiles/entry (over the
        original stack size, as the admission test enforces)."""
        return self.loaded_tiles / (2.0 * max(self.stack_size, 1))

    @property
    def issue_ratio(self) -> float:
        """MXU issue slots vs one-dot-per-entry (the fusion payoff)."""
        return (
            self.n_quads + self.n_pairs + self.n_singles
        ) / max(self.stack_size, 1)


def plan_panel_runs(
    stack_np: np.ndarray,  # int32 [S, 3] (c, a, b) sorted by c
    n_c_tiles: int,
    n_a_tiles: int,
    n_b_tiles: int,
    *,
    b_cm_perm: Optional[np.ndarray] = None,  # new slot -> old slot (take map)
    c_win: int = 8,
    a_cap: int = 64,
    b_cap: int = 64,
    chunk: int = 8,
    runlen: int = 4,
    admit_ratio: Optional[float] = None,
) -> Optional[PanelRunPlan]:
    """Run-fused panel plan; None if inadmissible (same span/cache/traffic
    rules as :func:`plan_panel_stack`, evaluated on the column-major B
    numbering). ``b_cm_perm`` maps the kernel's B slot order to the
    caller's store order (``argsort`` of column-major keys); None means
    the store is already in the desired order."""
    S = len(stack_np)
    if runlen < 2:
        return None
    b_map = None
    if b_cm_perm is not None:
        b_map = np.empty(n_b_tiles, dtype=np.int64)
        b_map[np.asarray(b_cm_perm, dtype=np.int64)] = np.arange(
            n_b_tiles, dtype=np.int64
        )
    sg = _plan_slab_groups(
        stack_np, n_c_tiles, n_a_tiles, n_b_tiles, c_win=c_win,
        a_cap=a_cap, b_cap=b_cap, chunk=chunk, admit_ratio=admit_ratio,
        b_map=b_map,
    )
    if sg is None:
        return None
    c_win = sg.c_win
    n_groups = sg.n_groups
    gstart = sg.gstart
    tot = len(sg.idx)

    # sort each (group, C slot) segment by A slot so consecutive-k runs
    # are adjacent (within-slot order is free: the accumulator is f32
    # either way and slot entry COUNTS are what obounds encode). Spans
    # and slabs are order-invariant, so the helper's results carry over.
    c_of_entry = stack_np[sg.idx, 0].astype(np.int64)
    seg = sg.g_of_entry * np.int64(n_c_tiles) + c_of_entry
    order2 = np.lexsort((sg.a_col, seg))
    a_col = sg.a_col[order2]
    b_col = sg.b_col[order2]
    seg = seg[order2]
    g_of_entry = sg.g_of_entry[order2]
    c_of_entry = c_of_entry[order2]
    a_lo, b_lo = sg.a_lo, sg.b_lo

    # run detection on slab-local slot numbers
    a_local = a_col - a_lo[g_of_entry]
    b_local = b_col - b_lo[g_of_entry]
    assert a_local.min(initial=0) >= 0 and b_local.min(initial=0) >= 0
    new_run = np.ones(tot, dtype=bool)
    if tot > 1:
        new_run[1:] = (
            (seg[1:] != seg[:-1])
            | (a_col[1:] != a_col[:-1] + 1)
            | (b_col[1:] != b_col[:-1] + 1)
        )
    run_id = np.cumsum(new_run) - 1
    run_start = np.flatnonzero(new_run)
    run_len = np.diff(np.append(run_start, tot))
    off_in_run = np.arange(tot, dtype=np.int64) - run_start[run_id]
    # three-tier quantization: full R-runs, then K=2T pairs on the
    # remainder, then per-entry singles (runlen==2 leaves the pair tier
    # empty — quads already are pairs)
    n_full = (run_len // runlen) * runlen
    off2 = off_in_run - n_full[run_id]
    rem_len = run_len - n_full
    n_pair = (rem_len // 2) * 2
    is_quad = (off_in_run < n_full[run_id]) & (off_in_run % runlen == 0)
    is_pair = (off2 >= 0) & (off2 < n_pair[run_id]) & (off2 % 2 == 0)
    is_single = off2 >= n_pair[run_id]

    packed = ((a_local << 16) | b_local).astype(np.int32)
    qent = packed[is_quad]
    pent = packed[is_pair]
    sent = packed[is_single]

    # per (group, local slot) offsets for each entry family; entries are
    # already ordered by (group, slot)
    cell = g_of_entry * np.int64(c_win) + (c_of_entry - gstart[g_of_entry])
    ncell = n_groups * c_win

    def cell_bounds(mask):
        counts = np.bincount(cell[mask], minlength=ncell)
        return np.concatenate(
            ([0], np.cumsum(counts))
        ).astype(np.int32)

    obq = cell_bounds(is_quad)
    obp = cell_bounds(is_pair)
    obs = cell_bounds(is_single)

    return PanelRunPlan(
        gstart=gstart.astype(np.int32),
        a_lo=a_lo.astype(np.int32),
        a_nch=sg.a_nch,
        b_lo=b_lo.astype(np.int32),
        b_nch=sg.b_nch,
        obq=obq,
        qent=qent if len(qent) else np.zeros(1, dtype=np.int32),
        obp=obp,
        pent=pent if len(pent) else np.zeros(1, dtype=np.int32),
        obs=obs,
        sent=sent if len(sent) else np.zeros(1, dtype=np.int32),
        cm_perm=(
            None
            if b_cm_perm is None
            else np.asarray(b_cm_perm, dtype=np.int32)
        ),
        n_groups=n_groups,
        c_win=c_win,
        # realized max span (chunk-padded), not the requested admission
        # cap — see the PanelPlan construction note
        a_cap=int(sg.a_nch.max(initial=1)) * sg.chunk,
        b_cap=int(sg.b_nch.max(initial=1)) * sg.chunk,
        chunk=sg.chunk,
        runlen=runlen,
        n_c_tiles=n_c_tiles,
        loaded_tiles=sg.loaded,
        stack_size=S,
        n_quads=int(is_quad.sum()),
        n_pairs=int(is_pair.sum()),
        n_singles=int(is_single.sum()),
    )


def _panel_run_kernel(
    # scalar prefetch
    gstart_ref, a_lo_ref, a_nch_ref, b_lo_ref, b_nch_ref,
    obq_ref, qent_ref, obp_ref, pent_ref, obs_ref, sent_ref,
    # tensor inputs (HBM-resident, FLAT: A^T tiles / column-major B tiles
    # stacked along the sublane dim)
    a_hbm, b_hbm,
    # output (HBM-resident)
    out_hbm,
    # scratch
    a_cache, b_cache, c_buf, a_sems, b_sems, c_sems,
    *, c_win: int, chunk: int, n_groups: int, precision, runlen: int,
    tile: int,
):
    # all scalar index math pinned i32 (x64 mixed-width traps, see
    # kernels.py `zero` note)
    i32 = jnp.int32
    one = np.int32(1)
    two = np.int32(2)
    t_c = np.int32(tile)
    chrow = chunk * tile  # rows per slab-DMA chunk (static)
    cwin_c = np.int32(c_win)
    bmask = np.int32(0xFFFF)
    g = pl.program_id(0).astype(i32)
    buf = jnp.remainder(g, two)

    def a_dma(grp, slot, i):
        return pltpu.make_async_copy(
            a_hbm.at[pl.ds(a_lo_ref[grp].astype(i32) * t_c + i * np.int32(chrow), chrow)],
            a_cache.at[slot, pl.ds(i * np.int32(chrow), chrow)],
            a_sems.at[slot, i],
        )

    def b_dma(grp, slot, i):
        return pltpu.make_async_copy(
            b_hbm.at[pl.ds(b_lo_ref[grp].astype(i32) * t_c + i * np.int32(chrow), chrow)],
            b_cache.at[slot, pl.ds(i * np.int32(chrow), chrow)],
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

    def out_dma(grp, slot):
        return pltpu.make_async_copy(
            c_buf.at[slot],
            out_hbm.at[pl.ds(gstart_ref[grp].astype(i32), c_win)],
            c_sems.at[slot],
        )

    @pl.when(g >= two)
    def _():
        out_dma(g - two, buf).wait()

    dims = (((0,), (0,)), ((), ()))  # contract sublane dim of both slabs

    # i32 carry counter; see _panel_kernel's l_body for why the static-
    # bound induction variable cannot be used under x64
    def l_body(_, li):
        l = li
        cell = g * cwin_c + l

        def dot_run(ent_ref, rt):
            # one fused dot over rt = run*tile rows of each slab
            def body(e, acc):
                packed = ent_ref[e.astype(i32)].astype(i32)
                sa = jax.lax.shift_right_logical(packed, np.int32(16))
                sb = jnp.bitwise_and(packed, bmask)
                return acc + jax.lax.dot_general(
                    a_cache[buf, pl.ds(sa * t_c, rt)],
                    b_cache[buf, pl.ds(sb * t_c, rt)],
                    dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )

            return body

        acc = jax.lax.fori_loop(
            obq_ref[cell].astype(i32), obq_ref[cell + one].astype(i32),
            dot_run(qent_ref, runlen * tile),
            jnp.zeros((tile, tile), jnp.float32),
        )
        if runlen > 2:
            acc = jax.lax.fori_loop(
                obp_ref[cell].astype(i32), obp_ref[cell + one].astype(i32),
                dot_run(pent_ref, 2 * tile),
                acc,
            )
        acc = jax.lax.fori_loop(
            obs_ref[cell].astype(i32), obs_ref[cell + one].astype(i32),
            dot_run(sent_ref, tile),
            acc,
        )
        c_buf[buf, pl.ds(l, 1)] = acc.astype(c_buf.dtype)[None]
        return li + one

    jax.lax.fori_loop(np.int32(0), cwin_c, l_body, np.int32(0))

    # same clamped-last-group overlap rule as _panel_kernel: drain the
    # previous output DMA before starting an overlapping one
    @pl.when((g == np.int32(n_groups) - one) & (g >= one))
    def _():
        out_dma(g - one, jnp.remainder(g + one, two)).wait()

    dma = out_dma(g, buf)
    dma.start()

    @pl.when(g == np.int32(n_groups) - one)
    def _():
        dma.wait()


@partial(
    jax.jit,
    static_argnames=(
        "n_groups", "c_win", "a_cap", "b_cap", "chunk", "runlen", "tile",
        "n_c_tiles", "interpret", "precision", "out_dtype", "loaded_tiles",
    ),
)
def _panel_run_launch(
    a_tiles, b_tiles, cm_perm, gstart, a_lo, a_nch, b_lo, b_nch,
    obq, qent, obp, pent, obs, sent, *,
    n_groups: int, c_win: int, a_cap: int, b_cap: int, chunk: int,
    runlen: int, tile: int, n_c_tiles: int, interpret: bool,
    precision: str, out_dtype, loaded_tiles: int,
):
    t = tile
    # flat slab layouts (one XLA pass each, fused with any upstream
    # gather inside the same jit): A as stacked TRANSPOSED tiles, B as
    # stacked tiles in column-major slot order
    a_flat = jnp.swapaxes(a_tiles, 1, 2).reshape(-1, t)
    if cm_perm is not None:
        b_flat = jnp.take(b_tiles, cm_perm, axis=0).reshape(-1, t)
    else:
        b_flat = b_tiles.reshape(-1, t)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=11,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, a_cap * t, t), a_tiles.dtype),
            pltpu.VMEM((2, b_cap * t, t), b_tiles.dtype),
            pltpu.VMEM((2, c_win, t, t), out_dtype),
            pltpu.SemaphoreType.DMA((2, a_cap // chunk)),
            pltpu.SemaphoreType.DMA((2, b_cap // chunk)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    s = (
        int(qent.shape[0]) * runlen
        + int(pent.shape[0]) * 2
        + int(sent.shape[0])
    )
    return pl.pallas_call(
        partial(
            _panel_run_kernel,
            c_win=c_win,
            chunk=chunk,
            n_groups=n_groups,
            precision=_PRECISIONS[precision],
            runlen=runlen,
            tile=t,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_c_tiles, t, t), out_dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_vmem_limit_bytes(
                a_cap, b_cap, c_win, t, a_tiles.dtype.itemsize,
                jnp.dtype(out_dtype).itemsize,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * t * t * t,
            bytes_accessed=(
                loaded_tiles * t * t * a_tiles.dtype.itemsize
                + n_groups * c_win * t * t * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
    )(
        gstart, a_lo, a_nch, b_lo, b_nch, obq, qent, obp, pent, obs, sent,
        a_flat, b_flat,
    )


def tile_stack_matmul_panel_runs(
    a_tiles: jax.Array,
    b_tiles: jax.Array,
    stack_np: np.ndarray,
    *,
    n_c_tiles: int,
    plan: Optional[PanelRunPlan] = None,
    b_cm_perm: Optional[np.ndarray] = None,
    c_win: int = 8,
    a_cap: int = 64,
    b_cap: int = 64,
    chunk: int = 8,
    runlen: int = 4,
    interpret: bool = False,
    precision: str = "highest",
    out_dtype=None,
) -> jax.Array:
    """Run-fused panel stack processor (see the k-run fusion note above).
    Raises ValueError if the pattern is inadmissible."""
    tile = a_tiles.shape[1]
    out_dtype = out_dtype or a_tiles.dtype
    if len(stack_np) == 0:
        return jnp.zeros((n_c_tiles, tile, tile), dtype=out_dtype)
    if plan is None:
        plan = plan_panel_runs(
            stack_np, n_c_tiles, a_tiles.shape[0], b_tiles.shape[0],
            b_cm_perm=b_cm_perm, c_win=c_win, a_cap=a_cap, b_cap=b_cap,
            chunk=chunk, runlen=runlen,
        )
    if plan is None:
        raise ValueError("pattern not panel-run-admissible")
    return _panel_run_launch(
        a_tiles, b_tiles,
        None if plan.cm_perm is None else jnp.asarray(plan.cm_perm),
        jnp.asarray(plan.gstart),
        jnp.asarray(plan.a_lo), jnp.asarray(plan.a_nch),
        jnp.asarray(plan.b_lo), jnp.asarray(plan.b_nch),
        jnp.asarray(plan.obq), jnp.asarray(plan.qent),
        jnp.asarray(plan.obp), jnp.asarray(plan.pent),
        jnp.asarray(plan.obs), jnp.asarray(plan.sent),
        n_groups=plan.n_groups, c_win=plan.c_win, a_cap=plan.a_cap,
        b_cap=plan.b_cap, chunk=plan.chunk, runlen=plan.runlen,
        tile=tile, n_c_tiles=plan.n_c_tiles, interpret=interpret,
        precision=precision, out_dtype=out_dtype,
        loaded_tiles=plan.loaded_tiles,
    )
