"""Tile-stack batched GEMM kernels — the TPU-native libsmm_acc.

The reference JIT-compiles per-(m,n,k) CUDA kernels that process "parameter
stacks" of small GEMMs with atomicAdd into C
(``src/acc/libsmm_acc/libsmm_acc.cpp``, kernels
``smm_acc_dnt_{tiny,small,medium,largeDB*}.h``). Here the stack entries are
(c_tile, a_tile, b_tile) triples over T×T hardware tiles (T=128 → every
matmul is MXU-native), the stack is **sorted by output tile** on the host,
and accumulation uses Pallas output-window revisiting — deterministic, no
atomics (SURVEY.md §7 "scatter-add contention").

Two implementations with identical semantics:
- ``tile_stack_matmul_pallas``: scalar-prefetch gather GEMM, one grid step
  per stack entry, first-visit zeroing of the output window, Pallas's
  pipeline double-buffers the tile DMAs under the MXU (the role of the
  reference's double-buffered largeDB kernels). The stack rides in SMEM as
  a FLAT int32 array (a [S,3] shape would be lane-padded to [S,128] and
  blow the ~1MB SMEM budget), and launches are chunked at output-tile
  boundaries (``max_chunk`` entries) so arbitrarily large stacks fit.
- ``tile_stack_matmul_xla``: gather → batched matmul → segment-sum. Works
  on any backend (CPU tests, f64/complex dtypes).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # Pallas TPU lowering is unavailable on pure-CPU builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

__all__ = [
    "tile_stack_matmul",
    "tile_stack_matmul_pallas",
    "tile_stack_matmul_xla",
]


@partial(jax.jit, static_argnames=("n_c_tiles", "acc_dtype", "precision"))
def tile_stack_matmul_xla(
    a_tiles: jax.Array,  # [nA, T, T]
    b_tiles: jax.Array,  # [nB, T, T]
    stack: jax.Array,  # [S, 3] int32 (c, a, b), sorted by c
    *,
    n_c_tiles: int,
    acc_dtype=jnp.float32,
    precision: str = "default",
) -> jax.Array:
    """Reference implementation: gather, batched matmul, segment-sum."""
    acc = jnp.promote_types(acc_dtype, a_tiles.dtype)
    ga = jnp.take(a_tiles, stack[:, 1], axis=0)
    gb = jnp.take(b_tiles, stack[:, 2], axis=0)
    prods = jax.lax.dot_general(
        ga,
        gb,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=acc,
        precision={
            "default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
        }[precision],
    )
    out = jax.ops.segment_sum(prods, stack[:, 0], num_segments=n_c_tiles + 1)
    return out[:n_c_tiles].astype(a_tiles.dtype)


def _stack_kernel(stack_ref, *refs, precision, e_batch):
    """``e_batch`` stack entries per grid step (all sharing one C tile —
    the host pads each C run to a multiple of e_batch with zero-tile
    entries): E concurrent input DMAs pipeline far better than one, and the
    output window is revisited while consecutive steps share a C tile
    (host-sorted), so accumulation stays in VMEM and each C tile is written
    back exactly once."""
    out_ref = refs[-1]
    i = pl.program_id(0)
    stride = 3 * e_batch
    c_here = stack_ref[stride * i]
    c_prev = stack_ref[stride * jnp.maximum(i, 1) - stride]
    first = jnp.logical_or(i == 0, c_here != c_prev)

    prod = jnp.dot(
        refs[0][0], refs[1][0],
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    for e in range(1, e_batch):
        prod = prod + jnp.dot(
            refs[2 * e][0], refs[2 * e + 1][0],
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    @pl.when(first)
    def _():
        out_ref[0] = prod.astype(out_ref.dtype)

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[0] = out_ref[0] + prod.astype(out_ref.dtype)


_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


@partial(
    jax.jit,
    static_argnames=(
        "n_c", "tile", "interpret", "precision", "out_dtype", "e_batch"
    ),
)
def _pallas_launch(
    a_tiles, b_tiles, flat_stack, *, n_c: int, tile: int, interpret: bool,
    precision: str = "highest", out_dtype=None, e_batch: int = 1,
):
    out_dtype = out_dtype or a_tiles.dtype
    stride = 3 * e_batch
    s = flat_stack.shape[0] // stride

    # index maps must return a uniform int type: under jax_enable_x64 the
    # literal 0s would be i64 next to the i32 SMEM load, and Mosaic fails
    # to legalize the mixed-type transform function
    zero = np.int32(0)

    def mk_spec(off):
        return pl.BlockSpec(
            (1, tile, tile),
            lambda i, st, off=off: (st[stride * i + off], zero, zero),
        )

    in_specs = []
    for e in range(e_batch):
        in_specs.append(mk_spec(3 * e + 1))
        in_specs.append(mk_spec(3 * e + 2))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile, tile), lambda i, st: (st[stride * i], zero, zero)
        ),
    )
    out = pl.pallas_call(
        partial(
            _stack_kernel, precision=_PRECISIONS[precision], e_batch=e_batch
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_c + 1, tile, tile), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * s * e_batch * tile * tile * tile,
            bytes_accessed=(2 * s * e_batch + n_c)
            * tile * tile * a_tiles.dtype.itemsize,
            transcendentals=0,
        ),
    )(flat_stack, *([a_tiles, b_tiles] * e_batch))
    return out


def _bucket(n: int) -> int:
    m = 16
    while m < n:
        m <<= 1
    return m


def tile_stack_matmul_pallas(
    a_tiles: jax.Array,
    b_tiles: jax.Array,
    stack_np: np.ndarray,  # host-side int32 [S, 3], sorted by c
    *,
    n_c_tiles: int,
    max_chunk: int = 32768,
    interpret: bool = False,
    precision: str = "highest",
    out_dtype=None,
    e_batch: Optional[int] = None,
) -> jax.Array:
    """Pallas TPU stack processor (f32/bf16), chunked at c boundaries.

    ``out_dtype`` decouples the accumulation/output dtype from the inputs:
    feeding bf16 tiles with ``out_dtype=float32`` halves the HBM traffic
    this bandwidth-bound kernel pays per stack entry while keeping f32
    accumulation (the MXU computes bf16×bf16→f32 natively).

    Chunk boundaries never split one output tile's run (every C tile is
    finalized within a single launch), so launch results are disjoint,
    consecutive c-slot ranges that concatenate into the full tile store.
    Padding entries inside a launch compute a (real) product into a local
    trash slot that is sliced off.
    """
    tile = a_tiles.shape[1]
    s_total = len(stack_np)
    out_dtype = out_dtype or a_tiles.dtype
    if s_total == 0:
        return jnp.zeros((n_c_tiles, tile, tile), dtype=out_dtype)

    if e_batch is None:
        from ..core.config import get_config

        e_batch = get_config().stack_e_batch
    e_batch = max(int(e_batch), 1)
    if e_batch > 1:
        # pad every C run to a multiple of e_batch with zero-tile entries
        # (the appended all-zero tile: contributes nothing); padding of
        # consecutive identical indices costs ~no DMA (pipeline elision)
        za, zb = a_tiles.shape[0], b_tiles.shape[0]
        c_col0 = stack_np[:, 0]
        run_starts = np.flatnonzero(
            np.concatenate([[True], c_col0[1:] != c_col0[:-1]])
        )
        run_lens = np.diff(np.concatenate([run_starts, [s_total]]))
        pads = (-run_lens) % e_batch
        total2 = int(run_lens.sum() + pads.sum())
        new = np.empty((total2, 3), dtype=np.int32)
        pos = 0
        for rs, rl, pd in zip(run_starts, run_lens, pads):
            new[pos:pos + rl] = stack_np[rs:rs + rl]
            if pd:
                new[pos + rl:pos + rl + pd] = (int(c_col0[rs]), za, zb)
            pos += rl + pd
        stack_np = new
        a_tiles = jnp.concatenate(
            [a_tiles, jnp.zeros((1, tile, tile), a_tiles.dtype)]
        )
        b_tiles = jnp.concatenate(
            [b_tiles, jnp.zeros((1, tile, tile), b_tiles.dtype)]
        )
        s_total = total2

    c_col = stack_np[:, 0]
    outs = []
    start = 0
    while start < s_total:
        end = min(start + max(max_chunk // e_batch, 1) * e_batch, s_total)
        if end < s_total:
            # retreat to the start of the c-run that straddles the cut
            # (runs are multiples of e_batch, so groups stay intact)
            boundary = int(np.searchsorted(c_col, c_col[end], side="left"))
            if boundary <= start:
                raise ValueError(
                    "a single output tile has more contributions than "
                    f"max_chunk={max_chunk}; raise max_stack_size"
                )
            end = boundary
        c_lo = int(c_col[start])
        c_hi = int(c_col[end - 1]) + 1
        n_c_local = c_hi - c_lo
        n_entries = end - start
        length = _bucket(max(n_entries // e_batch, 1)) * e_batch
        chunk = np.empty((length, 3), dtype=np.int32)
        chunk[:n_entries] = stack_np[start:end]
        chunk[:n_entries, 0] -= c_lo
        chunk[n_entries:] = (n_c_local, 0, 0)  # trash groups
        out = _pallas_launch(
            a_tiles,
            b_tiles,
            jnp.asarray(chunk.reshape(-1)),
            n_c=n_c_local,
            tile=tile,
            interpret=interpret,
            precision=precision,
            out_dtype=out_dtype,
            e_batch=e_batch,
        )
        outs.append(out[:n_c_local])
        start = end
    full = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    # every c slot in [0, n_c_tiles) appears in the stack by construction
    assert full.shape[0] == n_c_tiles, (full.shape, n_c_tiles)
    return full


def tile_stack_matmul(
    a_tiles: jax.Array,
    b_tiles: jax.Array,
    stack_np: np.ndarray,
    *,
    n_c_tiles: int,
    acc_dtype=jnp.float32,
    prefer_pallas: bool = True,
    max_chunk: int = 32768,
    precision: str = "highest",
) -> jax.Array:
    """Dispatch: Pallas on TPU for f32/bf16, XLA everywhere else."""
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if (
        prefer_pallas
        and _HAVE_PALLAS
        and on_tpu
        and a_tiles.dtype in (jnp.float32, jnp.bfloat16)
    ):
        return tile_stack_matmul_pallas(
            a_tiles, b_tiles, stack_np, n_c_tiles=n_c_tiles,
            max_chunk=max_chunk, precision=precision,
        )
    return tile_stack_matmul_xla(
        a_tiles,
        b_tiles,
        jnp.asarray(stack_np),
        n_c_tiles=n_c_tiles,
        acc_dtype=acc_dtype,
    )
