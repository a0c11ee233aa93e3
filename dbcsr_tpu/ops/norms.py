"""Per-block norms and matrix-level norms.

Analog of the reference's norms machinery: per-block squared Frobenius norms
feed epsilon filtering (``src/mm/dbcsr_mm_common.F:629-694``, GPU variant
``calculate_norms.cpp``); matrix norms frobenius / maxabs / gershgorin
mirror ``dbcsr_types.F:231-234`` + ``src/ops/dbcsr_operations.F``.

Here the per-block pass is one XLA ``segment_sum`` over the flat data array
— it fuses with neighbouring elementwise work and needs no custom kernel.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..block.bcsr import BCSRMatrix, SYM_NONE
from ..block.index import BCSRIndex

__all__ = ["block_norms_sq", "block_norms", "norm_frobenius", "norm_maxabs", "norm_gershgorin"]


@partial(jax.jit, static_argnums=2)
def _segment_sumsq(data: jax.Array, seg: jax.Array, nseg: int) -> jax.Array:
    v = (data * jnp.conj(data)).real if jnp.iscomplexobj(data) else data * data
    return jax.ops.segment_sum(v, seg, num_segments=nseg)


@partial(jax.jit, static_argnums=2)
def _segment_max_abs(data: jax.Array, seg: jax.Array, nseg: int) -> jax.Array:
    return jax.ops.segment_max(jnp.abs(data), seg, num_segments=nseg)


def block_norms_sq(m: BCSRMatrix) -> jax.Array:
    """Squared Frobenius norm per stored block, float32, device [nblks]."""
    if m.nblks == 0:
        return jnp.zeros((0,), dtype=jnp.float32)
    seg = jnp.asarray(m.index.elem_to_blk)
    out = _segment_sumsq(m.data, seg, m.nblks)
    return out.astype(jnp.float32)


def block_norms(m: BCSRMatrix) -> jax.Array:
    return jnp.sqrt(block_norms_sq(m))


def norm_frobenius(m: BCSRMatrix) -> float:
    nsq = np.asarray(block_norms_sq(m), dtype=np.float64)
    if m.sym != SYM_NONE:
        diag = m.index.blk_rows == m.index.col_idx
        total = 2.0 * nsq.sum() - nsq[diag].sum()
    else:
        total = nsq.sum()
    return float(np.sqrt(total))


def norm_maxabs(m: BCSRMatrix) -> float:
    if m.data.size == 0:
        return 0.0
    return float(jnp.max(jnp.abs(m.data)))


def norm_gershgorin(m: BCSRMatrix) -> float:
    """Gershgorin-circle bound: max over rows of sum_j |a_ij| (on the
    symmetry-expanded matrix)."""
    from ..mm.pack import elem_coords

    mm = m
    if m.sym != SYM_NONE:
        from .transform import desymmetrize

        mm = desymmetrize(m)
    rows, _ = elem_coords(mm.index)
    if mm.data.size == 0:
        return 0.0
    sums = jax.ops.segment_sum(
        jnp.abs(mm.data), jnp.asarray(rows.astype(np.int32)),
        num_segments=mm.index.nfullrows,
    )
    return float(jnp.max(sums))
