"""Element-level gather maps for block permutation / transposition.

Used by transpose, desymmetrize, redistribute and filtering: every such
transformation is (new index built on host) + (one device gather through a
host-built int32 map). This replaces the reference's block-by-block copy /
transpose loops (``src/block/dbcsr_block_operations.F``) with single
bandwidth-bound XLA ops.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .index import BCSRIndex

__all__ = ["block_permutation_gather", "block_subset_gather"]


def block_permutation_gather(
    new_index: BCSRIndex,
    src_index: BCSRIndex,
    src_blk_of_new: np.ndarray,
    transpose_src: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Gather map (int64 [new nelems]) pulling each element of the new
    layout from the source flat buffer.

    ``src_blk_of_new[b]`` is the source block id for new block ``b``;
    ``transpose_src[b]`` marks blocks whose source is stored transposed
    (new block = src block **T**).
    """
    if new_index.nblks == 0:
        return np.zeros((0,), dtype=np.int64)
    b = new_index.elem_to_blk.astype(np.int64)
    t = np.arange(new_index.nelems, dtype=np.int64) - new_index.blk_offset[b]
    bm_new, bn_new = new_index.blk_shapes
    bn = bn_new.astype(np.int64)[b]
    r = t // bn
    c = t - r * bn
    src_blk = src_blk_of_new.astype(np.int64)[b]
    base = src_index.blk_offset[src_blk]
    if transpose_src is None:
        return base + t
    tr = transpose_src[b]
    # source stored (bn_new, bm_new) row-major when transposed
    bm = bm_new.astype(np.int64)[b]
    straight = r * bn + c
    flipped = c * bm + r
    return base + np.where(tr, flipped, straight)


def block_subset_gather(index: BCSRIndex, keep_mask: np.ndarray) -> np.ndarray:
    """Element indices (int64) of the blocks kept by ``keep_mask``, in
    canonical order — the data-compaction map for filtering."""
    keep_elem = keep_mask[index.elem_to_blk]
    return np.flatnonzero(keep_elem).astype(np.int64)
