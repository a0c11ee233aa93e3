"""SUMMA distributed multiply over arbitrary (non-square) 2-D meshes.

The reference offers two distributed algorithms: Cannon point-to-point
shifts (``dbcsr_mm_cannon.F``) and the one-sided 2.5D driver
(``dbcsr_mm_3d.F``), with "image decimation" to run Cannon on non-square
grids (``dbcsr_mm_dist_operations.F:56-212``). The TPU-native second
algorithm is SUMMA: device (i, j) owns the C tiles with row-bin i / col-bin
j and consumes A's row-panel i (k-sharded along the 'pc' axis) and B's
col-panel j (k-sharded along 'pr'); each k-step broadcasts one k-slice —
here ``lax.all_gather`` over one mesh axis, which XLA pipelines over ICI.
SUMMA has no grid-shape constraint, so it is the dispatch choice whenever
nprow != npcol (the reference reaches the same generality via virtual-image
decimation of Cannon).

Work partitioning is tile-granular like the tiled Cannon path (block
distributions honored as their nearest tile-aligned form).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..block.bcsr import BCSRMatrix
from ..block.index import BCSRIndex
from ..block.store import store_layout
from ..block.tileops import take_tiles, valid_mask
from ..core.stats import get_stats
from ..core.timing import timed
from ..dist.distribution import Distribution, dist_tile_bins
from ..dist.grid import AXIS_COL, AXIS_ROW
from .tileplan import enumerate_tile_triples

__all__ = ["execute_summa", "pad_summa_plan"]

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


@dataclass
class SummaPlan:
    p: int  # nprow
    q: int  # npcol
    n_a: int  # A panel capacity (tiles) per device
    n_b: int
    n_c: int
    s_max: int
    a_pack: np.ndarray  # int32 [P*Q*n_a] op-store slot (-1 pad)
    b_pack: np.ndarray
    stacks: np.ndarray  # int32 [P, Q, s_max, 3] (c, a_local, b_local)
    c_unpack: np.ndarray  # int32 [c n_tiles] -> [P*Q*n_c] position


def plan_summa(
    a_coords: np.ndarray,
    b_coords: np.ndarray,
    c_layout,
    rowb: np.ndarray,  # m tile-row -> prow
    colb: np.ndarray,  # n tile-col -> pcol
    kb_a: np.ndarray,  # k tile -> pcol bin (A's k sharding)
    kb_b: np.ndarray,  # k tile -> prow bin (B's k sharding)
    p: int,
    q: int,
) -> SummaPlan:
    """Tile-granular SUMMA schedule.

    A tile (tr, tc) lives on device (rowb[tr], kb_a[tc]); B tile (tr, tc)
    on (kb_b[tr], colb[tc]). After the all_gathers every device holds A's
    full row-panel and B's full col-panel, so the local stacks reference
    positions in the GATHERED panels: A slot = owner_col * n_a + local slot.
    (Plans sharing one shard_map pad to common capacities with
    :func:`pad_summa_plan`.)
    """
    # --- owner panels -------------------------------------------------------
    def group(coords, rkey, ckey):
        out = {}
        pr = rkey[coords[:, 0]]
        pc = ckey[coords[:, 1]]
        for t in range(len(coords)):
            out.setdefault((int(pr[t]), int(pc[t])), []).append(t)
        return out

    a_panels = group(a_coords, rowb, kb_a)  # (i, kq) -> tiles
    b_panels = group(b_coords, kb_b, colb)  # (kp, j) -> tiles
    n_a = max((len(v) for v in a_panels.values()), default=1)
    n_b = max((len(v) for v in b_panels.values()), default=1)

    a_pack = np.full((p, q, n_a), -1, dtype=np.int64)
    for (i, kq), tiles in a_panels.items():
        a_pack[i, kq, : len(tiles)] = tiles
    b_pack = np.full((p, q, n_b), -1, dtype=np.int64)
    for (kp, j), tiles in b_panels.items():
        b_pack[kp, j, : len(tiles)] = tiles

    # --- C ownership ---------------------------------------------------------
    c_coords = c_layout.tile_coords
    c_dev = rowb[c_coords[:, 0]] * q + colb[c_coords[:, 1]]
    n_c = max(int(np.bincount(c_dev, minlength=p * q).max()), 1)
    c_unpack = np.empty(len(c_coords), dtype=np.int64)
    pos = np.zeros(p * q, dtype=np.int64)
    c_keys_dev = {d: [] for d in range(p * q)}
    for s in range(len(c_coords)):
        d = int(c_dev[s])
        c_unpack[s] = d * n_c + pos[d]
        c_keys_dev[d].append(
            int(c_coords[s, 0]) * c_layout.ntc + int(c_coords[s, 1])
        )
        pos[d] += 1
    c_keys_dev = {d: np.asarray(v, dtype=np.int64) for d, v in c_keys_dev.items()}

    # --- per-device stacks over the gathered panels ---------------------------
    mt, ktl, ntc = len(rowb), len(kb_a), len(colb)

    def pat(slots_with_offsets, coords, shape):
        tiles = np.concatenate([t for t, _ in slots_with_offsets]) if slots_with_offsets else np.zeros(0, np.int64)
        vals = np.concatenate([o for _, o in slots_with_offsets]) if slots_with_offsets else np.zeros(0, np.int64)
        return sp.csr_matrix(
            (
                vals + 1,
                (coords[tiles, 0].astype(np.int64), coords[tiles, 1].astype(np.int64)),
            ),
            shape=shape,
        )

    s_max = 1
    triples = {}
    for i in range(p):
        for j in range(q):
            # A row-panel i: pieces from every owner col kq
            a_parts = []
            for kq in range(q):
                tl = a_panels.get((i, kq), [])
                if tl:
                    base = kq * n_a
                    a_parts.append(
                        (np.asarray(tl), base + np.arange(len(tl), dtype=np.int64))
                    )
            b_parts = []
            for kp in range(p):
                tl = b_panels.get((kp, j), [])
                if tl:
                    base = kp * n_b
                    b_parts.append(
                        (np.asarray(tl), base + np.arange(len(tl), dtype=np.int64))
                    )
            amat = pat(a_parts, a_coords, (mt, ktl))
            bmat = pat(b_parts, b_coords, (ktl, ntc))
            cr, cc, asl, bsl = enumerate_tile_triples(amat, bmat)
            triples[(i, j)] = (cr, cc, asl, bsl)
            s_max = max(s_max, len(cr))

    stacks = np.zeros((p, q, s_max, 3), dtype=np.int32)
    stacks[..., 0] = n_c
    for (i, j), (cr, cc, asl, bsl) in triples.items():
        s = len(cr)
        if s == 0:
            continue
        keys = c_keys_dev[i * q + j]
        ck = cr * c_layout.ntc + cc
        cslot = np.searchsorted(keys, ck)
        ok = (cslot < len(keys)) & (
            keys[np.minimum(cslot, max(len(keys) - 1, 0))] == ck
        )
        cslot = np.where(ok, cslot, n_c)
        order = np.argsort(cslot, kind="stable")
        stacks[i, j, :s, 0] = cslot[order]
        stacks[i, j, :s, 1] = asl[order]
        stacks[i, j, :s, 2] = bsl[order]

    return SummaPlan(
        p=p, q=q, n_a=n_a, n_b=n_b, n_c=n_c, s_max=s_max,
        a_pack=a_pack.reshape(-1), b_pack=b_pack.reshape(-1),
        stacks=stacks, c_unpack=c_unpack,
    )


def pad_summa_plan(
    plan: SummaPlan, n_a: int, n_b: int, n_c: int, s_max: int
) -> SummaPlan:
    """Re-pad a plan to larger capacities (so several group plans share one
    shard_map's static shapes). Gathered-panel slot ids are re-encoded for
    the new panel strides; padded stack rows are trash entries."""
    if (plan.n_a, plan.n_b, plan.n_c, plan.s_max) == (n_a, n_b, n_c, s_max):
        return plan
    p, q = plan.p, plan.q

    def repad_pack(flat: np.ndarray, old_n: int, new_n: int) -> np.ndarray:
        out = np.full((p, q, new_n), -1, dtype=flat.dtype)
        out[:, :, :old_n] = flat.reshape(p, q, old_n)
        return out.reshape(-1)

    st = plan.stacks
    new = np.zeros((p, q, s_max, 3), dtype=np.int32)
    new[..., 0] = n_c  # trash
    so = plan.s_max
    new[:, :, :so, 0] = np.where(st[..., 0] == plan.n_c, n_c, st[..., 0])
    new[:, :, :so, 1] = (st[..., 1] // plan.n_a) * n_a + st[..., 1] % plan.n_a
    new[:, :, :so, 2] = (st[..., 2] // plan.n_b) * n_b + st[..., 2] % plan.n_b
    c_unpack = (plan.c_unpack // plan.n_c) * n_c + plan.c_unpack % plan.n_c
    return SummaPlan(
        p=p, q=q, n_a=n_a, n_b=n_b, n_c=n_c, s_max=s_max,
        a_pack=repad_pack(plan.a_pack, plan.n_a, n_a),
        b_pack=repad_pack(plan.b_pack, plan.n_b, n_b),
        stacks=new, c_unpack=c_unpack,
    )


@partial(
    jax.jit,
    static_argnames=("p", "q", "n_a", "n_b", "n_c", "tile", "s_max", "prec", "mesh"),
)
def _summa_exec(
    a_store,  # [P, Q, n_a, T, T] A tiles at their owners
    b_store,  # [P, Q, n_b, T, T]
    stacks,  # [P, Q, s_max, 3]
    *,
    p: int,
    q: int,
    n_a: int,
    n_b: int,
    n_c: int,
    tile: int,
    s_max: int,
    prec: str,
    mesh,
):
    """all_gather panels along the opposite axes, local tile stacks."""
    from jax.sharding import PartitionSpec as P

    dtype = a_store.dtype
    precision = _PRECISIONS[prec]

    def local_fn(a, b, st):
        a = a[0, 0]  # [n_a, T, T] own A piece
        b = b[0, 0]
        st = st[0, 0]
        # gather A's row panel across the column axis, B's col panel across
        # the row axis (the SUMMA broadcasts, pipelined by XLA over ICI)
        a_full = jax.lax.all_gather(a, AXIS_COL)  # [Q, n_a, T, T]
        b_full = jax.lax.all_gather(b, AXIS_ROW)  # [P, n_b, T, T]
        a_full = a_full.reshape(q * n_a, tile, tile)
        b_full = b_full.reshape(p * n_b, tile, tile)
        ga = jnp.take(a_full, st[:, 1], axis=0)
        gb = jnp.take(b_full, st[:, 2], axis=0)
        prods = jax.lax.dot_general(
            ga, gb,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.promote_types(jnp.float32, dtype),
            precision=precision,
        ).astype(dtype)
        c = jax.ops.segment_sum(prods, st[:, 0], num_segments=n_c + 1)
        return c[:n_c][None, None]

    summa = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(AXIS_ROW, AXIS_COL), P(AXIS_ROW, AXIS_COL), P(AXIS_ROW, AXIS_COL)),
        out_specs=P(AXIS_ROW, AXIS_COL),
        check_vma=False,
    )
    return summa(a_store, b_store, stacks)


def execute_summa(
    a: BCSRMatrix,
    ta: bool,
    ca: bool,
    b: BCSRMatrix,
    tb: bool,
    cb: bool,
    c: Optional[BCSRMatrix],
    c_index: BCSRIndex,
    alpha,
    beta,
    dist: Distribution,
    k_dist: Optional[np.ndarray],
    cfg,
    *,
    mask_result: bool = False,
) -> jax.Array:
    """SUMMA execution path (any grid shape). Returns C's tile store."""
    from .engine import _align_old_c, _op_store

    tile = a.tile
    p, q = dist.grid.nprow, dist.grid.npcol
    m_sizes = a.index.col_block_sizes if ta else a.index.row_block_sizes
    k_sizes = a.index.row_block_sizes if ta else a.index.col_block_sizes
    n_sizes = b.index.row_block_sizes if tb else b.index.col_block_sizes
    if k_dist is None:
        from ..dist.distribution import tile_dist_vector

        k_dist = tile_dist_vector(k_sizes, max(p, q), tile)

    rowb = dist_tile_bins(dist.row_dist, m_sizes, tile, majority=True)
    colb = dist_tile_bins(dist.col_dist, n_sizes, tile, majority=True)
    kb = dist_tile_bins(k_dist, k_sizes, tile, majority=True)

    a_st, a_coords, _ = _op_store(a, ta, ca)
    b_st, b_coords, _ = _op_store(b, tb, cb)
    c_lay = store_layout(c_index, tile)

    with timed("summa/plan"):
        plan = plan_summa(
            a_coords, b_coords, c_lay, rowb, colb, kb % q, kb % p, p, q
        )

    # static message accounting (the reference's MPI statistics): each
    # device receives the other owners' panel pieces in the all_gathers
    st = get_stats()
    isz = a.data.dtype.itemsize
    st.record_comm("allgather_a", p * q * (q - 1), plan.n_a * tile * tile * isz)
    st.record_comm("allgather_b", p * q * (p - 1), plan.n_b * tile * tile * isz)

    with timed("summa/exec"):
        a_store = take_tiles(a_st, plan.a_pack, tile).reshape(
            p, q, plan.n_a, tile, tile
        )
        b_store = take_tiles(b_st, plan.b_pack, tile).reshape(
            p, q, plan.n_b, tile, tile
        )
        c_tiles = _summa_exec(
            a_store, b_store, jnp.asarray(plan.stacks),
            p=p, q=q, n_a=plan.n_a, n_b=plan.n_b, n_c=plan.n_c,
            tile=tile, s_max=plan.s_max, prec=cfg.matmul_precision,
            mesh=dist.grid.mesh,
        )
        prod = take_tiles(
            c_tiles.reshape(p * q * plan.n_c, tile, tile), plan.c_unpack, tile
        )
        if mask_result and c_lay.n_tiles:
            prod = prod * valid_mask(c_index, tile).astype(prod.dtype)
        get_stats().hardware_flops += 2.0 * float(
            (plan.stacks[..., 0] < plan.n_c).sum()
        ) * tile**3

    old = _align_old_c(c, c_index, tile)
    out = jnp.asarray(alpha, dtype=a.dtype) * prod
    if old is not None:
        out = out + jnp.asarray(beta, dtype=a.dtype) * old
    return out
