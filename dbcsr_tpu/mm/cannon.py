"""Cannon distributed multiply over a 2-D device mesh.

TPU-native redesign of ``multiply_cannon``
(``src/mm/dbcsr_mm_cannon.F:839-1772``): the reference runs ``nvirt_k``
"metronome" ticks of double-buffered MPI isend/irecv ring shifts of A
(left along grid rows) and B (up along grid columns) overlapped with local
multiplies. Here the ticks are a ``jax.lax.fori_loop`` inside a
``jax.shard_map``-ped program whose ring shifts are ``lax.ppermute`` over
the mesh axes — XLA's async collectives overlap the ICI transfer with the
local tile-stack GEMM, which is the whole point of Cannon.

Key structural moves (see ARCHITECTURE.md):
- Panels are **pre-shifted at pack time** — A panel (i,k) is packed straight
  to device (i, (k-i) mod P), B panel (k,j) to ((k-j) mod P, j) — exactly
  the reference's ``make_images`` 'L'/'R' predistribution
  (``dbcsr_mm_cannon.F:146-751``).
- Panels are fixed-capacity tile stores padded to the global max tile count
  (the reference allgathers max sizes up front, ``dbcsr_mm_cannon.F:1036``).
- Per-(device, tick) tile stacks are planned on host for ALL devices and
  shipped as one sharded int32 array; inside the loop each device slices
  its tick's stack. Static shapes everywhere.
- C partials accumulate in a local tile store; the result is gathered into
  the product's flat block layout at the end.

Round-1 scope: square P×P grids, one k-distribution shared by both
operands (the general non-square "image decimation" of the reference is
future work), operand data replicated at rest, distributed in motion.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..block.bcsr import BCSRMatrix
from ..block.index import BCSRIndex
from ..core.config import get_config
from ..core.stats import get_stats
from ..core.timing import timed
from ..dist.distribution import Distribution, LocalMap, local_map
from ..dist.grid import AXIS_COL, AXIS_LAYER, AXIS_ROW, ProcessGrid
from .tileplan import enumerate_tile_triples

__all__ = ["CannonPlan", "plan_cannon", "execute_cannon"]


def _op_elem_panels(
    index: BCSRIndex,
    trans: bool,
    row_bins: np.ndarray,  # op-row block -> bin
    col_bins: np.ndarray,  # op-col block -> bin
    row_locals: List[LocalMap],
    col_locals: List[LocalMap],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-element (panel_row_bin, panel_col_bin, local_r, local_c) in op
    space, vectorized over the flat data buffer."""
    b = index.elem_to_blk.astype(np.int64)
    t = np.arange(index.nelems, dtype=np.int64) - index.blk_offset[b]
    bn = index.col_block_sizes[index.col_idx].astype(np.int64)[b]
    r_in = t // bn
    c_in = t - r_in * bn
    r_blk = index.blk_rows[b]
    c_blk = index.col_idx[b]
    if trans:
        r_blk, c_blk = c_blk, r_blk
        r_in, c_in = c_in, r_in
    pi = row_bins[r_blk]
    pk = col_bins[c_blk]
    # local element coords within (pi, pk) panel
    row_off = np.stack([m.elem_offset for m in row_locals])  # [P, nblk]
    col_off = np.stack([m.elem_offset for m in col_locals])
    lr = row_off[pi, r_blk] + r_in
    lc = col_off[pk, c_blk] + c_in
    return pi.astype(np.int64), pk.astype(np.int64), lr, lc


@dataclass
class CannonPlan:
    p: int
    layers: int
    tile: int
    n_a: int  # padded tiles per A panel
    n_b: int
    n_c: int
    s_max: int
    a_dest: np.ndarray  # int64 [a nelems] into the [P,P,n_a,T,T] store
    b_dest: np.ndarray
    stacks: np.ndarray  # int32 [P, P, P(ticks), s_max, 3]
    c_src: np.ndarray  # int64 [c nelems] into the [P,P,n_c,T,T] result
    eff_flops: float


def _panelize(
    index: BCSRIndex,
    trans: bool,
    row_bins,
    col_bins,
    row_locals,
    col_locals,
    tile: int,
    nbr: int,
    nbc: int,
):
    """Tile structure of every (row_bin, col_bin) panel.

    Returns (tile patterns dict[(pi,pk)] -> csr with slot+1 values,
    per-panel tile counts, element (panel ids, tile slot, within-tile pos)).
    """
    pi, pk, lr, lc = _op_elem_panels(
        index, trans, row_bins, col_bins, row_locals, col_locals
    )
    ntc = np.array(
        [-(-m.nelems // tile) if m.nelems else 1 for m in col_locals],
        dtype=np.int64,
    )
    ntr = np.array(
        [-(-m.nelems // tile) if m.nelems else 1 for m in row_locals],
        dtype=np.int64,
    )
    tr = lr // tile
    tc = lc // tile
    tid = tr * ntc[pk] + tc  # tile id within panel
    panel_key = pi * nbc + pk  # panel id in [0, nbr*nbc)
    # unique tiles per panel: combine panel and tile id into one key
    max_tid = int((ntr.max() * ntc.max())) if len(tid) else 1
    combo = panel_key * max(max_tid, 1) + tid
    uniq, inverse = np.unique(combo, return_inverse=True)
    # slot of each unique tile within its panel
    u_panel = uniq // max(max_tid, 1)
    u_tid = uniq % max(max_tid, 1)
    # slots: rank within panel (uniq is sorted, so ranks are consecutive)
    panel_starts = np.searchsorted(u_panel, np.arange(nbr * nbc))
    slot_of_uniq = np.arange(len(uniq)) - panel_starts[u_panel]
    elem_slot = slot_of_uniq[inverse]
    panel_counts = np.bincount(u_panel, minlength=nbr * nbc)
    # tile patterns per panel (csr over local tile grid, values slot+1)
    patterns = {}
    for ppi in range(nbr):
        for ppk in range(nbc):
            pid = ppi * nbc + ppk
            sel = slice(panel_starts[pid], panel_starts[pid] + panel_counts[pid])
            tids = u_tid[sel]
            patterns[(ppi, ppk)] = sp.csr_matrix(
                (
                    np.arange(1, len(tids) + 1, dtype=np.int64),
                    (tids // ntc[ppk], tids % ntc[ppk]),
                ),
                shape=(int(ntr[ppi]), int(ntc[ppk])),
            )
    within = (lr - tr * tile) * tile + (lc - tc * tile)
    return patterns, panel_counts, (pi, pk, elem_slot, within)


def plan_cannon(
    a_index: BCSRIndex,
    ta: bool,
    b_index: BCSRIndex,
    tb: bool,
    c_index: BCSRIndex,
    dist: Distribution,
    k_dist: np.ndarray,
    tile: int,
) -> CannonPlan:
    """Host-side planning of the whole Cannon schedule."""
    grid = dist.grid
    p = grid.nprow
    layers = grid.nlayer
    assert grid.npcol == p, "round-1 Cannon requires a square grid"

    m_sizes = c_index.row_block_sizes
    n_sizes = c_index.col_block_sizes
    k_sizes = a_index.row_block_sizes if ta else a_index.col_block_sizes

    m_locals = dist.row_local_maps(m_sizes)
    n_locals = dist.col_local_maps(n_sizes)

    # 2.5D: each k bin is split round-robin across layers; combined bin id
    # kl = kbin * layers + layer (the reference's make_layers_3D_C_reduction,
    # src/mm/dbcsr_mm_3d.F:1038)
    if layers > 1:
        rank_in_bin = np.zeros(len(k_dist), dtype=np.int64)
        for kb in range(p):
            sel = np.flatnonzero(k_dist == kb)
            rank_in_bin[sel] = np.arange(len(sel))
        kl_dist = (k_dist.astype(np.int64) * layers + rank_in_bin % layers)
    else:
        kl_dist = k_dist.astype(np.int64)
    k_locals = local_map(kl_dist, k_sizes, p * layers)

    # --- A panels: rows binned by C's row dist, cols by (k, layer) -------
    a_pat, a_counts, (a_pi, a_pkl, a_slot, a_within) = _panelize(
        a_index, ta, dist.row_dist, kl_dist, m_locals, k_locals,
        tile, p, p * layers,
    )
    # --- B panels: rows binned by (k, layer), cols by C's col dist -------
    b_pat, b_counts, (b_pkl, b_pj, b_slot, b_within) = _panelize(
        b_index, tb, kl_dist, dist.col_dist, k_locals, n_locals,
        tile, p * layers, p,
    )

    n_a = max(int(a_counts.max()), 1)
    n_b = max(int(b_counts.max()), 1)

    # destinations: A panel (i, kbin, l) pre-shifted to device
    # (i, (kbin-i) mod p, l); B panel (kbin, l, j) to ((kbin-j) mod p, j, l)
    a_kbin = a_pkl // layers
    a_lay = a_pkl % layers
    a_dev_col = (a_kbin - a_pi) % p
    a_dest = (
        (((a_pi * p + a_dev_col) * layers + a_lay) * n_a + a_slot)
        * (tile * tile)
        + a_within
    )
    b_kbin = b_pkl // layers
    b_lay = b_pkl % layers
    b_dev_row = (b_kbin - b_pj) % p
    b_dest = (
        (((b_dev_row * p + b_pj) * layers + b_lay) * n_b + b_slot)
        * (tile * tile)
        + b_within
    )

    # --- stacks per (device, tick) + C tile sets per device --------------
    triples = {}  # (i,j,l) -> list over t of (c_trow, c_tcol, a_slot, b_slot)
    for i in range(p):
        for j in range(p):
            for l in range(layers):
                per_tick = []
                for t in range(p):
                    k = (i + j + t) % p
                    kl = k * layers + l
                    cr, cc, asl, bsl = enumerate_tile_triples(
                        a_pat[(i, kl)], b_pat[(kl, j)]
                    )
                    per_tick.append((cr, cc, asl, bsl))
                triples[(i, j, l)] = per_tick

    # C tile set per device: union of product tiles and old-C block tiles
    n_tc = np.array(
        [-(-m.nelems // tile) if m.nelems else 1 for m in n_locals],
        dtype=np.int64,
    )
    c_pi, c_pj, c_lr, c_lc = _op_elem_panels(
        c_index, False, dist.row_dist, dist.col_dist, m_locals, n_locals
    )
    c_tr = c_lr // tile
    c_tc = c_lc // tile
    # all layers of one (i,j) share the C tile set (partials are psum'd)
    c_keysets = {}
    for i in range(p):
        for j in range(p):
            prod_keys = [
                cr * n_tc[j] + cc
                for l in range(layers)
                for (cr, cc, _, _) in triples[(i, j, l)]
            ]
            sel = (c_pi == i) & (c_pj == j)
            own_keys = c_tr[sel] * n_tc[j] + c_tc[sel]
            allk = np.concatenate(prod_keys + [own_keys]) if prod_keys else own_keys
            c_keysets[(i, j)] = np.unique(allk)
    n_c = max(max((len(v) for v in c_keysets.values()), default=1), 1)

    s_max = max(
        max(
            (len(cr) for per in triples.values() for (cr, _, _, _) in per),
            default=1,
        ),
        1,
    )
    stacks = np.zeros((p, p, layers, p, s_max, 3), dtype=np.int32)
    stacks[..., 0] = n_c  # trash slot default
    for (i, j, l), per_tick in triples.items():
        keys = c_keysets[(i, j)]
        for t, (cr, cc, asl, bsl) in enumerate(per_tick):
            s = len(cr)
            if s == 0:
                continue
            ck = cr * n_tc[j] + cc
            cslot = np.searchsorted(keys, ck)
            order = np.argsort(cslot, kind="stable")
            stacks[i, j, l, t, :s, 0] = cslot[order]
            stacks[i, j, l, t, :s, 1] = asl[order]
            stacks[i, j, l, t, :s, 2] = bsl[order]

    # --- result gather map ------------------------------------------------
    slot_all = np.empty(c_index.nelems, dtype=np.int64)
    for i in range(p):
        for j in range(p):
            sel = (c_pi == i) & (c_pj == j)
            keys = c_keysets[(i, j)]
            ck = c_tr[sel] * n_tc[j] + c_tc[sel]
            slot_all[sel] = np.searchsorted(keys, ck)
    c_within = (c_lr - c_tr * tile) * tile + (c_lc - c_tc * tile)
    c_src = (
        ((c_pi * p + c_pj) * n_c + slot_all) * (tile * tile) + c_within
    )

    return CannonPlan(
        p=p,
        layers=layers,
        tile=tile,
        n_a=n_a,
        n_b=n_b,
        n_c=n_c,
        s_max=s_max,
        a_dest=a_dest,
        b_dest=b_dest,
        stacks=stacks,
        c_src=c_src,
        eff_flops=0.0,
    )


@partial(
    jax.jit,
    static_argnames=(
        "p", "layers", "n_a", "n_b", "n_c", "tile", "s_max", "prec", "mesh"
    ),
)
def _cannon_exec(
    a_store,  # [P, P, L, n_a, T, T] pre-shifted A panels
    b_store,  # [P, P, L, n_b, T, T]
    stacks,  # [P, P, L, P, s_max, 3] int32
    *,
    p: int,
    layers: int,
    n_a: int,
    n_b: int,
    n_c: int,
    tile: int,
    s_max: int,
    prec: str,
    mesh,
):
    """shard_map'd Cannon tick loop → sharded C tile stores.

    With ``layers > 1`` the k range is split over a third mesh axis and the
    per-layer C partials are psum'd over it at the end — the 2.5D
    C-reduction of the reference (``multiply_3D``, ``src/mm/dbcsr_mm_3d.F``).
    """
    dtype = a_store.dtype
    precision = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[prec]

    from jax.sharding import PartitionSpec as P

    if layers > 1:
        spec_in = P(AXIS_ROW, AXIS_COL, AXIS_LAYER)
    else:
        spec_in = P(AXIS_ROW, AXIS_COL, None)
    spec_out = P(AXIS_ROW, AXIS_COL)

    def local_fn(a, b, st):
        # local shapes: a [1,1,1,n_a,T,T], b [1,1,1,n_b,T,T],
        # st [1,1,1,P,s_max,3]
        a = a[0, 0, 0]
        b = b[0, 0, 0]
        st = st[0, 0, 0]
        c = jnp.zeros((n_c + 1, tile, tile), dtype=dtype)
        shift_left = [(s, (s - 1) % p) for s in range(p)]

        def body(t, carry):
            a, b, c = carry
            stack_t = jax.lax.dynamic_index_in_dim(st, t, 0, keepdims=False)
            ga = jnp.take(a, stack_t[:, 1], axis=0)
            gb = jnp.take(b, stack_t[:, 2], axis=0)
            prods = jax.lax.dot_general(
                ga,
                gb,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.promote_types(jnp.float32, dtype),
                precision=precision,
            ).astype(dtype)
            c = c + jax.ops.segment_sum(
                prods, stack_t[:, 0], num_segments=n_c + 1
            )
            # ring shifts: A left along the row axis, B up along the column
            # axis (dbcsr_mm_cannon.F tick loop); the last tick's shift
            # restores the initial layout.
            a = jax.lax.ppermute(a, AXIS_COL, shift_left)
            b = jax.lax.ppermute(b, AXIS_ROW, shift_left)
            return a, b, c

        _, _, c = jax.lax.fori_loop(0, p, body, (a, b, c))
        if layers > 1:
            # 2.5D C-reduction across the layer axis
            c = jax.lax.psum(c, AXIS_LAYER)
        return c[:n_c][None, None]

    cannon = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec_in, spec_in, spec_in),
        out_specs=spec_out,
        check_vma=False,
    )
    stacks6 = stacks  # [P,P,L,P,s_max,3]
    return cannon(a_store, b_store, stacks6)


def _inverse_map_values(
    dest: np.ndarray, values: np.ndarray, total: int
) -> np.ndarray:
    """Gather map: inv[dest[i]] = values[i], holes = OOB (gathers 0)."""
    inv = np.full(total, np.iinfo(np.int32).max, dtype=np.int64)
    inv[dest] = values
    return inv


@dataclass
class TiledCannonPlan:
    """Cannon plan at GLOBAL-TILE granularity (the fast path).

    Requires tile-aligned distributions (every tile-row/col of the global
    tile grids owned by one grid row/col — ``dist.tile_aligned_dist``):
    then every panel tile IS a tile of the at-rest store, packing is a
    tile-level gather, and the result lands back in C's store by another.
    """

    p: int
    layers: int
    n_a: int
    n_b: int
    n_c: int
    s_max: int
    a_pack: np.ndarray  # int32 [P*P*L*n_a] op-store slot per panel slot (-1 pad)
    b_pack: np.ndarray
    stacks: np.ndarray  # int32 [P, P, L, P, s_max, 3]
    c_unpack: np.ndarray  # int32 [c n_tiles] slot into [P*P*n_c] tile array


def _tile_layer_split(kb: np.ndarray, layers: int) -> np.ndarray:
    """2.5D layer of each k tile: rank within its k-bin modulo layers (the
    tile-granular form of make_layers_3D_C_reduction,
    src/mm/dbcsr_mm_3d.F:1038)."""
    if layers == 1:
        return np.zeros(len(kb), dtype=np.int64)
    lay = np.zeros(len(kb), dtype=np.int64)
    for b in np.unique(kb):
        sel = np.flatnonzero(kb == b)
        lay[sel] = np.arange(len(sel)) % layers
    return lay


def plan_cannon_tiled(
    a_coords: np.ndarray,  # op(A) tile coords, row-major = op-store slots
    b_coords: np.ndarray,
    c_layout,
    rowb: np.ndarray,  # m tile-row -> prow
    colb: np.ndarray,  # n tile-col -> pcol
    kb: np.ndarray,  # k tile -> k bin
    p: int,
    layers: int,
) -> Optional[TiledCannonPlan]:
    """Build the tile-granular Cannon schedule, or None if any tile maps
    outside the grid.

    Fully vectorized single pass: panels, pack maps, per-device C sets and
    the per-(device, layer, tick) stacks all come from one global triple
    enumeration + numpy grouping — no Python loop over tiles, panels or
    grid cells (the O(P²) per-panel scipy loop flagged in round 1)."""
    import scipy.sparse as sp

    from .tileplan import enumerate_tile_triples

    klay = _tile_layer_split(kb, layers)
    kl = kb * layers + klay  # combined (bin, layer) id per k tile
    nkl = p * layers
    mt, ktl, ntc_n = int(len(rowb)), int(len(kb)), int(len(colb))

    # --- panels: panel id + slot-within-panel per tile -------------------
    # (stable sort keeps each panel's tiles in row-major store order, the
    # panel slot order the executor's pack maps rely on)
    def panelize(coords, rk, ck, npan_c):
        pid = (
            rk[coords[:, 0]].astype(np.int64) * npan_c
            + ck[coords[:, 1]].astype(np.int64)
        )
        order = np.argsort(pid, kind="stable")
        counts = np.bincount(pid, minlength=p * npan_c if npan_c else 1)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        slot = np.empty(len(pid), dtype=np.int64)
        slot[order] = np.arange(len(pid), dtype=np.int64) - starts[pid[order]]
        return pid, slot, counts

    a_pid, a_slot, a_counts = panelize(a_coords, rowb, kl, nkl)
    b_pid, b_slot, b_counts = panelize(b_coords, kl, colb, p)
    n_a = max(int(a_counts.max()) if a_counts.size else 0, 1)
    n_b = max(int(b_counts.max()) if b_counts.size else 0, 1)

    # pack maps: pre-shifted destinations (make_images 'L'/'R'
    # predistribution, dbcsr_mm_cannon.F:146-751)
    a_pi, a_kli = a_pid // nkl, a_pid % nkl
    a_kbin, a_lay = a_kli // layers, a_kli % layers
    a_devcol = (a_kbin - a_pi) % p
    a_pack = np.full(p * p * layers * n_a, -1, dtype=np.int64)
    a_pack[((a_pi * p + a_devcol) * layers + a_lay) * n_a + a_slot] = (
        np.arange(len(a_coords), dtype=np.int64)
    )
    b_kli, b_pj = b_pid // p, b_pid % p
    b_kbin, b_lay = b_kli // layers, b_kli % layers
    b_devrow = (b_kbin - b_pj) % p
    b_pack = np.full(p * p * layers * n_b, -1, dtype=np.int64)
    b_pack[((b_devrow * p + b_pj) * layers + b_lay) * n_b + b_slot] = (
        np.arange(len(b_coords), dtype=np.int64)
    )

    # --- per-device C tile sets ------------------------------------------
    c_coords = c_layout.tile_coords
    c_dev = (
        rowb[c_coords[:, 0]].astype(np.int64) * p
        + colb[c_coords[:, 1]].astype(np.int64)
    )
    c_counts = np.bincount(c_dev, minlength=p * p)
    n_c = max(int(c_counts.max()) if len(c_coords) else 0, 1)
    c_starts = np.concatenate([[0], np.cumsum(c_counts)[:-1]])
    order_c = np.argsort(c_dev, kind="stable")
    pos = np.empty(len(c_dev), dtype=np.int64)
    pos[order_c] = np.arange(len(c_dev), dtype=np.int64) - c_starts[c_dev[order_c]]
    c_unpack = c_dev * n_c + pos
    # per-device key lists, concatenated sorted-by-(dev, key): tile_coords
    # are globally row-major sorted so keys ascend within each device
    c_keys = (
        c_coords[:, 0].astype(np.int64) * c_layout.ntc
        + c_coords[:, 1].astype(np.int64)
    )
    keyspace = int(c_layout.ntr) * int(c_layout.ntc) + 1
    c_devkey = c_dev[order_c] * keyspace + c_keys[order_c]

    # --- stacks: one global triple enumeration, grouped ------------------
    amat = sp.csr_matrix(
        (
            np.arange(1, len(a_coords) + 1, dtype=np.int64),
            (a_coords[:, 0].astype(np.int64), a_coords[:, 1].astype(np.int64)),
        ),
        shape=(mt, ktl),
    )
    bmat = sp.csr_matrix(
        (
            np.arange(1, len(b_coords) + 1, dtype=np.int64),
            (b_coords[:, 0].astype(np.int64), b_coords[:, 1].astype(np.int64)),
        ),
        shape=(ktl, ntc_n),
    )
    cr, cc, asl_g, bsl_g = enumerate_tile_triples(amat, bmat)

    n_groups = p * p * layers * p
    if len(cr) == 0:
        stacks = np.zeros((p, p, layers, p, 1, 3), dtype=np.int32)
        stacks[..., 0] = n_c
        return TiledCannonPlan(
            p=p, layers=layers, n_a=n_a, n_b=n_b, n_c=n_c, s_max=1,
            a_pack=a_pack, b_pack=b_pack, stacks=stacks, c_unpack=c_unpack,
        )

    i_t = rowb[cr].astype(np.int64)
    j_t = colb[cc].astype(np.int64)
    kli_t = kl[a_coords[asl_g, 1]].astype(np.int64)
    kbin_t, l_t = kli_t // layers, kli_t % layers
    t_t = (kbin_t - i_t - j_t) % p  # tick when this k bin visits (i, j)
    dev_t = i_t * p + j_t
    dk = dev_t * keyspace + cr.astype(np.int64) * c_layout.ntc + cc
    ppos = np.searchsorted(c_devkey, dk)
    ok = (ppos < len(c_devkey)) & (
        c_devkey[np.minimum(ppos, max(len(c_devkey) - 1, 0))] == dk
    )
    cslot = np.where(ok, ppos - c_starts[dev_t], n_c)  # absent C -> trash
    group = (dev_t * layers + l_t) * p + t_t
    gcounts = np.bincount(group, minlength=n_groups)
    s_max = max(int(gcounts.max()), 1)
    gstarts = np.concatenate([[0], np.cumsum(gcounts)[:-1]])
    order_t = np.lexsort((cslot, group))  # by group, then output tile
    posg = np.arange(len(cr), dtype=np.int64) - gstarts[group[order_t]]
    flat = np.zeros((n_groups * s_max, 3), dtype=np.int32)
    flat[:, 0] = n_c
    rowsel = group[order_t] * s_max + posg
    flat[rowsel, 0] = cslot[order_t]
    flat[rowsel, 1] = a_slot[asl_g[order_t]]
    flat[rowsel, 2] = b_slot[bsl_g[order_t]]
    stacks = flat.reshape(p, p, layers, p, s_max, 3)

    return TiledCannonPlan(
        p=p, layers=layers, n_a=n_a, n_b=n_b, n_c=n_c, s_max=s_max,
        a_pack=a_pack, b_pack=b_pack, stacks=stacks, c_unpack=c_unpack,
    )


def _try_tiled_plan(a, ta, b, tb, c_index, dist, k_dist, tile, layers):
    """Tiled plan when all three distributions are tile-aligned, else None.

    Plans are content-cached (index patterns + distribution + k_dist):
    a second multiply over the same patterns skips planning entirely —
    the distributed analog of the local plan cache, standing in for the
    reference's batched-mm amortization (``dbcsr_tas_batched_mm_*``)."""
    from ..block.store import store_layout
    from ..dist.distribution import dist_tile_bins

    m_sizes = a.index.col_block_sizes if ta else a.index.row_block_sizes
    k_sizes = a.index.row_block_sizes if ta else a.index.col_block_sizes
    n_sizes = b.index.row_block_sizes if tb else b.index.col_block_sizes
    from ..core.config import get_config

    if not get_config().use_tiled_cannon:
        return None

    from .plancache import (
        array_fingerprint,
        dist_fingerprint,
        get_plan_cache,
        index_fingerprint,
    )

    pcache = get_plan_cache()
    key = pcache.key(
        a.index, ta, b.index, tb,
        extra=(
            "cannon_tiled",
            index_fingerprint(c_index),
            dist_fingerprint(dist),
            array_fingerprint(k_dist),
            tile,
            layers,
        ),
    )
    cached = pcache.get(key)
    if cached is not None:
        return cached
    rowb = dist_tile_bins(dist.row_dist, m_sizes, tile, majority=True)
    colb = dist_tile_bins(dist.col_dist, n_sizes, tile, majority=True)
    kb = dist_tile_bins(k_dist, k_sizes, tile, majority=True)
    a_lay = store_layout(a.index, tile)
    b_lay = store_layout(b.index, tile)
    if ta:
        from ..block.tileops import transpose_store

        _, a_coords = transpose_store(a.index, tile, a.data)
    else:
        a_coords = a_lay.tile_coords
    if tb:
        from ..block.tileops import transpose_store

        _, b_coords = transpose_store(b.index, tile, b.data)
    else:
        b_coords = b_lay.tile_coords
    c_lay = store_layout(c_index, tile)
    plan = plan_cannon_tiled(
        a_coords, b_coords, c_lay, rowb, colb, kb, dist.grid.nprow, layers
    )
    if plan is not None:
        pcache.put(key, plan)
    return plan


def execute_cannon(
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
    """Distributed execution path called from the engine. Returns C's store.

    Fast path: with TILE-ALIGNED distributions (``dist.tile_aligned_dist``)
    every panel tile is a tile of the at-rest store — packing and result
    unpacking are tile-level gathers. Fallback: arbitrary block
    distributions pack through composed element maps (correct everywhere,
    element-granular).
    """
    from ..block.store import store_layout
    from ..block.tileops import take_tiles, valid_mask
    from .engine import _align_old_c, _op_store

    tile = a.tile
    p = dist.grid.nprow
    layers = dist.grid.nlayer
    k_sizes = a.index.row_block_sizes if ta else a.index.col_block_sizes
    if k_dist is None:
        from ..dist.distribution import tile_dist_vector

        k_dist = tile_dist_vector(k_sizes, p, tile)

    c_lay = store_layout(c_index, tile)

    with timed("cannon/plan"):
        tplan = _try_tiled_plan(a, ta, b, tb, c_index, dist, k_dist, tile, layers)

    def _record_comm(n_a, n_b, n_c):
        # static message accounting (the reference's MPI statistics,
        # ``dbcsr_mpi_statistics_type``): p-1 ring shifts of each panel per
        # device, one C psum across layers
        st = get_stats()
        ndev = p * p * layers
        isz = a.data.dtype.itemsize
        st.record_comm("ppermute_a", ndev * (p - 1), n_a * tile * tile * isz)
        st.record_comm("ppermute_b", ndev * (p - 1), n_b * tile * tile * isz)
        if layers > 1:
            st.record_comm(
                "psum_c_layers", ndev * (layers - 1),
                n_c * tile * tile * isz,
            )

    if tplan is not None:
        _record_comm(tplan.n_a, tplan.n_b, tplan.n_c)
        with timed("cannon/exec"):
            a_st, _, _ = _op_store(a, ta, ca)
            b_st, _, _ = _op_store(b, tb, cb)
            a_store = take_tiles(a_st, tplan.a_pack, tile).reshape(
                p, p, layers, tplan.n_a, tile, tile
            )
            b_store = take_tiles(b_st, tplan.b_pack, tile).reshape(
                p, p, layers, tplan.n_b, tile, tile
            )
            c_tiles = _cannon_exec(
                a_store, b_store, jnp.asarray(tplan.stacks),
                p=p, layers=layers, n_a=tplan.n_a, n_b=tplan.n_b,
                n_c=tplan.n_c, tile=tile, s_max=tplan.s_max,
                prec=cfg.matmul_precision, mesh=dist.grid.mesh,
            )
            prod = take_tiles(
                c_tiles.reshape(p * p * tplan.n_c, tile, tile),
                tplan.c_unpack, tile,
            )
            if mask_result and c_lay.n_tiles:
                prod = prod * valid_mask(c_index, tile).astype(prod.dtype)
            n_stack = float((tplan.stacks[..., 0] < tplan.n_c).sum())
    else:
        with timed("cannon/plan-element"):
            plan = plan_cannon(
                a.index, ta, b.index, tb, c_index, dist, k_dist, tile
            )
        _record_comm(plan.n_a, plan.n_b, plan.n_c)
        with timed("cannon/exec"):
            a_data = a.data.reshape(-1)
            b_data = b.data.reshape(-1)
            if ca:
                a_data = jnp.conj(a_data)
            if cb:
                b_data = jnp.conj(b_data)
            layers = plan.layers
            # panel gather maps: panel position -> at-rest STORE position
            a_inv = _inverse_map_values(
                plan.a_dest, a.layout.elem_dest,
                p * p * layers * plan.n_a * tile * tile,
            )
            b_inv = _inverse_map_values(
                plan.b_dest, b.layout.elem_dest,
                p * p * layers * plan.n_b * tile * tile,
            )
            a_store = (
                a_data.at[jnp.asarray(a_inv)]
                .get(mode="fill", fill_value=0)
                .reshape(p, p, layers, plan.n_a, tile, tile)
            )
            b_store = (
                b_data.at[jnp.asarray(b_inv)]
                .get(mode="fill", fill_value=0)
                .reshape(p, p, layers, plan.n_b, tile, tile)
            )
            c_tiles = _cannon_exec(
                a_store, b_store, jnp.asarray(plan.stacks),
                p=p, layers=layers, n_a=plan.n_a, n_b=plan.n_b,
                n_c=plan.n_c, tile=tile, s_max=plan.s_max,
                prec=cfg.matmul_precision, mesh=dist.grid.mesh,
            )
            # result: C's at-rest tile store, gathered from the cannon panels
            total = c_lay.n_tiles * tile * tile
            sg = _inverse_map_values(c_lay.elem_dest, plan.c_src, total)
            prod = (
                c_tiles.reshape(-1)
                .at[jnp.asarray(sg)]
                .get(mode="fill", fill_value=0)
                .reshape(c_lay.n_tiles, tile, tile)
            )
            n_stack = float((plan.stacks[..., 0] < plan.n_c).sum())

    old = _align_old_c(c, c_index, tile)
    alpha_ = jnp.asarray(alpha, dtype=a.dtype)
    out = alpha_ * prod
    if old is not None:
        out = out + jnp.asarray(beta, dtype=a.dtype) * old
    get_stats().hardware_flops += 2.0 * n_stack * tile**3
    return out
