"""Parallel TAS group execution over a mesh axis.

The reference runs its TAS subgroups on disjoint MPI subgroups of the cart
grid simultaneously (``dbcsr_tas_split.F``: each split group owns a slice
of the communicator), splitting whichever of (m, k, n) is largest
(``max_mm_dim``, ``src/tas/dbcsr_tas_mm.F:79-782``). The host-loop form
(``tas/mm.py``) runs groups sequentially; this module is the mesh-parallel
form for all three split orientations:

- ``long_dim='m'`` — A's rows split; B replicated (the reference's
  ``dbcsr_tas_replicate``); per-group C row panels merged (disjoint).
- ``long_dim='n'`` — B's cols split; A replicated; per-group C column
  panels merged (disjoint).
- ``long_dim='k'`` — the contraction dimension split: A's cols and B's
  rows carry the SAME split; every group computes a PARTIAL product over
  the union C pattern and the groups are summed with ``lax.psum`` over the
  split axis — the analog of the reference's ``redistribute_and_sum``
  (``dbcsr_tas_mm.F:783``) and of the 2.5D driver's C-reduction layers.
- ``long_dim='auto'`` — pick the largest dimension (``max_mm_dim``).

Mechanics shared by all three: the split dimension's groups are padded to
a COMMON shape (tile capacity, stack length, C capacity) and stacked on a
leading 'split' axis; that axis is laid over the devices (NamedSharding)
and a ``shard_map`` runs every group's tile-stack multiply simultaneously.
This is the EP/SP-like axis of SURVEY §2.9: independent experts (groups)
over the mesh, dense math inside.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..block.bcsr import BCSRMatrix
from ..block.index import BCSRIndex, build_index
from ..block.store import store_layout
from ..core.errors import dbcsr_assert
from ..core.timing import timed
from ..mm.plan import symbolic_product
from ..mm.tileplan import plan_tile_stacks_stores
from ..ops.transform import desymmetrize
from .matrix import extract_block_subset, merge_col_groups, merge_row_groups
from .split import COLSPLIT, ROWSPLIT, TASSplit

__all__ = ["tas_multiply_parallel", "tas_multiply_subgrid"]

_PREC = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


@partial(
    jax.jit,
    static_argnames=("n_c", "prec", "mesh", "a_split", "b_split", "reduce_k"),
)
def _group_exec(
    a_arr, b_arr, stacks, *,
    n_c: int, prec: str, mesh,
    a_split: bool, b_split: bool, reduce_k: bool,
):
    """shard_map over the 'split' axis: per-group gather + batched matmul +
    sorted-segment accumulation (dense math; groups are independent except
    for the k-split psum)."""
    precision = _PREC[prec]

    def local(a, b, st):
        a = a[0] if a_split else a
        b = b[0] if b_split else b
        st = st[0]  # [S_max, 3]
        ga = jnp.take(a, st[:, 1], axis=0)
        gb = jnp.take(b, st[:, 2], axis=0)
        prods = jax.lax.dot_general(
            ga, gb,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.promote_types(jnp.float32, a.dtype),
            precision=precision,
        ).astype(a.dtype)
        c = jax.ops.segment_sum(prods, st[:, 0], num_segments=n_c + 1)[:n_c]
        if reduce_k:
            return jax.lax.psum(c, "split")
        return c[None]

    sp = PartitionSpec("split")
    rep = PartitionSpec()
    run = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(sp if a_split else rep, sp if b_split else rep, sp),
        out_specs=rep if reduce_k else sp,
        check_vma=False,
    )
    return run(a_arr, b_arr, stacks)


def _pad_groups(subs_stores, plans, nsplit, tile, dtype):
    """Stack per-group stores and stacks on a leading split axis, padded to
    common shapes (trash C slot = per-group n_c_max)."""
    n_max = max(max((s.shape[0] for s in subs_stores), default=1), 1)
    s_max = max(max((len(p.stack) for p in plans), default=1), 1)
    n_c_max = max(max((p.n_c_tiles for p in plans), default=1), 1)
    groups = jnp.zeros((nsplit, n_max, tile, tile), dtype=dtype)
    stacks = np.zeros((nsplit, s_max, 3), dtype=np.int32)
    stacks[:, :, 0] = n_c_max  # trash
    for g, (store, plan) in enumerate(zip(subs_stores, plans)):
        if store.shape[0]:
            groups = groups.at[g, : store.shape[0]].set(store)
        if len(plan.stack):
            stacks[g, : len(plan.stack)] = plan.stack
    return groups, stacks, n_c_max


def tas_multiply_parallel(
    a: BCSRMatrix,
    b: BCSRMatrix,
    *,
    long_dim: str = "m",
    nsplit: Optional[int] = None,
    devices=None,
    split_kind: str = "contiguous",
    return_flops: bool = False,
):
    """``C = A · B`` with the ``long_dim`` ∈ {'m','n','k','auto'} dimension
    split into ``nsplit`` groups executed SIMULTANEOUSLY over a 1-D 'split'
    mesh (one group per device by default). The mesh-parallel analog of
    ``tas_multiply(..., long_dim=...)``."""
    import jax as _jax

    a = desymmetrize(a)
    b = desymmetrize(b)
    dbcsr_assert(a.tile == b.tile, "operand tile sizes differ")
    dbcsr_assert(
        np.array_equal(a.index.col_block_sizes, b.index.row_block_sizes),
        "inner block dimensions do not match",
    )
    dbcsr_assert(
        long_dim in ("m", "n", "k", "auto"), "long_dim must be m|n|k|auto"
    )
    if long_dim == "auto":  # the reference's max_mm_dim
        dims = {
            "m": a.index.nfullrows,
            "k": a.index.nfullcols,
            "n": b.index.nfullcols,
        }
        long_dim = max(dims, key=dims.get)
    tile = a.tile
    devs = list(devices) if devices is not None else list(_jax.devices())
    nblk_long = {
        "m": a.nblkrows, "n": b.index.nblkcols, "k": a.index.nblkcols
    }[long_dim]
    if nsplit is None:
        nsplit = len(devs)
    nsplit = max(1, min(nsplit, len(devs), nblk_long))
    mesh = Mesh(np.array(devs[:nsplit]), ("split",))

    mk = TASSplit.contiguous if split_kind == "contiguous" else TASSplit.cyclic
    rowcol = ROWSPLIT if long_dim in ("m", "k") else COLSPLIT
    split = mk(rowcol, nblk_long, nsplit)
    from ..core.config import get_config

    prec = get_config().matmul_precision
    sharding = NamedSharding(mesh, PartitionSpec("split"))

    if long_dim == "m":
        with timed("tas_parallel/plan"):
            subs, plans, eff = [], [], 0.0
            for g in range(nsplit):
                blocks = split.blocks_of_group(g)
                a_g = extract_block_subset(a, row_blocks=blocks)
                la, lb = a_g.layout, b.layout
                plans.append(plan_tile_stacks_stores(
                    la.tile_coords, (la.ntr, la.ntc),
                    lb.tile_coords, (lb.ntr, lb.ntc),
                ))
                symb = symbolic_product(a_g.index, False, b.index, False)
                eff += symb.eff_flops
                subs.append((blocks, a_g, symb))
            a_groups, stacks, n_c_max = _pad_groups(
                [s[1].data for s in subs], plans, nsplit, tile, a.dtype
            )
        with timed("tas_parallel/exec"):
            a_groups = _jax.device_put(a_groups, sharding)
            stacks_j = _jax.device_put(jnp.asarray(stacks), sharding)
            c_groups = _group_exec(
                a_groups, b.data, stacks_j, n_c=n_c_max, prec=prec,
                mesh=mesh, a_split=True, b_split=False, reduce_k=False,
            )
        with timed("tas_parallel/merge"):
            parts = []
            for g, ((blocks, a_g, symb), plan) in enumerate(zip(subs, plans)):
                c_g_index, _ = build_index(
                    symb.rows, symb.cols,
                    a_g.index.row_block_sizes, b.index.col_block_sizes,
                )
                dbcsr_assert(
                    np.array_equal(
                        store_layout(c_g_index, tile).tile_keys(),
                        plan.c_tile_keys,
                    ),
                    "group product tiles must equal the group C store tiles",
                )
                parts.append((
                    BCSRMatrix(
                        name=f"g{g}", index=c_g_index,
                        data=c_groups[g, : plan.n_c_tiles],
                    ),
                    blocks,
                ))
            out = merge_row_groups(
                parts, a.index.row_block_sizes, b.index.col_block_sizes,
                name="tas_parallel", dtype=a.dtype,
            )

    elif long_dim == "n":
        with timed("tas_parallel/plan"):
            subs, plans, eff = [], [], 0.0
            for g in range(nsplit):
                blocks = split.blocks_of_group(g)
                b_g = extract_block_subset(b, col_blocks=blocks)
                la, lb = a.layout, b_g.layout
                plans.append(plan_tile_stacks_stores(
                    la.tile_coords, (la.ntr, la.ntc),
                    lb.tile_coords, (lb.ntr, lb.ntc),
                ))
                symb = symbolic_product(a.index, False, b_g.index, False)
                eff += symb.eff_flops
                subs.append((blocks, b_g, symb))
            b_groups, stacks, n_c_max = _pad_groups(
                [s[1].data for s in subs], plans, nsplit, tile, b.dtype
            )
        with timed("tas_parallel/exec"):
            b_groups = _jax.device_put(b_groups, sharding)
            stacks_j = _jax.device_put(jnp.asarray(stacks), sharding)
            c_groups = _group_exec(
                a.data, b_groups, stacks_j, n_c=n_c_max, prec=prec,
                mesh=mesh, a_split=False, b_split=True, reduce_k=False,
            )
        with timed("tas_parallel/merge"):
            parts = []
            for g, ((blocks, b_g, symb), plan) in enumerate(zip(subs, plans)):
                c_g_index, _ = build_index(
                    symb.rows, symb.cols,
                    a.index.row_block_sizes, b_g.index.col_block_sizes,
                )
                dbcsr_assert(
                    np.array_equal(
                        store_layout(c_g_index, tile).tile_keys(),
                        plan.c_tile_keys,
                    ),
                    "group product tiles must equal the group C store tiles",
                )
                parts.append((
                    BCSRMatrix(
                        name=f"g{g}", index=c_g_index,
                        data=c_groups[g, : plan.n_c_tiles],
                    ),
                    blocks,
                ))
            out = merge_col_groups(
                parts, a.index.row_block_sizes, b.index.col_block_sizes,
                name="tas_parallel", dtype=a.dtype,
            )

    else:  # k-split: partial products over the union C pattern, psum'd
        with timed("tas_parallel/plan"):
            subs, plans, eff = [], [], 0.0
            for g in range(nsplit):
                blocks = split.blocks_of_group(g)
                a_g = extract_block_subset(a, col_blocks=blocks)
                b_g = extract_block_subset(b, row_blocks=blocks)
                la, lb = a_g.layout, b_g.layout
                plans.append(plan_tile_stacks_stores(
                    la.tile_coords, (la.ntr, la.ntc),
                    lb.tile_coords, (lb.ntr, lb.ntc),
                ))
                symb = symbolic_product(a_g.index, False, b_g.index, False)
                eff += symb.eff_flops
                subs.append((a_g, b_g, symb))
            # union C pattern across groups (``redistribute_and_sum``)
            nbc = b.index.nblkcols
            keys = np.unique(np.concatenate(
                [s[2].rows.astype(np.int64) * nbc + s[2].cols for s in subs]
                or [np.zeros(0, dtype=np.int64)]
            ))
            c_index, _ = build_index(
                (keys // nbc).astype(np.int32), (keys % nbc).astype(np.int32),
                a.index.row_block_sizes, b.index.col_block_sizes,
            )
            c_lay = store_layout(c_index, tile)
            c_keys = c_lay.tile_keys()
            n_c = max(c_lay.n_tiles, 1)
            # remap every group's stack c slots into the UNION store slots
            re_plans = []
            for plan in plans:
                st = plan.stack.copy()
                if len(st):
                    slot_map = np.searchsorted(c_keys, plan.c_tile_keys)
                    dbcsr_assert(
                        len(c_keys) > 0
                        and np.array_equal(
                            c_keys[slot_map], plan.c_tile_keys
                        ),
                        "group product tiles must lie in the union C store",
                    )
                    st[:, 0] = slot_map[st[:, 0]]
                re_plans.append(st)
            n_a_max = max(max((s[0].layout.n_tiles for s in subs), default=1), 1)
            n_b_max = max(max((s[1].layout.n_tiles for s in subs), default=1), 1)
            s_max = max(max((len(st) for st in re_plans), default=1), 1)
            a_groups = jnp.zeros((nsplit, n_a_max, tile, tile), dtype=a.dtype)
            b_groups = jnp.zeros((nsplit, n_b_max, tile, tile), dtype=b.dtype)
            stacks = np.zeros((nsplit, s_max, 3), dtype=np.int32)
            stacks[:, :, 0] = n_c  # trash
            for g, ((a_g, b_g, _), st) in enumerate(zip(subs, re_plans)):
                if a_g.layout.n_tiles:
                    a_groups = a_groups.at[g, : a_g.layout.n_tiles].set(a_g.data)
                if b_g.layout.n_tiles:
                    b_groups = b_groups.at[g, : b_g.layout.n_tiles].set(b_g.data)
                if len(st):
                    stacks[g, : len(st)] = st
        with timed("tas_parallel/exec"):
            a_groups = _jax.device_put(a_groups, sharding)
            b_groups = _jax.device_put(b_groups, sharding)
            stacks_j = _jax.device_put(jnp.asarray(stacks), sharding)
            c_store = _group_exec(
                a_groups, b_groups, stacks_j, n_c=n_c, prec=prec,
                mesh=mesh, a_split=True, b_split=True, reduce_k=True,
            )
        out = BCSRMatrix(
            name="tas_parallel", index=c_index,
            data=c_store[: c_lay.n_tiles]
            if c_lay.n_tiles
            else jnp.zeros((0, tile, tile), dtype=a.dtype),
        )

    if return_flops:
        return out, eff
    return out


# ---------------------------------------------------------------------------
# 2-D sub-grids per group: each TAS group runs SUMMA on its own (pr, pc)
# sub-mesh, all groups simultaneously over a (split, pr, pc) mesh — the
# full analog of the reference's cart-grid subgroup communicators
# (``dbcsr_tas_split.F:66-371``: every split group IS a 2-D process grid).
# ---------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=(
        "p", "q", "n_a", "n_b", "n_c", "tile", "prec", "mesh", "a_grouped"
    ),
)
def _group_summa_exec(
    a_store, b_store, stacks, *,
    p: int, q: int, n_a: int, n_b: int, n_c: int, tile: int,
    prec: str, mesh, a_grouped: bool,
):
    """shard_map over ('split', pr, pc): within each split slice the SUMMA
    all_gathers ride the (pr, pc) sub-mesh only — 'split' is absent from
    the gather axes, so groups never communicate (until the merge)."""
    precision = _PREC[prec]
    dtype = a_store.dtype

    def local_fn(a, b, st):
        a = a.reshape(a.shape[-3:])  # [n_a, T, T] own piece
        b = b.reshape(b.shape[-3:])
        st = st.reshape(st.shape[-2:])
        a_full = jax.lax.all_gather(a, "pc").reshape(q * n_a, tile, tile)
        b_full = jax.lax.all_gather(b, "pr").reshape(p * n_b, tile, tile)
        ga = jnp.take(a_full, st[:, 1], axis=0)
        gb = jnp.take(b_full, st[:, 2], axis=0)
        prods = jax.lax.dot_general(
            ga, gb,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.promote_types(jnp.float32, dtype),
            precision=precision,
        ).astype(dtype)
        c = jax.ops.segment_sum(prods, st[:, 0], num_segments=n_c + 1)
        return c[:n_c][None, None, None]

    gspec = PartitionSpec("split", "pr", "pc")
    sspec = PartitionSpec("pr", "pc")  # replicated over 'split' (unmentioned)
    run = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            gspec if a_grouped else sspec,
            sspec if a_grouped else gspec,
            gspec,
        ),
        out_specs=gspec,
        check_vma=False,
    )
    return run(a_store, b_store, stacks)


def tas_multiply_subgrid(
    a: BCSRMatrix,
    b: BCSRMatrix,
    *,
    long_dim: str = "m",
    nsplit: int,
    subgrid: Tuple[int, int],
    devices=None,
    split_kind: str = "contiguous",
    return_flops: bool = False,
):
    """``C = A · B`` with ``nsplit`` TAS groups, each executing SUMMA on
    its own ``subgrid = (p, q)`` device sub-mesh — ``nsplit * p * q``
    devices total. ``long_dim='m'`` splits A's rows (B replicated per
    group); ``long_dim='n'`` splits B's cols (A replicated per group)."""
    import jax as _jax

    from ..block.tileops import take_tiles
    from ..core.config import get_config
    from ..mm.summa import plan_summa

    a = desymmetrize(a)
    b = desymmetrize(b)
    dbcsr_assert(a.tile == b.tile, "operand tile sizes differ")
    dbcsr_assert(
        np.array_equal(a.index.col_block_sizes, b.index.row_block_sizes),
        "inner block dimensions do not match",
    )
    dbcsr_assert(long_dim in ("m", "n"), "subgrid TAS supports long_dim m|n")
    p, q = subgrid
    tile = a.tile
    devs = list(devices) if devices is not None else list(_jax.devices())
    need = nsplit * p * q
    dbcsr_assert(
        need <= len(devs),
        f"subgrid TAS needs {need} devices, have {len(devs)}",
    )
    mesh = Mesh(
        np.array(devs[:need]).reshape(nsplit, p, q), ("split", "pr", "pc")
    )
    prec = get_config().matmul_precision
    mk = TASSplit.contiguous if split_kind == "contiguous" else TASSplit.cyclic
    split_rows = long_dim == "m"
    nblk_long = a.nblkrows if split_rows else b.index.nblkcols
    split = mk(ROWSPLIT if split_rows else COLSPLIT, nblk_long, nsplit)

    with timed("tas_subgrid/plan"):
        # shared-operand tile bins (plain tile-cyclic; TAS groups carry no
        # user distribution)
        ktl = a.layout.ntc
        kb_a = (np.arange(ktl, dtype=np.int64) % q).astype(np.int32)
        kb_b = (np.arange(ktl, dtype=np.int64) % p).astype(np.int32)
        subs, eff = [], 0.0
        for g in range(nsplit):
            blocks = split.blocks_of_group(g)
            if split_rows:
                a_g = extract_block_subset(a, row_blocks=blocks)
                symb = symbolic_product(a_g.index, False, b.index, False)
                c_g_index, _ = build_index(
                    symb.rows, symb.cols,
                    a_g.index.row_block_sizes, b.index.col_block_sizes,
                )
            else:
                b_g = extract_block_subset(b, col_blocks=blocks)
                symb = symbolic_product(a.index, False, b_g.index, False)
                c_g_index, _ = build_index(
                    symb.rows, symb.cols,
                    a.index.row_block_sizes, b_g.index.col_block_sizes,
                )
            eff += symb.eff_flops
            subs.append((blocks, a_g if split_rows else b_g, c_g_index))

        def plan_group(g):
            blocks, sub, c_g_index = subs[g]
            la = (sub if split_rows else a).layout
            lb = (b if split_rows else sub).layout
            c_lay = store_layout(c_g_index, tile)
            rowb = (np.arange(la.ntr, dtype=np.int64) % p).astype(np.int32)
            colb = (np.arange(lb.ntc, dtype=np.int64) % q).astype(np.int32)
            return plan_summa(
                la.tile_coords, lb.tile_coords, c_lay, rowb, colb,
                kb_a, kb_b, p, q,
            ), c_lay

        from ..mm.summa import pad_summa_plan

        first, c_lays = zip(*(plan_group(g) for g in range(nsplit)))
        n_a = max(pl.n_a for pl in first)
        n_b = max(pl.n_b for pl in first)
        n_c = max(pl.n_c for pl in first)
        s_max = max(pl.s_max for pl in first)
        plans = [
            pad_summa_plan(pl, n_a, n_b, n_c, s_max) for pl in first
        ]

        # grouped operand: one SUMMA-packed store per group, stacked on
        # 'split'; shared operand: packed once (identical packs by
        # construction — same coords, same bins)
        grouped_stores = []
        for g, (blocks, sub, _) in enumerate(subs):
            pk = plans[g].a_pack if split_rows else plans[g].b_pack
            cap = n_a if split_rows else n_b
            grouped_stores.append(
                take_tiles(sub.data, pk, tile).reshape(p, q, cap, tile, tile)
            )
        grouped = jnp.stack(grouped_stores)
        if split_rows:
            shared = take_tiles(b.data, plans[0].b_pack, tile).reshape(
                p, q, n_b, tile, tile
            )
        else:
            shared = take_tiles(a.data, plans[0].a_pack, tile).reshape(
                p, q, n_a, tile, tile
            )
        stacks = np.stack([pl.stacks for pl in plans])

    with timed("tas_subgrid/exec"):
        gspec = NamedSharding(mesh, PartitionSpec("split", "pr", "pc"))
        sspec = NamedSharding(mesh, PartitionSpec("pr", "pc"))
        grouped = _jax.device_put(grouped, gspec)
        shared = _jax.device_put(shared, sspec)
        stacks_j = _jax.device_put(jnp.asarray(stacks), gspec)
        c_groups = _group_summa_exec(
            grouped if split_rows else shared,
            shared if split_rows else grouped,
            stacks_j,
            p=p, q=q, n_a=n_a, n_b=n_b, n_c=n_c, tile=tile, prec=prec,
            mesh=mesh, a_grouped=split_rows,
        )

    with timed("tas_subgrid/merge"):
        parts = []
        for g, ((blocks, _, c_g_index), plan, c_lay) in enumerate(
            zip(subs, plans, c_lays)
        ):
            flat = c_groups[g].reshape(p * q * n_c, tile, tile)
            data = take_tiles(flat, plan.c_unpack, tile)
            parts.append((
                BCSRMatrix(name=f"g{g}", index=c_g_index, data=data),
                blocks,
            ))
        merge = merge_row_groups if split_rows else merge_col_groups
        out = merge(
            parts, a.index.row_block_sizes, b.index.col_block_sizes,
            name="tas_subgrid", dtype=a.dtype,
        )

    if return_flops:
        return out, eff
    return out
