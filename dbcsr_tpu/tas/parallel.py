"""Parallel TAS group execution over a mesh axis.

The reference runs its TAS subgroups on disjoint MPI subgroups of the cart
grid simultaneously (``dbcsr_tas_split.F``: each split group owns a slice
of the communicator). The host-loop form (``tas/mm.py``) runs groups
sequentially; this module is the mesh-parallel form for the m-split case:

- the long dimension's groups are padded to a COMMON shape (tile capacity,
  stack length, C capacity) and stacked on a leading 'split' axis;
- that axis is laid over the devices (NamedSharding) and a ``shard_map``
  runs every group's local tile-stack multiply simultaneously — each device
  computes its group's C rows with the small operand B replicated (the
  reference's ``dbcsr_tas_replicate``);
- the merged result is assembled from the per-group C stores (disjoint
  row groups).

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
from .matrix import extract_block_subset
from .split import ROWSPLIT, TASSplit

__all__ = ["tas_multiply_parallel"]


@partial(jax.jit, static_argnames=("n_c", "prec", "mesh", "axis"))
def _group_exec(a_groups, b_store, stacks, *, n_c: int, prec: str, mesh, axis):
    """shard_map over the 'split' axis: per-group gather + batched matmul +
    sorted-segment accumulation (dense math; groups are independent)."""
    precision = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[prec]

    def local(a, st):
        a = a[0]  # [nA_max, T, T]
        st = st[0]  # [S_max, 3]
        ga = jnp.take(a, st[:, 1], axis=0)
        gb = jnp.take(b_store, st[:, 2], axis=0)
        prods = jax.lax.dot_general(
            ga, gb,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.promote_types(jnp.float32, a.dtype),
            precision=precision,
        ).astype(a.dtype)
        c = jax.ops.segment_sum(prods, st[:, 0], num_segments=n_c + 1)
        return c[:n_c][None]

    run = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(PartitionSpec(axis), PartitionSpec(axis)),
        out_specs=PartitionSpec(axis),
        check_vma=False,
    )
    return run(a_groups, stacks)


def tas_multiply_parallel(
    a: BCSRMatrix,
    b: BCSRMatrix,
    *,
    nsplit: Optional[int] = None,
    devices=None,
    split_kind: str = "contiguous",
    return_flops: bool = False,
):
    """``C = A · B`` with A's rows m-split into ``nsplit`` groups executed
    SIMULTANEOUSLY over a 1-D 'split' mesh (one group per device by
    default). B is replicated across the groups; the merged C is exact.

    The mesh-parallel analog of ``tas_multiply(..., long_dim='m')``.
    """
    import jax as _jax

    a = desymmetrize(a)
    b = desymmetrize(b)
    dbcsr_assert(a.tile == b.tile, "operand tile sizes differ")
    dbcsr_assert(
        np.array_equal(a.index.col_block_sizes, b.index.row_block_sizes),
        "inner block dimensions do not match",
    )
    tile = a.tile
    devs = list(devices) if devices is not None else list(_jax.devices())
    if nsplit is None:
        nsplit = len(devs)
    nsplit = max(1, min(nsplit, len(devs), a.nblkrows))
    mesh = Mesh(np.array(devs[:nsplit]), ("split",))

    with timed("tas_parallel/plan"):
        mk = TASSplit.contiguous if split_kind == "contiguous" else TASSplit.cyclic
        split = mk(ROWSPLIT, a.nblkrows, nsplit)
        subs = []
        plans = []
        eff = 0.0
        for g in range(nsplit):
            blocks = split.blocks_of_group(g)
            a_g = extract_block_subset(a, row_blocks=blocks)
            la, lb = a_g.layout, b.layout
            plan = plan_tile_stacks_stores(
                la.tile_coords, (la.ntr, la.ntc),
                lb.tile_coords, (lb.ntr, lb.ntc),
            )
            symb = symbolic_product(a_g.index, False, b.index, False)
            eff += symb.eff_flops
            subs.append((blocks, a_g, symb))
            plans.append(plan)

        n_a_max = max(max(s[1].layout.n_tiles for s in subs), 1)
        s_max = max(max(len(p.stack) for p in plans), 1)
        n_c_max = max(max(p.n_c_tiles for p in plans), 1)

        # padded per-group arrays
        a_groups = jnp.zeros((nsplit, n_a_max, tile, tile), dtype=a.dtype)
        stacks = np.zeros((nsplit, s_max, 3), dtype=np.int32)
        stacks[:, :, 0] = n_c_max  # trash
        for g, ((blocks, a_g, _), plan) in enumerate(zip(subs, plans)):
            if a_g.layout.n_tiles:
                a_groups = a_groups.at[g, : a_g.layout.n_tiles].set(a_g.data)
            s = len(plan.stack)
            if s:
                stacks[g, :s] = plan.stack

    with timed("tas_parallel/exec"):
        from ..core.config import get_config

        sharding = NamedSharding(mesh, PartitionSpec("split"))
        a_groups = _jax.device_put(a_groups, sharding)
        stacks_j = _jax.device_put(jnp.asarray(stacks), sharding)
        c_groups = _group_exec(
            a_groups, b.data, stacks_j,
            n_c=n_c_max, prec=get_config().matmul_precision,
            mesh=mesh, axis="split",
        )

    with timed("tas_parallel/merge"):
        # per-group C matrices (the group product tile set IS the group C
        # store layout for an unfiltered product), merged over the disjoint
        # row groups
        from .matrix import merge_row_groups

        n_sizes = b.index.col_block_sizes
        parts = []
        for g, ((blocks, a_g, symb), plan) in enumerate(zip(subs, plans)):
            c_g_index, order = build_index(
                symb.rows, symb.cols, a_g.index.row_block_sizes, n_sizes
            )
            g_lay = store_layout(c_g_index, tile)
            dbcsr_assert(
                np.array_equal(g_lay.tile_keys(), plan.c_tile_keys),
                "group product tiles must equal the group C store tiles",
            )
            c_g = BCSRMatrix(
                name=f"g{g}", index=c_g_index,
                data=c_groups[g, : plan.n_c_tiles],
            )
            parts.append((c_g, blocks))
        out = merge_row_groups(
            parts, a.index.row_block_sizes, n_sizes,
            name="tas_parallel", dtype=a.dtype,
        )

    if return_flops:
        return out, eff
    return out
