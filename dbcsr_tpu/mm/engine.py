"""The multiply engine: C := alpha * op(A) * op(B) + beta * C.

TPU-native replacement for ``dbcsr_multiply_generic``
(``src/mm/dbcsr_mm.F:336-1023``) for the local (single-device) product.
The reference's five sub-layers (cannon/multrec/csr/sched/accdrv) collapse
into: host symbolic plan (``plan.py``) → device pack (``pack.py``) →
tile-granular GEMM (dense panel or Pallas tile stacks, ``kernels.py``) →
device gather into the result layout. Distributed Cannon wraps this local
engine per tick (``cannon.py``).

Engine selection (config ``mm_driver``, analog of the reference's
MM_DRIVER): "dense" packs full padded panels and runs one MXU GEMM (the
``make_dense`` fast path, ``src/mm/dbcsr_mm.F:771-810``); "stack" runs
tile-level sparse stacks; "auto" picks by tile occupancy against
``dense_threshold``.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..block.bcsr import BCSRMatrix, SYM_NONE
from ..block.index import BCSRIndex, build_index, merge_index
from ..core.config import get_config
from ..core.errors import dbcsr_assert
from ..core.stats import get_stats
from ..core.timing import timed
from ..ops.norms import block_norms_sq
from ..ops.transform import desymmetrize
from .kernels import tile_stack_matmul_pallas, tile_stack_matmul_xla
from .pack import inverse_map, panel_gather_map, panel_scatter_map
from .plan import symbolic_product
from .tileplan import plan_tile_stacks, tile_gather_map

__all__ = ["multiply"]


def _bucket_len(n: int) -> int:
    """Round up to the next power of two (>=16) to bound recompilation."""
    if not get_config().shape_bucketing:
        return max(n, 1)
    m = 16
    while m < n:
        m <<= 1
    return m


def _pad_i32(arr: np.ndarray, length: int, fill: int) -> jax.Array:
    out = np.full((length,), fill, dtype=np.int32)
    out[: len(arr)] = arr
    return jnp.asarray(out)


def _pad_data(data: jax.Array, length: int) -> jax.Array:
    if data.shape[0] == length:
        return data
    return jnp.zeros((length,), dtype=data.dtype).at[: data.shape[0]].set(data)


@partial(
    jax.jit,
    static_argnames=("mp", "kp", "np_", "conj_a", "conj_b", "prec"),
)
def _dense_exec(
    a_data,
    b_data,
    a_inv,
    b_inv,
    c_src,
    old_inv,
    old_data,
    alpha,
    beta,
    *,
    mp: int,
    kp: int,
    np_: int,
    conj_a: bool,
    conj_b: bool,
    prec: str,
):
    """Pack → GEMM → gather, one fused jitted program.

    Everything is a GATHER through host-inverted maps (TPU scatters with
    arbitrary indices serialize; gathers vectorize): ``a_inv``/``b_inv``
    pull flat block data into the panels (holes gather 0), ``c_src`` pulls
    the product at the result blocks' element positions, ``old_inv`` pulls
    beta * old C data into its slots of the new flat layout.
    """
    pa = a_data.at[a_inv].get(mode="fill", fill_value=0).reshape(mp, kp)
    pb = b_data.at[b_inv].get(mode="fill", fill_value=0).reshape(kp, np_)
    if conj_a:
        pa = jnp.conj(pa)
    if conj_b:
        pb = jnp.conj(pb)
    precision = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[prec]
    g = jnp.matmul(pa, pb, precision=precision)
    out = alpha * g.reshape(-1).at[c_src].get(mode="fill", fill_value=0)
    out = out + beta * old_data.at[old_inv].get(mode="fill", fill_value=0)
    return out


def _effective_trans(trans: str) -> Tuple[bool, bool]:
    trans = trans.upper()
    dbcsr_assert(trans in ("N", "T", "C"), f"bad transpose flag {trans!r}")
    return trans in ("T", "C"), trans == "C"


def multiply(
    transa: str,
    transb: str,
    alpha,
    a: BCSRMatrix,
    b: BCSRMatrix,
    beta=0.0,
    c: Optional[BCSRMatrix] = None,
    *,
    filter_eps: Optional[float] = None,
    retain_sparsity: bool = False,
    return_flops: bool = False,
    dist=None,
    k_dist: Optional[np.ndarray] = None,
    limits: Optional[dict] = None,
):
    """Sparse multiply with the reference's full semantics
    (``dbcsr_multiply``, ``src/dbcsr_api.F:1411``): transposes/conjugation,
    alpha/beta scaling, product-block discovery, epsilon filtering,
    retain-sparsity mode.

    With a ``dist`` (explicit, or carried by ``c``/``a``) the product runs
    distributed over the 2-D device mesh via Cannon ring shifts
    (``cannon.py``); otherwise on the local engine.
    """
    cfg = get_config()
    ta, ca = _effective_trans(transa)
    tb, cb = _effective_trans(transb)

    if limits is not None:
        return _multiply_limited(
            transa, transb, alpha, a, b, beta, c,
            filter_eps=filter_eps, return_flops=return_flops,
            dist=dist, limits=limits,
        )

    with timed("multiply"):
        a = desymmetrize(a)
        b = desymmetrize(b)

        m_sizes = a.index.col_block_sizes if ta else a.index.row_block_sizes
        k_sizes_a = a.index.row_block_sizes if ta else a.index.col_block_sizes
        k_sizes_b = b.index.col_block_sizes if tb else b.index.row_block_sizes
        n_sizes = b.index.row_block_sizes if tb else b.index.col_block_sizes
        dbcsr_assert(
            np.array_equal(k_sizes_a, k_sizes_b),
            "inner block dimensions do not match",
        )
        if c is not None:
            dbcsr_assert(
                np.array_equal(c.index.row_block_sizes, m_sizes)
                and np.array_equal(c.index.col_block_sizes, n_sizes),
                "C block structure does not match the product",
            )
            dbcsr_assert(c.sym == SYM_NONE, "product into symmetric C not supported yet")

        # ---- plan -------------------------------------------------------
        with timed("multiply/plan"):
            a_nsq = b_nsq = None
            if filter_eps is not None:
                a_nsq = np.asarray(block_norms_sq(a))
                b_nsq = np.asarray(block_norms_sq(b))
            symb = symbolic_product(
                a.index, ta, b.index, tb,
                a_norms_sq=a_nsq, b_norms_sq=b_nsq,
                filter_eps=filter_eps, per_row_eps=cfg.per_row_eps,
            )
            if retain_sparsity:
                dbcsr_assert(c is not None, "retain_sparsity requires c")
                c_index = c.index
                old_to_new = np.arange(c.nblks, dtype=np.int64)
            else:
                prod_index, _ = build_index(
                    symb.rows, symb.cols, m_sizes, n_sizes
                )
                if c is not None and c.nblks:
                    c_index, old_to_new, _ = merge_index(c.index, prod_index)
                else:
                    c_index = prod_index
                    old_to_new = np.zeros(0, dtype=np.int64)

        # ---- execute ----------------------------------------------------
        eff_dist = dist
        if eff_dist is None and c is not None:
            eff_dist = c.dist
        if eff_dist is None:
            eff_dist = a.dist
        if eff_dist is not None:
            from .cannon import execute_cannon

            with timed("multiply/cannon"):
                out_data = execute_cannon(
                    a, ta, ca, b, tb, cb, c, c_index, old_to_new,
                    alpha, beta, eff_dist, k_dist, cfg,
                )
        else:
            with timed("multiply/exec"):
                driver = cfg.mm_driver
                tplan = None
                if driver in ("auto", "stack", "xla"):
                    with timed("multiply/tileplan"):
                        tplan = plan_tile_stacks(
                            a.index, ta, b.index, tb, cfg.tile_size
                        )
                    mt, kt, nt = tplan.tile_grid  # tile counts per dim
                    tdensity = len(tplan.stack) / max(mt * kt * nt, 1)
                    if driver == "auto" and tdensity >= cfg.dense_threshold:
                        tplan = None  # dense panels win at this occupancy
                if tplan is None:
                    out_data = _execute_dense(
                        a, ta, ca, b, tb, cb, c, c_index, old_to_new,
                        alpha, beta, cfg,
                    )
                else:
                    out_data = _execute_stack(
                        a, ca, b, cb, c, c_index, old_to_new, alpha, beta,
                        cfg, tplan, prefer_pallas=(driver != "xla"),
                    )

        result = BCSRMatrix(
            name=(c.name if c is not None else "product"),
            index=c_index,
            data=out_data,
            sym=SYM_NONE,
            dist=(c.dist if c is not None else eff_dist),
        )

        # ---- final norm filter (multrec_filtering analog) ---------------
        if filter_eps is not None and not retain_sparsity:
            from ..ops.arithmetic import filter_blocks

            result = filter_blocks(result, filter_eps)

        stats = get_stats()
        stats.num_multiplications += 1
        stats.total_flops += symb.eff_flops
        if cfg.collect_mnk_stats:
            from .plan import mnk_statistics

            for (m_, n_, k_), cnt in mnk_statistics(
                a.index, ta, b.index, tb, symb.rows, symb.cols
            ).items():
                prev_cnt, prev_fl = stats.by_mnk.get((m_, n_, k_), (0, 0.0))
                stats.by_mnk[(m_, n_, k_)] = (
                    prev_cnt + cnt, prev_fl + 2.0 * m_ * n_ * k_ * cnt
                )

    if return_flops:
        return result, symb.eff_flops
    return result


def _multiply_limited(
    transa: str,
    transb: str,
    alpha,
    a: BCSRMatrix,
    b: BCSRMatrix,
    beta,
    c: Optional[BCSRMatrix],
    *,
    filter_eps,
    return_flops: bool,
    dist,
    limits: dict,
):
    """Sub-matrix multiplication window (the reference's
    ``first_row/last_row/first_column/last_column/first_k/last_k``
    parameters, ``src/mm/dbcsr_mm.F:630-709``): the product is computed only
    over the given half-open BLOCK-index ranges ``limits={"rows": (r0, r1),
    "cols": ..., "k": ...}``, while ``beta * C`` applies to the whole C.

    Runs as extract → multiply (compacted) → re-expand — the TPU-native form
    of the reference's crop-to-limits in ``make_images``
    (``src/mm/dbcsr_mm_cannon.F:146``)."""
    from ..ops.arithmetic import add
    from ..ops.transform import desymmetrize as desym
    from ..tas.matrix import extract_block_subset

    ta, _ = _effective_trans(transa)
    tb, _ = _effective_trans(transb)
    a = desym(a)
    b = desym(b)
    m_sizes = a.index.col_block_sizes if ta else a.index.row_block_sizes
    k_sizes = a.index.row_block_sizes if ta else a.index.col_block_sizes
    n_sizes = b.index.row_block_sizes if tb else b.index.col_block_sizes

    def _range(key, n):
        lo, hi = limits.get(key, (0, n))
        dbcsr_assert(0 <= lo <= hi <= n, f"bad {key} limits ({lo},{hi})")
        return np.arange(lo, hi, dtype=np.int64)

    rows_sel = _range("rows", len(m_sizes))
    cols_sel = _range("cols", len(n_sizes))
    k_sel = _range("k", len(k_sizes))

    a_sub = (
        extract_block_subset(a, row_blocks=k_sel, col_blocks=rows_sel)
        if ta
        else extract_block_subset(a, row_blocks=rows_sel, col_blocks=k_sel)
    )
    b_sub = (
        extract_block_subset(b, row_blocks=cols_sel, col_blocks=k_sel)
        if tb
        else extract_block_subset(b, row_blocks=k_sel, col_blocks=cols_sel)
    )
    window, fl = multiply(
        transa, transb, alpha, a_sub, b_sub,
        filter_eps=filter_eps, dist=dist, return_flops=True,
    )
    # re-expand into the full C block space (selections are ascending ranges,
    # so canonical order — and hence the flat data layout — is preserved)
    w_idx = window.index
    full_index, order = build_index(
        rows_sel[w_idx.blk_rows].astype(np.int64),
        cols_sel[w_idx.col_idx].astype(np.int64),
        m_sizes,
        n_sizes,
    )
    dbcsr_assert(
        np.array_equal(order, np.arange(len(order))),
        "window expansion must preserve block order",
    )
    expanded = BCSRMatrix(
        name="product", index=full_index, data=window.data, dist=dist
    )
    if c is not None:
        result = add(1.0, expanded, beta, c)
        result = replace_name(result, c.name)
    else:
        result = expanded
    if return_flops:
        return result, fl
    return result


def replace_name(m: BCSRMatrix, name: str) -> BCSRMatrix:
    from dataclasses import replace as _replace

    return _replace(m, name=name)


def _execute_dense(
    a: BCSRMatrix,
    ta: bool,
    ca: bool,
    b: BCSRMatrix,
    tb: bool,
    cb: bool,
    c: Optional[BCSRMatrix],
    c_index: BCSRIndex,
    old_to_new: np.ndarray,
    alpha,
    beta,
    cfg,
) -> jax.Array:
    tile = cfg.tile_size
    a_inv, (mp, kp) = panel_gather_map(a.index, tile, ta)
    b_inv, (kp2, np_) = panel_gather_map(b.index, tile, tb)
    dbcsr_assert(kp == kp2, "panel K mismatch")

    # result gather positions inside the (mp, np_) padded product panel
    c_src, (mp3, np3) = panel_scatter_map(c_index, tile, False)
    dbcsr_assert((mp3, np3) == (mp, np_), "product panel mismatch")

    lc = _bucket_len(len(c_src))
    old_inv, old_data = _old_inverse(c, c_index, old_to_new, a.dtype, lc)
    lo = _bucket_len(max(len(old_data), 1))
    out = _dense_exec(
        a.data,
        b.data,
        jnp.asarray(a_inv),
        jnp.asarray(b_inv),
        _pad_i32(c_src, lc, mp * np_),  # OOB gather → fill 0
        jnp.asarray(old_inv),
        _pad_data(old_data, lo),
        jnp.asarray(alpha, dtype=a.dtype),
        jnp.asarray(beta, dtype=a.dtype),
        mp=mp,
        kp=kp,
        np_=np_,
        conj_a=ca,
        conj_b=cb,
        prec=cfg.matmul_precision,
    )
    hw_flops = 2.0 * mp * kp * np_
    get_stats().hardware_flops += hw_flops
    return out[: c_index.nelems]


@partial(jax.jit, static_argnames=("n_tiles", "tile", "conj"))
def _pack_tiles(data, inv, *, n_tiles: int, tile: int, conj: bool):
    out = (
        data.at[inv]
        .get(mode="fill", fill_value=0)
        .reshape(n_tiles, tile, tile)
    )
    return jnp.conj(out) if conj else out


@jax.jit
def _gather_combine(c_tiles, c_src, old_inv, old_data, alpha, beta):
    out = alpha * c_tiles.reshape(-1).at[c_src].get(mode="fill", fill_value=0)
    return out + beta * old_data.at[old_inv].get(mode="fill", fill_value=0)


def _old_positions(
    c: Optional[BCSRMatrix], c_index: BCSRIndex, old_to_new: np.ndarray, dtype
):
    """Positions of old C elements inside the new flat layout."""
    if c is not None and c.nblks:
        b_old = c.index.elem_to_blk.astype(np.int64)
        t = np.arange(c.index.nelems, dtype=np.int64) - c.index.blk_offset[b_old]
        return c_index.blk_offset[old_to_new[b_old]] + t, c.data
    return np.zeros(0, dtype=np.int64), jnp.zeros(0, dtype=dtype)


def _old_inverse(
    c, c_index, old_to_new: np.ndarray, dtype, out_len: int
):
    """Gather map (len out_len) pulling old C elements into the new layout."""
    from .pack import inverse_map

    old_pos, old_data = _old_positions(c, c_index, old_to_new, dtype)
    inv = inverse_map(old_pos.astype(np.int64), out_len)
    return inv, old_data


def _execute_stack(
    a: BCSRMatrix,
    ca: bool,
    b: BCSRMatrix,
    cb: bool,
    c: Optional[BCSRMatrix],
    c_index: BCSRIndex,
    old_to_new: np.ndarray,
    alpha,
    beta,
    cfg,
    tplan,
    *,
    prefer_pallas: bool,
) -> jax.Array:
    tile = cfg.tile_size
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    use_pallas = (
        prefer_pallas
        and on_tpu
        and a.dtype in (jnp.float32, jnp.bfloat16)
    )
    if len(tplan.stack) == 0:
        # empty symbolic product: result is beta * old C gathered in place
        old_inv, old_data = _old_inverse(
            c, c_index, old_to_new, a.dtype, c_index.nelems
        )
        if old_data.shape[0]:
            return jnp.asarray(beta, a.dtype) * old_data.at[
                jnp.asarray(old_inv)
            ].get(mode="fill", fill_value=0)
        return jnp.zeros((c_index.nelems,), dtype=a.dtype)

    _, _, nt = tplan.tile_grid
    c_src = tile_gather_map(c_index, tplan.c_tile_coords, tile, nt)

    lc = _bucket_len(len(c_src))
    old_inv, old_data = _old_inverse(c, c_index, old_to_new, a.dtype, lc)
    lo = _bucket_len(max(len(old_data), 1))
    n_a = max(tplan.n_a_tiles, 1)
    n_b = max(tplan.n_b_tiles, 1)
    n_c = tplan.n_c_tiles  # > 0 here (stack nonempty)

    a_tiles = _pack_tiles(
        a.data,
        jnp.asarray(inverse_map(tplan.a_dest, n_a * tile * tile)),
        n_tiles=n_a, tile=tile, conj=ca,
    )
    b_tiles = _pack_tiles(
        b.data,
        jnp.asarray(inverse_map(tplan.b_dest, n_b * tile * tile)),
        n_tiles=n_b, tile=tile, conj=cb,
    )
    if use_pallas:
        c_tiles = tile_stack_matmul_pallas(
            a_tiles, b_tiles, tplan.stack, n_c_tiles=n_c,
            max_chunk=cfg.max_stack_size, precision=cfg.matmul_precision,
        )
    else:
        ls = _bucket_len(len(tplan.stack))
        pad_stack = np.zeros((ls, 3), dtype=np.int32)
        pad_stack[:, 0] = n_c  # trash slot
        pad_stack[: len(tplan.stack)] = tplan.stack
        c_tiles = tile_stack_matmul_xla(
            a_tiles, b_tiles, jnp.asarray(pad_stack), n_c_tiles=n_c
        )
    out = _gather_combine(
        c_tiles,
        _pad_i32(c_src, lc, n_c * tile * tile),
        jnp.asarray(old_inv),
        _pad_data(old_data, lo),
        jnp.asarray(alpha, dtype=a.dtype),
        jnp.asarray(beta, dtype=a.dtype),
    )
    get_stats().hardware_flops += 2.0 * len(tplan.stack) * tile**3
    return out[: c_index.nelems]


def build_multiply_executor(
    transa: str,
    transb: str,
    a: BCSRMatrix,
    b: BCSRMatrix,
    *,
    driver: Optional[str] = None,
):
    """Plan once, execute many: returns ``(fn, c_index, eff_flops)`` where
    ``fn(a_data, b_data) -> c_data`` is a pure jittable function computing
    op(A)·op(B) for NEW DATA with the SAME sparsity patterns.

    The analog of the reference's batched-multiply state machine
    (``dbcsr_tas_batched_mm_*``): iterative algorithms (SCF, matrix
    iterations) repeat products over fixed patterns — the symbolic plan and
    all maps are reused, so steady-state cost is pure device time.
    """
    cfg = get_config()
    ta, ca = _effective_trans(transa)
    tb, cb = _effective_trans(transb)
    a = desymmetrize(a)
    b = desymmetrize(b)
    m_sizes = a.index.col_block_sizes if ta else a.index.row_block_sizes
    n_sizes = b.index.row_block_sizes if tb else b.index.col_block_sizes
    symb = symbolic_product(a.index, ta, b.index, tb)
    c_index, _ = build_index(symb.rows, symb.cols, m_sizes, n_sizes)
    tile = cfg.tile_size

    drv = driver or cfg.mm_driver
    tplan = None
    if drv in ("auto", "stack", "xla"):
        tplan = plan_tile_stacks(a.index, ta, b.index, tb, tile)
        mt, kt, nt = tplan.tile_grid
        if drv == "auto" and len(tplan.stack) / max(mt * kt * nt, 1) >= cfg.dense_threshold:
            tplan = None

    nelems = c_index.nelems
    zero_old = jnp.zeros(1, dtype=a.dtype)
    one = jnp.asarray(1.0, dtype=a.dtype)
    zero = jnp.asarray(0.0, dtype=a.dtype)

    if tplan is None:
        a_inv, (mp, kp) = panel_gather_map(a.index, tile, ta)
        b_inv, (kp2, np_) = panel_gather_map(b.index, tile, tb)
        c_src, _ = panel_scatter_map(c_index, tile, False)
        a_inv_j = jnp.asarray(a_inv)
        b_inv_j = jnp.asarray(b_inv)
        c_src_j = jnp.asarray(c_src)
        prec = cfg.matmul_precision

        no_old = jnp.full((len(c_src),), np.iinfo(np.int32).max, jnp.int32)

        def fn(a_data, b_data):
            return _dense_exec(
                a_data, b_data, a_inv_j, b_inv_j, c_src_j,
                no_old, zero_old, one, zero,
                mp=mp, kp=kp, np_=np_, conj_a=ca, conj_b=cb, prec=prec,
            )[:nelems]

        return fn, c_index, symb.eff_flops

    plan = tplan
    n_a = max(plan.n_a_tiles, 1)
    n_b = max(plan.n_b_tiles, 1)
    n_c = max(plan.n_c_tiles, 1)
    _, _, nt = plan.tile_grid
    c_src = tile_gather_map(c_index, plan.c_tile_coords, tile, nt)
    a_inv_j = jnp.asarray(inverse_map(plan.a_dest, n_a * tile * tile))
    b_inv_j = jnp.asarray(inverse_map(plan.b_dest, n_b * tile * tile))
    c_src_j = jnp.asarray(c_src)
    stack_np = plan.stack
    no_old = jnp.full((len(c_src),), np.iinfo(np.int32).max, jnp.int32)
    use_pallas = (
        drv != "xla"
        and any(d.platform == "tpu" for d in jax.devices())
        and a.dtype in (jnp.float32, jnp.bfloat16)
    )
    prec = cfg.matmul_precision

    def fn(a_data, b_data):
        a_tiles = _pack_tiles(a_data, a_inv_j, n_tiles=n_a, tile=tile, conj=ca)
        b_tiles = _pack_tiles(b_data, b_inv_j, n_tiles=n_b, tile=tile, conj=cb)
        if use_pallas:
            c_tiles = tile_stack_matmul_pallas(
                a_tiles, b_tiles, stack_np, n_c_tiles=n_c,
                max_chunk=cfg.max_stack_size, precision=prec,
            )
        else:
            c_tiles = tile_stack_matmul_xla(
                a_tiles, b_tiles, jnp.asarray(stack_np), n_c_tiles=n_c
            )
        return _gather_combine(
            c_tiles, c_src_j, no_old, zero_old, one, zero
        )[:nelems]

    return fn, c_index, symb.eff_flops
