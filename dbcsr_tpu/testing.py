"""Built-in self-test API.

Analog of the reference's embedded test infrastructure
(``dbcsr_run_tests`` / ``dbcsr_test_mm`` / ``dbcsr_test_binary_io``,
``src/ops/dbcsr_tests.F:62``; helpers ``src/ops/dbcsr_test_methods.F``):
embedding applications can self-check the installed library on their own
machine without the pytest suite. The correctness oracle is the same as the
reference's (``tests/dbcsr_test_multiply.F:523-700``): convert operands to
replicated dense, compare ``multiply`` against dense GEMM with
norm-scaled residuals, imposing C's sparsity when ``retain_sparsity``.
"""
from __future__ import annotations

import tempfile
from typing import Optional, Sequence

import numpy as np

from .block.bcsr import BCSRMatrix
from .mm.engine import multiply
from .ops.io import binary_read, binary_write, checksum
from .ops.random import random_block_sizes, random_matrix

__all__ = [
    "to_dense_local",
    "impose_sparsity",
    "check_multiply",
    "test_mm",
    "test_binary_io",
    "test_tas",
    "test_tensor",
    "validate_kernels",
    "lower_kernels_for_tpu",
    "compile_kernels_for_tpu",
    "tpu_compile_topology",
    "run_tests",
]


def _kernel_validation_cases(tile: int, n_tiles: int, seed: int):
    """One representative case per Pallas kernel family, shared by
    :func:`validate_kernels` (the on-chip numeric gate — the reference
    validates every JIT kernel at first use, ``validate_kernel``,
    ``src/acc/libsmm_acc/libsmm_acc.cpp:55-89``) and
    :func:`lower_kernels_for_tpu` (the AOT Mosaic-lowering gate, which
    needs no chip). Returns ``[(name, run_pallas, run_xla), ...]``
    thunks; raises RuntimeError if a host planner declines its pattern —
    that is a planning regression, not a numerics question."""
    import jax.numpy as jnp

    from .mm.kernels import (
        tile_stack_matmul_grouped,
        tile_stack_matmul_pallas,
        tile_stack_matmul_xla,
    )

    rng = np.random.default_rng(seed)
    cases = []

    a = jnp.asarray(rng.standard_normal((n_tiles, tile, tile)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n_tiles, tile, tile)), jnp.float32)
    # stack with repeated C tiles to exercise revisit accumulation
    stack = np.array(
        [[0, 0, 0], [0, 1, 1], [1, 2, 2], [2, 0, 3], [2, 3, 0]],
        dtype=np.int32,
    )
    cases.append((
        "flat",
        lambda: tile_stack_matmul_pallas(
            a, b, stack, n_c_tiles=3, precision="highest"
        ),
        lambda: tile_stack_matmul_xla(
            a, b, jnp.asarray(stack), n_c_tiles=3, precision="highest"
        ),
    ))

    # grouped A-caching kernel (same stack)
    cases.append((
        "grouped",
        lambda: tile_stack_matmul_grouped(
            a, b, stack, n_c_tiles=3, group=2, cache=4, ring=2,
            precision="highest",
        ),
        cases[0][2],
    ))

    # band kernel: small tridiagonal product
    from .mm.band import BandPlan, _band_matmul_xla, band_matmul_pallas

    mt = 5
    coords = np.array(
        [(r, c) for r in range(mt) for c in range(mt) if abs(r - c) <= 1],
        dtype=np.int64,
    )
    a_pack = np.full(3 * mt, -1, dtype=np.int64)
    d = coords[:, 1] - coords[:, 0] + 1
    a_pack[d * mt + coords[:, 0]] = np.arange(len(coords))
    n_band = len(coords)
    ab = jnp.asarray(
        rng.standard_normal((n_band, tile, tile)), jnp.float32
    )
    bb = jnp.asarray(
        rng.standard_normal((n_band, tile, tile)), jnp.float32
    )
    ckeys = np.sort(coords[:, 0] * mt + coords[:, 1])
    bplan = BandPlan(
        a_pack=a_pack, b_pack=a_pack,
        c_unpack=((ckeys % mt) - (ckeys // mt) + 2) * mt + (ckeys // mt),
        wa=3, wb=3, off_a=-1, off_b=-1, mt=mt, kt=mt, hw_flops=0.0,
    )
    cases.append((
        "band",
        lambda: band_matmul_pallas(
            ab, bb, bplan, tile=tile, precision="highest"
        ),
        lambda: _band_matmul_xla(
            ab, bb, bplan, tile=tile, precision="highest"
        ),
    ))

    # panel (supertile slab-DMA) kernel: banded stack over a 32-tile
    # store with per-group spans that keep the chunked (chunk=4) slab
    # path live
    from .mm.panel import plan_panel_stack, tile_stack_matmul_panel

    n_pt, n_c, s = 32, 8, 48
    ap = jnp.asarray(rng.standard_normal((n_pt, tile, tile)), jnp.float32)
    bp = jnp.asarray(rng.standard_normal((n_pt, tile, tile)), jnp.float32)
    c_col = np.sort(
        np.concatenate(
            [np.arange(n_c, dtype=np.int32),  # every slot non-empty
             rng.integers(0, n_c, s - n_c).astype(np.int32)]
        )
    )
    # each c slot draws its a/b tiles from a 4-tile window at 3*c: a
    # c_win=4 group's span is <= 13, chunk-padded to 16 = the cache cap,
    # inside the 32-tile store — the chunked slab path stays live
    base = (3 * c_col).astype(np.int32)
    pstack = np.stack(
        [c_col,
         base + rng.integers(0, 4, s).astype(np.int32),
         base + rng.integers(0, 4, s).astype(np.int32)], axis=1
    )
    pstack = pstack[np.argsort(pstack[:, 0], kind="stable")]
    pplan = plan_panel_stack(
        pstack, n_c, n_pt, n_pt, c_win=4, a_cap=16, b_cap=16, chunk=4
    )
    if pplan is None or pplan.chunk != 4:
        raise RuntimeError(f"kernel cases: panel plan FAILED ({pplan})")
    cases.append((
        "panel",
        lambda: tile_stack_matmul_panel(
            ap, bp, pstack, n_c_tiles=n_c, plan=pplan, precision="highest"
        ),
        lambda: tile_stack_matmul_xla(
            ap, bp, jnp.asarray(pstack), n_c_tiles=n_c, precision="highest"
        ),
    ))

    # panel kernel with bf16 slab inputs / f32 accumulate+out (the
    # panel_bf16 knob's launch configuration)
    ap16, bp16 = ap.astype(jnp.bfloat16), bp.astype(jnp.bfloat16)
    cases.append((
        "panel-bf16",
        lambda: tile_stack_matmul_panel(
            ap16, bp16, pstack, n_c_tiles=n_c, plan=pplan,
            precision="default", out_dtype=jnp.float32,
        ),
        lambda: tile_stack_matmul_xla(
            ap16.astype(jnp.float32), bp16.astype(jnp.float32),
            jnp.asarray(pstack), n_c_tiles=n_c, precision="highest",
        ),
    ))

    # run-fused panel kernel: banded stack (consecutive-k runs exist under
    # the col-major B numbering) exercising all three dot tiers
    # (quads/pairs/singles)
    from .mm.panel import plan_panel_runs, tile_stack_matmul_panel_runs

    mt_r, w_r = 12, 2
    rc = np.array(
        [(r, c) for r in range(mt_r) for c in range(mt_r)
         if abs(r - c) <= w_r],
        dtype=np.int64,
    )
    slot_of = {(r, c): i for i, (r, c) in enumerate(rc)}
    trips = sorted(
        (slot_of[(r, c)], sa, slot_of[(k, c)])
        for (r, k), sa in slot_of.items()
        for c in range(max(0, k - w_r, r - w_r),
                       min(mt_r, k + w_r + 1, r + w_r + 1))
    )
    rstack = np.asarray(trips, dtype=np.int32)
    n_r = len(rc)
    ar = jnp.asarray(rng.standard_normal((n_r, tile, tile)), jnp.float32)
    br = jnp.asarray(rng.standard_normal((n_r, tile, tile)), jnp.float32)
    cm = np.argsort(rc[:, 1] * mt_r + rc[:, 0]).astype(np.int32)
    rplan = plan_panel_runs(
        rstack, n_r, n_r, n_r, b_cm_perm=cm, c_win=8, a_cap=32, b_cap=32,
        chunk=4, runlen=3,
    )
    if rplan is None or rplan.n_quads == 0 or rplan.n_pairs == 0:
        raise RuntimeError(f"kernel cases: panel-runs plan FAILED ({rplan})")
    cases.append((
        "panel-runs",
        lambda: tile_stack_matmul_panel_runs(
            ar, br, rstack, n_c_tiles=n_r, plan=rplan, precision="highest"
        ),
        lambda: tile_stack_matmul_xla(
            ar, br, jnp.asarray(rstack), n_c_tiles=n_r, precision="highest"
        ),
    ))

    # fused ozaki f64 panel kernel (mm/ozaki_panel.py): exact bf16 slice
    # products + two-sum cascade; oracle = the XLA store-sliced ozaki
    # twin (both ~2^-53-grade, so they agree far inside the 1e-4 gate)
    from .mm.ozaki_panel import (
        plan_ozaki_panel,
        tile_stack_matmul_ozaki_panel,
    )
    from .ops.f64_emu import tile_stack_matmul_ozaki

    nt_o = 6
    oc = np.array(
        [(i, k) for i in range(nt_o)
         for k in range(max(0, i - 1), min(nt_o, i + 2))],
        dtype=np.int64,
    )
    oslot = {tuple(c): s for s, c in enumerate(oc)}
    otrips = sorted(
        (oslot[(i, j)], sa_, oslot[(k, j)])
        for (i, k), sa_ in oslot.items()
        for j in range(max(0, k - 1), min(nt_o, k + 2))
        if (i, j) in oslot
    )
    ostack = np.asarray(otrips, dtype=np.int32)
    # C pattern == the band itself here, slots see <= 3 entries each
    n_ot = len(oc)
    a64 = rng.standard_normal((n_ot, tile, tile)) * np.exp2(
        rng.integers(-12, 12, (n_ot, tile, 1)).astype(np.float64)
    )
    b64 = rng.standard_normal((n_ot, tile, tile)) * np.exp2(
        rng.integers(-12, 12, (n_ot, 1, tile)).astype(np.float64)
    )
    ao, bo = jnp.asarray(a64), jnp.asarray(b64)
    oplan = plan_ozaki_panel(ostack, n_ot, n_ot, n_ot)
    if oplan is None:
        raise RuntimeError("kernel cases: ozaki-panel plan FAILED")
    cases.append((
        "ozaki-panel",
        lambda: tile_stack_matmul_ozaki_panel(
            ao, bo, ostack, n_c_tiles=n_ot,
            a_rows=oc[:, 0], b_cols=oc[:, 1], c_coords=oc, plan=oplan,
        ).astype(jnp.float32),
        lambda: tile_stack_matmul_ozaki(
            ao, bo, jnp.asarray(ostack), n_c_tiles=n_ot
        ).astype(jnp.float32),
    ))
    return cases


def validate_kernels(*, tile: int = 128, n_tiles: int = 4, seed: int = 0,
                     verbose: bool = False) -> bool:
    """Numeric self-validation of every Pallas stack-kernel family against
    its XLA twin (the reference validates every JIT kernel at first use,
    ``validate_kernel``, ``src/acc/libsmm_acc/libsmm_acc.cpp:55-89``).
    Returns True on non-TPU backends (the XLA twin IS the kernel there).

    Tolerances: bf16-input cases are compared at bf16 resolution; all
    f32 cases at 1e-4 relative."""
    import jax
    import jax.numpy as jnp

    if not any(d.platform == "tpu" for d in jax.devices()):
        return True
    all_ok = True
    for name, run_pallas, run_xla in _kernel_validation_cases(
        tile, n_tiles, seed
    ):
        got = run_pallas()
        ref = run_xla()
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
        scale = float(jnp.max(jnp.abs(ref))) or 1.0
        tol = 2e-2 if "bf16" in name else 1e-4
        ok = err <= tol * scale
        if verbose or not ok:
            print(f"validate_kernels[{name}]: max err {err:.3e} "
                  f"(scale {scale:.3e}) {'OK' if ok else 'FAILED'}")
        all_ok = all_ok and ok
    return all_ok


def lower_kernels_for_tpu(*, tile: int = 128, n_tiles: int = 4,
                          seed: int = 0, verbose: bool = False) -> dict:
    """AOT-lower every Pallas kernel family for the TPU platform — from
    ANY backend, no chip required. The Pallas→Mosaic kernel construction
    runs at jit-lowering time, so this catches the kernel-construction /
    legalization failure class that interpret-mode tests cannot (the
    round-3 risk: a kernel that only ever ran interpreted). It does NOT
    replace :func:`validate_kernels` on hardware: the Mosaic pass
    pipeline and chip numerics still run at XLA-compile/execute time.

    Returns ``{case_name: True}`` for every case; raises with the failing
    case name otherwise.
    """
    import jax

    results = {}
    for name, run_pallas, _ in _kernel_validation_cases(
        tile, n_tiles, seed
    ):
        try:
            lowered = jax.jit(run_pallas).trace().lower(
                lowering_platforms=("tpu",)
            )
            txt = lowered.as_text()
        except Exception as e:  # re-raise with the case name attached
            raise RuntimeError(
                f"lower_kernels_for_tpu[{name}]: TPU lowering failed: {e}"
            ) from e
        if "tpu_custom_call" not in txt:
            raise RuntimeError(
                f"lower_kernels_for_tpu[{name}]: lowered module contains "
                "no tpu_custom_call — the Pallas kernel was not emitted"
            )
        if verbose:
            print(f"lower_kernels_for_tpu[{name}]: OK "
                  f"({len(txt)} bytes of StableHLO)")
        results[name] = True
    return results


def tpu_compile_topology(topology_name: str = "v5e:2x2"):
    """Compile-only PJRT TPU topology for device-less AOT compilation.

    Requires a local ``libtpu`` (the compiler library — NOT a TPU chip:
    the topology holds compile-only device descriptions). Returns None
    when unavailable so callers can skip gracefully. The default models
    this project's bench target exactly (``device_kind == 'TPU v5 lite'``,
    1 core/chip, the real 128 MiB/core VMEM bound — verified by probing:
    a 655 MB VMEM scratch fails RESOURCE_EXHAUSTED against
    ``size=134217728`` while ≤128 MiB compiles)."""
    import os

    # libtpu serializes process loads through /tmp/libtpu_lockfile and
    # ABORTS when another process holds it (or a killed one left it
    # stale). Compile-only topologies claim no TPU, so multiple loads
    # are safe — opt out of the lock before the first libtpu touch, or
    # a concurrently running gate (pytest + a tool) flakes the suite.
    os.environ.setdefault("ALLOW_MULTIPLE_LIBTPU_LOAD", "true")
    try:
        from jax.experimental import topologies

        return topologies.get_topology_desc(topology_name, "tpu")
    except Exception:
        return None


def compile_kernels_for_tpu(*, tile: int = 128, n_tiles: int = 4,
                            seed: int = 0, verbose: bool = False,
                            topology_name: str = "v5e:2x2") -> dict:
    """AOT-compile every Pallas kernel family for the real TPU target —
    device-less, from any backend. One step deeper than
    :func:`lower_kernels_for_tpu`: jitting against a compile-only PJRT
    topology (:func:`tpu_compile_topology`) runs the FULL Mosaic pass
    pipeline and the XLA TPU backend — legalization, layout assignment,
    VMEM allocation against the hardware bound — i.e. everything the
    chip itself would run at compile time. After this gate passes, only
    chip NUMERICS remain for :func:`validate_kernels` on hardware (the
    reference's first-use validation, ``libsmm_acc.cpp:55-89``).

    Returns ``{case_name: True}``; ``{"skipped": reason}`` when no local
    TPU compiler is available; raises with the failing case otherwise.
    """
    import jax
    from jax.sharding import SingleDeviceSharding

    topo = tpu_compile_topology(topology_name)
    if topo is None:
        return {"skipped": "no local TPU compiler (libtpu) available"}
    sh = SingleDeviceSharding(topo.devices[0])

    results = {}
    for name, run_pallas, _ in _kernel_validation_cases(
        tile, n_tiles, seed
    ):
        try:
            compiled = (
                jax.jit(run_pallas, out_shardings=sh).trace().lower()
                .compile()
            )
        except Exception as e:
            raise RuntimeError(
                f"compile_kernels_for_tpu[{name}]: TPU (Mosaic) compile "
                f"failed: {e}"
            ) from e
        if verbose:
            mem = compiled.memory_analysis()
            print(f"compile_kernels_for_tpu[{name}]: OK "
                  f"(temp {getattr(mem, 'temp_size_in_bytes', '?')} B)")
        results[name] = True
    return results


def to_dense_local(m: BCSRMatrix) -> np.ndarray:
    """Replicated dense copy on host (``dbcsr_to_dense_local``,
    ``src/ops/dbcsr_test_methods.F:213``)."""
    return np.asarray(m.to_dense())


def impose_sparsity(dense: np.ndarray, like: BCSRMatrix) -> np.ndarray:
    """Zero ``dense`` outside the block pattern of ``like``
    (``dbcsr_impose_sparsity``, ``src/ops/dbcsr_test_methods.F:102``)."""
    out = np.zeros_like(dense)
    ro = like.index.row_offsets
    co = like.index.col_offsets
    rows = like.index.blk_rows
    cols = like.index.col_idx
    for b in range(like.nblks):
        i, j = int(rows[b]), int(cols[b])
        out[ro[i]:ro[i + 1], co[j]:co[j + 1]] = dense[
            ro[i]:ro[i + 1], co[j]:co[j + 1]
        ]
        if like.sym != "N" and i != j:
            out[ro[j]:ro[j + 1], co[i]:co[i + 1]] = dense[
                ro[j]:ro[j + 1], co[i]:co[i + 1]
            ]
    return out


def check_multiply(
    transa: str,
    transb: str,
    alpha,
    a: BCSRMatrix,
    b: BCSRMatrix,
    beta,
    c_in: Optional[BCSRMatrix],
    c_out: BCSRMatrix,
    *,
    retain_sparsity: bool = False,
    eps_factor: float = 100.0,
) -> bool:
    """Norm-scaled residual acceptance test (``dbcsr_check_multiply``,
    ``tests/dbcsr_test_multiply.F:616-640``): accept when
    ``|C_dense − C_sparse|_max <= eps_factor · ε_machine · scale`` with
    ``scale = max(|A|, |B|, |C|)`` 1-norm products."""
    da = to_dense_local(a)
    db = to_dense_local(b)
    if transa.upper() in ("T", "C"):
        da = da.T.conj() if transa.upper() == "C" else da.T
    if transb.upper() in ("T", "C"):
        db = db.T.conj() if transb.upper() == "C" else db.T
    ref = alpha * (da @ db)
    if c_in is not None:
        ref = ref + beta * to_dense_local(c_in)
    if retain_sparsity and c_in is not None:
        ref = impose_sparsity(ref, c_in)
    got = to_dense_local(c_out)
    eps = np.finfo(np.asarray(got).real.dtype).eps
    scale = max(
        np.abs(da).sum(axis=0).max() * np.abs(db).sum(axis=0).max(),
        np.abs(ref).max(),
        1.0,
    )
    resid = np.abs(got - ref).max()
    return bool(resid <= eps_factor * eps * scale)


def test_mm(
    *,
    nblkrows: int = 60,
    nblkcols: int = 50,
    nblkks: int = 55,
    block_sizes: Sequence[int] = (2, 3, 5),
    occupancy: float = 0.3,
    dtype=np.float64,
    seed: int = 0,
    verbose: bool = False,
) -> bool:
    """Multiply self-test sweep (``dbcsr_test_mm``): transposes × alpha/beta
    on random matrices, dense-oracle checked. Returns True if all pass."""
    rng = np.random.default_rng(seed)
    mbs = random_block_sizes(nblkrows, block_sizes, rng)
    kbs = random_block_sizes(nblkks, block_sizes, rng)
    nbs = random_block_sizes(nblkcols, block_sizes, rng)
    ok = True
    for transa in ("N", "T"):
        for transb in ("N", "T"):
            a = random_matrix(
                kbs if transa == "T" else mbs,
                mbs if transa == "T" else kbs,
                occupancy, rng, dtype=dtype, name="A",
            )
            b = random_matrix(
                nbs if transb == "T" else kbs,
                kbs if transb == "T" else nbs,
                occupancy, rng, dtype=dtype, name="B",
            )
            for alpha, beta, with_c in ((1.0, 0.0, False), (2.0, 0.5, True)):
                c_in = (
                    random_matrix(mbs, nbs, occupancy, rng, dtype=dtype, name="C")
                    if with_c
                    else None
                )
                c_out = multiply(transa, transb, alpha, a, b, beta, c_in)
                good = check_multiply(
                    transa, transb, alpha, a, b, beta, c_in, c_out
                )
                if verbose or not good:
                    print(
                        f"test_mm {transa}{transb} alpha={alpha} beta={beta} "
                        f"c={'Y' if with_c else 'N'}: "
                        f"{'OK' if good else 'FAILED'}"
                    )
                ok = ok and good
    return ok


def test_binary_io(*, seed: int = 0, verbose: bool = False) -> bool:
    """Checkpoint self-test (``dbcsr_test_binary_io``): write → read →
    checksum compare."""
    rng = np.random.default_rng(seed)
    rbs = random_block_sizes(40, [2, 3, 5], rng)
    m = random_matrix(rbs, rbs, 0.3, rng, dtype=np.float64, name="io_test")
    with tempfile.NamedTemporaryFile(suffix=".dbcsr") as f:
        binary_write(m, f.name)
        m2 = binary_read(f.name)
    good = (
        m2.nblks == m.nblks
        and abs(checksum(m2) - checksum(m)) <= 1e-12 * max(checksum(m), 1.0)
    )
    if verbose or not good:
        print(f"test_binary_io: {'OK' if good else 'FAILED'}")
    return good


def test_tas(*, seed: int = 0, verbose: bool = False) -> bool:
    """TAS self-test: tall multiply vs dense oracle (the reference's
    ``dbcsr_tas_unittest`` checksum recipe in miniature)."""
    from .tas import tas_multiply

    rng = np.random.default_rng(seed)
    mbs = random_block_sizes(300, [2, 3], rng)
    kbs = random_block_sizes(24, [3], rng)
    nbs = random_block_sizes(20, [2], rng)
    a = random_matrix(mbs, kbs, 0.3, rng, dtype=np.float64, name="A")
    b = random_matrix(kbs, nbs, 0.6, rng, dtype=np.float64, name="B")
    out = tas_multiply("N", "N", 1.0, a, b, nsplit=4).matrix
    ref = to_dense_local(a) @ to_dense_local(b)
    good = bool(np.abs(to_dense_local(out) - ref).max() <= 1e-10 * max(
        np.abs(ref).max(), 1.0
    ))
    if verbose or not good:
        print(f"test_tas: {'OK' if good else 'FAILED'}")
    return good


def test_tensor(*, seed: int = 0, verbose: bool = False) -> bool:
    """Tensor self-test: rank-3 contraction vs an einsum oracle (the
    reference's ``dbcsr_t_contract_test``)."""
    from .tensors import NDMapping, TensorBuilder, contract

    rng = np.random.default_rng(seed)
    bs = [np.array([2, 3]), np.array([2, 2]), np.array([3, 1, 2])]
    bs_l = [np.array([4])]

    def build(sizes, occ, mapping=None):
        bld = TensorBuilder(sizes, mapping, dtype=np.float64)
        nbpd = [len(s) for s in sizes]
        for flat in np.flatnonzero(rng.random(int(np.prod(nbpd))) < occ):
            bi = np.unravel_index(flat, nbpd)
            shp = tuple(int(sizes[d][bi[d]]) for d in range(len(sizes)))
            bld.put_block(bi, rng.standard_normal(shp))
        return bld.finalize()

    a = build(bs, 0.7, NDMapping(3, (0, 1), (2,)))
    b = build([bs[2]] + bs_l, 0.8)
    out = contract(
        1.0, a, b,
        contract_1=(2,), notcontract_1=(0, 1),
        contract_2=(0,), notcontract_2=(1,),
    )
    ref = np.einsum("ijk,kl->ijl", np.asarray(a.to_dense()),
                    np.asarray(b.to_dense()))
    good = bool(
        np.abs(np.asarray(out.to_dense()) - ref).max()
        <= 1e-10 * max(np.abs(ref).max(), 1.0)
    )
    if verbose or not good:
        print(f"test_tensor: {'OK' if good else 'FAILED'}")
    return good


def run_tests(*, verbose: bool = False) -> bool:
    """Run every built-in self-test (``dbcsr_run_tests``)."""
    ok = test_mm(verbose=verbose)
    ok = test_binary_io(verbose=verbose) and ok
    ok = validate_kernels(verbose=verbose) and ok
    try:
        # kernel-construction gate, meaningful on ANY backend (numeric
        # validation above needs the chip; this needs only the lowerer)
        lower_kernels_for_tpu(verbose=verbose)
    except Exception as e:
        print(f"run_tests: TPU kernel lowering FAILED: {e}")
        ok = False
    try:
        # full Mosaic-compile gate (device-less; needs only local libtpu)
        res = compile_kernels_for_tpu(verbose=verbose)
        if verbose and "skipped" in res:
            print(f"run_tests: TPU kernel compile skipped: {res['skipped']}")
    except Exception as e:
        print(f"run_tests: TPU kernel compile FAILED: {e}")
        ok = False
    ok = test_tas(verbose=verbose) and ok
    ok = test_tensor(verbose=verbose) and ok
    if verbose:
        print(f"run_tests: {'ALL OK' if ok else 'FAILURES'}")
    return ok
