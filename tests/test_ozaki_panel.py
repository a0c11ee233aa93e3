"""Fused ozaki panel kernel (mm/ozaki_panel.py) vs f64 oracles.

Interpret mode on CPU (Mosaic legalization + chip numerics are covered
by the compile gates and the tpu battery, like every other kernel
family)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dbcsr_tpu.mm.ozaki_panel import (
    MAX_ENTRIES_PER_SLOT,
    plan_ozaki_panel,
    tile_stack_matmul_ozaki_panel,
)

pytestmark = pytest.mark.tpu_battery


def _banded_stack(nt, w, t, rng, scale_spread=0):
    """Banded tile pattern: C slot (i, j) with |i-j| <= 1 over an nt x nt
    tile grid, k running over a width-w band — every slot gets <= w
    entries. Returns (a_tiles, b_tiles, stack, n_c, a_rows, b_cols,
    c_coords)."""
    coords = []
    for i in range(nt):
        for k in range(max(0, i - w // 2), min(nt, i + w // 2 + 1)):
            coords.append((i, k))
    coords = np.array(sorted(coords), dtype=np.int64)
    slot_of = {tuple(c): s for s, c in enumerate(coords)}
    # C pattern: same band; entries where A(i,k) and B(k,j) both exist
    c_slots = {}
    stack = []
    for i, k in coords:
        for (k2, j) in coords:
            if k2 != k:
                continue
            ck = (i, j)
            if ck not in c_slots:
                c_slots[ck] = len(c_slots)
    c_keys = sorted(c_slots)
    c_slots = {c: s for s, c in enumerate(c_keys)}
    for i, k in coords:
        for (k2, j) in coords:
            if k2 == k:
                stack.append((c_slots[(i, j)], slot_of[(i, k)],
                              slot_of[(k, j)]))
    stack = np.array(sorted(stack), dtype=np.int32)
    n_c = len(c_keys)
    a_tiles = rng.standard_normal((len(coords), t, t))
    b_tiles = rng.standard_normal((len(coords), t, t))
    if scale_spread:
        a_tiles *= np.exp2(
            rng.integers(-scale_spread, scale_spread, (len(coords), t, 1))
        ).astype(np.float64)
        b_tiles *= np.exp2(
            rng.integers(-scale_spread, scale_spread, (len(coords), 1, t))
        ).astype(np.float64)
    a_rows = coords[:, 0]
    b_cols = coords[:, 1]
    c_coords = np.array(c_keys, dtype=np.int64)
    return a_tiles, b_tiles, stack, n_c, a_rows, b_cols, c_coords


def _oracle(a_tiles, b_tiles, stack, n_c, t):
    ref = np.zeros((n_c, t, t))
    bound = np.zeros((n_c, t, t))
    for c, ia, ib in stack:
        ref[c] += a_tiles[ia] @ b_tiles[ib]
        bound[c] += np.abs(a_tiles[ia]) @ np.abs(b_tiles[ib])
    return ref, np.maximum(bound, 1e-300)


@pytest.mark.parametrize("spread", [0, 25])
def test_matches_f64_oracle(rng, spread):
    """Error bound of the GLOBAL per-row/col scaling (the kernel's
    documented model): |err| <= ~2^-53 * rowmax(A) * colmax(B) * K —
    the classical Ozaki bound. (The XLA twin's per-chunk scaling is
    tighter, relative to per-element sum|a||b|.)"""
    t = 64
    a, b, stack, n_c, ar, bc, cc = _banded_stack(6, 3, t, rng,
                                                 scale_spread=spread)
    assert np.bincount(stack[:, 0]).max() <= MAX_ENTRIES_PER_SLOT
    got = np.asarray(tile_stack_matmul_ozaki_panel(
        jnp.asarray(a), jnp.asarray(b), stack, n_c_tiles=n_c,
        a_rows=ar, b_cols=bc, c_coords=cc, interpret=True,
    ))
    ref, _ = _oracle(a, b, stack, n_c, t)
    # GLOBAL row/col maxima (the scales cover the whole matrix row /
    # column, contributing tiles or not — that is the model's bound)
    ntr = int(ar.max()) + 1
    ntc = int(bc.max()) + 1
    rowmax_g = np.zeros((ntr, t))
    colmax_g = np.zeros((ntc, t))
    for s_, r_ in enumerate(ar):
        rowmax_g[r_] = np.maximum(rowmax_g[r_], np.abs(a[s_]).max(axis=1))
    for s_, c_ in enumerate(bc):
        colmax_g[c_] = np.maximum(colmax_g[c_], np.abs(b[s_]).max(axis=0))
    kcnt = np.bincount(stack[:, 0], minlength=n_c) * t
    bound = (
        rowmax_g[cc[:, 0]][:, :, None]
        * colmax_g[cc[:, 1]][:, None, :]
        * kcnt[:, None, None]
    )
    assert np.max(np.abs(got - ref) / np.maximum(bound, 1e-300)) < 1e-13


def test_rejects_wide_k():
    """More than MAX_ENTRIES_PER_SLOT contributions to one C slot breaks
    the exact-f32 accumulation bound — the plan must refuse."""
    S = MAX_ENTRIES_PER_SLOT + 2
    stack = np.stack(
        [np.zeros(S, np.int32), np.arange(S, dtype=np.int32),
         np.arange(S, dtype=np.int32)], axis=1,
    )
    assert plan_ozaki_panel(stack, 1, S, S) is None


def test_interpret_matches_xla_twin(rng):
    """Same stack through the kernel and the XLA store-sliced path:
    both are ~2^-53-grade, so they agree to f64-roundoff-class bounds."""
    from dbcsr_tpu.ops.f64_emu import tile_stack_matmul_ozaki

    t = 32
    a, b, stack, n_c, ar, bc, cc = _banded_stack(5, 3, t, rng)
    got = np.asarray(tile_stack_matmul_ozaki_panel(
        jnp.asarray(a), jnp.asarray(b), stack, n_c_tiles=n_c,
        a_rows=ar, b_cols=bc, c_coords=cc, interpret=True,
    ))
    twin = np.asarray(tile_stack_matmul_ozaki(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(stack), n_c_tiles=n_c,
    ))
    _, bound = _oracle(a, b, stack, n_c, t)
    assert np.max(np.abs(got - twin) / bound) < 2e-13


def test_lowers_under_highest_default_precision(rng):
    """init_lib sets jax_default_matmul_precision="highest"; an unpinned
    in-kernel dot then reaches Mosaic as contract_precision<fp32> on
    bf16 operands and the CHIP compiler rejects it ("Bad lhs type" —
    found by the round-5 window's x64 validate, invisible to the plain
    gates which run without the ambient setting). Compile the kernel
    under that ambient configuration. tile=128 — the production tile
    edge and the only one the DMA lane tiling accepts (Mosaic requires
    the cache's last dimension 128-aligned for sliced copies)."""
    t = 128
    a, b, stack, n_c, ar, bc, cc = _banded_stack(5, 3, t, rng)

    def run():
        return tile_stack_matmul_ozaki_panel(
            jnp.asarray(a), jnp.asarray(b), stack, n_c_tiles=n_c,
            a_rows=ar, b_cols=bc, c_coords=cc,
        )

    import dbcsr_tpu as dt

    topo = dt.testing.tpu_compile_topology()
    with jax.default_matmul_precision("highest"):
        if topo is not None:
            # full device-less Mosaic compile — the stage that rejected
            # the unpinned dot
            from jax.sharding import SingleDeviceSharding

            sh = SingleDeviceSharding(topo.devices[0])
            jax.jit(run, out_shardings=sh).trace().lower().compile()
        else:
            txt = jax.jit(run).trace().lower(
                lowering_platforms=("tpu",)
            ).as_text()
            assert "tpu_custom_call" in txt
