"""Pallas stack kernel in interpret mode (CPU): exercises the TPU kernel's
logic — revisit accumulation, chunking, E-batching, bf16 inputs — against
the XLA twin without TPU hardware."""
import numpy as np
import pytest

import jax.numpy as jnp

from dbcsr_tpu.mm.kernels import (
    _HAVE_PALLAS,
    tile_stack_matmul_pallas,
    tile_stack_matmul_xla,
)

pytestmark = pytest.mark.skipif(not _HAVE_PALLAS, reason="no pallas")

T = 8


def _case(rng, n_tiles=6, n_c=5, s=40):
    a = jnp.asarray(rng.standard_normal((n_tiles, T, T)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n_tiles, T, T)), jnp.float32)
    c_col = np.sort(rng.integers(0, n_c, s)).astype(np.int32)
    stack = np.stack(
        [c_col, rng.integers(0, n_tiles, s).astype(np.int32),
         rng.integers(0, n_tiles, s).astype(np.int32)], axis=1
    )
    # ensure every c slot appears (the kernel writes only visited slots)
    stack[:n_c, 0] = np.arange(n_c, dtype=np.int32)
    stack = stack[np.argsort(stack[:, 0], kind="stable")]
    return a, b, stack


@pytest.mark.parametrize("e_batch", [1, 2, 4])
def test_interpret_matches_xla(rng, e_batch):
    a, b, stack = _case(rng)
    ref = tile_stack_matmul_xla(
        a, b, jnp.asarray(stack), n_c_tiles=5, precision="highest"
    )
    got = tile_stack_matmul_pallas(
        a, b, stack, n_c_tiles=5, interpret=True, precision="highest",
        e_batch=e_batch,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_interpret_chunked(rng):
    a, b, stack = _case(rng, s=64)
    ref = tile_stack_matmul_xla(
        a, b, jnp.asarray(stack), n_c_tiles=5, precision="highest"
    )
    got = tile_stack_matmul_pallas(
        a, b, stack, n_c_tiles=5, interpret=True, precision="highest",
        max_chunk=16, e_batch=2,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_interpret_bf16_inputs_f32_accum(rng):
    a, b, stack = _case(rng)
    ref = tile_stack_matmul_xla(
        a, b, jnp.asarray(stack), n_c_tiles=5, precision="highest"
    )
    got = tile_stack_matmul_pallas(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), stack,
        n_c_tiles=5, interpret=True, out_dtype=jnp.float32, e_batch=2,
    )
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0.1, atol=0.5
    )


@pytest.mark.parametrize("group,cache,ring", [(4, 16, 4), (8, 8, 2), (2, 4, 8)])
def test_interpret_grouped_matches_xla(rng, group, cache, ring):
    """Grouped A-caching manual-DMA kernel (incl. cache-overflow splits)."""
    from dbcsr_tpu.mm.kernels import tile_stack_matmul_grouped

    a, b, stack = _case(rng, n_tiles=20, n_c=11, s=120)
    ref = tile_stack_matmul_xla(
        a, b, jnp.asarray(stack), n_c_tiles=11, precision="highest"
    )
    got = tile_stack_matmul_grouped(
        a, b, stack, n_c_tiles=11, group=group, cache=cache, ring=ring,
        interpret=True, precision="highest",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_interpret_band_pallas_matches_xla(rng):
    """Pallas band kernel (sliding-window B ring) vs XLA diagonal form."""
    import numpy as _np

    from dbcsr_tpu.mm.band import (
        BandPlan,
        _band_matmul_xla,
        band_matmul_pallas,
    )

    mt = 6
    coords = _np.array(
        [(r, c) for r in range(mt) for c in range(mt) if abs(r - c) <= 1],
        dtype=_np.int64,
    )
    a_pack = _np.full(3 * mt, -1, dtype=_np.int64)
    d = coords[:, 1] - coords[:, 0] + 1
    a_pack[d * mt + coords[:, 0]] = _np.arange(len(coords))
    n_band = len(coords)
    ab = jnp.asarray(rng.standard_normal((n_band, T, T)), jnp.float32)
    bb = jnp.asarray(rng.standard_normal((n_band, T, T)), jnp.float32)
    ckeys = _np.sort(coords[:, 0] * mt + coords[:, 1])
    plan = BandPlan(
        a_pack=a_pack, b_pack=a_pack,
        c_unpack=((ckeys % mt) - (ckeys // mt) + 2) * mt + (ckeys // mt),
        wa=3, wb=3, off_a=-1, off_b=-1, mt=mt, kt=mt, hw_flops=0.0,
    )
    got = band_matmul_pallas(
        ab, bb, plan, tile=T, precision="highest", interpret=True
    )
    ref = _band_matmul_xla(ab, bb, plan, tile=T, precision="highest")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
