"""Curated real-chip battery anchor (round-3 VERDICT item 5).

`make tpu-check` runs `DBCSR_TEST_PLATFORM=axon pytest -m tpu_battery`:
the multiply battery, every Pallas kernel against its XLA twin, complex
emulation, exact filtering, one TAS multiply, one tensor contraction and
the C API typed sweep — one command, before every perf commit. The
reference's analog is its JIT-time kernel self-validation
(``/root/reference/src/acc/libsmm_acc/libsmm_acc.cpp:55-89``); the CPU
suite runs Pallas in interpret mode and cannot catch Mosaic legalization
or chip-numerics regressions (e.g. the round-1 bf16-norms bug), so this
battery is the documented chip gate.
"""
import jax
import pytest

import dbcsr_tpu as dt

pytestmark = pytest.mark.tpu_battery


def _on_tpu() -> bool:
    """Lazy + non-raising: an import-time ``jax.devices()`` turned a
    transient axon grant refusal into a COLLECTION error (pytest rc=2 —
    the round-4 windows' twice-red ``make tpu-check``). Deciding at test
    time keeps a backend hiccup scoped to one skipped test."""
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except RuntimeError:
        return False


def test_validate_kernels_on_chip():
    """Every Pallas kernel (flat stack, grouped A-cache, band-DIA, panel
    supertile) against its XLA twin on the real chip."""
    if not _on_tpu():
        pytest.skip("kernel self-validation needs the real chip")
    assert dt.testing.validate_kernels(verbose=True)


def test_builtin_selftest_mm():
    """The embedded self-test sweep's multiply leg (runs on any backend;
    on the chip it exercises the production dispatch end to end)."""
    assert dt.testing.test_mm(
        nblkrows=24, nblkcols=20, nblkks=22, occupancy=0.4, seed=3
    )


def test_ozaki_f64_numerics():
    """True-f64 ozaki slice product vs a host f64 oracle — the slicing
    leans on emulated f64 elementwise ops (round/log2/exp2) whose CHIP
    numerics the CPU suite cannot certify (the compile gate only proves
    they lower). Runs on any backend; on the chip it is the f64
    counterpart of the Pallas-vs-XLA twin checks."""
    import numpy as np
    import jax.numpy as jnp

    from dbcsr_tpu.ops.f64_emu import ozaki_matmul

    rng = np.random.default_rng(11)
    a = rng.standard_normal((96, 260)) * np.exp2(
        rng.integers(-20, 20, (96, 1)).astype(np.float64)
    )
    b = rng.standard_normal((260, 72))
    ref = a @ b
    got = np.asarray(ozaki_matmul(jnp.asarray(a), jnp.asarray(b)))
    bound = np.abs(a) @ np.abs(b)
    assert np.max(np.abs(got - ref) / bound) < 1e-13
