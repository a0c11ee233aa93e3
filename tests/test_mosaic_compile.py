"""Device-less FULL TPU-compile gate for every Pallas kernel family.

One stage deeper than test_mosaic_lowering.py: jitting against a
compile-only PJRT TPU topology (local libtpu, no chip) runs the entire
Mosaic pass pipeline and the XLA TPU backend — legalization, layout
assignment, VMEM allocation against the real v5e bound. This was
round 3's residual risk ("a kernel that has only ever run interpreted
must be presumed broken on hardware"): after this gate, only chip
NUMERICS remain for the on-chip ``validate_kernels``
(``tools/chip_session.sh`` step 1). Reference analog: the runtime
JIT+validate-at-first-use flow, ``libsmm_acc.cpp:55-89``.

The case set is the same one ``validate_kernels`` checks numerically and
``lower_kernels_for_tpu`` lowers, so coverage cannot drift apart.
"""
import numpy as np
import pytest

import dbcsr_tpu as dt

pytestmark = pytest.mark.skipif(
    dt.testing.tpu_compile_topology() is None,
    reason="no local TPU compiler (libtpu) available",
)


def test_all_kernel_families_compile_for_tpu():
    res = dt.testing.compile_kernels_for_tpu()
    assert set(res) == {
        "flat", "grouped", "band", "panel", "panel-bf16", "panel-runs",
        "ozaki-panel",
    }
    assert all(res.values())


def test_kernel_families_compile_with_x64_disabled():
    """bench.py / panel_probe.py run with init_lib(enable_x64=False);
    the compile gate must hold under both x64 settings."""
    import jax

    with jax.enable_x64(False):
        res = dt.testing.compile_kernels_for_tpu()
    assert all(res.values()) and len(res) >= 6


def test_bench_banded_panel_launches_compile_for_tpu():
    """The exact launch configurations the chip-window probe runs
    (bench.py banded workload, real 40k-row plan shapes) compile through
    Mosaic + XLA-TPU device-less — a shape- or resource-dependent
    compile failure can no longer burn a chip window."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import SingleDeviceSharding

    from dbcsr_tpu.block.index import build_index
    from dbcsr_tpu.block.store import store_layout
    from dbcsr_tpu.core.config import config_override, get_config
    from dbcsr_tpu.mm.engine import _maybe_panel_plan
    from dbcsr_tpu.mm.panel import (
        PanelRunPlan,
        tile_stack_matmul_panel,
        tile_stack_matmul_panel_runs,
    )
    from dbcsr_tpu.mm.tileplan import plan_tile_stacks_stores

    topo = dt.testing.tpu_compile_topology()
    sh = SingleDeviceSharding(topo.devices[0])

    rng = np.random.default_rng(0)
    rbs = dt.random_block_sizes(40000, [5, 13, 23], rng)
    n = len(rbs)
    i = np.repeat(np.arange(n, dtype=np.int64), 25)
    j = i + np.tile(np.arange(-12, 13, dtype=np.int64), n)
    keep = (j >= 0) & (j < n) & (rng.random(len(j)) < 0.5)
    idx, _ = build_index(i[keep], j[keep], rbs, rbs)
    lay = store_layout(idx, 128)
    coords = lay.tile_coords
    tplan = plan_tile_stacks_stores(
        coords, (lay.ntr, lay.ntc), coords, (lay.ntc, lay.ntr)
    )

    cases = [
        ("panel_base", dict(mm_driver="panel"), jnp.float32),
        ("panelrun_r3", dict(mm_driver="panel", panel_runlen=3),
         jnp.float32),
        ("panel_u4_bf16_w32",
         dict(mm_driver="panel", panel_unroll=4, panel_bf16_inputs=True,
              panel_c_win=32, panel_cache=96, panel_chunk=16),
         jnp.bfloat16),
        # the round-4 large-envelope frontier: f32 caches past the old
        # 32 MiB scoped-vmem default (the kernel requests its own limit,
        # panel._vmem_limit_bytes) — bench-shape plan traffic 0.324 at
        # c_win 64 vs 0.538 at the round-3 c_win 16 ceiling
        ("panel_w64_c320",
         dict(mm_driver="panel", panel_c_win=64, panel_cache=320,
              panel_chunk=16),
         jnp.float32),
        ("panelrun_r3_w32_c192",
         dict(mm_driver="panel", panel_runlen=3, panel_c_win=32,
              panel_cache=192, panel_chunk=16),
         jnp.float32),
    ]
    for label, ov, in_dt in cases:
        with config_override(**ov):
            plan = _maybe_panel_plan(
                get_config(), tplan, idx, idx, lay.n_tiles, lay.n_tiles,
                "panel", None, b_coords=coords,
            )
        assert plan is not None, f"{label}: bench workload must admit"
        aval = jax.ShapeDtypeStruct((lay.n_tiles, 128, 128), in_dt)
        out_dt = jnp.float32 if in_dt == jnp.bfloat16 else None
        kern = (
            tile_stack_matmul_panel_runs
            if isinstance(plan, PanelRunPlan)
            else tile_stack_matmul_panel
        )

        def f(a, b, *, _k=kern, _p=plan):
            return _k(a, b, tplan.stack, n_c_tiles=tplan.n_c_tiles,
                      plan=_p, precision="default", out_dtype=out_dt)

        compiled = (
            jax.jit(f, out_shardings=sh).trace(aval, aval).lower()
            .compile()
        )
        assert compiled is not None, label


def test_distributed_executors_compile_for_tpu():
    """Multi-chip TPU COMPILE gate: Cannon / 2.5D / non-square SUMMA
    executors (shard_map + ppermute/all_gather/psum + local compute)
    compile end-to-end for real v5e device meshes (2x2 and 2x4
    compile-only topologies) — collective lowering, Mosaic kernels, and
    SPMD partitioning all pass the actual TPU backend without hardware."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from dbcsr_tpu.dist import ProcessGrid, tile_aligned_dist
    from dbcsr_tpu.mm.engine import build_distributed_executor

    topo = dt.testing.tpu_compile_topology("v5e:2x4")
    assert topo is not None and len(topo.devices) == 8

    rng = np.random.default_rng(0)
    rbs = dt.random_block_sizes(24, [3, 5], rng)
    a = dt.random_matrix(rbs, rbs, 0.5, rng, dtype=np.float32)
    b = dt.random_matrix(rbs, rbs, 0.5, rng, dtype=np.float32)

    cases = [
        ("cannon", (2, 2), 1),   # square Cannon ppermute ring
        ("cannon", (2, 2), 2),   # 2.5D layer axis (psum C-reduction)
        ("summa", (2, 4), 1),    # non-square all_gather panels
    ]
    for algo, shape, nlayer in cases:
        grid = ProcessGrid.make(
            *shape, nlayer=nlayer, devices=list(topo.devices)
        )
        dist = tile_aligned_dist(grid, rbs, rbs, a.tile)
        fn, _, _ = build_distributed_executor("N", "N", a, b, dist,
                                              algo=algo)
        sh = NamedSharding(grid.mesh, PartitionSpec())
        av_a = jax.ShapeDtypeStruct(a.data.shape, a.data.dtype, sharding=sh)
        av_b = jax.ShapeDtypeStruct(b.data.shape, b.data.dtype, sharding=sh)
        compiled = jax.jit(fn).trace(av_a, av_b).lower().compile()
        assert compiled is not None, (algo, shape, nlayer)


def test_vmem_budget_enforced_negative_control():
    """The gate must be able to FAIL: a VMEM-oversubscribed kernel has to
    be rejected at compile (RESOURCE_EXHAUSTED against the real 128 MiB
    v5e bound), proving resource checks actually run device-less."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import SingleDeviceSharding

    topo = dt.testing.tpu_compile_topology()
    sh = SingleDeviceSharding(topo.devices[0])

    def kernel(x_ref, o_ref, scratch):
        scratch[0, :, :] = x_ref[...]
        o_ref[...] = scratch[0]

    def run():
        x = jnp.ones((128, 128), jnp.float32)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((10000, 128, 128), jnp.float32)],
        )(x)

    with pytest.raises(Exception, match="RESOURCE_EXHAUSTED"):
        jax.jit(run, out_shardings=sh).trace().lower().compile()


def test_ozaki_f64_paths_compile_for_tpu():
    """The ozaki f64 slice product (ops/f64_emu.py) is pure XLA but
    leans on f64 elementwise ops (round, log2, exp2) whose TPU lowering
    is emulated — gate the FULL device-less TPU compile so an
    unsupported-f64-op regression cannot reach a chip window."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.sharding import SingleDeviceSharding

    from dbcsr_tpu.ops.f64_emu import ozaki_matmul, tile_stack_matmul_ozaki

    topo = dt.testing.tpu_compile_topology()
    sh = SingleDeviceSharding(topo.devices[0])
    with jax.enable_x64(True):
        a = jax.ShapeDtypeStruct((64, 256), jnp.float64, sharding=sh)
        b = jax.ShapeDtypeStruct((256, 48), jnp.float64, sharding=sh)
        assert jax.jit(ozaki_matmul).lower(a, b).compile() is not None
        at = jax.ShapeDtypeStruct((6, 128, 128), jnp.float64, sharding=sh)
        bt = jax.ShapeDtypeStruct((5, 128, 128), jnp.float64, sharding=sh)
        st = jax.ShapeDtypeStruct((9, 3), jnp.int32, sharding=sh)
        f = functools.partial(tile_stack_matmul_ozaki, n_c_tiles=4)
        assert jax.jit(f).lower(at, bt, st).compile() is not None
