"""Worker for the N-process ``jax.distributed`` CPU battery.

The battery always runs 8 global CPU devices split across ``nprocs``
processes (1 proc x 8 local devices, 2 x 4, or 4 x 2 — different
process counts exercise different collective groupings, the analog of
the reference running its whole suite at 1..N MPI ranks,
``/root/reference/tests/CMakeLists.txt:9-25``). Runs the named
scenarios across REAL process boundaries — covering what the
single-process virtual mesh cannot: per-process addressable shards,
cross-process collectives, per-process sharded checkpoint, and
cross-process plan determinism (tiled Cannon, SUMMA, 2.5D, sharded
storage + ops + checkpoint, TAS mesh-parallel).

Usage: python mp_worker.py <coordinator_port> <process_id> <tmpdir>
       [scenarios] [nprocs]
"""
import hashlib
import os
import sys

GLOBAL_DEVICES = 8
NPROCS = int(sys.argv[5]) if len(sys.argv) > 5 else 2
assert GLOBAL_DEVICES % NPROCS == 0, (GLOBAL_DEVICES, NPROCS)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags
        + f" --xla_force_host_platform_device_count={GLOBAL_DEVICES // NPROCS}"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

TILE = 8


def _host_view(x) -> np.ndarray:
    """Global host copy of a jax.Array: reshard device-sharded results to
    fully-replicated (a real cross-process collective), then read the
    local replica."""
    if x.is_fully_addressable:
        return np.asarray(x)
    if not x.is_fully_replicated:
        from jax.sharding import NamedSharding, PartitionSpec

        x = jax.jit(
            lambda v: v,
            out_shardings=NamedSharding(
                x.sharding.mesh, PartitionSpec()
            ),
        )(x)
    return np.asarray(x.addressable_shards[0].data)


def _balanced_devices(k: int):
    """k devices spread round-robin across ALL processes — every mesh
    must span every process so the workers stay in collective lockstep
    (a mesh that omits a process would leave it waiting at the next
    barrier while the others run collectives without it)."""
    per = {}
    for d in jax.devices():
        per.setdefault(d.process_index, []).append(d)
    procs = [per[p] for p in sorted(per)]
    assert k >= len(procs), (k, len(procs))
    out = []
    depth = 0
    while len(out) < k:
        for lst in procs:
            if depth < len(lst) and len(out) < k:
                out.append(lst[depth])
        depth += 1
    return out


def _mats(dt, rng, square=False):
    rbs = dt.random_block_sizes(48, [3, 5], rng)
    if square:
        a = dt.random_matrix(rbs, rbs, 0.5, rng, dtype=np.float32)
        b = dt.random_matrix(rbs, rbs, 0.5, rng, dtype=np.float32)
        return rbs, rbs, a, b
    cbs = dt.random_block_sizes(40, [4], rng)
    a = dt.random_matrix(rbs, cbs, 0.4, rng, dtype=np.float32)
    b = dt.random_matrix(cbs, rbs, 0.4, rng, dtype=np.float32)
    return rbs, cbs, a, b


def _check_multiply(dt, grid, algo, rng):
    """dt.multiply over a cross-process mesh vs the dense oracle."""
    from dbcsr_tpu.core.config import config_override
    from dbcsr_tpu.dist.distribution import tile_aligned_dist

    rbs, cbs, a, b = _mats(dt, rng)
    dist = tile_aligned_dist(grid, rbs, rbs, TILE)
    with config_override(mm_dist_algo=algo):
        c = dt.multiply("N", "N", 1.0, a, b, dist=dist)
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    cd = np.asarray(
        dt.BCSRMatrix(
            name="c", index=c.index, data=_host_view(c.data)
        ).to_dense()
    )
    err = np.abs(cd - ref).max()
    assert err < 1e-3 * max(1.0, float(np.abs(ref).max())), err


def scenario_cannon(dt, pid, tmpdir):
    from dbcsr_tpu.dist import ProcessGrid

    _check_multiply(
        dt, ProcessGrid.make(2, 2, devices=_balanced_devices(4)),
        "cannon", np.random.default_rng(0),
    )


def scenario_summa(dt, pid, tmpdir):
    from dbcsr_tpu.dist import ProcessGrid

    _check_multiply(
        dt, ProcessGrid.make(4, 2), "summa", np.random.default_rng(1)
    )


def scenario_cannon25d(dt, pid, tmpdir):
    from dbcsr_tpu.dist import ProcessGrid

    _check_multiply(
        dt, ProcessGrid.make(2, 2, nlayer=2), "cannon",
        np.random.default_rng(2),
    )


def scenario_summa25d(dt, pid, tmpdir):
    from dbcsr_tpu.dist import ProcessGrid

    _check_multiply(
        dt, ProcessGrid.make(2, 2, nlayer=2), "summa",
        np.random.default_rng(3),
    )


def scenario_tas(dt, pid, tmpdir):
    """TAS mesh-parallel split groups across the 8 global devices."""
    from dbcsr_tpu.tas import tas_multiply_parallel

    rng = np.random.default_rng(4)
    rbs, cbs, a, b = _mats(dt, rng)
    c = tas_multiply_parallel(a, b, long_dim="auto", nsplit=8)
    ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
    got = np.asarray(
        dt.BCSRMatrix(
            name="c", index=c.index, data=_host_view(c.data)
        ).to_dense()
    )
    err = np.abs(got - ref).max()
    assert err < 1e-3 * max(1.0, float(np.abs(ref).max())), err


def scenario_sharded(dt, pid, tmpdir):
    """Sharded executor: per-process ADDRESSABLE shards checked against
    the locally-computed expected store; plus cross-process plan hash."""
    from dbcsr_tpu.dist import ProcessGrid, tile_aligned_dist
    from dbcsr_tpu.dist.sharded import shard_store_with_layout
    from dbcsr_tpu.mm.engine import build_distributed_executor

    rng = np.random.default_rng(0)
    rbs = dt.random_block_sizes(48, [3, 5], rng)
    a = dt.random_matrix(rbs, rbs, 0.5, rng, dtype=np.float32)
    b = dt.random_matrix(rbs, rbs, 0.5, rng, dtype=np.float32)
    grid = ProcessGrid.make(2, 4)
    dist = tile_aligned_dist(grid, rbs, rbs, TILE)

    fn, c_index, _ = build_distributed_executor(
        "N", "N", a, b, dist, algo="summa", sharded=True
    )
    a_sh = shard_store_with_layout(a, fn.shard_a, grid.mesh)
    b_sh = shard_store_with_layout(b, fn.shard_b, grid.mesh)
    out_sh = jax.jit(fn)(a_sh, b_sh)

    c_exp = dt.multiply("N", "N", 1.0, a, b)
    assert c_exp.index.nblks == c_index.nblks
    exp_store = np.asarray(c_exp.data)
    sl_c = fn.shard_c
    exp_shards = np.zeros(
        (sl_c.ndev, sl_c.n_max) + exp_store.shape[1:], exp_store.dtype
    )
    pos = sl_c.pos_of_slot  # global slot -> ndev*n_max position
    exp_shards.reshape(sl_c.ndev * sl_c.n_max, TILE, TILE)[pos] = exp_store
    for s in out_sh.addressable_shards:
        d = int(
            s.index[0].start
            if isinstance(s.index[0], slice)
            else s.index[0]
        )
        got = np.asarray(s.data)[0]
        np.testing.assert_allclose(
            got, exp_shards[d], rtol=1e-5, atol=1e-5,
            err_msg=f"process {pid} device shard {d}",
        )

    # cross-process plan determinism: identical plan hashes, compared by
    # the parent test
    from dbcsr_tpu.block.store import store_layout
    from dbcsr_tpu.dist.distribution import dist_tile_bins
    from dbcsr_tpu.mm.summa import plan_summa

    rowb = dist_tile_bins(dist.row_dist, rbs, TILE, majority=True)
    colb = dist_tile_bins(dist.col_dist, rbs, TILE, majority=True)
    kb = dist_tile_bins(dist.col_dist, rbs, TILE, majority=True)
    plan = plan_summa(
        a.layout.tile_coords, b.layout.tile_coords,
        store_layout(c_index, TILE), rowb, colb, kb % 4, kb % 2, 2, 4,
    )
    h = hashlib.blake2b(digest_size=16)
    for arr in (plan.stacks, plan.a_pack, plan.b_pack, plan.c_unpack):
        h.update(np.ascontiguousarray(arr).tobytes())
    with open(os.path.join(tmpdir, f"planhash_{pid}.txt"), "w") as f:
        f.write(h.hexdigest())


def scenario_sharded_elementwise(dt, pid, tmpdir):
    """Sharded at-rest elementwise/reduction ops across processes."""
    from dbcsr_tpu.dist import ProcessGrid, tile_aligned_dist
    from dbcsr_tpu.dist.sharded_ops import (
        shard_matrix,
        sharded_add,
        sharded_filter,
        sharded_frobenius,
        sharded_hadamard,
        sharded_trace,
    )

    rng = np.random.default_rng(6)
    rbs, _, a, b = _mats(dt, rng, square=True)
    grid = ProcessGrid.make(2, 2, devices=_balanced_devices(4))
    dist = tile_aligned_dist(grid, rbs, rbs, TILE)
    sa = shard_matrix(a, dist)
    sb = shard_matrix(b, dist)
    ad = np.asarray(a.to_dense())
    bd = np.asarray(b.to_dense())

    sc = sharded_filter(sharded_add(1.0, sa, -0.5, sa), 1e-8)
    got = np.asarray(sc.to_local().to_dense())
    assert np.abs(got - 0.5 * ad).max() < 1e-4

    sh = sharded_hadamard(sa, sb)
    goth = np.asarray(sh.to_local().to_dense())
    assert np.abs(goth - ad * bd).max() < 1e-4

    fro = float(sharded_frobenius(sa))
    assert abs(fro - float(np.linalg.norm(ad))) < 1e-3 * max(1.0, fro)
    tr = float(sharded_trace(sa))
    assert abs(tr - float(np.trace(ad))) < 1e-2


def scenario_checkpoint(dt, pid, tmpdir):
    """Per-process sharded checkpoint write + read-back residual."""
    from jax.experimental import multihost_utils

    from dbcsr_tpu.dist import (
        ProcessGrid,
        sharded_checkpoint_read,
        sharded_checkpoint_write,
        tile_aligned_dist,
    )
    from dbcsr_tpu.dist.sharded_ops import (
        shard_matrix,
        sharded_add,
        sharded_frobenius,
    )

    rng = np.random.default_rng(7)
    rbs, _, a, _ = _mats(dt, rng, square=True)
    grid = ProcessGrid.make(2, 4)
    dist = tile_aligned_dist(grid, rbs, rbs, TILE)
    sm = shard_matrix(a, dist)
    ckdir = os.path.join(tmpdir, "ckpt")
    sharded_checkpoint_write(sm, ckdir)  # each process: its own shards
    multihost_utils.sync_global_devices("dbcsr-ckpt-written")
    back = sharded_checkpoint_read(ckdir, grid)
    diff = sharded_add(1.0, back, -1.0, sm)
    resid = float(sharded_frobenius(diff))
    assert resid < 1e-6, resid


def scenario_tensor(dt, pid, tmpdir):
    """Distributed tensor contraction: contract -> TAS -> SUMMA over a
    cross-process mesh (folded dims distributed)."""
    from dbcsr_tpu.dist import ProcessGrid, tile_aligned_dist
    from dbcsr_tpu.tensors import NDMapping, TensorBuilder, contract

    rng = np.random.default_rng(8)
    bs_i = np.asarray([3] * 16, np.int32)
    bs_j = np.asarray([3] * 4, np.int32)
    bs_k = np.asarray([3] * 12, np.int32)
    bs_l = np.asarray([3] * 10, np.int32)
    tb = TensorBuilder(
        [bs_i, bs_j, bs_k], NDMapping(3, (0, 1), (2,)), dtype=np.float64
    )
    for bi in np.ndindex(16, 4, 12):
        if rng.random() < 0.25:
            tb.put_block(bi, rng.standard_normal((3, 3, 3)))
    mb = TensorBuilder([bs_k, bs_l], dtype=np.float64)
    for bi in np.ndindex(12, 10):
        if rng.random() < 0.5:
            mb.put_block(bi, rng.standard_normal((3, 3)))
    t, m = tb.finalize(), mb.finalize()
    grid = ProcessGrid.make(2, 2, devices=_balanced_devices(4))
    dist = tile_aligned_dist(
        grid, t.matrix.index.row_block_sizes, bs_l, TILE
    )
    out = contract(
        1.0, t, m,
        contract_1=(2,), notcontract_1=(0, 1),
        contract_2=(0,), notcontract_2=(1,),
        dist=dist, nsplit=1,
    )
    # cross-process result data: reshard to a host-replicated copy first
    from dbcsr_tpu.tensors.tensor import Tensor

    host_m = dt.BCSRMatrix(
        name="o", index=out.matrix.index, data=_host_view(out.matrix.data)
    )
    got = Tensor(
        name="o", block_sizes=out.block_sizes, mapping=out.mapping,
        matrix=host_m,
    ).to_dense()
    ref = np.einsum("ijk,kl->ijl", t.to_dense(), m.to_dense())
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-10)


def scenario_complex(dt, pid, tmpdir):
    """Split-complex EMULATED sharded ops across processes (re/im stores,
    4-real-product multiply)."""
    from dbcsr_tpu.core import machine
    from dbcsr_tpu.dist import ProcessGrid, tile_aligned_dist
    from dbcsr_tpu.dist.sharded_ops import (
        shard_matrix,
        sharded_frobenius,
        sharded_multiply,
    )

    old = dict(machine._COMPLEX_OK)
    machine._COMPLEX_OK.clear()
    machine._COMPLEX_OK.update({"cpu": False})  # force the emulated path
    try:
        rng = np.random.default_rng(9)
        rbs = dt.random_block_sizes(36, [3], rng)
        a = dt.random_matrix(rbs, rbs, 0.5, rng, dtype=np.complex128)
        b = dt.random_matrix(rbs, rbs, 0.5, rng, dtype=np.complex128)
        grid = ProcessGrid.make(2, 2, devices=_balanced_devices(4))
        dist = tile_aligned_dist(grid, rbs, rbs, TILE)
        sa, sb = shard_matrix(a, dist), shard_matrix(b, dist)
        assert sa.is_complex_emulated
        sc = sharded_multiply("C", "N", 1.0 + 0.5j, sa, sb)
        ref = (1.0 + 0.5j) * (
            np.asarray(a.to_dense()).conj().T @ np.asarray(b.to_dense())
        )
        def unshard_host(x, sl, t):
            flat = _host_view(x).reshape(sl.ndev * sl.n_max, t, t)
            return flat[sl.pos_of_slot]

        got = np.asarray(
            dt.BCSRMatrix(
                name="c", index=sc.index,
                data=unshard_host(sc.data, sc.shard, TILE),
                data_im=unshard_host(sc.data_im, sc.shard, TILE),
                cdtype=sc.cdtype,
            ).to_dense()
        )
        err = np.abs(got - ref).max()
        assert err < 1e-10 * max(1.0, float(np.abs(ref).max())), err
        fro = float(sharded_frobenius(sa))
        assert abs(fro - float(np.linalg.norm(np.asarray(a.to_dense())))) < 1e-6 * max(1.0, fro)
    finally:
        machine._COMPLEX_OK.clear()
        machine._COMPLEX_OK.update(old)


SCENARIOS = {
    "cannon": scenario_cannon,
    "summa": scenario_summa,
    "cannon25d": scenario_cannon25d,
    "summa25d": scenario_summa25d,
    "tas": scenario_tas,
    "sharded": scenario_sharded,
    "sharded_elementwise": scenario_sharded_elementwise,
    "checkpoint": scenario_checkpoint,
    "tensor": scenario_tensor,
    "complex": scenario_complex,
}


def main() -> None:
    port, pid, tmpdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    names = sys.argv[4].split(",") if len(sys.argv) > 4 else ["sharded"]

    import dbcsr_tpu as dt

    dt.init_lib(
        distributed=True,
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=NPROCS,
        process_id=pid,
    )
    assert jax.process_count() == NPROCS, jax.process_count()
    assert len(jax.devices()) == GLOBAL_DEVICES, len(jax.devices())
    assert len(jax.local_devices()) == GLOBAL_DEVICES // NPROCS
    dt.set_config(tile_size=TILE)

    from jax.experimental import multihost_utils

    for name in names:
        # lockstep barrier: one worker must not race ahead into the next
        # scenario's collective setup while the other is still compiling
        multihost_utils.sync_global_devices(f"dbcsr-mp-{name}")
        SCENARIOS[name](dt, pid, tmpdir)
        print(f"scenario {name} ok", flush=True)

    print(f"worker {pid} ok", flush=True)


if __name__ == "__main__":
    main()
