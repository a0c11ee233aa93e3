"""Worker for the two-process ``jax.distributed`` CPU test.

Each of the 2 processes owns 4 local CPU devices (8 global). Exercises,
across REAL process boundaries, what the virtual single-process mesh
cannot: per-process addressable shards of the sharded executor, the
per-process sharded checkpoint, and cross-process plan determinism.
Reference analog: every test runs at 1..N MPI ranks
(``/root/reference/tests/CMakeLists.txt:9-25``).

Usage: python mp_worker.py <coordinator_port> <process_id> <tmpdir>
"""
import hashlib
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    port, pid, tmpdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import dbcsr_tpu as dt
    from dbcsr_tpu.dist import (
        ProcessGrid,
        sharded_checkpoint_read,
        sharded_checkpoint_write,
        tile_aligned_dist,
    )
    from dbcsr_tpu.dist.sharded import shard_store_with_layout
    from dbcsr_tpu.dist.sharded_ops import (
        shard_matrix,
        sharded_add,
        sharded_frobenius,
    )
    from dbcsr_tpu.mm.engine import build_distributed_executor

    dt.init_lib(
        distributed=True,
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    TILE = 8
    dt.set_config(tile_size=TILE)
    rng = np.random.default_rng(0)  # identical inputs in both processes
    rbs = dt.random_block_sizes(48, [3, 5], rng)
    a = dt.random_matrix(rbs, rbs, 0.5, rng, dtype=np.float32)
    b = dt.random_matrix(rbs, rbs, 0.5, rng, dtype=np.float32)

    grid = ProcessGrid.make(2, 4)
    dist = tile_aligned_dist(grid, rbs, rbs, TILE)

    # --- sharded executor across processes -------------------------------
    fn, c_index, _ = build_distributed_executor(
        "N", "N", a, b, dist, algo="summa", sharded=True
    )
    a_sh = shard_store_with_layout(a, fn.shard_a, grid.mesh)
    b_sh = shard_store_with_layout(b, fn.shard_b, grid.mesh)
    out_sh = jax.jit(fn)(a_sh, b_sh)

    # expected values from a process-local multiply; check only THIS
    # process's addressable shards
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

    # --- cross-process plan determinism ----------------------------------
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

    # --- per-process sharded checkpoint ----------------------------------
    sm = shard_matrix(a, dist)
    ckdir = os.path.join(tmpdir, "ckpt")
    sharded_checkpoint_write(sm, ckdir)  # each process: its own shards
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("dbcsr-ckpt-written")
    back = sharded_checkpoint_read(ckdir, grid)
    diff = sharded_add(1.0, back, -1.0, sm)
    resid = float(sharded_frobenius(diff))
    assert resid < 1e-6, resid

    print(f"worker {pid} ok", flush=True)


if __name__ == "__main__":
    main()
