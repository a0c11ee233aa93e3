"""Example 5: McWeeny density-matrix purification — the canonical
linear-scaling-SCF workload DBCSR exists for.

Iterates P <- 3P² − 2P³ with on-the-fly epsilon filtering until P is
idempotent; block sparsity is preserved by the filter throughout, and the
trace stays at the electron count. Exercises multiply, add, filtering,
trace and the statistics subsystem in a realistic loop.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import dbcsr_tpu as dt

    dt.init_lib()
    rng = np.random.default_rng(0)

    # banded symmetric "Hamiltonian-like" matrix, mixed chemistry block sizes
    sizes = dt.random_block_sizes(600, [5, 13], rng)
    n = len(sizes)
    builder = dt.BCSRBuilder(sizes, sizes, name="H", dtype=np.float64, sym="S")
    for i in range(n):
        for j in range(i, min(n, i + 3)):
            blk = 0.1 * rng.standard_normal((sizes[i], sizes[j]))
            if i == j:
                blk = 0.5 * (blk + blk.T) + np.diag(
                    np.linspace(-1, 1, sizes[i])
                )
            builder.put_block(i, j, blk)
    h = builder.finalize()

    # initial guess P0 = (I - (H - mu)/s)/2, s = max(hi-mu, mu-lo): maps the
    # spectrum into [0, 1] with occupied states above 1/2 (standard init)
    dh = np.asarray(dt.desymmetrize(h).to_dense())
    evals = np.linalg.eigvalsh(dh)
    lo, hi = evals[0], evals[-1]
    mu = 0.0
    s = max(hi - mu, mu - lo)
    p0 = dt.add_on_diag(
        dt.scale(dt.desymmetrize(h), -0.5 / s), 0.5 + 0.5 * mu / s
    )

    ne_target = int((evals < mu).sum())
    p = p0
    eps = 1e-8
    for it in range(30):
        p2, fl2 = dt.multiply("N", "N", 1.0, p, p, filter_eps=eps,
                              return_flops=True)
        p3 = dt.multiply("N", "N", 1.0, p2, p, filter_eps=eps)
        p_next = dt.add(3.0, p2, -2.0, p3)
        delta = dt.norm_frobenius(dt.add(1.0, p_next, -1.0, p))
        p = dt.filter_blocks(p_next, eps)
        print(
            f" iter {it:2d}: trace={dt.trace(p):9.4f} occ={p.occupation():.3f}"
            f" |dP|={delta:.2e}"
        )
        if delta < 1e-10:
            break

    # converged P must be idempotent: P² == P
    p2 = dt.multiply("N", "N", 1.0, p, p)
    idem = dt.norm_frobenius(dt.add(1.0, p2, -1.0, p))
    print(f"idempotency |P² − P| = {idem:.3e}; electrons (trace) = "
          f"{dt.trace(p):.4f} (target {ne_target})")
    print(dt.print_statistics())
    dt.finalize_lib()


if __name__ == "__main__":
    main()
