"""End-to-end McWeeny purification (the canonical DBCSR application):
iterated filtered multiplies must converge to an idempotent projector with
integer trace (electron count)."""
import numpy as np

import dbcsr_tpu as dt


def test_mcweeny_purification(rng):
    sizes = dt.random_block_sizes(80, [3, 5], rng)
    n = len(sizes)
    builder = dt.BCSRBuilder(sizes, sizes, name="H", dtype=np.float64, sym="S")
    for i in range(n):
        for j in range(i, min(n, i + 3)):
            blk = 0.1 * rng.standard_normal((int(sizes[i]), int(sizes[j])))
            if i == j:
                blk = 0.5 * (blk + blk.T) + np.diag(
                    np.linspace(-1, 1, int(sizes[i]))
                )
            builder.put_block(i, j, blk)
    h = builder.finalize()

    dh = np.asarray(dt.desymmetrize(h).to_dense())
    evals = np.linalg.eigvalsh(dh)
    lo, hi = evals[0], evals[-1]
    # place the chemical potential in the widest spectral gap near midband
    # (McWeeny needs a gap at mu to converge to a projector)
    mid = len(evals) // 2
    gaps = np.diff(evals[mid - 20 : mid + 20])
    g = int(np.argmax(gaps))
    mu = 0.5 * (evals[mid - 20 + g] + evals[mid - 20 + g + 1])
    # P0 = (I - (H - mu)/s) / 2 with s = max(hi-mu, mu-lo): spectrum in
    # [0,1], occupied states above 1/2 (standard purification init)
    s = max(hi - mu, mu - lo)
    p = dt.add_on_diag(
        dt.scale(dt.desymmetrize(h), -0.5 / s), 0.5 + 0.5 * mu / s
    )
    ne_target = int((evals < mu).sum())

    eps = 1e-9
    for _ in range(40):
        p2 = dt.multiply("N", "N", 1.0, p, p, filter_eps=eps)
        p3 = dt.multiply("N", "N", 1.0, p2, p, filter_eps=eps)
        p_next = dt.add(3.0, p2, -2.0, p3)
        delta = dt.norm_frobenius(dt.add(1.0, p_next, -1.0, p))
        p = dt.filter_blocks(p_next, eps)
        if delta < 1e-11:
            break

    # idempotent projector with integer trace == electron count
    p2 = dt.multiply("N", "N", 1.0, p, p)
    assert dt.norm_frobenius(dt.add(1.0, p2, -1.0, p)) < 1e-8
    assert abs(dt.trace(p) - ne_target) < 1e-6
