"""Property-based tensor invariants: fold/unfold bijection, layout refolds,
contraction vs einsum on random shapes/layouts."""
import numpy as np
from hypothesis import given, settings, strategies as st

from dbcsr_tpu.tensors import NDMapping, TensorBuilder, contract
from dbcsr_tpu.tensors.index import fold_indices, unfold_indices

DIMS = st.lists(st.integers(1, 4), min_size=2, max_size=4)


@settings(max_examples=30, deadline=None)
@given(dims=DIMS, seed=st.integers(0, 999))
def test_fold_unfold_bijection(dims, seed):
    rng = np.random.default_rng(seed)
    dims = np.asarray(dims)
    idx = np.stack([rng.integers(0, d, 32) for d in dims], axis=1)
    np.testing.assert_array_equal(
        unfold_indices(fold_indices(idx, dims), dims), idx
    )


def _rand_tensor(rng, bs, mapping, occ=0.8):
    builder = TensorBuilder(bs, mapping, dtype=np.float64)
    nbpd = [len(b) for b in bs]
    for flat in np.flatnonzero(rng.random(int(np.prod(nbpd))) < occ):
        bi = np.unravel_index(flat, nbpd)
        shp = tuple(int(bs[d][bi[d]]) for d in range(len(bs)))
        builder.put_block(bi, rng.standard_normal(shp))
    return builder.finalize()


def _rand_mapping(rng, ndim):
    dims = list(rng.permutation(ndim))
    h = int(rng.integers(1, ndim))
    return NDMapping(ndim, tuple(dims[:h]), tuple(dims[h:]))


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 999), ndim=st.integers(2, 4))
def test_with_layout_preserves_dense(seed, ndim):
    rng = np.random.default_rng(seed)
    bs = [
        np.asarray(rng.integers(1, 4, size=int(rng.integers(1, 4))), np.int32)
        for _ in range(ndim)
    ]
    t = _rand_tensor(rng, bs, _rand_mapping(rng, ndim))
    d0 = t.to_dense()
    for _ in range(3):
        t = t.with_layout(_rand_mapping(rng, ndim))
        np.testing.assert_allclose(t.to_dense(), d0, atol=1e-12)


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 999))
def test_contract_random_layouts_vs_einsum(seed):
    rng = np.random.default_rng(seed)
    bs_i = np.asarray(rng.integers(1, 4, size=2), np.int32)
    bs_j = np.asarray(rng.integers(1, 4, size=2), np.int32)
    bs_k = np.asarray(rng.integers(1, 4, size=2), np.int32)
    bs_l = np.asarray(rng.integers(1, 4, size=2), np.int32)
    a = _rand_tensor(rng, [bs_i, bs_j, bs_k], _rand_mapping(rng, 3))
    b = _rand_tensor(rng, [bs_k, bs_l], _rand_mapping(rng, 2))
    out = contract(
        1.0, a, b,
        contract_1=(2,), notcontract_1=(0, 1),
        contract_2=(0,), notcontract_2=(1,),
    )
    ref = np.einsum("ijk,kl->ijl", a.to_dense(), b.to_dense())
    np.testing.assert_allclose(out.to_dense(), ref, atol=1e-10)
