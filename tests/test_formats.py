import numpy as np
import pytest
import scipy.sparse as sp

from spmm_tpu.formats import COO, CSR, read_mtx, to_coo, to_csr
from spmm_tpu.formats.containers import permute_rows
from spmm_tpu.formats.mtx import read_mtx_bytes, write_mtx
from spmm_tpu.formats.synthetic import banded_random, random_csr, webgraph_like


def _rand_coo(rng, m=40, n=30, nnz=200):
    return COO(
        row=rng.integers(0, m, nnz).astype(np.int32),
        col=rng.integers(0, n, nnz).astype(np.int32),
        data=rng.standard_normal(nnz).astype(np.float32),
        shape=(m, n),
        nnz=nnz,
    )


def test_coo_to_csr_matches_scipy(rng):
    coo = _rand_coo(rng)
    ours = to_csr(coo, sort_within_row=True, sum_duplicates=True)
    ref = sp.coo_matrix((coo.data, (coo.row, coo.col)), shape=coo.shape).tocsr()
    ref.sum_duplicates()
    got = ours.to_scipy()
    assert (got != ref).nnz == 0 or np.allclose((got - ref).data, 0, atol=1e-6)
    np.testing.assert_array_equal(got.indptr, ref.indptr)
    np.testing.assert_array_equal(got.indices, ref.indices)
    np.testing.assert_allclose(got.data, ref.data, rtol=1e-6)


def test_csr_roundtrip_coo(rng):
    A = random_csr(25, 33, 0.1, seed=3)
    back = to_csr(to_coo(A), sort_within_row=True)
    np.testing.assert_array_equal(back.indptr, A.indptr)
    np.testing.assert_array_equal(back.indices[: A.nnz], A.indices[: A.nnz])
    np.testing.assert_allclose(back.data[: back.nnz], A.data[: A.nnz])


def test_padding_invariants():
    A = random_csr(10, 10, 0.2, seed=0)
    P = A.pad(128)
    assert P.nnz_pad % 128 == 0
    assert P.nnz == A.nnz
    np.testing.assert_array_equal(np.asarray(P.data[P.nnz :]), 0)
    np.testing.assert_array_equal(np.asarray(P.indices[P.nnz :]), 0)


def test_row_ids(rng):
    A = random_csr(17, 23, 0.15, seed=5).pad(16)
    rid = np.asarray(A.row_ids())
    ref = np.repeat(np.arange(17), np.diff(A.indptr))
    np.testing.assert_array_equal(rid[: A.nnz], ref)
    assert rid.min() >= 0 and rid.max() < 17


def test_permute_rows(rng):
    A = random_csr(30, 20, 0.2, seed=7)
    perm = rng.permutation(30)
    P = permute_rows(A, perm)
    ref = A.to_scipy()[perm]
    got = P.to_scipy()
    assert abs(got - ref).max() == 0


MTX_GENERAL = b"""%%MatrixMarket matrix coordinate real general
% comment line
4 5 6
1 1 2.5
1 3 -1.0
2 2 3.0e2
4 5 1e-3
3 1 7
4 1 0.125
"""

MTX_PATTERN = b"""%%MatrixMarket matrix coordinate pattern general
3 3 4
1 1
2 3
3 1
3 3
"""

MTX_SYMMETRIC = b"""%%MatrixMarket matrix coordinate real symmetric
3 3 3
1 1 1.0
2 1 5.0
3 2 -2.0
"""


def test_read_mtx_pattern_mode_forces_ones():
    # reference parity: values forced to 1.0 (serial_newblock_clock.cpp:84,96)
    m = read_mtx_bytes(MTX_GENERAL, values="pattern")
    assert m.shape == (4, 5) and m.nnz == 6
    np.testing.assert_array_equal(np.asarray(m.data), 1.0)
    np.testing.assert_array_equal(np.asarray(m.row), [0, 0, 1, 3, 2, 3])
    np.testing.assert_array_equal(np.asarray(m.col), [0, 2, 1, 4, 0, 0])


def test_read_mtx_native_values():
    m = read_mtx_bytes(MTX_GENERAL, values="native")
    np.testing.assert_allclose(
        np.asarray(m.data), [2.5, -1.0, 300.0, 1e-3, 7.0, 0.125], rtol=1e-7
    )


def test_read_mtx_pattern_file():
    m = read_mtx_bytes(MTX_PATTERN, values="native")
    assert m.nnz == 4
    np.testing.assert_array_equal(np.asarray(m.data), 1.0)


def test_read_mtx_symmetric_not_expanded_by_default():
    # reference parity: stored triangle only (SURVEY.md §2.1)
    m = read_mtx_bytes(MTX_SYMMETRIC)
    assert m.nnz == 3
    m2 = read_mtx_bytes(MTX_SYMMETRIC, expand_symmetric=True, values="native")
    assert m2.nnz == 5  # 3 stored + 2 mirrored off-diagonals
    S = to_csr(m2).to_scipy().toarray()
    np.testing.assert_allclose(S, S.T)


def test_write_read_roundtrip(tmp_path, rng):
    A = random_csr(12, 9, 0.3, seed=11)
    path = tmp_path / "t.mtx"
    write_mtx(path, to_coo(A))
    B = to_csr(read_mtx(path, values="native"), sort_within_row=True)
    assert abs(B.to_scipy() - A.to_scipy()).max() < 1e-6


def test_synthetic_generators():
    A = webgraph_like(5000, 30000, seed=1)
    assert A.shape == (5000, 5000)
    assert 15000 < A.nnz < 60000
    B = banded_random(1000, 64, 0.1, seed=2)
    assert (np.abs(np.asarray(B.indices[: B.nnz]) - np.asarray(B.row_ids()[: B.nnz])) <= 32).all()


def test_pytree_registration():
    import jax

    A = random_csr(8, 8, 0.3, seed=0)
    leaves = jax.tree.leaves(A)
    assert len(leaves) == 3  # data, indices, indptr — shape/nnz are static
    D = A.device()
    assert D.shape == A.shape and D.nnz == A.nnz
