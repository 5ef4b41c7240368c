"""Distributed paths on an 8-device CPU mesh (SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmm_tpu.formats.synthetic import random_csr, webgraph_like
from spmm_tpu.parallel import (
    make_mesh,
    partition_rows,
    spgemm_dist,
    spmm_dist,
    spmm_dist_ring,
    spmv_dist,
)
from spmm_tpu.parallel.partition import unshard_rows


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


@pytest.fixture(scope="module")
def mats():
    A = webgraph_like(2000, 14000, seed=0)
    S = partition_rows(A, 8)
    B = np.random.default_rng(0).standard_normal((2000, 16)).astype(np.float32)
    return A, S, B


def test_partition_rows_roundtrip(mats):
    A, S, _ = mats
    # reassemble and compare
    rows = []
    for i in range(S.n_shards):
        ptr = np.asarray(S.indptr[i])
        nnz_i = ptr[-1]
        rows.append((np.asarray(S.data[i][:nnz_i]), np.asarray(S.indices[i][:nnz_i])))
    data = np.concatenate([d for d, _ in rows])
    idx = np.concatenate([i for _, i in rows])
    np.testing.assert_array_equal(data, np.asarray(A.data[: A.nnz]))
    np.testing.assert_array_equal(idx, np.asarray(A.indices[: A.nnz]))


def test_spmm_dist_allgather(mesh, mats):
    A, S, B = mats
    Y = unshard_rows(np.asarray(spmm_dist(S, jnp.asarray(B), mesh)), S)
    np.testing.assert_allclose(Y, A.to_scipy() @ B, rtol=1e-4, atol=1e-4)


def test_spmm_dist_ring_matches_allgather(mesh, mats):
    A, S, B = mats
    Bpad = np.zeros((S.rows_per_shard * 8, 16), np.float32)
    Bpad[:2000] = B
    Yr = unshard_rows(np.asarray(spmm_dist_ring(S, jnp.asarray(Bpad), mesh)), S)
    np.testing.assert_allclose(Yr, A.to_scipy() @ B, rtol=1e-4, atol=1e-4)


def test_spmv_dist(mesh, mats):
    A, S, B = mats
    x = B[:, 0].copy()
    y = unshard_rows(np.asarray(spmv_dist(S, jnp.asarray(x), mesh))[..., None], S)
    np.testing.assert_allclose(y[:, 0], A.to_scipy() @ x, rtol=1e-4, atol=1e-4)


def test_spgemm_dist(mesh, mats):
    import scipy.sparse as sp

    A, S, _ = mats
    outs = spgemm_dist(S, A, mesh)
    refC = (A.to_scipy() @ A.to_scipy()).tocsr()
    rows = np.concatenate(
        [np.asarray(o.row[: o.nnz]) + i * S.rows_per_shard for i, o in enumerate(outs)]
    )
    cols = np.concatenate([np.asarray(o.col[: o.nnz]) for o in outs])
    vals = np.concatenate([np.asarray(o.data[: o.nnz]) for o in outs])
    got = sp.coo_matrix((vals, (rows, cols)), shape=(2000, 2000)).tocsr()
    assert abs(got - refC).max() < 1e-4


def test_uneven_rows_and_empty_shards(mesh):
    # nrow not divisible by shards; trailing shards nearly empty
    A = random_csr(1003, 777, 0.01, seed=3)
    S = partition_rows(A, 8)
    B = np.random.default_rng(1).standard_normal((777, 8)).astype(np.float32)
    Y = unshard_rows(np.asarray(spmm_dist(S, jnp.asarray(np.concatenate([B, np.zeros((S.rows_per_shard*8 - 777, 8), np.float32)])), mesh)), S)
    np.testing.assert_allclose(Y, A.to_scipy() @ B, rtol=1e-4, atol=1e-4)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4096, 128)
    ge.dryrun_multichip(8)


def test_spgemm_dist_spmd_matches_scipy():
    """SPMD row-partitioned SpGEMM (BASELINE config 5 machinery) on the
    8-device CPU mesh vs the scipy oracle."""
    import numpy as np

    from spmm_tpu.formats.synthetic import webgraph_like
    from spmm_tpu.parallel import make_mesh, partition_rows
    from spmm_tpu.parallel.spgemm_spmd import spgemm_dist_spmd

    import dataclasses

    # random values: exercises the value-bits path (pattern auto-detect off)
    A = webgraph_like(3000, 21000, seed=11)
    rng = np.random.default_rng(11)
    A = dataclasses.replace(
        A, data=rng.standard_normal(np.asarray(A.data).shape).astype(np.float32)
    )
    mesh = make_mesh()
    S = partition_rows(A, mesh.shape["rows"])
    C = spgemm_dist_spmd(S, A, mesh)
    Sp = A.to_scipy()
    ref = (Sp @ Sp).tocsr()
    ref.sum_duplicates()
    ref.sort_indices()
    assert C.nnz == ref.nnz
    np.testing.assert_array_equal(np.asarray(C.indptr), ref.indptr.astype(np.int64))
    np.testing.assert_array_equal(np.asarray(C.indices[: C.nnz]), ref.indices)
    np.testing.assert_allclose(np.asarray(C.data[: C.nnz]), ref.data, rtol=1e-5, atol=2e-5)


def test_spgemm_dist_spmd_with_tail_rows():
    """A heavy row (expansion above the class ceiling) routes through the
    per-shard host fallback and merges into the global CSR."""
    import numpy as np
    import scipy.sparse as sp

    from spmm_tpu.formats.containers import CSR
    from spmm_tpu.parallel import make_mesh, partition_rows
    from spmm_tpu.parallel.spgemm_spmd import spgemm_dist_spmd

    rng = np.random.default_rng(3)
    n = 600
    A = sp.random(n, n, density=0.01, random_state=3, format="lil", dtype=np.float32)
    A[5, :] = rng.standard_normal(n)
    A = A.tocsr()
    Ac = CSR.from_scipy(A)
    mesh = make_mesh()
    S = partition_rows(Ac, mesh.shape["rows"])
    C = spgemm_dist_spmd(S, Ac, mesh, classes=(4, 8, 16))
    ref = (A @ A).tocsr()
    ref.sum_duplicates()
    ref.sort_indices()
    assert C.nnz == ref.nnz
    np.testing.assert_array_equal(np.asarray(C.indices[: C.nnz]), ref.indices)
    np.testing.assert_allclose(np.asarray(C.data[: C.nnz]), ref.data, rtol=1e-4, atol=1e-4)


def test_spgemm_dist_halo_matches_scipy():
    """Halo-restricted SPMD SpGEMM (each shard holds only its referenced B
    rows) vs scipy, pattern and value modes."""
    import dataclasses

    import numpy as np

    from spmm_tpu.formats.synthetic import webgraph_like
    from spmm_tpu.parallel import make_mesh, partition_rows
    from spmm_tpu.parallel.spgemm_spmd import partition_halo, spgemm_dist_halo

    A = webgraph_like(2400, 16000, seed=13)
    mesh = make_mesh()
    S = partition_rows(A, mesh.shape["rows"])

    # halo restriction is real: every shard's local B is smaller than B
    _, lb_iptr, _, _, _, halo_counts = partition_halo(S, A)
    assert halo_counts.max() < A.nrow

    for values in ("pattern", "random"):
        Ax = A
        if values == "random":
            rng = np.random.default_rng(13)
            Ax = dataclasses.replace(
                A, data=rng.standard_normal(np.asarray(A.data).shape).astype(np.float32)
            )
            S2 = partition_rows(Ax, mesh.shape["rows"])
        else:
            S2 = S
        C = spgemm_dist_halo(S2, Ax, mesh)
        Sp = Ax.to_scipy()
        ref = (Sp @ Sp).tocsr()
        ref.sum_duplicates()
        ref.sort_indices()
        assert C.nnz == ref.nnz
        np.testing.assert_array_equal(np.asarray(C.indices[: C.nnz]), ref.indices)
        np.testing.assert_allclose(np.asarray(C.data[: C.nnz]), ref.data, rtol=1e-5, atol=2e-5)
