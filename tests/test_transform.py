"""Sparse transforms (ops/transform.py) vs scipy."""

import numpy as np
import scipy.sparse as sp

from spmm_tpu.formats.containers import CSR
from spmm_tpu.ops.transform import (
    add,
    col_sums,
    diagonal,
    row_sums,
    scale_cols,
    scale_rows,
    transpose,
)


def _rand(m, n, d, seed):
    A = sp.random(m, n, density=d, random_state=seed, format="csr", dtype=np.float32)
    A.data[:] = np.random.default_rng(seed).standard_normal(len(A.data)).astype(np.float32)
    return A


def test_transpose():
    A = _rand(80, 50, 0.08, 0)
    T = transpose(CSR.from_scipy(A)).to_scipy()
    ref = A.T.tocsr()
    ref.sort_indices()
    assert (T != ref).nnz == 0


def test_transpose_roundtrip():
    A = _rand(33, 77, 0.1, 1)
    Ac = CSR.from_scipy(A)
    back = transpose(transpose(Ac)).to_scipy()
    assert (back != A).nnz == 0


def test_add():
    A = _rand(60, 60, 0.05, 2)
    B = _rand(60, 60, 0.05, 3)
    C = add(CSR.from_scipy(A), CSR.from_scipy(B), alpha=2.0, beta=-0.5).to_scipy()
    ref = (2.0 * A - 0.5 * B).tocsr()
    ref.sort_indices()
    np.testing.assert_allclose(C.toarray(), ref.toarray(), rtol=1e-6, atol=1e-7)


def test_diagonal_and_sums():
    A = _rand(40, 40, 0.15, 4)
    Ac = CSR.from_scipy(A)
    np.testing.assert_allclose(diagonal(Ac), A.diagonal(), rtol=1e-6)
    np.testing.assert_allclose(row_sums(Ac), np.asarray(A.sum(axis=1)).ravel(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(col_sums(Ac), np.asarray(A.sum(axis=0)).ravel(), rtol=1e-5, atol=1e-6)


def test_scaling():
    A = _rand(30, 45, 0.2, 5)
    Ac = CSR.from_scipy(A)
    s = np.random.default_rng(6).uniform(0.5, 2.0, 30).astype(np.float32)
    t = np.random.default_rng(7).uniform(0.5, 2.0, 45).astype(np.float32)
    np.testing.assert_allclose(
        scale_rows(Ac, s).to_scipy().toarray(), (sp.diags(s) @ A).toarray(), rtol=1e-6
    )
    np.testing.assert_allclose(
        scale_cols(Ac, t).to_scipy().toarray(), (A @ sp.diags(t)).toarray(), rtol=1e-6
    )


def test_random_walk_normalization_chain():
    """D^-1 A chained SpMV — the reference's self-referential A x (A x ...)
    workload (wbsort seq_input, SURVEY.md §2.8) expressed with transforms."""
    import jax.numpy as jnp

    from spmm_tpu.formats.synthetic import webgraph_like
    from spmm_tpu.ops import spmv_xla

    A = webgraph_like(400, 2400, seed=8)
    d = row_sums(A)
    P = scale_rows(A, np.where(d > 0, 1.0 / np.maximum(d, 1e-30), 0.0))
    x = np.random.default_rng(9).uniform(size=400).astype(np.float32)
    x /= x.sum()
    y = x.copy()
    for _ in range(3):
        y = np.asarray(spmv_xla(P.pad(8).device(), jnp.asarray(y)))
    ref = x.copy()
    Ps = P.to_scipy()
    for _ in range(3):
        ref = Ps @ ref
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-6)


def test_pagerank_example_matches_dense():
    """examples/pagerank.py vs a dense-numpy PageRank oracle."""
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from pagerank import pagerank

    from spmm_tpu.formats.synthetic import webgraph_like

    A = webgraph_like(300, 1800, seed=12)
    ranks, _ = pagerank(A, iters=80, tol=1e-10)

    # dense oracle
    M = A.to_scipy().toarray().astype(np.float64)
    d = M.sum(1)
    dang = d == 0
    P = np.where(dang[:, None], 0.0, M / np.maximum(d, 1e-30)[:, None])
    x = np.full(300, 1 / 300)
    for _ in range(80):
        x = 0.85 * (P.T @ x + x[dang].sum() / 300) + 0.15 / 300
    np.testing.assert_allclose(ranks, x, rtol=5e-3, atol=1e-6)


def test_bfs_example_matches_scipy():
    """examples/bfs.py vs scipy.sparse.csgraph BFS distances."""
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from bfs import bfs

    from spmm_tpu.formats.synthetic import webgraph_like

    A = webgraph_like(400, 2400, seed=13)
    dist, levels = bfs(A, 0)
    dist = np.asarray(dist)

    from scipy.sparse.csgraph import shortest_path

    ref = shortest_path(A.to_scipy(), method="D", unweighted=True, indices=0)
    ref_i = np.where(np.isinf(ref), -1, ref).astype(np.int32)
    np.testing.assert_array_equal(dist, ref_i)
    assert levels == int(ref_i.max())


def test_add_empty_operands():
    """Regression: add() crashed when both operands were empty."""
    import scipy.sparse as sp

    Z = CSR.from_scipy(sp.csr_matrix((7, 9), dtype=np.float32))
    C = add(Z, Z)
    assert C.nnz == 0 and C.shape == (7, 9)
    A = _rand(7, 9, 0.2, 11)
    C2 = add(CSR.from_scipy(A), Z)
    np.testing.assert_allclose(C2.to_scipy().toarray(), A.toarray())


def test_cg_solver_example():
    """examples/cg_solver.py converges on a Laplacian system."""
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from cg_solver import cg, laplacian_system

    from spmm_tpu.formats.synthetic import webgraph_like

    A = webgraph_like(400, 2400, seed=13)
    L = laplacian_system(A, eps=0.1)
    b = np.random.default_rng(1).standard_normal(400).astype(np.float32)
    x, hist = cg(L, b, iters=300)
    res = np.linalg.norm(L.to_scipy() @ x - b) / np.linalg.norm(b)
    assert res < 1e-3, res


def test_triangle_count_example():
    """examples/triangle_count.py vs the scipy masked-product oracle."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import numpy as np
    from triangle_count import count_triangles, symmetrize

    from spmm_tpu.formats.synthetic import webgraph_like

    A = symmetrize(webgraph_like(1200, 9000, seed=4))
    t = count_triangles(A)
    S = A.to_scipy()
    ref = (S @ S).multiply(S).sum() / 6.0
    assert abs(t - ref) < 0.5, (t, ref)
    assert t > 0  # fixture must actually contain triangles
