"""PageRank on a web graph — the chained A^T x workload the reference's
preprocessing exists for.

The reference evaluates on SuiteSparse web graphs (web-Google, web-Stanford;
reference README.md:12-18) and its seq_input gather map makes the packed
format self-referential for chained products on square matrices
(wbsort.h:81-95, SURVEY.md §2.8).  PageRank is that workload: repeated
SpMV with the column-normalized adjacency matrix.

Run:  python examples/pagerank.py [--n 100000] [--nnz 600000] [--iters 50]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def pagerank(A, *, damping: float = 0.85, iters: int = 50, tol: float = 1e-8):
    """Power iteration on the Google matrix built from adjacency CSR ``A``
    (rows = source, cols = destination).  Runs the SpMV chain on device via
    the ELL slab kernel; returns (ranks, iterations used)."""
    import jax.numpy as jnp

    from spmm_tpu.formats.ell import ell_pack
    from spmm_tpu.ops.ell_spmm import ell_spmv
    from spmm_tpu.ops.transform import row_sums, scale_rows, transpose

    n = A.shape[0]
    # random-walk matrix P = D^-1 A, dangling rows handled via mass re-injection
    d = row_sums(A)
    dangling = np.asarray(d == 0)
    P = scale_rows(A, np.where(dangling, 0.0, 1.0 / np.maximum(d, 1e-30)))
    # PageRank iterates x <- c P^T x + teleport, so pack P^T once
    Pt = ell_pack(transpose(P)).device()

    import jax

    x0 = jnp.full((n,), 1.0 / n, jnp.float32)
    dang = jnp.asarray(dangling)

    # the whole power iteration is ONE compiled program (a host-side loop
    # would pay a dispatch + fence round-trip per step)
    @jax.jit
    def run(x0, Pt):
        def step(x, _):
            spread = ell_spmv(Pt, x)
            lost = jnp.sum(jnp.where(dang, x, 0.0))  # dangling mass
            x_new = damping * (spread + lost / n) + (1.0 - damping) / n
            return x_new, jnp.sum(jnp.abs(x_new - x))
        return jax.lax.scan(step, x0, None, length=iters)

    x, deltas = run(x0, Pt)
    deltas = np.asarray(deltas)
    converged = np.nonzero(deltas < tol)[0]
    it = int(converged[0]) + 1 if len(converged) else iters
    return np.asarray(x), it


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--nnz", type=int, default=600_000)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--mtx", type=str, default=None, help="optional .mtx input")
    args = ap.parse_args()

    if args.mtx:
        from spmm_tpu import read_mtx, to_csr

        A = to_csr(read_mtx(args.mtx), sort_within_row=True, sum_duplicates=True)
    else:
        from spmm_tpu.formats.synthetic import webgraph_like

        A = webgraph_like(args.n, args.nnz, seed=0)

    t0 = time.perf_counter()
    ranks, used = pagerank(A, iters=args.iters)
    dt = time.perf_counter() - t0
    top = np.argsort(-ranks)[:5]
    print(f"pagerank: n={A.shape[0]} nnz={A.nnz} iters={used} {dt:.2f}s "
          f"({A.nnz * used / dt / 1e6:.1f} M edge-updates/s)")
    print("top pages:", list(zip(top.tolist(), np.round(ranks[top], 6).tolist())))
    assert abs(ranks.sum() - 1.0) < 1e-3


if __name__ == "__main__":
    main()
