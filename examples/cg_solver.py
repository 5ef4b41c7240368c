"""Conjugate gradients on a graph Laplacian — iterative solves over SpMV.

The second standard chained-SpMV workload (after examples/pagerank.py): solve
``(L + eps I) x = b`` for the Laplacian of a web graph.  The entire CG loop
runs as one compiled ``lax.scan`` over the ELL SpMV kernel — no host round
trips inside the iteration.

Run: python examples/cg_solver.py [--n 50000] [--nnz 300000] [--iters 200]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def laplacian_system(A, eps: float = 1e-2):
    """Symmetrize A, build L = D - (A_s) + eps*I as CSR (SPD)."""
    from spmm_tpu.formats.containers import CSR
    from spmm_tpu.ops.transform import add, row_sums, transpose

    import scipy.sparse as sp

    S = add(A, transpose(A), alpha=0.5, beta=0.5)  # symmetric part
    d = row_sums(S)
    n = S.shape[0]
    D = CSR.from_scipy(sp.diags(np.asarray(d) + eps).tocsr())
    return add(D, S, alpha=1.0, beta=-1.0)


def cg(L, b, *, iters: int = 200, tol: float = 1e-8):
    """Plain CG; returns (x, residual_history).  One compiled scan."""
    import jax
    import jax.numpy as jnp

    from spmm_tpu.formats.ell import ell_pack
    from spmm_tpu.ops.ell_spmm import ell_spmv

    E = ell_pack(L).device()
    b = jnp.asarray(b, jnp.float32)

    @jax.jit
    def run(b, E):
        x0 = jnp.zeros_like(b)
        r0 = b
        p0 = r0
        rs0 = jnp.dot(r0, r0)

        def step(carry, _):
            x, r, p, rs = carry
            Ap = ell_spmv(E, p)
            denom = jnp.dot(p, Ap)
            alpha = jnp.where(denom > 0, rs / denom, 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = jnp.dot(r, r)
            beta = jnp.where(rs > 0, rs_new / rs, 0.0)
            p = r + beta * p
            return (x, r, p, rs_new), jnp.sqrt(rs_new)

        (x, r, p, rs), hist = jax.lax.scan(step, (x0, r0, p0, rs0), None, length=iters)
        return x, hist

    x, hist = run(b, E)
    hist = np.asarray(hist)
    conv = np.nonzero(hist < tol * hist[0])[0]
    used = int(conv[0]) + 1 if len(conv) else iters
    return np.asarray(x), hist[:used]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--nnz", type=int, default=300_000)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    from spmm_tpu.formats.synthetic import webgraph_like

    A = webgraph_like(args.n, args.nnz, seed=0)
    L = laplacian_system(A)
    b = np.random.default_rng(0).standard_normal(args.n).astype(np.float32)

    t0 = time.perf_counter()
    x, hist = cg(L, b, iters=args.iters)
    dt = time.perf_counter() - t0
    # residual check on host
    res = np.linalg.norm(L.to_scipy() @ x - b) / np.linalg.norm(b)
    print(f"cg: n={args.n} nnz(L)={L.nnz} iters={len(hist)} {dt:.2f}s "
          f"relative residual {res:.2e}")


if __name__ == "__main__":
    main()
