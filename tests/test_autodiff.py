"""Differentiability of the compute kernels (framework completeness: sparse
ops sit inside training loops; JAX autodiff must flow through them).

The XLA formulations are pure gather/segment-sum compositions, so
reverse-mode differentiation works out of the box — these tests pin that
contract (gradients w.r.t. both the dense RHS and the sparse values).
"""

import numpy as np

import jax
import jax.numpy as jnp

from spmm_tpu.formats.synthetic import webgraph_like


def test_spmm_grad_wrt_dense():
    A = webgraph_like(200, 1200, seed=0)
    Ad = A.pad(8).device()
    from spmm_tpu.ops import spmm_xla

    B0 = np.random.default_rng(0).standard_normal((200, 4)).astype(np.float32)

    def loss(B):
        return jnp.sum(spmm_xla(Ad, B) ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(B0)))
    # reference: d/dB ||A B||^2 = 2 A^T A B
    S = A.to_scipy()
    ref = 2.0 * (S.T @ (S @ B0))
    np.testing.assert_allclose(g, ref, rtol=1e-4, atol=1e-4)


def test_spmm_grad_wrt_values():
    """Gradients w.r.t. the sparse VALUES (e.g. learnable edge weights)."""
    A = webgraph_like(150, 900, seed=1)
    Ad = A.pad(8).device()
    from spmm_tpu.ops import spmm_xla

    B = jnp.asarray(np.random.default_rng(1).standard_normal((150, 4)).astype(np.float32))

    def loss(vals):
        import dataclasses

        A2 = dataclasses.replace(Ad, data=vals)
        return jnp.sum(spmm_xla(A2, B) ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(Ad.data)))[: A.nnz]
    # d/dv_e ||Y||^2 = 2 Y[row_e] . B[col_e]
    S = A.to_scipy()
    Y = S @ np.asarray(B)
    rows = np.repeat(np.arange(150), np.diff(np.asarray(A.indptr)))
    cols = np.asarray(A.indices[: A.nnz])
    ref = 2.0 * np.einsum("ek,ek->e", Y[rows], np.asarray(B)[cols])
    np.testing.assert_allclose(g, ref, rtol=1e-4, atol=1e-4)


def test_ell_spmm_grad():
    from spmm_tpu.formats.ell import ell_pack
    from spmm_tpu.ops.ell_spmm import ell_spmm

    A = webgraph_like(200, 1300, seed=2)
    E = ell_pack(A).device()
    B0 = np.random.default_rng(2).standard_normal((200, 8)).astype(np.float32)

    def loss(B):
        return jnp.sum(ell_spmm(E, B) ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(B0)))
    S = A.to_scipy()
    ref = 2.0 * (S.T @ (S @ B0))
    np.testing.assert_allclose(g, ref, rtol=1e-4, atol=1e-4)


def test_grad_through_blocked_slab_consumer():
    """Gradients w.r.t. the dense operand flow through the v8-slab consumer
    (einsum buckets + segment-sum leftover + un-permute gather)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from spmm_tpu.config import Config
    from spmm_tpu.formats.synthetic import webgraph_like
    from spmm_tpu.ops.blocked import blocked_slab_view, blocked_spmm_slab
    from spmm_tpu.preprocess import preprocess

    A = webgraph_like(1500, 9000, seed=23)
    P = preprocess(A, Config(region_budget=512, panel_rows=256)).device()
    view = blocked_slab_view(P)
    B = jnp.asarray(np.random.default_rng(6).standard_normal((1500, 8)).astype(np.float32))

    def loss(B):
        return jnp.sum(blocked_spmm_slab(P, B, view) ** 2)

    g = jax.grad(loss)(B)
    # analytic: d/dB sum((A B)^2) = 2 A^T (A B)
    S = A.to_scipy()
    ref = 2.0 * (S.T @ (S @ np.asarray(B)))
    np.testing.assert_allclose(np.asarray(g), ref, rtol=2e-3, atol=2e-3)


def test_vmap_batched_spmm():
    """vmap composes over the kernels: one sparse A against a BATCH of dense
    RHS stacks (multi-query workloads) without reshaping tricks — the
    functional-transform contract (jit/grad/vmap all flow through)."""
    A = webgraph_like(200, 1200, seed=3)
    Ad = A.pad(8).device()
    from spmm_tpu.formats.ell import ell_pack
    from spmm_tpu.ops import spmm_xla
    from spmm_tpu.ops.ell_spmm import ell_spmm

    rng = np.random.default_rng(4)
    Bb = rng.standard_normal((3, 200, 8)).astype(np.float32)  # (batch, n, k)
    S = A.to_scipy()
    ref = np.stack([S @ Bb[i] for i in range(3)])

    Yx = np.asarray(jax.vmap(lambda B: spmm_xla(Ad, B))(jnp.asarray(Bb)))
    np.testing.assert_allclose(Yx, ref, rtol=1e-4, atol=1e-4)

    E = ell_pack(A).device()
    Ye = np.asarray(jax.vmap(lambda B: ell_spmm(E, B))(jnp.asarray(Bb)))
    np.testing.assert_allclose(Ye, ref, rtol=1e-4, atol=1e-4)

    # and vmap-of-grad (per-batch gradients in one call)
    g = jax.vmap(jax.grad(lambda B: jnp.sum(spmm_xla(Ad, B) ** 2)))(jnp.asarray(Bb))
    gref = np.stack([2.0 * (S.T @ (S @ Bb[i])) for i in range(3)])
    np.testing.assert_allclose(np.asarray(g), gref, rtol=1e-4, atol=1e-4)
