"""Pallas BSR SpMM — MXU dense-block products with scalar-prefetch indexing.

The Pallas kernel the reference format points at (SURVEY.md §3.3): dense
(bm, bn) tiles multiplied against (bn, TK) RHS tiles on the MXU.  Block
coordinates are scalar-prefetched so the BlockSpec index maps are
data-dependent: step b DMAs A block b, the B tile selected by ``block_cols[b]``
and accumulates into the Y tile selected by ``block_rows[b]`` — the output
tile stays resident in VMEM across consecutive blocks of the same block row
(blocks are CSR-ordered), so each Y tile is written to HBM exactly once.

HBM traffic: nblocks·(bm·bn + bn·TK)·4 + Y once — speed-of-light for BSR.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmm_tpu.formats.bsr import BSR


def _kernel(brows_ref, bcols_ref, a_ref, b_ref, o_ref):
    blk = pl.program_id(1)

    @pl.when((blk == 0) | (brows_ref[blk] != brows_ref[jnp.maximum(blk - 1, 0)]))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jnp.dot(
        a_ref[0], b_ref[:], preferred_element_type=jnp.float32
    )


def bsr_spmm_pallas(A: BSR, B: jax.Array, *, k_tile: int = 128, interpret: bool = False) -> jax.Array:
    """Y[m, k] = A_bsr @ B[n, k].  B's row count must cover the padded block
    columns; k must be a multiple of k_tile."""
    bm, bn = A.block_shape
    m, n = A.shape
    k = B.shape[-1]
    if k % k_tile:
        raise ValueError(f"k={k} must be a multiple of k_tile={k_tile}")
    n_pad = (n + bn - 1) // bn * bn
    if B.shape[0] != n_pad:
        pad = n_pad - B.shape[0]
        B = jnp.concatenate([B, jnp.zeros((pad, k), B.dtype)], axis=0)
    nbrows = A.nbrows
    nblocks = A.nblocks
    kt = k // k_tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # block_rows, block_cols
        grid=(kt, nblocks),
        in_specs=[
            pl.BlockSpec(
                (1, bm, bn), lambda j, b, brows, bcols: (b, 0, 0)
            ),
            pl.BlockSpec(
                (bn, k_tile), lambda j, b, brows, bcols: (bcols[b], j)
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, k_tile), lambda j, b, brows, bcols: (brows[b], j),
        ),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbrows * bm, k), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nblocks * bm * bn * k,
            bytes_accessed=nblocks * (bm * bn + bn * k) * 4 + nbrows * bm * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(A.block_rows), jnp.asarray(A.block_cols), jnp.asarray(A.data), B)
    return out[:m]


def bsr_spmv(A: BSR, x: jax.Array, *, accum_dtype=None) -> jax.Array:
    """y[m] = A_bsr @ x[n] (BASELINE config 4: block-compressed SpMV).

    One aligned (nblocks, bn) row gather of x tiles + per-block dense
    matvecs on the VPU + a block-row segment sum — the BSR recast of the
    dense-block partial-product contract (SURVEY.md §3.3).  fp64 inputs
    accumulate in fp64 (CPU/x64 parity tests); fp32 in fp32."""
    bm, bn = A.block_shape
    m, n = A.shape
    n_pad = (n + bn - 1) // bn * bn
    if x.shape[0] != n_pad:
        x = jnp.concatenate([x, jnp.zeros((n_pad - x.shape[0],), x.dtype)])
    acc = accum_dtype or jnp.result_type(jnp.asarray(A.data).dtype, jnp.float32)
    xt = x.reshape(n_pad // bn, bn)
    gx = jnp.take(xt, jnp.asarray(A.block_cols), axis=0)  # (nblocks, bn)
    prods = jnp.einsum(
        "bij,bj->bi",
        jnp.asarray(A.data).astype(acc),
        gx.astype(acc),
        precision=jax.lax.Precision.HIGHEST,
    )
    y = jax.ops.segment_sum(
        prods, jnp.asarray(A.block_rows), num_segments=A.nbrows, indices_are_sorted=True
    )
    return y.reshape(A.nbrows * bm)[:m]


def bsr_spmm_xla(A: BSR, B: jax.Array) -> jax.Array:
    """XLA reference implementation (oracle for the Pallas kernel)."""
    bm, bn = A.block_shape
    m, n = A.shape
    k = B.shape[-1]
    n_pad = (n + bn - 1) // bn * bn
    if B.shape[0] != n_pad:
        B = jnp.concatenate([B, jnp.zeros((n_pad - B.shape[0], k), B.dtype)], axis=0)
    Bt = B.reshape(n_pad // bn, bn, k)
    btiles = jnp.take(Bt, jnp.asarray(A.block_cols), axis=0)  # (nblocks, bn, k)
    acc = jnp.result_type(jnp.asarray(A.data).dtype, jnp.float32)
    prods = jnp.einsum(
        "bij,bjk->bik", jnp.asarray(A.data), btiles, preferred_element_type=acc,
        precision=jax.lax.Precision.HIGHEST,
    )
    y = jax.ops.segment_sum(
        prods, jnp.asarray(A.block_rows), num_segments=A.nbrows, indices_are_sorted=True
    )
    return y.reshape(A.nbrows * bm, k)[:m]
