"""Pallas v8-slab SpMM attempt — per-row B fetch by scalar-prefetched index.

VERDICT r1 item #10: the BSR kernel (ops/pallas_bsr.py) proves scalar-
prefetch block maps work for *structured* blocks; this kernel tries the same
machinery for uniform-L ELL/v8 slabs, where every row of an (8, L) group
needs L arbitrary B rows.  Mosaic cannot express unstructured VMEM gathers
(``tpu.dynamic_gather`` spans one vreg — the round-1 finding), so the B rows
are fetched HBM→VMEM by explicit per-row async DMA (128-lane granularity),
double-buffered across the L reduction steps.

Expectation management (recorded before measurement): the XLA ELL kernel
(ops/ell_spmm.py) rides XLA's native gather engine at ~100 M rows/s; this
kernel issues one 512 B DMA per (row, element) — 8·L descriptors per group —
and its throughput is bounded by DMA-descriptor issue rate, not bandwidth.
It exists to answer SURVEY §3.3's "VMEM-staged consumer" question with a
measured number; the dispatcher never selects it unless it wins.

MEASURED OUTCOME (real v5e, r4): 5.87 ms vs the XLA gather's 4.05 ms on the
same 128K-row uniform slab (22 vs 32 M rows/s) — the gather engine wins.
Two real-Mosaic constraints surfaced that interpret mode does not check:
(1) dynamically-indexed lane offsets must be provably 128-aligned (the
value-column extraction is a one-hot mask+reduce for this reason), and
(2) the scalar-prefetch index stream lives in SMEM (1 MB on v5e), capping
R*L at ~256K per call — which rules this formulation out for production
slabs independent of its speed.  DESIGN.md §6 records the close-out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _octet_kernel(cols_ref, a_ref, b_hbm, o_ref, scratch, sem, *, L, k):
    """One 8-row group per grid step: double-buffered per-row DMA of the
    group's 8 B rows per reduction element, accumulate (8, k) in registers."""
    g = pl.program_id(0)
    base = g * (L * 8)

    def dma(slot, e, r):
        return pltpu.make_async_copy(
            b_hbm.at[pl.ds(cols_ref[base + e * 8 + r], 1), :],
            scratch.at[slot, pl.ds(r, 1), :],
            sem.at[slot, r],
        )

    for r in range(8):  # warm-up: stage element 0
        dma(0, 0, r).start()

    def body(e, acc):
        slot = jax.lax.rem(e, 2)

        @pl.when(e + 1 < L)
        def _():
            nxt = jax.lax.rem(e + 1, 2)
            for r in range(8):
                dma(nxt, e + 1, r).start()

        for r in range(8):
            dma(slot, e, r).wait()
        # element e of each row WITHOUT a dynamic lane slice: Mosaic requires
        # dynamically-indexed lane offsets to be provably 128-aligned
        # ("cannot statically prove that index in dimension 2 is a multiple
        # of 128", v5e, 2026-08-20) — a one-hot mask + reduce over the (8, L)
        # value block is the legal spelling, and is trivial next to the DMAs.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        vals = jnp.sum(
            jnp.where(lane == e, a_ref[0], 0.0), axis=1, keepdims=True
        )  # (8, 1)
        picked = scratch[slot]  # (8, k)
        return acc + vals * picked

    acc = jax.lax.fori_loop(0, L, body, jnp.zeros((8, k), jnp.float32))
    o_ref[:] = acc


def ell_slab_octets_pallas(cols_flat, a3, B, *, interpret: bool = False):
    """Jit-friendly core: ``cols_flat`` (G*L*8,) octet-ordered B-row ids,
    ``a3`` (G, 8, L) values, B (n, 128).  Returns (G*8, 128)."""
    G, _, L = a3.shape
    n, k = B.shape
    R = G * 8
    grid_spec = _grid_spec(G, L, k)
    return pl.pallas_call(
        functools.partial(_octet_kernel, L=L, k=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, k), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * L * k,
            bytes_accessed=R * L * (k * 4 + 8) + R * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(cols_flat, a3, B)


def ell_slab_spmm_pallas(
    cols: jax.Array,  # (R, L) int32, R % 8 == 0
    data: jax.Array,  # (R, L) float32
    B: jax.Array,  # (n, k) float32, k == 128
    *,
    interpret: bool = False,
) -> jax.Array:
    """Y[R, k] = slab @ B for one uniform-length ELL slab — the Pallas
    per-row-DMA formulation (see module docstring for why this is an
    experiment, not the production path)."""
    R, L = cols.shape
    n, k = B.shape
    if R % 8:
        raise ValueError("R must be a multiple of 8 (v8 octets)")
    if k != 128:
        raise ValueError("the experiment fixes k=128 (one lane tile)")
    G = R // 8
    # octet layout: cols_flat[(g*L + e)*8 + r] = cols[8g + r, e]
    c3 = np.asarray(cols).reshape(G, 8, L).transpose(0, 2, 1)  # (G, L, 8)
    cols_flat = jnp.asarray(np.clip(c3.reshape(-1), 0, n - 1), jnp.int32)
    a3 = jnp.asarray(np.asarray(data).reshape(G, 8, L))  # (G, 8, L)
    return ell_slab_octets_pallas(cols_flat, a3, B, interpret=interpret)


def _grid_spec(G, L, k):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # cols_flat
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 8, L), lambda g, cols: (g, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),  # B stays in HBM
        ],
        out_specs=pl.BlockSpec((8, k), lambda g, cols: (g, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 8, k), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 8)),
        ],
    )
