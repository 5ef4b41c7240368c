"""Kernels over the preprocessed BlockedCSR format.

This is the consumer the reference format implies but never ships
(SURVEY.md §3.3): per region, gather the compacted RHS panel
(``gather_cols`` slots — bounded by the region budget so it fits VMEM), then
multiply v8 groups as dense (8, L) tiles and remain rows as gathered dot
products, writing rows in final order; un-permute with ``row_inv`` at the end.

``blocked_spmm_xla`` is the XLA formulation — the production path; see
``blocked_spmm`` for why a Pallas VMEM-panel kernel is infeasible on this
toolchain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spmm_tpu.formats.containers import BlockedCSR


def _final_out_rows(P: BlockedCSR) -> jax.Array:
    """Per packed nonzero: the (final-order) output row it contributes to.

    Remain rows: the CSR row containing the position.  v8 blocks are 8-row
    interleaved, so position ``group_nnz[g] + t`` belongs to group-row
    ``t % 8`` (reference layout, serial_newblock_clock.cpp:366-385).
    """
    from spmm_tpu.ops.segments import boundary_segments

    nnz_pad = P.data.shape[0]
    pos = jnp.arange(nnz_pad, dtype=jnp.int32)
    r0 = boundary_segments(jnp.asarray(P.indptr), nnz_pad)
    g = jnp.asarray(P.row_group)[r0]
    has_groups = P.ngroups > 0
    if not has_groups:
        return r0
    gsafe = jnp.clip(g, 0, P.ngroups - 1)
    off = pos - jnp.asarray(P.group_nnz)[gsafe]
    grow = jnp.asarray(P.group_row)[gsafe] + (off % 8)
    return jnp.where(g >= 0, grow, r0)


def _global_cols(P: BlockedCSR) -> jax.Array:
    """Undo the per-region relabel: original column id per packed nonzero."""
    from spmm_tpu.ops.segments import boundary_segments

    nnz_pad = P.data.shape[0]
    reg = boundary_segments(jnp.asarray(P.region_nnz), nnz_pad)
    slot = jnp.asarray(P.region_gather)[reg] + jnp.asarray(P.cols_local)
    return jnp.asarray(P.gather_cols)[jnp.clip(slot, 0, P.ndistinct - 1)]


def blocked_exec_view(P: BlockedCSR):
    """Pack-once execution view: (out_rows, global_cols) per packed nonzero,
    computed on device once and reused across multiplies — recomputing the
    v8-interleave/relabel indirections per call costs as much as the multiply
    itself (measured 123 ms vs 84 ms on web-Google)."""
    out_rows = _final_out_rows(P)
    gcols = _global_cols(P)
    return jax.block_until_ready((out_rows, gcols))


def blocked_spmm_xla(
    P: BlockedCSR,
    B: jax.Array,
    *,
    accum_dtype=jnp.float32,
    permute_back: bool = True,
    view=None,
) -> jax.Array:
    """Y = unpack(P) @ B via the packed stream (validates the full format:
    interleave, relabel, permutations).  Pass ``view=blocked_exec_view(P)``
    for the pack-once/multiply-many pattern."""
    out_rows, gcols = view if view is not None else (_final_out_rows(P), _global_cols(P))
    contrib = jnp.take(B, gcols, axis=0).astype(accum_dtype) * jnp.asarray(P.data).astype(
        accum_dtype
    )[:, None]
    # mask padding (if any): positions >= nnz contribute zero via data==0
    y_final = jax.ops.segment_sum(contrib, out_rows, num_segments=P.nrow)
    if not permute_back:
        return y_final
    return y_final[jnp.asarray(P.row_inv)]


def blocked_spmm(P: BlockedCSR, B: jax.Array, **kw) -> jax.Array:
    """Dispatcher for the packed-format SpMM.

    A Pallas kernel staging the per-region gathered RHS panel in VMEM was
    prototyped and is NOT shippable on this toolchain: Mosaic's only gather
    primitive (``tpu.dynamic_gather``) spans a single vreg (8 sublanes) along
    the gather dimension, so random row gathers from a VMEM panel cannot be
    expressed ("Multiple source vregs along gather dimension").  The XLA
    formulation below is therefore the production path; for repeated
    multiplies pass ``view=blocked_exec_view(P)``.  For raw SpMM speed use
    the ELL kernel (ops/ell_spmm.py) — see the README primitive-rate table.
    """
    return blocked_spmm_xla(P, B, **kw)
