"""Row/region partitioning of sparse matrices across a device mesh.

The reference's region split (SURVEY.md §2.4) is exactly the unit to shard:
row-block-partition the left matrix so each shard's working set is bounded.
Shards are padded to uniform static shapes (rows, nnz) and stacked with a
leading shard axis — the layout ``shard_map`` consumes directly.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import numpy as np

from spmm_tpu.formats.containers import CSR

Array = object


def _round_up(x: int, m: int) -> int:
    return ((max(x, 1) + m - 1) // m) * m


def _device_tree(obj, sharding=None):
    """Shared device-placement for the sharded containers."""
    import jax.numpy as jnp

    if sharding is None:
        return jax.tree.map(jnp.asarray, obj)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), obj)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedCSR:
    """n_shards row blocks of a CSR matrix, padded to uniform static shapes.

    ``data/indices``: (n_shards, nnz_pad); ``indptr``: (n_shards, rows_pad+1);
    padded rows are empty; padded nonzeros are zeros.  ``row_starts`` gives
    each shard's global first row.
    """

    data: Array
    indices: Array
    indptr: Array
    row_starts: Array  # (n_shards,) int32 global row offset per shard
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    rows_per_shard: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))

    def device(self, sharding=None) -> "ShardedCSR":
        return _device_tree(self, sharding)


def partition_rows(A: CSR, n_shards: int, *, nnz_align: int = 128) -> ShardedCSR:
    """Split A into ``n_shards`` equal row blocks (row-balanced; for
    nnz-balanced splits preprocess first — the bitmap reorder clusters heavy
    rows so equal-nnz splits follow from region boundaries)."""
    h = A.host()
    m, n = A.shape
    rows_per = _round_up((m + n_shards - 1) // n_shards, 8)
    indptr = np.asarray(h.indptr, dtype=np.int64)
    starts = np.minimum(np.arange(n_shards, dtype=np.int64) * rows_per, m)
    ends = np.minimum(starts + rows_per, m)
    max_nnz = int(max(indptr[e] - indptr[s] for s, e in zip(starts, ends)))
    nnz_pad = _round_up(max_nnz, nnz_align)

    data = np.zeros((n_shards, nnz_pad), dtype=np.asarray(h.data).dtype)
    indices = np.zeros((n_shards, nnz_pad), dtype=np.int32)
    sh_indptr = np.zeros((n_shards, rows_per + 1), dtype=np.int32)
    for i, (s, e) in enumerate(zip(starts, ends)):
        lo, hi = int(indptr[s]), int(indptr[e])
        data[i, : hi - lo] = np.asarray(h.data[lo:hi])
        indices[i, : hi - lo] = np.asarray(h.indices[lo:hi], dtype=np.int32)
        local = (indptr[s : e + 1] - lo).astype(np.int32)
        sh_indptr[i, : e - s + 1] = local
        sh_indptr[i, e - s + 1 :] = local[-1] if len(local) else 0
    return ShardedCSR(
        data=data,
        indices=indices,
        indptr=sh_indptr,
        row_starts=starts.astype(np.int32),
        shape=(m, n),
        n_shards=n_shards,
        rows_per_shard=rows_per,
        nnz=A.nnz,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ColShardedCSR:
    """n_shards COLUMN blocks of a CSR matrix (contraction-dimension split).

    Each shard holds the sub-CSR of its column range over ALL rows, with
    column ids relocalized to the block (``indices - col_start``); rows are
    padded to ``rows_pad`` (a multiple of ``8 * n_shards`` so a
    ``psum_scatter`` over the row dimension tiles evenly).  The TP mirror of
    :class:`ShardedCSR`: shard the K axis, not the M axis."""

    data: Array  # (n_shards, nnz_pad)
    indices: Array  # (n_shards, nnz_pad) block-local column ids
    indptr: Array  # (n_shards, rows_pad + 1)
    col_starts: Array  # (n_shards,) int32 global first column per shard
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    cols_per_shard: int = dataclasses.field(metadata=dict(static=True))
    rows_pad: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))

    def device(self, sharding=None) -> "ColShardedCSR":
        return _device_tree(self, sharding)


def partition_cols(A: CSR, n_shards: int, *, nnz_align: int = 128) -> ColShardedCSR:
    """Split A into ``n_shards`` equal COLUMN blocks (the contraction axis).

    Within a row, each shard keeps its nonzeros in original order (the mask
    select preserves file/row order, matching the reference's no-sort CSR
    contract, SURVEY.md §2.1)."""
    h = A.host()
    m, n = A.shape
    cols_per = _round_up((n + n_shards - 1) // n_shards, 8)
    rows_pad = _round_up(m, 8 * n_shards)
    indptr = np.asarray(h.indptr, dtype=np.int64)[: m + 1]
    cols = np.asarray(h.indices, dtype=np.int64)[: A.nnz]
    vals = np.asarray(h.data)[: A.nnz]
    rows_nnz = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))

    shard_of = np.minimum(cols // cols_per, n_shards - 1)
    counts = np.bincount(shard_of, minlength=n_shards)
    nnz_pad = _round_up(int(counts.max()) if len(counts) else 1, nnz_align)

    # ONE stable grouping pass instead of an O(n_shards * nnz) mask per
    # shard: nonzeros are already row-major, so a stable sort by shard id
    # yields each shard's nonzeros contiguous AND still in row-major order
    order = np.argsort(shard_of, kind="stable")
    bounds = np.zeros(n_shards + 1, np.int64)
    np.cumsum(counts, out=bounds[1:])

    data = np.zeros((n_shards, nnz_pad), dtype=vals.dtype)
    indices = np.zeros((n_shards, nnz_pad), dtype=np.int32)
    sh_indptr = np.zeros((n_shards, rows_pad + 1), dtype=np.int32)
    starts = (np.arange(n_shards, dtype=np.int64) * cols_per).astype(np.int32)
    for i in range(n_shards):
        sel = order[bounds[i] : bounds[i + 1]]
        k = len(sel)
        data[i, :k] = vals[sel]
        indices[i, :k] = (cols[sel] - starts[i]).astype(np.int32)
        rc = np.bincount(rows_nnz[sel], minlength=rows_pad).astype(np.int64)
        np.cumsum(rc, out=rc)
        sh_indptr[i, 1:] = rc.astype(np.int32)
    return ColShardedCSR(
        data=data,
        indices=indices,
        indptr=sh_indptr,
        col_starts=starts,
        shape=(m, n),
        n_shards=n_shards,
        cols_per_shard=cols_per,
        rows_pad=rows_pad,
        nnz=A.nnz,
    )


def unshard_rows(Y_sharded: np.ndarray, S: ShardedCSR) -> np.ndarray:
    """(n_shards, rows_pad, k) → (m, k): drop per-shard row padding."""
    m = S.shape[0]
    out = np.concatenate([np.asarray(Y_sharded[i]) for i in range(S.n_shards)], axis=0)
    return out[:m]


def unshard_csr_rows(S: ShardedCSR) -> CSR:
    """Reassemble a row-sharded CSR (e.g. ``spgemm_dist_csr``'s device-
    resident output) into one global host CSR.  Shards are contiguous row
    blocks, so the merge is a plain concatenation of trimmed local triples
    with indptr offsets — no sort.  Pulls each shard's real nonzeros only
    (``data[s, :nnz_s]``), never the padded tails."""
    iptr = np.asarray(S.indptr, np.int64)
    m = S.shape[0]
    datas, inds, iptrs = [], [], []
    off = 0
    row_starts = np.asarray(S.row_starts, np.int64)
    for s in range(S.n_shards):
        k = int(iptr[s, -1])
        datas.append(np.asarray(S.data[s][:k]))
        inds.append(np.asarray(S.indices[s][:k], np.int32))
        # rows this shard actually owns (the last shard's padding overhangs m)
        own = min(S.rows_per_shard, m - int(row_starts[s]))
        own = max(own, 0)
        ip = iptr[s, : own + 1] + off
        iptrs.append(ip if s == 0 else ip[1:])
        off = int(ip[-1]) if len(ip) else off
    indptr = np.concatenate(iptrs) if iptrs else np.zeros(1, np.int64)
    data = np.concatenate(datas) if datas else np.zeros(0, np.float32)
    return CSR(
        data=data,
        indices=np.concatenate(inds) if inds else np.zeros(0, np.int32),
        indptr=indptr,
        shape=S.shape,
        nnz=int(indptr[-1]),
    )
