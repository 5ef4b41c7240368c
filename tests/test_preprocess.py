import numpy as np
import pytest

from spmm_tpu.config import Config
from spmm_tpu.formats.synthetic import banded_random, random_csr, webgraph_like
from spmm_tpu.preprocess import (
    bitmap_reorder,
    dominant_sections,
    panel_sort,
    panelize,
    preprocess,
    region_distinct_counts,
    split_regions,
    unpack_to_csr,
)


# ---------------------------------------------------------------- pass 1


def test_dominant_sections_oracle():
    A = webgraph_like(2000, 12000, seed=0)
    dom = dominant_sections(A, 256)
    # slow oracle
    S = A.to_scipy()
    for r in [0, 1, 17, 555, 1999]:
        cols = S.indices[S.indptr[r] : S.indptr[r + 1]]
        if len(cols) == 0:
            assert dom[r] == -1
            continue
        counts = np.bincount(cols // 256)
        assert dom[r] == counts.argmax()  # argmax: max count, lowest section


def test_bitmap_reorder_is_permutation_and_preserves_matrix():
    A = webgraph_like(1500, 9000, seed=1)
    A1, perm = bitmap_reorder(A, 2048)
    assert sorted(perm) == list(range(1500))
    ref = A.to_scipy()[perm]
    assert abs(A1.to_scipy() - ref).max() == 0
    # rows are bucketed: dominant sections must be non-decreasing
    dom = dominant_sections(A, 2048)
    assert (np.diff(dom[perm]) >= 0).all()


def test_bitmap_reorder_device_matches_host():
    import jax.numpy as jnp

    from spmm_tpu.preprocess.reorder import bitmap_perm_device, dominant_sections_device

    A = webgraph_like(800, 5000, seed=2).pad(16)
    dom_d = np.asarray(
        dominant_sections_device(
            jnp.asarray(A.indices), jnp.asarray(A.indptr), A.nnz, A.shape, 256
        )
    )
    dom_h = dominant_sections(A, 256)
    np.testing.assert_array_equal(dom_d, dom_h)
    perm_d = np.asarray(bitmap_perm_device(A, 256))
    _, perm_h = bitmap_reorder(A, 256, materialize=False)
    np.testing.assert_array_equal(perm_d, perm_h)


# ---------------------------------------------------------------- pass 2


def test_split_regions_budget_invariant():
    A = webgraph_like(3000, 30000, seed=3)
    budget = 500
    bounds = split_regions(A, budget)
    assert bounds[0] == 0 and bounds[-1] == 3000
    assert (np.diff(bounds) > 0).all()
    counts = region_distinct_counts(A, bounds)
    max_row = int(np.diff(A.indptr).max())
    assert (counts < budget + max_row).all()
    # all regions but the last must have actually hit the budget
    assert (counts[:-1] >= budget).all()


def test_split_regions_matches_serial_oracle():
    # direct transcription of the reference scan (transmat.h:334-376)
    A = webgraph_like(400, 2500, seed=4)
    budget = 120
    S = A.to_scipy()
    seen = set()
    bounds_ref = [0]
    for r in range(400):
        seen.update(S.indices[S.indptr[r] : S.indptr[r + 1]].tolist())
        if len(seen) >= budget:
            bounds_ref.append(r + 1)
            seen = set()
    if bounds_ref[-1] != 400:
        bounds_ref.append(400)
    np.testing.assert_array_equal(split_regions(A, budget), bounds_ref)


def test_split_regions_single_region_when_budget_large():
    A = webgraph_like(500, 2000, seed=5)
    bounds = split_regions(A, 10**9)
    np.testing.assert_array_equal(bounds, [0, 500])


# ---------------------------------------------------------------- pass 3a/3b


def test_panelize_alignment_and_balance():
    A = webgraph_like(10000, 60000, seed=6)
    lens = np.diff(A.indptr)
    rb = np.array([0, 4096, 10000])
    pb = panelize(lens, rb, panel_rows=2048, align=8)
    assert pb[0] == 0 and pb[-1] == 10000
    # region boundaries are panel boundaries
    assert 4096 in pb
    # panel cuts are 8-aligned relative to their region start
    for s, t in zip(rb[:-1], rb[1:]):
        inner = pb[(pb > s) & (pb < t)]
        assert ((inner - s) % 8 == 0).all()


def test_panel_sort_properties():
    rng = np.random.default_rng(7)
    lens = rng.integers(0, 40, size=400)
    pb = np.array([0, 160, 400])
    ps = panel_sort(lens, pb, group_width=8, max_len=32)
    # permutation
    assert sorted(ps.perm) == list(range(400))
    # rows stay within their panel
    orig_panel = np.searchsorted(pb, np.arange(400), side="right") - 1
    np.testing.assert_array_equal(orig_panel[ps.perm], ps.panel_of_row)
    # every group: 8 consecutive rows, equal length, len in (0, 32]
    lens_final = lens[ps.perm]
    for gr, gl in zip(ps.group_row, ps.group_len):
        assert 0 < gl <= 32
        np.testing.assert_array_equal(lens_final[gr : gr + 8], gl)
        assert ps.is_grouped[gr : gr + 8].all()
    # grouped rows: count per (panel, len) bucket is c - c % 8
    for p in range(2):
        sel = ps.panel_of_row == p
        for L in range(1, 33):
            c = int(((lens_final == L) & sel).sum())
            gcount = int(((lens_final == L) & sel & ps.is_grouped).sum())
            assert gcount == (c // 8) * 8
    # long rows are never grouped
    assert not ps.is_grouped[lens_final > 32].any()


# ---------------------------------------------------------------- end-to-end


@pytest.mark.parametrize("gen,args", [
    (webgraph_like, (1200, 8000)),
    (banded_random, (900, 100, 0.2)),
    (random_csr, (700, 700, 0.01)),
])
def test_pack_unpack_identity(gen, args):
    A = gen(*args, seed=8)
    cfg = Config(region_budget=300, panel_rows=128)
    P = preprocess(A, cfg)
    back = unpack_to_csr(P)
    refS = A.to_scipy()
    refS.sort_indices()
    got = back.to_scipy()
    assert (got != refS).nnz == 0
    np.testing.assert_allclose(got.data, refS.data)


def test_preprocess_invariants():
    A = webgraph_like(2500, 16000, seed=9)
    cfg = Config(region_budget=400, panel_rows=256)
    P = preprocess(A, cfg)
    nrow = A.shape[0]
    # permutations invert each other
    np.testing.assert_array_equal(P.row_inv[P.row_perm], np.arange(nrow))
    # region/panel bookkeeping
    assert P.region_rows[0] == 0 and P.region_rows[-1] == nrow
    assert P.region_nnz[-1] == P.nnz
    assert P.region_gather[-1] == P.ndistinct
    # per-region relabeled ids are dense 0..count-1
    for r in range(P.nregions):
        lo, hi = int(P.region_nnz[r]), int(P.region_nnz[r + 1])
        cnt = int(P.region_gather[r + 1] - P.region_gather[r])
        ids = np.asarray(P.cols_local[lo:hi])
        if len(ids):
            assert ids.min() == 0 and ids.max() == cnt - 1
            assert np.unique(ids).size == cnt
    # distinct per region respects the budget overshoot bound
    max_row = int(np.diff(A.indptr).max())
    counts = np.diff(P.region_gather)
    assert (counts < 400 + max_row).all()
    # gather_rows round-trips on square matrices (SURVEY.md §2.8)
    np.testing.assert_array_equal(
        np.asarray(P.row_perm)[np.asarray(P.gather_rows)], np.asarray(P.gather_cols)
    )


def test_blocked_spmm_xla_matches_dense():
    import jax.numpy as jnp

    from spmm_tpu.ops.blocked import blocked_spmm_xla

    A = webgraph_like(1000, 7000, seed=10)
    cfg = Config(region_budget=250, panel_rows=128)
    P = preprocess(A, cfg).device()
    B = np.random.default_rng(0).standard_normal((1000, 16)).astype(np.float32)
    Y = np.asarray(blocked_spmm_xla(P, jnp.asarray(B)))
    ref = A.to_scipy() @ B
    np.testing.assert_allclose(Y, ref, rtol=1e-4, atol=1e-4)


def test_blocked_spmm_empty_rows_matrix():
    import jax.numpy as jnp

    from spmm_tpu.ops.blocked import blocked_spmm_xla

    # heavy-tailed with many empty rows
    A = random_csr(600, 600, 0.002, seed=11)
    P = preprocess(A, Config(region_budget=100)).device()
    B = np.random.default_rng(1).standard_normal((600, 8)).astype(np.float32)
    Y = np.asarray(blocked_spmm_xla(P, jnp.asarray(B)))
    np.testing.assert_allclose(Y, A.to_scipy() @ B, rtol=1e-4, atol=1e-4)


def test_preprocess_numpy_pack_fallback(monkeypatch):
    """Regression: native perm_algebra + numpy pack fallback crashed on an
    unbound lens_final (the fallback fires when native pack_blocked declines,
    e.g. an unspecialized element size)."""
    import numpy as np

    from spmm_tpu import native
    from spmm_tpu.config import Config
    from spmm_tpu.formats.synthetic import webgraph_like
    from spmm_tpu.preprocess import preprocess
    from spmm_tpu.preprocess.pipeline import unpack_to_csr

    monkeypatch.setattr(native, "pack_blocked", lambda *a, **k: None)
    A = webgraph_like(2000, 12000, seed=9)
    P = preprocess(A, Config(region_budget=1024))
    # the format stays invertible through the numpy pack path
    U = unpack_to_csr(P)
    S = A.to_scipy().tocsr()
    S.sum_duplicates()
    S.sort_indices()
    assert (U.to_scipy().tocsr() != S).nnz == 0
