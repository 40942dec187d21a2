"""Exactness equivalence of the three scoring strategies.

direct (sort top-k), panel (two-level bin-max top-k), scan (streaming tiles
with threshold early-out) must all return identical exact results; numpy
brute force is the oracle.
"""

import numpy as np
import pytest

from otters_tpu.ops import scoring
from otters_tpu.types import Cmp, Metric


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    n, d, b = 8192, 24, 4  # pads to a multiple of both PANEL_BIN and SCAN_TILE
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(b, d)).astype(np.float32)
    dv = scoring.materialize(vectors)
    return vectors, queries, dv


def _run(dv, queries, mode, monkeypatch, **kw):
    # force the dispatcher's hand
    if mode == "direct":
        monkeypatch.setattr(scoring, "DIRECT_LIMIT", 1 << 62)
    else:
        monkeypatch.setattr(scoring, "DIRECT_LIMIT", 1)
        if mode == "scan":
            monkeypatch.setattr(scoring, "PANEL_K_MAX", 0)
    assert scoring.choose_mode(
        dv.vectors.shape[0], queries.shape[0], kw.get("k", 10)
    ) == mode
    return scoring.run_vec_topk(dv, queries, **kw)


@pytest.mark.parametrize("mode", ["direct", "panel", "scan"])
def test_modes_match_numpy_dot(data, mode, monkeypatch):
    vectors, queries, dv = data
    rows, scores, ok = _run(
        dv, queries, mode, monkeypatch,
        metric=Metric.DotProduct, k=25, take_min=False, cmp=None, thr=None,
    )
    assert ok.all()
    ref = (queries @ vectors.T).reshape(-1)
    want = np.sort(ref)[::-1][:25]
    np.testing.assert_allclose(scores, want, rtol=1e-5, atol=1e-5)
    # each returned (row, score) must correspond to some query's dot product
    for r, s in zip(rows, scores):
        assert np.min(np.abs(queries @ vectors[r] - s)) < 1e-4


@pytest.mark.parametrize("mode", ["direct", "panel", "scan"])
def test_modes_match_numpy_euclid_min_filtered(data, mode, monkeypatch):
    vectors, queries, dv = data
    k = 40
    rows, scores, ok = _run(
        dv, queries, mode, monkeypatch,
        metric=Metric.Euclidean, k=k, take_min=True, cmp=Cmp.Gt, thr=5.0,
    )
    q_sq = (queries**2).sum(1)[:, None]
    v_sq = (vectors**2).sum(1)[None, :]
    ref = (q_sq + v_sq - 2 * queries @ vectors.T).reshape(-1)
    ref = ref[ref > 5.0]
    want = np.sort(ref)[:k]
    np.testing.assert_allclose(scores[ok], want[: ok.sum()], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["panel", "scan"])
def test_modes_with_row_mask(data, mode, monkeypatch):
    vectors, queries, dv = data
    n_pad = dv.vectors.shape[0]
    mask = np.zeros(n_pad, dtype=bool)
    mask[::7] = True
    rows, scores, ok = _run(
        dv, queries, mode, monkeypatch,
        metric=Metric.DotProduct, k=15, take_min=False, cmp=None, thr=None,
        row_mask=mask,
    )
    assert ok.all()
    assert all(r % 7 == 0 for r in rows)
    ref = (queries @ vectors[::7].T).reshape(-1)
    want = np.sort(ref)[::-1][:15]
    np.testing.assert_allclose(scores, want, rtol=1e-5, atol=1e-5)


def test_panel_k_exceeding_bins(data, monkeypatch):
    """k larger than one bin's worth still exact (kb clamps to bin count)."""
    vectors, queries, dv = data
    monkeypatch.setattr(scoring, "DIRECT_LIMIT", 1)
    k = 600
    rows, scores, ok = scoring.run_vec_topk(
        dv, queries, metric=Metric.DotProduct, k=k, take_min=False,
        cmp=None, thr=None,
    )
    # k=600 > PANEL_K_MAX would fall to scan; force panel by raising the cap
    monkeypatch.setattr(scoring, "PANEL_K_MAX", 2048)
    rows2, scores2, ok2 = scoring.run_vec_topk(
        dv, queries, metric=Metric.DotProduct, k=k, take_min=False,
        cmp=None, thr=None,
    )
    ref = (queries @ vectors.T).reshape(-1)
    want = np.sort(ref)[::-1][:k]
    np.testing.assert_allclose(scores, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(scores2, want, rtol=1e-5, atol=1e-5)
