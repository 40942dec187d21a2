"""Take-all semantics at scale (reference meta.rs:638-640: default k returns
EVERY row, sorted by the take direction).

Round-2 verdict item: the previous default k = n_rows hit choose_mode's
OttersError at large (b, n) and materialized results through a per-row
Python loop. Now large-k-over-large-store queries stream score windows to
the host (scoring.collect_all) and results materialize via vectorized
gathers."""

import numpy as np
import pytest

from otters_tpu import Column, DataType, Metric, MetaStore, VecStore, col
from otters_tpu.errors import OttersError
from otters_tpu.ops import scoring


def test_needs_windowed_routing():
    D = scoring.DIRECT_LIMIT
    # small candidate count: direct, any k
    assert not scoring.needs_windowed(1 << 20, 1, 1 << 20)
    # large store, small k: panel
    assert not scoring.needs_windowed(1 << 23, 256, 10)
    # large store, mid k: scan (SCAN_TILE-aligned n_pad)
    assert not scoring.needs_windowed(scoring.SCAN_TILE * 1024, 8, 4096)
    # large store, k past SCAN_K_MAX: windowed
    assert scoring.needs_windowed(
        scoring.SCAN_TILE * 1024, 8, scoring.SCAN_K_MAX + 1
    )
    # mid-size non-SCAN-aligned store with k past the panel bound: windowed
    assert scoring.needs_windowed(300032, 16, 5000)
    assert D == scoring.DIRECT_LIMIT


def _oracle_order(scores_flat, ok_flat, k, take_min):
    key = np.where(ok_flat, scores_flat, np.inf if take_min else -np.inf)
    if not take_min:
        key = -key
    order = np.argsort(key, kind="stable")[:k]
    return order


def test_windowed_take_all_matches_oracle():
    rng = np.random.default_rng(7)
    n, d, b = 300_000, 8, 16
    k = 5_000  # > PANEL_K_MAX, scan-ineligible n_pad -> windowed path
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    qs = rng.normal(size=(b, d)).astype(np.float32)
    price = (np.arange(n) % 100).astype(np.float64)
    store = (
        MetaStore.from_columns(
            [Column("price", DataType.Float64).from_values(price)]
        )
        .with_vectors(vecs)
        .with_chunk_size(4096)
        .build()
    )
    assert scoring.needs_windowed(store._dv.vectors.shape[0], b, k)
    res = (
        store.query_batch(qs, Metric.Cosine)
        .meta_filter(col("price").lt(50.0))
        .take(k)
        .collect()
    )
    assert len(res) == k
    # oracle: global top-k over all (query, row) pairs with the filter
    qi = 1.0 / np.linalg.norm(qs, axis=1)
    vi = 1.0 / np.linalg.norm(vecs, axis=1)
    s = (qs @ vecs.T) * qi[:, None] * vi[None, :]
    okm = np.broadcast_to((price < 50.0)[None, :], s.shape)
    vals = np.sort(s[okm])[::-1][:k]
    np.testing.assert_allclose(np.asarray(res.scores), vals, rtol=2e-5, atol=2e-5)
    assert all(price[i] < 50.0 for i in res.indices[:100])
    # sorted descending
    sc = np.asarray(res.scores)
    assert (np.diff(sc) <= 1e-12).all()


def test_take_all_2m_rows_returns_everything():
    """The verdict's 'done' bar: take-all on a 2M-row store returns the
    complete, correctly ordered result set in seconds."""
    import time

    rng = np.random.default_rng(8)
    n, d = 2_000_000, 8
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(d,)).astype(np.float32)
    version = (np.arange(n) % 5).astype(np.int32)
    store = (
        MetaStore.from_columns(
            [Column("version", DataType.Int32).from_values(version)]
        )
        .with_vectors(vecs)
        .with_chunk_size(8192)
        .build()
    )
    t0 = time.perf_counter()
    res = store.query(q, Metric.DotProduct).collect()  # no take(): ALL rows
    dt = time.perf_counter() - t0
    assert len(res) == n
    sc = np.asarray(res.scores)
    assert (np.diff(sc) <= 1e-9).all()
    # exact: the best and worst match the brute-force oracle
    s = vecs @ q
    assert np.argmax(s) == res.indices[0]
    np.testing.assert_allclose(sc[0], s.max(), rtol=1e-5)
    np.testing.assert_allclose(sc[-1], s.min(), rtol=1e-5)
    # materialization included: the result carries all 2M column values
    assert len(res.column("version")) == n
    assert dt < 120.0, f"take-all took {dt:.1f}s"


def test_windowed_take_min_and_vec_filter():
    rng = np.random.default_rng(9)
    n, d, b = 300_000, 8, 16
    k = 3_000
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    qs = rng.normal(size=(b, d)).astype(np.float32)
    store = (
        MetaStore.from_columns([])
        .with_vectors(vecs)
        .with_chunk_size(4096)
        .build()
    )
    from otters_tpu import Cmp

    res = (
        store.query_batch(qs, Metric.Euclidean)
        .vec_filter(float(d * 1.5), Cmp.Lt)
        .take(k)
        .collect()
    )
    q_sq = (qs**2).sum(1)[:, None]
    v_sq = (vecs**2).sum(1)[None, :]
    s = q_sq + v_sq - 2.0 * (qs @ vecs.T)
    vals = np.sort(s[s < d * 1.5])[:k]
    assert len(res) == min(k, vals.size)
    np.testing.assert_allclose(
        np.asarray(res.scores), vals[: len(res)], rtol=2e-4, atol=2e-4
    )


def test_take_all_cap_raises_clear_error():
    with pytest.raises(OttersError, match="candidate scores"):
        scoring.collect_all(
            scoring.DeviceVecs(
                _FakeArr((scoring.TAKE_ALL_LIMIT + 512, 4)), None, None, None
            ),
            np.zeros((2, 4), np.float32),
            Metric.Cosine,
            scoring.TAKE_ALL_LIMIT,
            take_min=False,
            cmp=None,
            thr=None,
        )


class _FakeArr:
    def __init__(self, shape):
        self.shape = shape


def test_vecstore_take_all_windowed():
    """VecStore.take(k) routes through the windowed path at huge k too."""
    rng = np.random.default_rng(10)
    n, d, b = 300_000, 8, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    qs = rng.normal(size=(b, d)).astype(np.float32)
    vs = VecStore(d)
    vs.add_vectors(vecs)
    res = vs.query(qs, Metric.DotProduct).take(2000).collect()
    s = (qs @ vecs.T).reshape(-1)
    want = np.sort(s)[::-1][:2000]
    got = np.asarray([r.score for r in res])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
