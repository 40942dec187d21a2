"""Pruning for the VPU metrics (round-3): Manhattan / Hamming / Jaccard
filtered queries must SKIP pruned tiles (reference meta.rs:647-691 prunes
independent of the metric), not just fix the stats."""

import numpy as np
import pytest

from otters_tpu import Column, DataType, Metric, MetaStore, col
from otters_tpu.ops import scoring

N, D, CHUNK = 32_768, 16, 1024  # n_pad == N == 4 * SCAN_TILE


@pytest.fixture(scope="module")
def store_and_data():
    rng = np.random.default_rng(41)
    vecs = np.abs(rng.normal(size=(N, D))).astype(np.float32)  # >=0 for Jaccard
    price = (np.arange(N) // CHUNK % 2 * 50 + np.arange(N) % 10).astype(
        np.float64
    )  # even chunks 0-9, odd chunks 50-59 -> lt(10) prunes half
    store = (
        MetaStore.from_columns(
            [Column("price", DataType.Float64).from_values(price)]
        )
        .with_vectors(vecs)
        .with_chunk_size(CHUNK)
        .build()
    )
    assert store._dv.vectors.shape[0] == N  # geometry the route depends on
    return store, vecs, price


def _oracle(qs, vecs, metric, mask):
    ql = qs[:, None, :]
    vl = vecs[None, :, :]
    if metric is Metric.Manhattan:
        s = np.abs(ql - vl).sum(-1)
    elif metric is Metric.Hamming:
        s = (ql != vl).sum(-1).astype(np.float64)
    else:
        num = np.minimum(ql, vl).sum(-1)
        den = np.maximum(ql, vl).sum(-1)
        s = np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0)
    s = np.where(mask[None, :], s, np.inf if metric is not Metric.Jaccard else -np.inf)
    return s


@pytest.mark.parametrize(
    "metric", [Metric.Manhattan, Metric.Hamming, Metric.Jaccard]
)
def test_vpu_filtered_uses_pruned_scan_and_is_exact(
    store_and_data, metric, monkeypatch
):
    store, vecs, price = store_and_data
    calls = []
    orig = scoring.scan_pruned_topk_core

    def spy(*a, **kw):
        calls.append(kw.get("metric"))
        return orig(*a, **kw)

    monkeypatch.setattr(scoring, "scan_pruned_topk_core", spy)
    monkeypatch.setenv("OTTERS_DISABLE_AOT", "1")  # force a fresh trace path
    rng = np.random.default_rng(5)
    qs = np.abs(rng.normal(size=(2, D))).astype(np.float32)
    k = 9
    r = (
        store.query_batch(qs, metric)
        .meta_filter(col("price").lt(10.0))
        .take(k)
        .collect()
    )
    assert calls and calls[0] is metric, "pruned scan path not used"
    st = store.last_query_stats()
    assert st.evaluated_chunks == st.total_chunks // 2
    mask = price < 10.0
    s = _oracle(qs.astype(np.float64), vecs.astype(np.float64), metric, mask)
    flat = s.reshape(-1)
    if metric is Metric.Jaccard:  # similarity: take_max
        want = np.sort(flat)[::-1][:k]
    else:
        want = np.sort(flat)[:k]
    np.testing.assert_allclose(np.asarray(r.scores), want, rtol=2e-4, atol=2e-4)
    assert all(price[i] < 10.0 for i in r.indices)


def test_vpu_unfiltered_still_matches(store_and_data):
    store, vecs, price = store_and_data
    rng = np.random.default_rng(6)
    qs = np.abs(rng.normal(size=(2, D))).astype(np.float32)
    r = store.query_batch(qs, Metric.Manhattan).take(5).collect()
    s = _oracle(
        qs.astype(np.float64), vecs.astype(np.float64), Metric.Manhattan,
        np.ones(N, bool),
    )
    want = np.sort(s.reshape(-1))[:5]
    np.testing.assert_allclose(np.asarray(r.scores), want, rtol=2e-4, atol=2e-4)


def test_vpu_pruned_scan_sharded():
    """The sharded path prunes VPU metrics per shard too."""
    import otters_tpu.ops.scoring as scoring_mod
    from otters_tpu.parallel import make_mesh

    rng = np.random.default_rng(7)
    n, d, chunk = 65_536 * 4, 8, 8192  # n_local = 32768 = 4 * SCAN_TILE
    vecs = np.abs(rng.normal(size=(n, d))).astype(np.float32)
    price = (np.arange(n) // chunk % 2 * 50.0).astype(np.float64)
    mesh = make_mesh(rows=8, batch=1)
    store = (
        MetaStore.from_columns(
            [Column("price", DataType.Float64).from_values(price)]
        )
        .with_vectors(vecs)
        .with_chunk_size(chunk)
        .build_sharded(mesh)
    )
    qs = np.abs(rng.normal(size=(2, d))).astype(np.float32)
    r = (
        store.query_batch(qs, Metric.Manhattan)
        .meta_filter(col("price").lt(10.0))
        .take(6)
        .collect()
    )
    st = store.last_query_stats()
    assert st.evaluated_chunks == st.total_chunks // 2
    mask = price < 10.0
    s = np.abs(
        qs.astype(np.float64)[:, None, :] - vecs.astype(np.float64)[None, :, :]
    ).sum(-1)
    s = np.where(mask[None, :], s, np.inf)
    want = np.sort(s.reshape(-1))[:6]
    np.testing.assert_allclose(np.asarray(r.scores), want, rtol=2e-4, atol=2e-4)
    assert all(price[i] < 10.0 for i in r.indices)


@pytest.mark.parametrize("trial", range(6))
def test_vpu_pruned_scan_fuzz(trial):
    """Mini-fuzz of the pruned-scan route at route-triggering scale
    (the main differential fuzz pool runs at n<=800, below the
    4*SCAN_TILE threshold): random thresholds/k per trial, exact oracle."""
    rng = np.random.default_rng(100 + trial)
    metric = [Metric.Manhattan, Metric.Hamming, Metric.Jaccard][trial % 3]
    n, d, chunk = 32_768, 8, 1024
    if metric is Metric.Hamming:
        vecs = rng.integers(0, 4, size=(n, d)).astype(np.float32)
        qs = rng.integers(0, 4, size=(2, d)).astype(np.float32)
    else:
        vecs = np.abs(rng.normal(size=(n, d))).astype(np.float32)
        qs = np.abs(rng.normal(size=(2, d))).astype(np.float32)
    base = (np.arange(n) // chunk % 4) * 10.0
    price = base + rng.uniform(0, 5, n)
    store = (
        MetaStore.from_columns(
            [Column("price", DataType.Float64).from_values(price)]
        )
        .with_vectors(vecs)
        .with_chunk_size(chunk)
        .build()
    )
    thr = float(rng.uniform(5, 35))
    expr = col("price").lt(thr) if trial % 2 == 0 else col("price").gt(thr)
    k = int(rng.integers(1, 33))
    r = store.query_batch(qs, metric).meta_filter(expr).take(k).collect()
    mask = (price < thr) if trial % 2 == 0 else (price > thr)
    s = _oracle(qs.astype(np.float64), vecs.astype(np.float64), metric, mask)
    flat = s.reshape(-1)
    if metric is Metric.Jaccard:
        want = np.sort(flat)[::-1][:k]
    else:
        want = np.sort(flat)[:k]
    want = want[np.isfinite(want)]
    assert len(r) == len(want)
    np.testing.assert_allclose(
        np.asarray(r.scores), want, rtol=2e-4, atol=2e-4
    )
    assert all(mask[i] for i in r.indices)


def test_vpu_pruned_scan_skipped_on_unaligned_sharded_store():
    """Round-3 review regression: an UNALIGNED shard() store (chunk axis
    padded separately from rows) must NOT take the per-shard pruned-scan
    route — its local chunk->row mapping is wrong there. Previously a
    Manhattan query with a single-chunk filter silently returned []."""
    from otters_tpu.parallel import ShardedMetaStore, make_mesh

    rng = np.random.default_rng(71)
    n, d, chunk = 70_000, 8, 1000  # lcm(8192, 1000) >> 4*8192 -> unaligned
    vecs = np.abs(rng.normal(size=(n, d))).astype(np.float32)
    price = (np.arange(n) // chunk).astype(np.float64)
    local = (
        MetaStore.from_columns(
            [Column("price", DataType.Float64).from_values(price)]
        )
        .with_vectors(vecs)
        .with_chunk_size(chunk)
        .build()
    )
    mesh = make_mesh(rows=2, batch=4)
    sharded = ShardedMetaStore.shard(local, mesh)
    assert not sharded._pallas_aligned
    q = np.abs(rng.normal(size=(2, d))).astype(np.float32)
    expr = col("price").eq(45.0)  # rows 45000..45999 only
    want = local.query_batch(q, Metric.Manhattan).meta_filter(expr).take(10).collect()
    got = sharded.query_batch(q, Metric.Manhattan).meta_filter(expr).take(10).collect()
    assert len(got) == len(want) == 10
    assert got.indices == want.indices
    np.testing.assert_allclose(got.scores, want.scores, rtol=2e-4, atol=2e-4)
