"""Exact re-rank as a library API (round-2 verdict item 3).

``builder.with_rerank_source(...)`` + ``plan.take(k, rerank_from=k_wide)``
recover the reference's exactness contract (vec_compute.rs:77-294) on top of
approximate bf16/int8 storage: recall@k = 1.0 whenever the true top-k is
contained in the widened candidate set."""

import numpy as np
import pytest

from otters_tpu import Cmp, Column, DataType, Metric, MetaStore, col
from otters_tpu.datasets import synthetic_catalog
from otters_tpu.errors import OttersError
from otters_tpu.evaluate import recall_at_k


def _cosine_oracle(qs, vecs, mask=None):
    qi = 1.0 / np.linalg.norm(qs, axis=1)
    vi = np.linalg.norm(vecs, axis=1)
    vi = np.where(vi > 0, 1.0 / vi, 0.0)
    s = (qs @ vecs.T) * qi[:, None] * vi[None, :]
    if mask is not None:
        s = np.where(mask[None, :], s, -np.inf)
    return s


def test_int8_rerank_recall_is_one():
    vecs, cols = synthetic_catalog(20_000, 64, seed=3)
    store = (
        MetaStore.from_columns(list(cols.values()))
        .with_vectors(vecs)
        .with_chunk_size(512)
        .with_storage_dtype("int8")
        .with_rerank_source(keep_host_f32=True)
        .build()
    )
    rng = np.random.default_rng(0)
    qs = (vecs[:4] + 0.05 * rng.normal(size=(4, 64))).astype(np.float32)
    res = store.query_batch(qs, Metric.Cosine).take(10, rerank_from=200).collect()
    assert len(res) == 10
    s = _cosine_oracle(qs, vecs)
    flat = s.reshape(-1)
    want_rows = (np.argsort(-flat, kind="stable")[:10] % vecs.shape[0]).tolist()
    assert recall_at_k(want_rows, res.indices) == 1.0
    want_scores = np.sort(flat)[::-1][:10]
    np.testing.assert_allclose(
        np.asarray(res.scores), want_scores, rtol=1e-5, atol=1e-6
    )


def test_rerank_with_meta_filter_and_sorted_store():
    """Rerank composes with filters and with_z_order (index_map remapping):
    returned ids are ORIGINAL ingestion-order ids and exactly the filtered
    f32 top-k."""
    vecs, cols = synthetic_catalog(12_000, 32, seed=5)
    store = (
        MetaStore.from_columns(list(cols.values()))
        .with_vectors(vecs)
        .with_chunk_size(256)
        .with_storage_dtype("int8")
        .with_z_order(["category", "price"])
        .with_rerank_source(keep_host_f32=True)
        .build()
    )
    rng = np.random.default_rng(1)
    qs = (vecs[:3] + 0.05 * rng.normal(size=(3, 32))).astype(np.float32)
    expr = col("category").eq("electronics")
    res = (
        store.query_batch(qs, Metric.Cosine)
        .meta_filter(expr)
        .take(5, rerank_from=100)
        .collect()
    )
    cat = cols["category"]
    nulls = np.asarray(cat.null_mask(), dtype=bool)
    mask = np.array(
        [(not nulls[i]) and v == "electronics" for i, v in enumerate(cat.values())]
    )
    s = _cosine_oracle(qs, vecs, mask)
    flat = s.reshape(-1)
    want_rows = (np.argsort(-flat, kind="stable")[:5] % vecs.shape[0]).tolist()
    assert recall_at_k(want_rows, res.indices) == 1.0
    np.testing.assert_allclose(
        np.asarray(res.scores), np.sort(flat)[::-1][:5], rtol=1e-5, atol=1e-6
    )
    assert all(mask[i] for i in res.indices)


def test_rerank_fetch_vectors_callable():
    """fetch_vectors receives ORIGINAL row ids and supplies the true rows."""
    rng = np.random.default_rng(2)
    n, d = 5_000, 48
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    calls = []

    def fetch(ids):
        calls.append(np.asarray(ids))
        return vecs[np.asarray(ids, dtype=np.int64)]

    store = (
        MetaStore.from_columns([])
        .with_vectors(vecs)
        .with_storage_dtype("bfloat16")
        .with_rerank_source(fetch_vectors=fetch)
        .build()
    )
    q = vecs[7] + 0.01 * rng.normal(size=d).astype(np.float32)
    res = store.query(q, Metric.Cosine).take(3, rerank_from=64).collect()
    assert calls and len(res) == 3
    s = _cosine_oracle(q[None, :].astype(np.float32), vecs)
    want = np.argsort(-s[0], kind="stable")[:3].tolist()
    assert res.indices == want


def test_rerank_vec_filter_reapplied_on_exact_scores():
    rng = np.random.default_rng(4)
    n, d = 4_000, 32
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    store = (
        MetaStore.from_columns([])
        .with_vectors(vecs)
        .with_storage_dtype("int8")
        .with_rerank_source(keep_host_f32=True)
        .build()
    )
    q = rng.normal(size=d).astype(np.float32)
    thr = 0.35
    res = (
        store.query(q, Metric.Cosine)
        .vec_filter(thr, Cmp.Gt)
        .take(50, rerank_from=500)
        .collect()
    )
    assert all(s > thr for s in res.scores)
    s = _cosine_oracle(q[None, :], vecs)[0]
    want = np.sort(s[s > thr])[::-1][:50]
    np.testing.assert_allclose(
        np.asarray(res.scores), want[: len(res)], rtol=1e-5, atol=1e-6
    )


def test_rerank_error_paths():
    rng = np.random.default_rng(6)
    vecs = rng.normal(size=(100, 8)).astype(np.float32)
    store = MetaStore.from_columns([]).with_vectors(vecs).build()
    q = vecs[0]
    with pytest.raises(OttersError, match="rerank_from"):
        store.query(q, Metric.Cosine).take(10, rerank_from=5)
    plan = store.query(q, Metric.Cosine).take(5, rerank_from=20)
    with pytest.raises(OttersError, match="with_rerank_source"):
        plan.collect()
    builder = MetaStore.from_columns([]).with_vectors(vecs)
    with pytest.raises(OttersError, match="exactly one"):
        builder.with_rerank_source()
    with pytest.raises(OttersError, match="exactly one"):
        builder.with_rerank_source(fetch_vectors=lambda i: i, keep_host_f32=True)
    # pre-built DeviceVecs cannot keep a host f32 copy
    from otters_tpu.ops import scoring

    dv = scoring.materialize(vecs, dtype=__import__("jax.numpy", fromlist=["int8"]).int8)
    with pytest.raises(OttersError, match="keep_host_f32"):
        (
            MetaStore.from_columns([])
            .with_vectors(dv, n_rows=100)
            .with_rerank_source(keep_host_f32=True)
            .build()
        )


def test_resolve_batches_rerank_fetch_one_call(monkeypatch):
    """resolve() must fetch rerank vectors ONCE for all in-flight queries
    (per-pending fetches would pay a device roundtrip each)."""
    from otters_tpu.meta import resolve

    # pin the default single-unit contract (a positive OTTERS_RESOLVE_
    # GROUP_MAX intentionally splits the group; see the chunked test below)
    monkeypatch.delenv("OTTERS_RESOLVE_GROUP_MAX", raising=False)

    rng = np.random.default_rng(11)
    n, d = 4_000, 32
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    calls = []

    def fetch(ids):
        calls.append(len(ids))
        return vecs[np.asarray(ids, dtype=np.int64)]

    store = (
        MetaStore.from_columns([])
        .with_vectors(vecs)
        .with_storage_dtype("int8")
        .with_rerank_source(fetch_vectors=fetch)
        .build()
    )
    qs = [rng.normal(size=(2, d)).astype(np.float32) for _ in range(4)]
    pend = [
        store.query_batch(q, Metric.Cosine).take(5, rerank_from=40).collect_async()
        for q in qs
    ]
    results = resolve(pend)
    assert len(calls) == 1, calls
    # equality with the sequential path
    calls.clear()
    for q, r in zip(qs, results):
        want = (
            store.query_batch(q, Metric.Cosine).take(5, rerank_from=40).collect()
        )
        assert r.indices == want.indices
        np.testing.assert_allclose(r.scores, want.scores, rtol=1e-6)


def test_resolve_device_rerank_engages_and_matches_host():
    """The batched device rerank runs for compatible groups (one dispatch
    per resolve) and agrees with the host exact_rerank path."""
    from otters_tpu.meta import resolve

    rng = np.random.default_rng(13)
    n, d = 6_000, 32
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    store = (
        MetaStore.from_columns([])
        .with_vectors(vecs)
        .with_storage_dtype("int8")
        .with_rerank_source(keep_host_f32=True)
        .build()
    )
    qs = [rng.normal(size=(3, d)).astype(np.float32) for _ in range(5)]
    pend = [
        store.query_batch(q, Metric.Cosine).take(7, rerank_from=50).collect_async()
        for q in qs
    ]
    results = resolve(pend)
    assert all(p._device_rerank is not None for p in pend)
    for q, r in zip(qs, results):
        want = (
            store.query_batch(q, Metric.Cosine).take(7, rerank_from=50).collect()
        )
        assert r.indices == want.indices
        np.testing.assert_allclose(r.scores, want.scores, rtol=1e-5, atol=1e-6)


def test_resolve_device_rerank_vpu_metric_falls_back():
    """VPU metrics (no batched matmul form) use the host prefetch path."""
    from otters_tpu.meta import resolve

    rng = np.random.default_rng(14)
    n, d = 3_000, 16
    vecs = np.abs(rng.normal(size=(n, d))).astype(np.float32)
    store = (
        MetaStore.from_columns([])
        .with_vectors(vecs)
        .with_storage_dtype("bfloat16")
        .with_rerank_source(keep_host_f32=True)
        .build()
    )
    qs = [np.abs(rng.normal(size=(2, d))).astype(np.float32) for _ in range(3)]
    pend = [
        store.query_batch(q, Metric.Manhattan)
        .take(4, rerank_from=32)
        .collect_async()
        for q in qs
    ]
    results = resolve(pend)
    assert all(p._device_rerank is None for p in pend)
    assert all(p._rerank_prefetch is not None for p in pend)
    for q, r in zip(qs, results):
        want = (
            store.query_batch(q, Metric.Manhattan)
            .take(4, rerank_from=32)
            .collect()
        )
        assert r.indices == want.indices
        np.testing.assert_allclose(r.scores, want.scores, rtol=1e-4, atol=1e-4)


def test_resolve_device_rerank_with_vec_filter_and_zorder():
    from otters_tpu.meta import resolve

    vecs, cols = synthetic_catalog(8_000, 32, seed=9)
    store = (
        MetaStore.from_columns(list(cols.values()))
        .with_vectors(vecs)
        .with_chunk_size(256)
        .with_storage_dtype("int8")
        .with_z_order(["category", "price"])
        .with_rerank_source(keep_host_f32=True)
        .build()
    )
    rng = np.random.default_rng(15)
    qs = [
        (vecs[i] + 0.05 * rng.normal(size=(32,))).astype(np.float32)[None, :]
        for i in range(4)
    ]
    mk = lambda q: (
        store.query_batch(q, Metric.Cosine)
        .meta_filter(col("category").eq("electronics"))
        .vec_filter(0.2, Cmp.Gt)
        .take(5, rerank_from=64)
    )
    results = resolve([mk(q).collect_async() for q in qs])
    for q, r in zip(qs, results):
        want = mk(q).collect()
        assert r.indices == want.indices
        np.testing.assert_allclose(r.scores, want.scores, rtol=1e-5, atol=1e-6)
        assert all(s > 0.2 for s in r.scores)


def test_resolve_mixed_groups_in_one_call():
    """One resolve() with heterogeneous plans: different k/rerank widths,
    filtered and unfiltered, plus a no-rerank plan — groups split correctly
    and every result matches its sequential counterpart."""
    from otters_tpu.meta import resolve

    vecs, cols = synthetic_catalog(6_000, 16, seed=21)
    store = (
        MetaStore.from_columns(list(cols.values()))
        .with_vectors(vecs)
        .with_chunk_size(256)
        .with_storage_dtype("int8")
        .with_rerank_source(keep_host_f32=True)
        .build()
    )
    rng = np.random.default_rng(22)
    q = rng.normal(size=(2, 16)).astype(np.float32)
    makers = [
        lambda: store.query_batch(q, Metric.Cosine).take(5, rerank_from=40),
        lambda: store.query_batch(q, Metric.Cosine).take(9, rerank_from=64),
        lambda: (
            store.query_batch(q, Metric.Cosine)
            .meta_filter(col("category").eq("electronics"))
            .take(5, rerank_from=40)
        ),
        lambda: store.query_batch(q, Metric.Cosine).take(5),  # no rerank
        lambda: store.query_batch(q, Metric.Cosine).take(5, rerank_from=40),
    ]
    results = resolve([m().collect_async() for m in makers])
    for m, r in zip(makers, results):
        want = m().collect()
        assert r.indices == want.indices
        np.testing.assert_allclose(r.scores, want.scores, rtol=1e-5, atol=1e-6)


def _head_vals(c, m):
    """First m values of a Column as push()-able Python values."""
    vm = c.values()
    nm = np.asarray(c.null_mask(), dtype=bool)
    out = []
    for i in range(m):
        if nm[i]:
            out.append(None)
        else:
            v = vm[i]
            out.append(v.item() if hasattr(v, "item") else v)
    return out


def test_append_preserves_keep_host_f32_rerank():
    """append on a keep_host_f32 store re-sources TRUE f32 rows for the
    rebuilt snapshot (NOT the quantized int8 codes), so the exactness
    contract survives appends."""
    vecs, cols = synthetic_catalog(6_000, 32, seed=7)
    store = (
        MetaStore.from_columns(list(cols.values()))
        .with_vectors(vecs)
        .with_chunk_size(256)
        .with_storage_dtype("int8")
        .with_rerank_source(keep_host_f32=True)
        .build()
    )
    rng = np.random.default_rng(2)
    dead = rng.choice(6_000, size=500, replace=False).tolist()
    store.delete_rows(dead)
    m = 400
    new_vecs = rng.normal(size=(m, 32)).astype(np.float32)
    new_vals = {name: _head_vals(c, m) for name, c in cols.items()}
    st2 = store.append(new_vecs, new_vals)
    keep = np.ones(6_000, dtype=bool)
    keep[dead] = False
    combined = np.concatenate([vecs[keep], new_vecs], axis=0)
    # the carried snapshot holds the TRUE f32 rows, bit-exact
    ids = np.arange(combined.shape[0], dtype=np.int64)
    np.testing.assert_array_equal(st2._rerank_fetch(ids), combined)
    qs = (combined[:3] + 0.05 * rng.normal(size=(3, 32))).astype(np.float32)
    res = st2.query_batch(qs, Metric.Cosine).take(10, rerank_from=200).collect()
    s = _cosine_oracle(qs, combined)
    flat = s.reshape(-1)
    want = np.argsort(-flat, kind="stable")[:10]
    want_rows = (want % combined.shape[0]).tolist()
    assert recall_at_k(want_rows, res.indices) == 1.0
    np.testing.assert_allclose(
        np.asarray(res.scores), np.sort(flat)[::-1][:10], rtol=1e-5, atol=1e-6
    )


def test_append_with_fetch_rerank_raises():
    """A fetch_vectors rerank source cannot survive append (ids change
    under compaction; the fetch knows nothing of the new rows) — append
    raises with guidance instead of silently dropping exactness."""
    vecs, cols = synthetic_catalog(2_000, 16, seed=9)
    store = (
        MetaStore.from_columns(list(cols.values()))
        .with_vectors(vecs)
        .with_chunk_size(256)
        .with_storage_dtype("int8")
        .with_rerank_source(fetch_vectors=lambda ids: vecs[np.asarray(ids)])
        .build()
    )
    new_vals = {name: _head_vals(c, 1) for name, c in cols.items()}
    with pytest.raises(OttersError, match="fetch"):
        store.append(vecs[:1], new_vals)


def test_resolve_group_max_chunks_match_sequential(monkeypatch):
    """OTTERS_RESOLVE_GROUP_MAX splits a compatible group into dispatch
    units (one rerank fetch each, pipelined against later scans) without
    changing any result."""
    from otters_tpu.meta import resolve

    monkeypatch.setenv("OTTERS_RESOLVE_GROUP_MAX", "3")
    rng = np.random.default_rng(12)
    n, d = 4_000, 32
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    calls = []

    def fetch(ids):
        calls.append(len(ids))
        return vecs[np.asarray(ids, dtype=np.int64)]

    store = (
        MetaStore.from_columns([])
        .with_vectors(vecs)
        .with_storage_dtype("int8")
        .with_rerank_source(fetch_vectors=fetch)
        .build()
    )
    qs = [rng.normal(size=(2, d)).astype(np.float32) for _ in range(7)]
    pend = [
        store.query_batch(q, Metric.Cosine)
        .take(5, rerank_from=40)
        .collect_async()
        for q in qs
    ]
    results = resolve(pend)
    assert len(calls) == 3, calls  # ceil(7 / 3) units, one fetch each
    calls.clear()
    monkeypatch.delenv("OTTERS_RESOLVE_GROUP_MAX")
    for q, r in zip(qs, results):
        want = (
            store.query_batch(q, Metric.Cosine)
            .take(5, rerank_from=40)
            .collect()
        )
        assert r.indices == want.indices
        np.testing.assert_allclose(r.scores, want.scores, rtol=1e-6)
