"""int8 quantized cosine storage (reference roadmap: vector quantization)."""

import numpy as np
import pytest

from otters_tpu import Metric, MetaStore, OttersError, VecStore
from otters_tpu.evaluate import mean_recall_at_k, recall_at_k


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(101)
    vectors = rng.normal(size=(3000, 64)).astype(np.float32)
    queries = rng.normal(size=(10, 64)).astype(np.float32)
    return vectors, queries


def test_int8_cosine_high_recall(data):
    vectors, queries = data
    exact = VecStore(64)
    exact.add_vectors(vectors)
    quant = VecStore(64, dtype="int8")
    quant.add_vectors(vectors)

    exact_lists, approx_lists = [], []
    for q in queries:
        e = exact.query(q, Metric.Cosine).take(10).collect()
        a = quant.query(q, Metric.Cosine).take(10).collect()
        exact_lists.append([r.index for r in e])
        approx_lists.append([r.index for r in a])
    r = mean_recall_at_k(exact_lists, approx_lists)
    assert r >= 0.8, f"int8 recall@10 too low: {r}"
    # top-1 should essentially always survive quantization
    top1 = mean_recall_at_k([e[:1] for e in exact_lists], [a[:3] for a in approx_lists])
    assert top1 == 1.0


def test_int8_meta_store_and_metric_guard(data):
    vectors, queries = data
    store = (
        MetaStore.from_columns([])
        .with_vectors(vectors)
        .with_storage_dtype("int8")
        .build()
    )
    r = store.query(queries[0], Metric.Cosine).take(5).collect()
    assert len(r) == 5
    with pytest.raises(OttersError, match="Cosine metric only"):
        store.query(queries[0], Metric.Euclidean).take(5).collect()
    with pytest.raises(OttersError, match="Cosine metric only"):
        vs = VecStore(64, dtype="int8")
        vs.add_vectors(vectors)
        vs.query(queries[0], Metric.DotProduct).take(5).collect()


def test_int8_save_load_identical(data, tmp_path):
    """Re-quantizing quantized rows is the identity (row max maps to 127),
    so int8 stores round-trip to IDENTICAL results."""
    vectors, queries = data
    store = (
        MetaStore.from_columns([])
        .with_vectors(vectors)
        .with_storage_dtype("int8")
        .build()
    )
    path = str(tmp_path / "q.npz")
    store.save(path)
    loaded = MetaStore.load(path)
    a = store.query(queries[0], Metric.Cosine).take(10).collect()
    b = loaded.query(queries[0], Metric.Cosine).take(10).collect()
    assert a.indices == b.indices
    assert a.scores == b.scores


def test_recall_helpers():
    assert recall_at_k([1, 2, 3], [3, 2, 9]) == pytest.approx(2 / 3)
    assert recall_at_k([], []) == 1.0
    assert mean_recall_at_k([[1], [2]], [[1], [3]]) == 0.5


def test_materialize_int8_slabs_matches_direct():
    """Slab-wise ingest must produce the same quantized store as one-shot."""
    import jax.numpy as jnp

    from otters_tpu.ops import scoring

    rng = np.random.default_rng(91)
    n, d = 2500, 32
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    n_pad = scoring.pad_rows(n)
    full = np.zeros((n_pad, d), np.float32)
    full[:n] = vecs

    def slab_fn(start, rows):
        return full[start : start + rows]

    dv_slab = scoring.materialize_int8_slabs(slab_fn, n, d, slab_rows=1000)
    dv_direct = scoring.materialize(vecs, dtype=jnp.int8)
    np.testing.assert_array_equal(
        np.asarray(dv_slab.vectors), np.asarray(dv_direct.vectors)
    )
    np.testing.assert_allclose(
        np.asarray(dv_slab.norms_sq), np.asarray(dv_direct.norms_sq)
    )
    np.testing.assert_array_equal(
        np.asarray(dv_slab.valid), np.asarray(dv_direct.valid)
    )


def test_int8_widen_and_exact_rerank_recall_1():
    """int8 candidates widened to k'=10k then f32-re-ranked must recover the
    exact top-k (the 10M north-star recipe at toy scale)."""
    from otters_tpu.evaluate import exact_rerank
    from otters_tpu.ops import scoring

    import jax.numpy as jnp

    rng = np.random.default_rng(92)
    n, d, k, k_wide = 5000, 64, 10, 100
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(4, d)).astype(np.float32)
    dv8 = scoring.materialize(vecs, dtype=jnp.int8)
    rows, _, ok = scoring.run_vec_topk(
        dv8, q, Metric.Cosine, k_wide, take_min=False, cmp=None, thr=None
    )
    cand = [int(r) for r, o in zip(rows, ok) if o]
    got_rows, got_scores = exact_rerank(
        q, cand, lambda idx: vecs[np.asarray(idx)], Metric.Cosine, k
    )
    # exact oracle
    qi = 1 / np.linalg.norm(q, axis=1)
    vi = 1 / np.linalg.norm(vecs, axis=1)
    s = (q @ vecs.T) * qi[:, None] * vi[None, :]
    flat = np.sort(s.reshape(-1))[::-1][:k]
    want_rows = (np.argsort(-s.reshape(-1), kind="stable")[:k] % n).tolist()
    assert got_rows == want_rows
    np.testing.assert_allclose(got_scores, flat, rtol=1e-5, atol=1e-6)


def test_builder_adopts_prebuilt_devicevecs():
    from otters_tpu import Column, DataType, col
    from otters_tpu.ops import scoring

    import jax.numpy as jnp

    rng = np.random.default_rng(93)
    n, d = 3000, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    dv8 = scoring.materialize(vecs, dtype=jnp.int8)
    tag = Column("tag", DataType.Int32).from_values(
        np.arange(n, dtype=np.int32) % 7
    )
    store = (
        MetaStore.from_columns([tag])
        .with_vectors(dv8, n_rows=n)
        .with_chunk_size(256)
        .build()
    )
    assert store._storage_dtype == "int8"
    q = rng.normal(size=(2, d)).astype(np.float32)
    r = (
        store.query_batch(q, Metric.Cosine)
        .meta_filter(col("tag").eq(3))
        .take(5)
        .collect()
    )
    assert len(r) == 5
    assert all(i % 7 == 3 for i in r.indices)
    # n_rows is required for pre-built vecs
    with pytest.raises(OttersError, match="requires n_rows"):
        MetaStore.from_columns([]).with_vectors(dv8).build()
