"""Persistence round-trip tests (save/load)."""

import numpy as np

from otters_tpu import Cmp, Column, DataType, Metric, MetaStore, VecStore, col


def test_vecstore_roundtrip(tmp_path):
    rng = np.random.default_rng(31)
    store = VecStore(16)
    store.add_vectors(rng.normal(size=(100, 16)).astype(np.float32))
    path = str(tmp_path / "vec.npz")
    store.save(path)
    loaded = VecStore.load(path)
    assert len(loaded) == 100 and loaded.dim == 16
    q = rng.normal(size=16).astype(np.float32)
    a = store.query(q, Metric.Cosine).take(5).collect()
    b = loaded.query(q, Metric.Cosine).take(5).collect()
    assert [r.index for r in a] == [r.index for r in b]
    assert [r.score for r in a] == [r.score for r in b]


def test_metastore_roundtrip(tmp_path):
    rng = np.random.default_rng(32)
    n, d = 500, 24
    cols = [
        Column("name", DataType.String).from_values(
            [f"item_{i}" if i % 7 else None for i in range(n)]
        ),
        Column("price", DataType.Float64).from_values(
            [float(i % 90) if i % 5 else None for i in range(n)]
        ),
        Column("ver", DataType.Int64).from_values([2**40 + i for i in range(n)]),
        Column("when", DataType.DateTime).from_values(
            [f"2024-0{(i % 9) + 1}-11" for i in range(n)]
        ),
        Column("w", DataType.Float32).from_values(list(rng.uniform(0, 1, n))),
        Column("c", DataType.Int32).from_values([i % 13 for i in range(n)]),
    ]
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    store = (
        MetaStore.from_columns(cols)
        .with_vectors(vectors)
        .with_chunk_size(128)
        .with_bloom_bits(512)
        .build()
    )
    path = str(tmp_path / "meta.npz")
    store.save(path)
    loaded = MetaStore.load(path)
    assert loaded.n_rows == n
    assert loaded.chunk_size() == 128
    assert loaded.schema() == store.schema()

    q = rng.normal(size=d).astype(np.float32)
    expr = (
        col("price").lt(40.0)
        & col("name").neq("item_3")
        & col("when").gte("2024-02-01")
    )
    a = (
        store.query(q, Metric.Cosine)
        .meta_filter(expr)
        .vec_filter(-1.0, Cmp.Gt)
        .take(12)
        .collect()
    )
    b = (
        loaded.query(q, Metric.Cosine)
        .meta_filter(expr)
        .vec_filter(-1.0, Cmp.Gt)
        .take(12)
        .collect()
    )
    assert a.indices == b.indices
    assert a.scores == b.scores
    sa = store.last_query_stats()
    sb = loaded.last_query_stats()
    assert sa.evaluated_chunks == sb.evaluated_chunks
    # materialized nulls survive the round trip
    assert (
        a.column("price").null_mask().tolist()
        == b.column("price").null_mask().tolist()
    )
