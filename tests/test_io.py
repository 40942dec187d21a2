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


def test_keep_host_f32_rerank_survives_roundtrip(tmp_path):
    """A keep_host_f32 rerank source is serialized (the TRUE f32 rows are
    the saved payload) and restored on load: int8 exact-rerank recall
    survives persistence, including under z-order clustering."""
    from otters_tpu.datasets import synthetic_catalog

    vecs, cols = synthetic_catalog(4_000, 32, seed=13)
    store = (
        MetaStore.from_columns(list(cols.values()))
        .with_vectors(vecs)
        .with_chunk_size(256)
        .with_storage_dtype("int8")
        .with_z_order(["category", "price"])
        .with_rerank_source(keep_host_f32=True)
        .build()
    )
    path = str(tmp_path / "rerank.npz")
    store.save(path)
    loaded = MetaStore.load(path)
    ids = np.arange(4_000, dtype=np.int64)
    # the snapshot holds the TRUE f32 rows, bit-exact, in original order
    np.testing.assert_array_equal(loaded._rerank_fetch(ids), vecs)
    # and the rebuilt int8 codes are identical (quantized from the same f32)
    np.testing.assert_array_equal(
        np.asarray(loaded._dv.vectors), np.asarray(store._dv.vectors)
    )
    rng = np.random.default_rng(3)
    q = (vecs[7] + 0.05 * rng.normal(size=32)).astype(np.float32)
    a = store.query(q, Metric.Cosine).take(10, rerank_from=100).collect()
    b = loaded.query(q, Metric.Cosine).take(10, rerank_from=100).collect()
    assert a.indices == b.indices
    np.testing.assert_allclose(a.scores, b.scores, rtol=1e-6)


def test_fetch_rerank_not_serialized(tmp_path):
    """A fetch_vectors rerank source cannot be saved: the loaded store has
    no rerank source and take(rerank_from=...) raises the standard
    guidance error instead of silently mis-scoring."""
    import pytest

    from otters_tpu.errors import OttersError

    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(300, 16)).astype(np.float32)
    store = (
        MetaStore.from_columns(
            [Column("p", DataType.Float64).from_values([1.0] * 300)]
        )
        .with_vectors(vecs)
        .with_storage_dtype("int8")
        .with_rerank_source(fetch_vectors=lambda i: vecs[np.asarray(i)])
        .build()
    )
    path = str(tmp_path / "fetch.npz")
    store.save(path)
    loaded = MetaStore.load(path)
    assert loaded._rerank_fetch is None
    q = rng.normal(size=16).astype(np.float32)
    with pytest.raises(OttersError, match="rerank"):
        loaded.query(q, Metric.Cosine).take(5, rerank_from=50).collect()


def test_load_onto_mesh_direct_sharded(tmp_path):
    """MetaStore.load(path, mesh=...) rebuilds by direct sharded ingest:
    the loaded store is a ShardedMetaStore with row-sharded leaves and
    query parity with the single-device reload — including a sharded
    save -> sharded reload roundtrip that never forms the store on one
    device."""
    from otters_tpu.parallel import ShardedMetaStore, make_mesh

    rng = np.random.default_rng(41)
    n, d = 3_000, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    cols = [
        Column("price", DataType.Float64).from_values(
            [float(i % 97) for i in range(n)]
        ),
        Column("tag", DataType.String).from_values(
            [f"t{i % 7}" for i in range(n)]
        ),
    ]
    mesh = make_mesh(rows=4, batch=2)
    sharded = (
        MetaStore.from_columns(cols)
        .with_vectors(vecs)
        .with_chunk_size(128)
        .build_sharded(mesh)
    )
    sharded.delete_rows([3, 44, 555])
    path = str(tmp_path / "sharded.npz")
    sharded.save(path)

    # sharded reload: straight back onto the mesh
    re_sh = MetaStore.load(path, mesh=mesh)
    assert isinstance(re_sh, ShardedMetaStore)
    n_pad = re_sh._dv.vectors.shape[0]
    assert re_sh._dv.vectors.sharding.shard_shape((n_pad, d))[0] == n_pad // 4
    assert len(re_sh) == n - 3

    re_single = MetaStore.load(path)
    q = rng.normal(size=(2, d)).astype(np.float32)
    expr = col("price").lt(30.0) & col("tag").eq("t2")
    a = (
        re_sh.query_batch(q, Metric.Cosine)
        .meta_filter(expr)
        .take(8)
        .collect()
    )
    b = (
        re_single.query_batch(q, Metric.Cosine)
        .meta_filter(expr)
        .take(8)
        .collect()
    )
    assert a.indices == b.indices
    np.testing.assert_allclose(a.scores, b.scores, rtol=1e-5, atol=1e-5)
    assert 3 not in a.indices and 44 not in a.indices
