"""Direct sharded ingest + build (round-3): the store is placed straight
into per-shard HBM — it never exists on one device — and queries agree
exactly with the single-device oracle."""

import numpy as np
import pytest

import jax

from otters_tpu import Cmp, Column, DataType, Metric, MetaStore, col
from otters_tpu.errors import OttersError
from otters_tpu.parallel import (
    make_mesh,
    materialize_int8_slabs_sharded,
    sharded_geometry,
)

N, D, CHUNK = 20_000, 32, 512
ROWS_SHARDS = 4


def _columns(n, rng):
    price = [None if i % 53 == 0 else float(rng.uniform(0, 100)) for i in range(n)]
    version = (np.arange(n) % 7).astype(np.int32)
    tag = [f"t{i % 37}" for i in range(n)]
    when = [f"202{(i % 4)}-0{(i % 9) + 1}-15" for i in range(n)]
    flag = [None if i % 29 == 0 else (i % 2 == 0) for i in range(n)]
    count = (np.arange(n, dtype=np.int64) * 3_000_000_000) % (1 << 40)
    weight = rng.normal(size=n).astype(np.float32)
    return [
        Column("price", DataType.Float64).from_values(price),
        Column("version", DataType.Int32).from_values(version),
        Column("tag", DataType.String).from_values(tag),
        Column("when", DataType.DateTime).from_values(when),
        Column("flag", DataType.Bool).from_values(flag),
        Column("count", DataType.Int64).from_values(count),
        Column("weight", DataType.Float32).from_values(weight),
    ]


@pytest.fixture(scope="module")
def stores():
    rng = np.random.default_rng(31)
    vectors = rng.normal(size=(N, D)).astype(np.float32)
    cols = _columns(N, rng)
    local = (
        MetaStore.from_columns(cols)
        .with_vectors(vectors)
        .with_chunk_size(CHUNK)
        .build()
    )
    mesh = make_mesh(rows=ROWS_SHARDS, batch=2)
    sharded = (
        MetaStore.from_columns(cols)
        .with_vectors(vectors)
        .with_chunk_size(CHUNK)
        .build_sharded(mesh)
    )
    return local, sharded, vectors, cols


def _row_shards(arr):
    """Number of distinct blocks the first axis is split into."""
    return arr.shape[0] // arr.sharding.shard_shape(arr.shape)[0]


def test_every_array_is_placed_sharded(stores):
    """The capacity contract: every row/chunk-axis array is split across
    the 'rows' axis — no leaf ever holds the whole store on one device."""
    _, sharded, _, _ = stores
    n_pad_s, n_chunks_s, _ = sharded_geometry(N, CHUNK, ROWS_SHARDS)
    dv = sharded._dv
    assert dv.vectors.shape[0] == n_pad_s
    for arr in (dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid):
        assert _row_shards(arr) == ROWS_SHARDS, arr.sharding
    assert _row_shards(sharded._chunk_lens) == ROWS_SHARDS
    assert sharded._chunk_lens.shape[0] == n_chunks_s
    for name, colarrs in sharded._device_cols.items():
        for key, arr in colarrs.items():
            assert _row_shards(arr) == ROWS_SHARDS, (name, key, arr.sharding)


def _check(local, sharded, plan_fn):
    want = plan_fn(local).collect()
    got = plan_fn(sharded).collect()
    assert got.indices == want.indices
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-5, atol=1e-5)
    return want, got


def test_build_sharded_query_parity(stores):
    local, sharded, _, _ = stores
    rng = np.random.default_rng(2)
    qs = rng.normal(size=(4, D)).astype(np.float32)

    _check(local, sharded, lambda s: s.query_batch(qs, Metric.Cosine).take(12))
    _check(
        local, sharded,
        lambda s: s.query_batch(qs, Metric.DotProduct)
        .meta_filter(col("price").lt(30.0) & col("when").gte("2022-01-01"))
        .take(20),
    )
    _check(
        local, sharded,
        lambda s: s.query_batch(qs, Metric.Cosine)
        .meta_filter(col("tag").eq("t5") | col("tag").eq("t11"))
        .take(15),
    )
    _check(
        local, sharded,
        lambda s: s.query_batch(qs, Metric.Cosine)
        .meta_filter(
            (col("flag").eq(True) | col("price").is_null())
            & col("count").gt(1 << 33)
        )
        .take(10),
    )
    _check(
        local, sharded,
        lambda s: s.query_batch(qs, Metric.Cosine)
        .meta_filter(col("tag").contains("t1") & ~col("version").eq(3))
        .take(10),
    )
    w, g = _check(
        local, sharded,
        lambda s: s.query_batch(qs, Metric.Euclidean)
        .vec_filter(float(D) * 2.2, Cmp.Lt)
        .take(25),
    )
    assert len(g) > 0


def test_build_sharded_stats_parity(stores):
    local, sharded, _, _ = stores
    rng = np.random.default_rng(3)
    qs = rng.normal(size=(2, D)).astype(np.float32)
    expr = col("version").eq(2)
    for s in (local, sharded):
        s.query_batch(qs, Metric.Cosine).meta_filter(expr).take(5).collect()
    ws, gs = local.last_query_stats(), sharded.last_query_stats()
    assert gs.evaluated_chunks == ws.evaluated_chunks
    assert gs.total_chunks == ws.total_chunks
    assert gs.vectors_compared == ws.vectors_compared


def test_build_sharded_zorder_and_rerank():
    rng = np.random.default_rng(5)
    n, d = 6_000, 16
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    price = rng.uniform(0, 100, n)
    cat = [f"c{i % 5}" for i in range(n)]
    cols = [
        Column("price", DataType.Float64).from_values(price),
        Column("cat", DataType.String).from_values(cat),
    ]
    mesh = make_mesh(rows=4, batch=2)
    build = lambda b: (
        b.with_chunk_size(512)
        .with_z_order(["cat", "price"])
        .with_storage_dtype("int8")
        .with_rerank_source(keep_host_f32=True)
    )
    local = build(
        MetaStore.from_columns(cols).with_vectors(vectors)
    ).build()
    sharded = build(
        MetaStore.from_columns(cols).with_vectors(vectors)
    ).build_sharded(mesh)
    qs = rng.normal(size=(3, d)).astype(np.float32)
    expr = col("cat").eq("c2") & col("price").between(10.0, 60.0)
    want = (
        local.query_batch(qs, Metric.Cosine).meta_filter(expr)
        .take(8, rerank_from=64).collect()
    )
    got = (
        sharded.query_batch(qs, Metric.Cosine).meta_filter(expr)
        .take(8, rerank_from=64).collect()
    )
    # ids are ORIGINAL ingestion-order ids on both paths; rerank is exact f32
    assert got.indices == want.indices
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-5, atol=1e-6)
    assert all(cat[i] == "c2" and 10.0 <= price[i] <= 60.0 for i in got.indices)


def test_sharded_int8_slab_ingest():
    rng = np.random.default_rng(6)
    n, d, chunk = 40_000, 16, 1024
    full = rng.normal(size=(n + 8192, d)).astype(np.float32)

    def slab_fn(start, rows):
        return full[start : start + rows]

    mesh = make_mesh(rows=4, batch=2)
    dv = materialize_int8_slabs_sharded(slab_fn, n, d, 8192, mesh, chunk)
    n_pad_s, _, _ = sharded_geometry(n, chunk, 4)
    assert dv.vectors.shape == (n_pad_s, d)
    assert _row_shards(dv.vectors) == 4
    assert _row_shards(dv.norms_sq) == 4
    price = (np.arange(n) % 100).astype(np.float64)
    cols = [Column("price", DataType.Float64).from_values(price)]
    store = (
        MetaStore.from_columns(cols)
        .with_vectors(dv, n_rows=n)
        .with_chunk_size(chunk)
        .build_sharded(mesh)
    )
    assert store._storage_dtype == "int8"
    # oracle: single-device int8 store over the same rows
    local = (
        MetaStore.from_columns(cols)
        .with_vectors(full[:n])
        .with_chunk_size(chunk)
        .with_storage_dtype("int8")
        .build()
    )
    qs = rng.normal(size=(2, d)).astype(np.float32)
    expr = col("price").lt(50.0)
    want = local.query_batch(qs, Metric.Cosine).meta_filter(expr).take(10).collect()
    got = store.query_batch(qs, Metric.Cosine).meta_filter(expr).take(10).collect()
    assert got.indices == want.indices
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-5, atol=1e-5)


def test_build_sharded_error_paths():
    mesh = make_mesh(rows=4, batch=2)
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(100, 8)).astype(np.float32)
    with pytest.raises(OttersError, match="chunk size"):
        (
            MetaStore.from_columns([])
            .with_vectors(vecs)
            .with_chunk_size(3000)
            .build_sharded(mesh)
        )
    from otters_tpu.ops import scoring

    dv = scoring.materialize(vecs)  # single-device padding: wrong geometry
    with pytest.raises(OttersError, match="padded rows"):
        (
            MetaStore.from_columns([])
            .with_vectors(dv, n_rows=100)
            .build_sharded(mesh)
        )
    from otters_tpu.parallel import ShardedMetaStore

    store = MetaStore.from_columns([]).with_vectors(vecs).build_sharded(mesh)
    assert isinstance(store, ShardedMetaStore)


def test_sharded_delete_rows_matches_oracle():
    """delete_rows on a sharded store: the validity mask is re-placed on the
    rows sharding and deleted rows never surface; results match a
    single-device store with identical deletes."""
    import jax

    rng = np.random.default_rng(11)
    n, d = 4_000, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    price = (np.arange(n) % 100).astype(np.float64)
    cols = [Column("price", DataType.Float64).from_values(price)]
    mesh = make_mesh(rows=4, batch=2)
    sharded = (
        MetaStore.from_columns(cols)
        .with_vectors(vecs)
        .with_chunk_size(512)
        .build_sharded(mesh)
    )
    single = (
        MetaStore.from_columns(
            [Column("price", DataType.Float64).from_values(price)]
        )
        .with_vectors(vecs)
        .with_chunk_size(512)
        .build()
    )
    q = rng.normal(size=(3, d)).astype(np.float32)
    top = sharded.query_batch(q, Metric.Cosine).take(6).collect()
    dead = list(top.indices[:4]) + [0, n - 1]
    sharded.delete_rows(dead)
    single.delete_rows(dead)
    assert len(sharded) == n - len(set(dead))
    # the mask kept its row sharding (not a single-device or fully
    # replicated re-place): each shard holds exactly n_pad / n_row_shards
    n_pad = sharded._dv.vectors.shape[0]
    assert (
        sharded._dv.valid.sharding.shard_shape((n_pad,))[0] == n_pad // 4
    )
    assert len(sharded._dv.valid.sharding.device_set) == len(
        mesh.devices.flat
    )
    for expr in (None, col("price").lt(30.0)):
        pw = sharded.query_batch(q, Metric.Cosine)
        ps = single.query_batch(q, Metric.Cosine)
        if expr is not None:
            pw = pw.meta_filter(expr)
            ps = ps.meta_filter(expr)
        want = ps.take(8).collect()
        got = pw.take(8).collect()
        assert got.indices == want.indices
        assert not (set(got.indices) & set(dead))
        np.testing.assert_allclose(
            got.scores, want.scores, rtol=1e-5, atol=1e-6
        )
    # idempotent + still queryable after a second delete round
    sharded.delete_rows(dead[:2])
    assert len(sharded) == n - len(set(dead))
    jax.block_until_ready(sharded._dv.valid)


def test_sharded_delete_rows_sorted_store_original_ids():
    """On a sort_by sharded store, delete_rows takes ORIGINAL row ids
    (remapped through the index map), same as the single-device contract."""
    rng = np.random.default_rng(12)
    n, d = 2_048, 8
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    key = rng.permutation(n).astype(np.int64)
    cols = [Column("key", DataType.Int64).from_values(key)]
    mesh = make_mesh(rows=4, batch=2)
    sharded = (
        MetaStore.from_columns(cols)
        .with_vectors(vecs)
        .with_chunk_size(512)
        .with_sort_by("key")
        .build_sharded(mesh)
    )
    top = sharded.query(vecs[5], Metric.Cosine).take(1).collect()
    victim = top.indices[0]
    sharded.delete_rows([victim])
    after = sharded.query(vecs[5], Metric.Cosine).take(3).collect()
    assert victim not in after.indices


def test_sharded_take_all_windowed():
    """Take-all on a sharded store now runs per-shard windowed collection
    (previously a guard error): every valid row comes back, globally
    merged across the batch in take order."""
    rng = np.random.default_rng(9)
    n, d, b = 4096, 8, 64
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    mesh = make_mesh(rows=4, batch=2)
    store = MetaStore.from_columns([]).with_vectors(vecs).build_sharded(mesh)
    from otters_tpu.ops import scoring

    qs = rng.normal(size=(b, d)).astype(np.float32)  # k_eff > SCAN_K_MAX
    r = store.query_batch(qs, Metric.Cosine).take(scoring.SCAN_K_MAX + 1).collect()
    assert len(r) == b * n  # every (query, row) candidate survives
    scores = np.asarray(r.scores)
    assert np.all(np.diff(scores) <= 1e-12)  # take_max order
    # top result matches numpy exactly
    qn = qs / np.linalg.norm(qs, axis=1, keepdims=True)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    full = qn @ vn.T
    assert r.indices[0] == int(np.argmax(full.max(axis=0)))
    np.testing.assert_allclose(scores[0], full.max(), rtol=1e-5)
    # normal k unchanged
    r5 = store.query(vecs[0], Metric.Cosine).take(5).collect()
    assert len(r5) == 5


def test_sharded_windowed_matches_single_device(monkeypatch):
    """Forced-windowed sharded collection == the single-device direct path,
    with a meta filter (numeric + string-contains hostmask + is_null),
    vec_filter, and tombstone deletes in play."""
    from otters_tpu.ops import scoring

    rng = np.random.default_rng(13)
    n, d, b, k = 2048, 16, 3, 60
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    price = [None if i % 41 == 0 else float(i % 90) for i in range(n)]
    tag = [f"t{i % 23}x" for i in range(n)]

    def build(shard):
        cols = [
            Column("price", DataType.Float64).from_values(price),
            Column("tag", DataType.String).from_values(tag),
        ]
        builder = (
            MetaStore.from_columns(cols)
            .with_vectors(vecs)
            .with_chunk_size(512)
        )
        if shard:
            return builder.build_sharded(make_mesh(rows=4, batch=2))
        return builder.build()

    sharded, single = build(True), build(False)
    dead = [0, 7, 500, 1999]
    sharded.delete_rows(dead)
    single.delete_rows(dead)
    expr = (
        col("price").lt(70.0) | col("price").is_null() | col("tag").contains("3x")
    )
    qs = rng.normal(size=(b, d)).astype(np.float32)

    def run(store):
        return (
            store.query_batch(qs, Metric.Cosine)
            .meta_filter(expr)
            .vec_filter(-0.5, Cmp.Gt)
            .take(k)
            .collect()
        )

    want = run(single)
    # force the sharded dispatch down the windowed path at this tiny scale
    real = scoring.needs_windowed

    def fake(n_pad, b_, k_eff):
        return n_pad > 4096 or real(n_pad, b_, k_eff)

    monkeypatch.setattr(scoring, "needs_windowed", fake)
    got = run(sharded)
    assert got.indices == want.indices
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-5, atol=1e-6)
    s_got, s_want = sharded.last_query_stats(), single.last_query_stats()
    assert (
        s_got.evaluated_chunks + s_got.pruned_chunks == s_got.total_chunks
    )


def test_sharded_append_matches_oracle():
    """append on a sharded store rebuilds straight onto the mesh
    (tombstones compacted, fresh ids) and matches a single-device store
    with identical deletes + appends."""
    from otters_tpu.parallel import ShardedMetaStore

    rng = np.random.default_rng(23)
    n, d, m = 3_000, 16, 500
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    price = [float(x) for x in rng.uniform(0, 100, size=n)]
    tag = [f"t{i % 11}" for i in range(n)]

    def builder():
        return (
            MetaStore.from_columns(
                [
                    Column("price", DataType.Float64).from_values(price),
                    Column("tag", DataType.String).from_values(tag),
                ]
            )
            .with_vectors(vecs)
            .with_chunk_size(256)
        )

    mesh = make_mesh(rows=4, batch=2)
    sharded = builder().build_sharded(mesh)
    single = builder().build()
    dead = rng.choice(n, size=200, replace=False).tolist()
    sharded.delete_rows(dead)
    single.delete_rows(dead)
    new_vecs = rng.normal(size=(m, d)).astype(np.float32)
    new_cols = {
        "price": [float(x) for x in rng.uniform(0, 100, size=m)],
        "tag": [f"t{i % 11}" for i in range(m)],
    }
    sh2 = sharded.append(new_vecs, new_cols)
    si2 = single.append(new_vecs, new_cols)
    assert isinstance(sh2, ShardedMetaStore)
    assert len(sh2) == len(si2) == n - 200 + m
    # the rebuilt vectors landed sharded over the mesh rows axis
    n_pad2 = sh2._dv.vectors.shape[0]
    assert sh2._dv.vectors.sharding.shard_shape((n_pad2, d))[0] == n_pad2 // 4
    qs = rng.normal(size=(3, d)).astype(np.float32)
    for expr in (None, col("price").lt(40.0) & col("tag").eq("t3")):
        pw = sh2.query_batch(qs, Metric.Cosine)
        ps = si2.query_batch(qs, Metric.Cosine)
        if expr is not None:
            pw = pw.meta_filter(expr)
            ps = ps.meta_filter(expr)
        rw = pw.take(8).collect()
        rs = ps.take(8).collect()
        assert rw.indices == rs.indices
        np.testing.assert_allclose(rw.scores, rs.scores, rtol=1e-5, atol=1e-5)


def test_sharded_append_int8_rerank_exact():
    """append on an int8 + keep_host_f32 sharded store keeps the exactness
    contract: the rebuilt snapshot holds TRUE f32 rows (not quantized
    codes), so rerank recall stays 1.0 over surviving + appended rows."""
    rng = np.random.default_rng(29)
    n, d, m = 4_000, 24, 600
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    price = [float(x) for x in rng.uniform(0, 100, size=n)]
    mesh = make_mesh(rows=4, batch=2)
    store = (
        MetaStore.from_columns(
            [Column("price", DataType.Float64).from_values(price)]
        )
        .with_vectors(vecs)
        .with_chunk_size(256)
        .with_storage_dtype("int8")
        .with_rerank_source(keep_host_f32=True)
        .build_sharded(mesh)
    )
    dead = rng.choice(n, size=300, replace=False).tolist()
    store.delete_rows(dead)
    new_vecs = rng.normal(size=(m, d)).astype(np.float32)
    st2 = store.append(
        new_vecs, {"price": [float(x) for x in rng.uniform(0, 100, size=m)]}
    )
    assert st2._storage_dtype == "int8"
    keep = np.ones(n, dtype=bool)
    keep[dead] = False
    combined = np.concatenate([vecs[keep], new_vecs], axis=0)
    q = rng.normal(size=(d,)).astype(np.float32)
    r = st2.query(q, Metric.Cosine).take(5, rerank_from=100).collect()
    s = (combined @ q) / (
        np.linalg.norm(combined, axis=1) * np.linalg.norm(q)
    )
    want = np.argsort(-s, kind="stable")[:5]
    assert list(r.indices) == list(want)
    np.testing.assert_allclose(r.scores, s[want], rtol=1e-5, atol=1e-6)


def test_sharded_windowed_collision_redo(monkeypatch):
    """A string-hash collision on a take-all-sized sharded query must be
    corrected through the windowed path, not crash on the SPMD k guard
    (review regression: _run_exact_mask_query previously re-dispatched
    into _run_query_program, whose SCAN_K_MAX guard raised)."""
    from otters_tpu.ops import hashing, scoring

    rng = np.random.default_rng(17)
    n, d = 2048, 8
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    names = ["a" if i % 2 == 0 else "b" for i in range(n)]
    cols = [Column("name", DataType.String).from_values(names)]
    mesh = make_mesh(rows=4, batch=2)
    sharded = (
        MetaStore.from_columns(cols)
        .with_vectors(vectors)
        .with_chunk_size(128)
        .build_sharded(mesh)
    )
    # query hash of "b" collides with stored "a": device matches the wrong
    # rows; host verification must detect and redo exactly
    real_hash = hashing.hash_string
    monkeypatch.setattr(
        hashing, "hash_string",
        lambda s: real_hash("a") if s == "b" else real_hash(s),
    )
    # route BOTH the main query and the redo down the windowed path
    real_nw = scoring.needs_windowed
    monkeypatch.setattr(
        scoring, "needs_windowed",
        lambda n_pad, b_, k_eff: n_pad > 4096 or real_nw(n_pad, b_, k_eff),
    )
    q = rng.normal(size=(d,)).astype(np.float32)
    r = (
        sharded.query(q, Metric.Cosine)
        .meta_filter(col("name").eq("b"))
        .take(6)
        .collect()
    )
    assert all(names[i] == "b" for i in r.indices)
    qi = 1 / np.linalg.norm(q)
    vi = 1 / np.linalg.norm(vectors, axis=1)
    s = (vectors @ q) * qi * vi
    want = np.sort(s[np.array([nm == "b" for nm in names])])[::-1][:6]
    np.testing.assert_allclose(r.scores, want, rtol=1e-5, atol=1e-5)


def test_build_sharded_save_load_roundtrip(tmp_path):
    """A build_sharded store saves (gathering shards) and loads as a
    single-device store with identical query results."""
    rng = np.random.default_rng(10)
    n, d = 3_000, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    price = (np.arange(n) % 50).astype(np.float64)
    cols = [Column("price", DataType.Float64).from_values(price)]
    mesh = make_mesh(rows=4, batch=2)
    sharded = (
        MetaStore.from_columns(cols)
        .with_vectors(vecs)
        .with_chunk_size(512)
        .build_sharded(mesh)
    )
    path = str(tmp_path / "s.npz")
    sharded.save(path)
    loaded = MetaStore.load(path)
    q = rng.normal(size=(2, d)).astype(np.float32)
    expr = col("price").lt(10.0)
    want = sharded.query_batch(q, Metric.Cosine).meta_filter(expr).take(8).collect()
    got = loaded.query_batch(q, Metric.Cosine).meta_filter(expr).take(8).collect()
    assert got.indices == want.indices
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-5, atol=1e-6)


def test_unaligned_chunk_append_and_load_fall_back(tmp_path):
    """Stores with chunk sizes that don't align with the scan tile (legal
    single-device configs, shardable only via shard()) still support
    sharded append and load(mesh=...) — through the single-device-build +
    re-shard fallback instead of a circular build_sharded error."""
    from otters_tpu.parallel import ShardedMetaStore

    rng = np.random.default_rng(37)
    n, d = 1_000, 8
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    price = [float(i % 40) for i in range(n)]
    single = (
        MetaStore.from_columns(
            [Column("p", DataType.Float64).from_values(price)]
        )
        .with_vectors(vecs)
        .with_chunk_size(100)  # lcm(100, SCAN_TILE) is huge -> unaligned
        .build()
    )
    mesh = make_mesh(rows=4, batch=2)
    sharded = ShardedMetaStore.shard(single, mesh)
    new_vecs = rng.normal(size=(3, d)).astype(np.float32)
    st2 = sharded.append(new_vecs, {"p": [1.0, 2.0, 3.0]})
    assert isinstance(st2, ShardedMetaStore)
    assert len(st2) == n + 3
    r = st2.query(new_vecs[0], Metric.Cosine).take(1).collect()
    assert r.indices[0] == n and abs(r.scores[0] - 1.0) < 1e-5

    path = str(tmp_path / "unaligned.npz")
    single.save(path)
    loaded = MetaStore.load(path, mesh=mesh)
    assert isinstance(loaded, ShardedMetaStore)
    q = rng.normal(size=(d,)).astype(np.float32)
    a = loaded.query(q, Metric.Cosine).meta_filter(col("p").lt(20.0)).take(5).collect()
    b = single.query(q, Metric.Cosine).meta_filter(col("p").lt(20.0)).take(5).collect()
    assert a.indices == b.indices
    np.testing.assert_allclose(a.scores, b.scores, rtol=1e-5, atol=1e-5)


def test_device_bloom_scatter_matches_host_bitforbit(monkeypatch):
    """Round-4 item 5: the per-shard device Bloom scatter must produce the
    SAME uint32 matrix as the host build, and string-Eq queries must agree
    between the two builds."""
    monkeypatch.setenv("OTTERS_BLOOM_DEVICE", "1")
    rng = np.random.default_rng(11)
    n, d = 20_000, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    tags = [None if i % 29 == 0 else f"tag-{i % 137}" for i in range(n)]
    cols = [Column("tag", DataType.String).from_values(tags)]
    mesh = make_mesh(rows=8)
    dev_store = (
        MetaStore.from_columns(cols)
        .with_vectors(vecs)
        .with_chunk_size(1024)
        .build_sharded(mesh)
    )
    monkeypatch.delenv("OTTERS_BLOOM_DEVICE")
    host_store = (
        MetaStore.from_columns(
            [Column("tag", DataType.String).from_values(tags)]
        )
        .with_vectors(vecs)
        .with_chunk_size(1024)
        .build_sharded(mesh)
    )
    np.testing.assert_array_equal(
        np.asarray(dev_store._device_cols["tag"]["bloom"]),
        np.asarray(host_store._device_cols["tag"]["bloom"]),
    )
    q = rng.normal(size=d).astype(np.float32)
    for rhs in ["tag-5", "tag-136", "absent"]:
        a = (
            dev_store.query(q, Metric.Cosine)
            .meta_filter(col("tag").eq(rhs))
            .take(7)
            .collect()
        )
        sa = dev_store.last_query_stats()
        b = (
            host_store.query(q, Metric.Cosine)
            .meta_filter(col("tag").eq(rhs))
            .take(7)
            .collect()
        )
        sb = host_store.last_query_stats()
        assert a.indices == b.indices
        assert sa.evaluated_chunks == sb.evaluated_chunks
