"""ShardedMetaStore: exact agreement with the single-device MetaStore."""

import numpy as np
import pytest

from otters_tpu import Cmp, Column, DataType, Metric, MetaStore, col
from otters_tpu.parallel import ShardedMetaStore, make_mesh


@pytest.fixture(scope="module")
def stores():
    rng = np.random.default_rng(21)
    n, d = 3000, 32
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    price = list(rng.uniform(0, 100, n))
    tag = [f"t{i % 37}" for i in range(n)]
    when = [
        f"202{(i % 4)}-0{(i % 9) + 1}-15" for i in range(n)
    ]
    cols = [
        Column("price", DataType.Float64).from_values(price),
        Column("tag", DataType.String).from_values(tag),
        Column("when", DataType.DateTime).from_values(when),
    ]
    local = (
        MetaStore.from_columns(cols)
        .with_vectors(vectors)
        .with_chunk_size(256)
        .build()
    )
    mesh = make_mesh(rows=4, batch=2)
    sharded = ShardedMetaStore.shard(local, mesh)
    return local, sharded, vectors


def _q(rng, d, b):
    return [list(v) for v in rng.normal(size=(b, d)).astype(np.float32)]


def test_sharded_unfiltered_matches(stores):
    local, sharded, vectors = stores
    rng = np.random.default_rng(1)
    qs = _q(rng, 32, 4)
    want = local.query_batch(qs, Metric.Cosine).take(12).collect()
    got = sharded.query_batch(qs, Metric.Cosine).take(12).collect()
    assert got.indices == want.indices
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-5, atol=1e-5)


def test_sharded_numeric_filter_matches(stores):
    local, sharded, _ = stores
    rng = np.random.default_rng(2)
    qs = _q(rng, 32, 3)
    expr = col("price").lt(30.0) & col("when").gte("2022-01-01")
    want = local.query_batch(qs, Metric.DotProduct).meta_filter(expr).take(20).collect()
    got = sharded.query_batch(qs, Metric.DotProduct).meta_filter(expr).take(20).collect()
    assert got.indices == want.indices
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-5, atol=1e-5)
    # materialized metadata agrees
    assert got.column("price").null_mask().tolist() == want.column(
        "price"
    ).null_mask().tolist()


def test_sharded_string_bloom_filter_matches(stores):
    local, sharded, _ = stores
    rng = np.random.default_rng(3)
    qs = _q(rng, 32, 2)
    expr = col("tag").eq("t5") | col("tag").eq("t11")
    want = local.query_batch(qs, Metric.Cosine).meta_filter(expr).take(15).collect()
    got = sharded.query_batch(qs, Metric.Cosine).meta_filter(expr).take(15).collect()
    assert got.indices == want.indices
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-5, atol=1e-5)


def test_sharded_vec_filter_euclidean(stores):
    local, sharded, _ = stores
    rng = np.random.default_rng(4)
    qs = _q(rng, 32, 2)
    want = (
        local.query_batch(qs, Metric.Euclidean)
        .vec_filter(50.0, Cmp.Lt)
        .take(10)
        .collect()
    )
    got = (
        sharded.query_batch(qs, Metric.Euclidean)
        .vec_filter(50.0, Cmp.Lt)
        .take(10)
        .collect()
    )
    assert got.indices == want.indices
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-5, atol=1e-5)


def test_sharded_stats_match(stores):
    local, sharded, _ = stores
    rng = np.random.default_rng(5)
    qs = _q(rng, 32, 2)
    expr = col("price").lt(10.0)
    _ = local.query_batch(qs, Metric.Cosine).meta_filter(expr).take(5).collect()
    ls = local.last_query_stats()
    _ = sharded.query_batch(qs, Metric.Cosine).meta_filter(expr).take(5).collect()
    ss = sharded.last_query_stats()
    assert ss.evaluated_chunks == ls.evaluated_chunks
    assert ss.vectors_compared == ls.vectors_compared
    assert ss.total_chunks == ls.total_chunks

    # unfiltered stats: padded shard chunks must not inflate counts
    _ = sharded.query_batch(qs, Metric.Cosine).take(5).collect()
    ss2 = sharded.last_query_stats()
    assert ss2.evaluated_chunks == local.n_chunks()
    assert ss2.vectors_compared == len(local) * 2


def test_sharded_extended_string_predicates():
    """contains/starts_with/ends_with now run on sharded stores via
    rows-sharded hostmask tensors; results must match the local store."""
    rng = np.random.default_rng(55)
    n, d = 2000, 16
    names = [f"item_{i % 37}_{'blue' if i % 3 == 0 else 'red'}" for i in range(n)]
    cols = [Column("name", DataType.String).from_values(names)]
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    local = (
        MetaStore.from_columns(cols)
        .with_vectors(vectors)
        .with_chunk_size(256)
        .build()
    )
    mesh = make_mesh(rows=4, batch=2)
    sharded = ShardedMetaStore.shard(local, mesh)
    q = rng.normal(size=(3, d)).astype(np.float32)
    for expr in [
        col("name").contains("blue"),
        col("name").starts_with("item_3"),
        col("name").ends_with("red"),
        col("name").contains("_1") & col("name").ends_with("blue"),
    ]:
        a = local.query_batch(q, Metric.Cosine).meta_filter(expr).take(7).collect()
        b = sharded.query_batch(q, Metric.Cosine).meta_filter(expr).take(7).collect()
        assert a.indices == b.indices, expr
        np.testing.assert_allclose(a.scores, b.scores, rtol=1e-6, atol=1e-6)


def test_sharded_pallas_tile_skipping(monkeypatch):
    """The fused kernel runs per shard (interpret mode on the CPU mesh) and
    must agree exactly with the local store, including chunk pruning."""
    monkeypatch.setenv("OTTERS_PALLAS_INTERPRET", "1")
    import otters_tpu.ops.scoring as scoring_mod

    monkeypatch.setattr(scoring_mod, "DIRECT_LIMIT", 1 << 10)
    rng = np.random.default_rng(56)
    n, d = 131072, 16
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    price = (np.arange(n) // 1024 % 2 * 50 + np.arange(n) % 10).astype(
        np.float32
    )  # even chunks 0-9, odd chunks 50-59
    cols = [Column("price", DataType.Float32).from_values(price)]
    local = (
        MetaStore.from_columns(cols)
        .with_vectors(vectors)
        .with_chunk_size(1024)
        .build()
    )
    mesh = make_mesh(rows=8, batch=1)
    sharded = ShardedMetaStore.shard(local, mesh)
    assert sharded._pallas_aligned
    q = rng.normal(size=(2, d)).astype(np.float32)
    expr = col("price").lt(10.0)
    b = sharded.query_batch(q, Metric.Cosine).meta_filter(expr).take(9).collect()
    # exact oracle
    qi = 1 / np.linalg.norm(q, axis=1)
    vi = 1 / np.linalg.norm(vectors, axis=1)
    s = (q @ vectors.T) * qi[:, None] * vi[None, :]
    s[:, price >= 10.0] = -np.inf
    want = np.sort(s.reshape(-1))[::-1][:9]
    np.testing.assert_allclose(b.scores, want, rtol=1e-5, atol=1e-5)
    assert all(price[i] < 10.0 for i in b.indices)
    st = sharded.last_query_stats()
    assert st.evaluated_chunks == 64  # half of 128 real chunks


def test_sharded_precompile_and_save_roundtrip(tmp_path):
    """precompile() must warm through the SPMD path (not the single-device
    AOT machinery), and a sharded store saves/loads like a local one."""
    rng = np.random.default_rng(57)
    n, d = 1500, 8
    cols = [
        Column("v", DataType.Int32).from_values(
            (np.arange(n) % 5).astype(np.int32)
        )
    ]
    local = (
        MetaStore.from_columns(cols)
        .with_vectors(rng.normal(size=(n, d)).astype(np.float32))
        .with_chunk_size(128)
        .build()
    )
    mesh = make_mesh(rows=4, batch=2)
    sharded = ShardedMetaStore.shard(local, mesh)
    assert sharded.precompile(
        filters=[None, col("v").lt(3)], batch_sizes=(2,), k=4
    ) == 2
    q = rng.normal(size=(2, d)).astype(np.float32)
    r = sharded.query_batch(q, Metric.Cosine).meta_filter(col("v").lt(3)).take(4).collect()
    assert len(r) == 4 and all(i % 5 < 3 for i in r.indices)

    path = str(tmp_path / "sharded.npz")
    sharded.save(path)
    loaded = MetaStore.load(path)  # loads as a local store
    a = loaded.query_batch(q, Metric.Cosine).meta_filter(col("v").lt(3)).take(4).collect()
    assert a.indices == r.indices


# ---- round-3: verified fast-exact + collision fallback on the mesh ----------


def _pallas_sharded_store(monkeypatch, n, d, chunk, seed):
    monkeypatch.setenv("OTTERS_PALLAS_INTERPRET", "1")
    import otters_tpu.ops.scoring as scoring_mod

    monkeypatch.setattr(scoring_mod, "DIRECT_LIMIT", 1 << 10)
    rng = np.random.default_rng(seed)
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    price = (np.arange(n) // chunk % 2 * 50 + np.arange(n) % 10).astype(
        np.float32
    )
    cols = [Column("price", DataType.Float32).from_values(price)]
    mesh = make_mesh(rows=8, batch=1)
    sharded = (
        MetaStore.from_columns(cols)
        .with_vectors(vectors)
        .with_chunk_size(chunk)
        .build_sharded(mesh)
    )
    return sharded, vectors, price, rng


def test_sharded_fast_exact_engaged_and_correct(monkeypatch):
    """fast=True reaches the per-shard kernel (no more hardcoded
    fast=False) and the certified result is exact."""
    from otters_tpu.ops import pallas_topk as pk

    fast_seen = []
    orig = pk.pallas_topk

    def spy(*args, **kwargs):
        fast_seen.append(kwargs.get("fast", False))
        return orig(*args, **kwargs)

    monkeypatch.setattr(pk, "pallas_topk", spy)
    sharded, vectors, price, rng = _pallas_sharded_store(
        monkeypatch, 65536, 8, 1024, 61
    )
    q = rng.normal(size=(2, 8)).astype(np.float32)
    expr = col("price").lt(10.0)
    r = sharded.query_batch(q, Metric.Cosine).meta_filter(expr).take(7).collect()
    assert any(fast_seen), "fast mode never engaged on the sharded path"
    qi = 1 / np.linalg.norm(q, axis=1)
    vi = 1 / np.linalg.norm(vectors, axis=1)
    s = (q @ vectors.T) * qi[:, None] * vi[None, :]
    s[:, price >= 10.0] = -np.inf
    want = np.sort(s.reshape(-1))[::-1][:7]
    np.testing.assert_allclose(r.scores, want, rtol=1e-5, atol=1e-5)


def test_sharded_fast_check_failure_triggers_strict_redo(monkeypatch):
    """A failed certificate on ANY shard must re-run the whole query
    strictly (psum'd check + the caller's strict redo)."""
    from otters_tpu.ops import pallas_topk as pk
    from otters_tpu.parallel.meta_sharded import ShardedMetaStore as SMS

    # an absurd error bound makes the certificate unsatisfiable -> check
    # False on every shard (fresh shapes force a retrace under the patch)
    monkeypatch.setattr(pk, "high_precision_bound", lambda d: 1.0e9)
    strict_calls = []
    orig = SMS._run_query_program

    def spy(self, *a, **kw):
        strict_calls.append(kw.get("strict", False))
        return orig(self, *a, **kw)

    monkeypatch.setattr(SMS, "_run_query_program", spy)
    # per-shard stores must be big enough that phase 1 leaves UNEXAMINED
    # bins (a finite certificate boundary) — tiny shards legitimately pass
    # the check even with an absurd bound
    sharded, vectors, price, rng = _pallas_sharded_store(
        monkeypatch, 262144, 8, 512, 62
    )
    q = rng.normal(size=(2, 8)).astype(np.float32)
    expr = col("price").lt(10.0)
    r = sharded.query_batch(q, Metric.Cosine).meta_filter(expr).take(5).collect()
    assert True in strict_calls, "strict redo never ran"
    qi = 1 / np.linalg.norm(q, axis=1)
    vi = 1 / np.linalg.norm(vectors, axis=1)
    s = (q @ vectors.T) * qi[:, None] * vi[None, :]
    s[:, price >= 10.0] = -np.inf
    want = np.sort(s.reshape(-1))[::-1][:5]
    np.testing.assert_allclose(r.scores, want, rtol=1e-5, atol=1e-5)


def test_sharded_hash_collision_fallback(monkeypatch):
    """An injected string-hash collision on a SHARDED store must be caught
    by host verification and corrected through the SPMD exact-mask re-run
    (never an unsharded re-dispatch)."""
    from otters_tpu.ops import hashing

    rng = np.random.default_rng(63)
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
    # collide the QUERY hash of "b" with the stored hash of "a": the device
    # now matches the wrong rows; host verification must detect + redo
    real = hashing.hash_string
    monkeypatch.setattr(
        hashing, "hash_string", lambda s: real("a") if s == "b" else real(s)
    )
    base_exact = type(sharded).__mro__[1]._run_exact_mask_query
    sharded_exact_calls = []
    orig_exact = type(sharded)._run_exact_mask_query

    def spy(self, *a, **kw):
        sharded_exact_calls.append(1)
        return orig_exact(self, *a, **kw)

    monkeypatch.setattr(type(sharded), "_run_exact_mask_query", spy)
    q = rng.normal(size=(d,)).astype(np.float32)
    r = (
        sharded.query(q, Metric.Cosine)
        .meta_filter(col("name").eq("b"))
        .take(6)
        .collect()
    )
    assert sharded_exact_calls, "collision fallback never ran"
    assert all(names[i] == "b" for i in r.indices)
    qi = 1 / np.linalg.norm(q)
    vi = 1 / np.linalg.norm(vectors, axis=1)
    s = (vectors @ q) * qi * vi
    mask = np.array([nm == "b" for nm in names])
    want = np.sort(s[mask])[::-1][:6]
    np.testing.assert_allclose(r.scores, want, rtol=1e-5, atol=1e-5)
    assert base_exact is not None
