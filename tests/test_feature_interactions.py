"""Cross-feature interaction coverage: round-2 features (Bool, null
predicates, NOT, Z-order) x mutation (delete/append) x persistence x
sharding. These seams are where independently-correct features break.
"""

import numpy as np
import pytest

from otters_tpu import Column, DataType, MetaStore, Metric, col

N = 256
rng = np.random.default_rng(11)
VECS = rng.normal(size=(N, 16)).astype(np.float32)
VALS = [None if i % 11 == 0 else i % 40 for i in range(N)]
FLAGS = [None if i % 13 == 0 else (i % 3 == 0) for i in range(N)]


def _build(z=None, chunk=32):
    cols = [
        Column("v", DataType.Int32).from_values(VALS),
        Column("f", DataType.Bool).from_values(FLAGS),
    ]
    b = MetaStore.from_columns(cols).with_vectors(VECS.tolist())
    b = b.with_chunk_size(chunk)
    if z:
        b = b.with_z_order(z)
    return b.build()


def _idxs(store, expr, q=None):
    q = VECS[0] if q is None else q
    r = (
        store.query(q.tolist(), Metric.Cosine)
        .meta_filter(expr)
        .take(N)
        .collect()
    )
    return sorted(r.indices)


def test_is_null_does_not_resurrect_deleted_rows():
    store = _build()
    null_rows = [i for i in range(N) if VALS[i] is None]
    store.delete_rows(null_rows[:3])
    got = _idxs(store, col("v").is_null())
    assert got == null_rows[3:]


def test_delete_on_zordered_store_keeps_original_ids():
    store = _build(z=["v", "f"])
    target = _idxs(store, col("v").eq(5))
    assert target
    store.delete_rows([target[0]])
    got = _idxs(store, col("v").eq(5))
    assert got == target[1:]


def test_is_null_after_delete_on_zordered_store():
    store = _build(z=["v", "f"])
    null_rows = [i for i in range(N) if FLAGS[i] is None]
    store.delete_rows(null_rows[:2])
    got = _idxs(store, col("f").is_null())
    assert got == null_rows[2:]


def test_append_with_bool_and_nulls():
    store = _build()
    m = 3
    new_vecs = rng.normal(size=(m, 16)).astype(np.float32)
    new = store.append(
        new_vecs, {"v": [100, None, 102], "f": [None, True, False]}
    )
    assert new.n_rows == N + m
    got = _idxs(new, col("v").eq(100))
    assert got == [N]
    # appended f values are [None, True, False] -> the null lands at row N
    got = _idxs(new, col("f").is_null())
    expected = [i for i in range(N) if FLAGS[i] is None] + [N]
    assert got == expected
    got = _idxs(new, col("v").is_null())
    expected = [i for i in range(N) if VALS[i] is None] + [N + 1]
    assert got == expected


def test_zorder_bool_save_load_delete_round_trip(tmp_path):
    store = _build(z=["f", "v"])
    store.delete_rows([7, 8])
    p = str(tmp_path / "s.npz")
    store.save(p)
    back = MetaStore.load(p)
    assert back._z_order == ("f", "v")
    for e in (col("f").eq(True), col("v").is_null(), ~col("v").lt(20)):
        assert _idxs(back, e) == _idxs(store, e)
    assert 7 not in _idxs(back, col("v").is_not_null() | col("v").is_null())


def test_sharded_zordered_store_with_new_predicates():
    import jax
    from jax.sharding import Mesh

    from otters_tpu.parallel import ShardedMetaStore

    store = _build(z=["v", "f"])
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("rows", "batch"))
    sh = ShardedMetaStore.shard(store, mesh)
    for e in (
        col("f").is_null() | col("v").between(10, 20),
        ~col("f").eq(False),
        col("v").isin([5, 6, 7]),
    ):
        assert _idxs(sh, e) == _idxs(store, e)


def test_not_with_vec_filter_and_take():
    from otters_tpu import Cmp

    store = _build()
    r = (
        store.query(VECS[0].tolist(), Metric.Cosine)
        .meta_filter(~col("v").lt(20))
        .vec_filter(-1.0, Cmp.Gt)
        .take(10)
        .collect()
    )
    assert len(r) == 10
    for i in r.indices:
        assert VALS[i] is not None and VALS[i] >= 20


def test_stats_consistent_for_null_predicates_on_zordered_store():
    store = _build(z=["v"], chunk=16)
    (
        store.query(VECS[0].tolist(), Metric.Cosine)
        .meta_filter(col("v").is_null())
        .take(5)
        .collect()
    )
    st = store.last_query_stats()
    # z-order clusters nulls (max code): most chunks have no nulls
    assert st.pruned_chunks > st.total_chunks // 2
    assert st.evaluated_chunks >= 1


def test_certify_survives_delete_append_saveload(tmp_path):
    """Round-4 seam: the exactness certificate must stay sound through a
    delete -> append -> save -> load chain on an int8 + keep_host_f32
    store (residuals and the rerank snapshot must track every rebuild)."""
    n, d = 4_096, 32
    r = np.random.default_rng(21)
    vecs = r.normal(size=(n, d)).astype(np.float32)
    ids = Column("id", DataType.Int64).from_values(list(range(n)))
    store = (
        MetaStore.from_columns([ids])
        .with_vectors(vecs)
        .with_chunk_size(512)
        .with_storage_dtype("int8")
        .with_rerank_source(keep_host_f32=True)
        .build()
    )

    def oracle(q, rows):
        s = (rows @ q) / (
            np.linalg.norm(rows, axis=1) * np.linalg.norm(q) + 1e-30
        )
        return s

    q = vecs[17]

    store.delete_rows([17])  # delete the best match itself
    res = store.query(q, Metric.Cosine).take(5, rerank_from=40).collect()
    st = store.last_query_stats()
    assert st.certified is True
    s = oracle(q, vecs)
    s[17] = -np.inf
    want = np.argsort(-s, kind="stable")[:5].tolist()
    assert res.indices == want

    newv = r.normal(size=(8, d)).astype(np.float32)
    newv[0] = vecs[17]  # re-add an exact twin of the deleted row
    ap = store.append(newv, {"id": list(range(n, n + 8))})
    res2 = ap.query(q, Metric.Cosine).take(5, rerank_from=40).collect()
    assert ap.last_query_stats().certified is True
    rows2 = np.concatenate([np.delete(vecs, 17, axis=0), newv])
    s2 = oracle(q, rows2)
    want2 = np.argsort(-s2, kind="stable")[:5].tolist()
    assert res2.indices == want2
    assert res2.indices[0] == len(rows2) - 8  # the twin wins

    path = str(tmp_path / "chain.npz")
    ap.save(path)
    re = MetaStore.load(path)
    res3 = re.query(q, Metric.Cosine).take(5, rerank_from=40).collect()
    assert re.last_query_stats().certified is True
    assert res3.indices == res2.indices
    np.testing.assert_allclose(res3.scores, res2.scores, rtol=1e-6, atol=1e-7)


def test_certify_with_zorder_and_null_filter():
    """Certificate x z-order (index_map remap) x null-aware predicate."""
    n, d = 4_096, 32
    r = np.random.default_rng(22)
    vecs = r.normal(size=(n, d)).astype(np.float32)
    cols = [
        Column("v", DataType.Int32).from_values(
            [None if i % 7 == 0 else i % 50 for i in range(n)]
        ),
        Column("g", DataType.String).from_values(
            [f"g{i % 5}" for i in range(n)]
        ),
    ]
    store = (
        MetaStore.from_columns(cols)
        .with_vectors(vecs)
        .with_chunk_size(512)
        .with_storage_dtype("int8")
        .with_z_order(["v", "g"])
        .with_rerank_source(keep_host_f32=True)
        .build()
    )
    q = vecs[33]
    expr = col("v").is_not_null() & col("g").eq("g2")
    res = (
        store.query(q, Metric.Cosine)
        .meta_filter(expr)
        .take(6, rerank_from=48)
        .collect()
    )
    assert store.last_query_stats().certified is True
    mask = np.array(
        [i % 7 != 0 and i % 5 == 2 for i in range(n)]
    )
    s = (vecs @ q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    s[~mask] = -np.inf
    want = [int(i) for i in np.argsort(-s, kind="stable") if s[i] > -np.inf][
        :6
    ]
    assert res.indices == want
