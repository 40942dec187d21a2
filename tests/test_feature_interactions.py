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
