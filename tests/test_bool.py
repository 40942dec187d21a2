"""Bool column type — the reference's "More Metadata Types" roadmap item.

Stored host-side as a bool array + null mask, shipped to device as int32
0/1 so zonemap min/max pruning works (an all-False chunk prunes eq(True)).
Only Eq/Neq (+ is_null/is_not_null) comparisons are valid; bool literals
never match non-Bool columns.
"""

import numpy as np
import pytest

from otters_tpu import Column, DataType, MetaStore, Metric, col
from otters_tpu.errors import (
    ColumnTypeMismatch,
    InvalidComparison,
    OttersError,
    TypeMismatch,
)

N = 64
rng = np.random.default_rng(0)
VECS = rng.normal(size=(N, 8)).astype(np.float32)
FLAGS = [None if i % 13 == 0 else (i % 3 == 0) for i in range(N)]


@pytest.fixture(scope="module")
def store():
    c = Column("f", DataType.Bool).from_values(FLAGS)
    return (
        MetaStore.from_columns([c])
        .with_vectors(VECS.tolist())
        .with_chunk_size(8)
        .build()
    )


def _idxs(store, expr):
    r = (
        store.query(VECS[0].tolist(), Metric.Cosine)
        .meta_filter(expr)
        .take(N)
        .collect()
    )
    return sorted(r.indices)


def test_bool_eq_neq_rows(store):
    assert _idxs(store, col("f").eq(True)) == [
        i for i in range(N) if FLAGS[i] is True
    ]
    assert _idxs(store, col("f").eq(False)) == [
        i for i in range(N) if FLAGS[i] is False
    ]
    # neq excludes nulls, like every value predicate
    assert _idxs(store, col("f").neq(True)) == [
        i for i in range(N) if FLAGS[i] is False
    ]
    assert _idxs(store, ~col("f").eq(True)) == _idxs(store, col("f").neq(True))


def test_bool_null_predicates(store):
    assert _idxs(store, col("f").is_null()) == [
        i for i in range(N) if FLAGS[i] is None
    ]
    assert _idxs(store, col("f").is_not_null()) == [
        i for i in range(N) if FLAGS[i] is not None
    ]


def test_bool_zonemap_pruning():
    flags = [True] * 8 + [False] * 8 + [True, False] * 4
    c = Column("f", DataType.Bool).from_values(flags)
    s = (
        MetaStore.from_columns([c])
        .with_vectors(VECS[:24].tolist())
        .with_chunk_size(8)
        .build()
    )
    r = (
        s.query(VECS[0].tolist(), Metric.Cosine)
        .meta_filter(col("f").eq(False))
        .take(24)
        .collect()
    )
    st = s.last_query_stats()
    assert st.total_chunks == 3
    assert st.evaluated_chunks == 2  # the all-True chunk is pruned
    assert sorted(r.indices) == [i for i in range(24) if not flags[i]]


def test_bool_column_push_rules():
    c = Column("f", DataType.Bool)
    c.push(True).push(np.True_).push(None).push(False)
    assert len(c) == 4
    assert list(c.null_mask()) == [False, False, True, False]
    assert c.bool_values().tolist() == [True, True, False, False]
    for bad in (1, 0, 1.0, "true"):
        with pytest.raises(ColumnTypeMismatch):
            Column("f", DataType.Bool).push(bad)


def test_bool_from_values_vectorized():
    arr = np.array([True, False, True])
    c = Column("f", DataType.Bool).from_values(arr)
    assert c.bool_values().tolist() == [True, False, True]
    # int arrays don't silently coerce
    with pytest.raises(ColumnTypeMismatch):
        Column("f", DataType.Bool).from_values(np.array([1, 0, 1]))


def test_bool_type_rules():
    schema = {"f": DataType.Bool, "v": DataType.Int32, "s": DataType.String}
    with pytest.raises(InvalidComparison):
        col("f").gt(True).compile(schema)
    with pytest.raises(TypeMismatch):
        col("f").eq(1).compile(schema)
    with pytest.raises(TypeMismatch):
        col("f").eq("true").compile(schema)
    with pytest.raises(TypeMismatch):
        col("v").eq(True).compile(schema)
    with pytest.raises(TypeMismatch):
        col("s").eq(False).compile(schema)
    lf = col("f").eq(True).compile(schema).clauses[0][0]
    assert lf.rhs is True and lf.rhs_kind == "bool"


def test_bool_save_load_round_trip(store, tmp_path):
    p = str(tmp_path / "b.npz")
    store.save(p)
    back = MetaStore.load(p)
    assert back.schema()["f"] is DataType.Bool
    assert _idxs(back, col("f").eq(True)) == _idxs(store, col("f").eq(True))


def test_bool_result_materialization_and_display(store, capsys):
    r = (
        store.query(VECS[0].tolist(), Metric.Cosine)
        .meta_filter(col("f").is_not_null())
        .take(3)
        .collect()
    )
    out = str(r)
    assert "true" in out or "false" in out
    fcol = r.data["f"]
    assert fcol.dtype is DataType.Bool
    assert all(isinstance(bool(v), bool) for v in fcol.bool_values())


def test_bool_sharded_agrees(store):
    import jax
    from jax.sharding import Mesh

    from otters_tpu.parallel import ShardedMetaStore

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("rows", "batch"))
    sh = ShardedMetaStore.shard(store, mesh)
    for e in (col("f").eq(True), col("f").is_null() | col("f").eq(False)):
        a = _idxs(store, e)
        b = _idxs(sh, e)
        assert a == b


def test_bool_pandas_adapter():
    pd = pytest.importorskip("pandas")
    from otters_tpu.adapters import column_from_series

    s = pd.Series([True, False, None, True], dtype="boolean", name="flag")
    c = column_from_series(s)
    assert c.dtype is DataType.Bool
    assert list(c.null_mask()) == [False, False, True, False]
    assert c.bool_values().tolist() == [True, False, False, True]
