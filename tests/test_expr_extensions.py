"""Filter-DSL extensions beyond the reference: is_null / is_not_null,
isin / between sugar, and `~` (NOT) with De Morgan push-down.

The reference DSL has no Not and no null predicates (expr.rs:94-106 — AST is
Column/Literal/Cmp/And/Or only); these extend it under the same CNF compiler
and the same nulls-excluded convention for value predicates
(meta_compute.rs:194-232). Exact-assertion style mirrors the reference tests.
"""

import numpy as np
import pytest

from otters_tpu import (
    Column,
    DataType,
    MetaStore,
    Metric,
    col,
)
from otters_tpu.errors import InvalidExpression, OttersError, UnknownColumn
from otters_tpu.types import NEGATED_CMP, CmpOp


def _build(vals, names, chunk=4, dim=8, seed=0):
    n = len(vals)
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    cols = [
        Column("v", DataType.Int32).from_values(vals),
        Column("s", DataType.String).from_values(names),
    ]
    store = (
        MetaStore.from_columns(cols)
        .with_vectors(vecs.tolist())
        .with_chunk_size(chunk)
        .build()
    )
    return store, vecs


VALS = [1, 2, None, 4, 5, None, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20]
NAMES = ["alpha", "beta", None, "gamma", "delta"] * 4


@pytest.fixture(scope="module")
def store_vecs():
    return _build(VALS, NAMES)


def _idxs(store, vecs, expr):
    r = (
        store.query(vecs[0].tolist(), Metric.Cosine)
        .meta_filter(expr)
        .take(len(VALS))
        .collect()
    )
    return sorted(r.indices)


# ---------------------------------------------------------------------------
# compile shapes
# ---------------------------------------------------------------------------


def test_isin_compiles_to_one_or_clause():
    schema = {"v": DataType.Int32}
    cf = col("v").isin([1, 2, 3]).compile(schema)
    assert [len(c) for c in cf.clauses] == [3]
    assert all(lf.cmp is CmpOp.Eq for lf in cf.clauses[0])


def test_isin_empty_raises():
    with pytest.raises(InvalidExpression):
        col("v").isin([])


def test_between_compiles_to_two_clauses():
    schema = {"v": DataType.Float32}
    cf = col("v").between(1, 5).compile(schema)
    assert [len(c) for c in cf.clauses] == [1, 1]
    assert cf.clauses[0][0].cmp is CmpOp.Gte
    assert cf.clauses[1][0].cmp is CmpOp.Lte


def test_not_de_morgan_cnf_shape():
    schema = {"a": DataType.Int32, "b": DataType.Int32}
    # ~(a>1 & b>2) == (a<=1 | b<=2): one clause, two leaves
    cf = (~(col("a").gt(1) & col("b").gt(2))).compile(schema)
    assert [len(c) for c in cf.clauses] == [2]
    assert {lf.cmp for lf in cf.clauses[0]} == {CmpOp.Lte}
    # ~(a>1 | b>2) == (a<=1 & b<=2): two clauses
    cf = (~(col("a").gt(1) | col("b").gt(2))).compile(schema)
    assert [len(c) for c in cf.clauses] == [1, 1]


def test_double_negation_round_trip():
    schema = {"a": DataType.Int32}
    assert (~~col("a").eq(4)).compile(schema) == col("a").eq(4).compile(schema)


def test_negated_cmp_is_total_involution():
    for op in CmpOp:
        assert op in NEGATED_CMP
        assert NEGATED_CMP[NEGATED_CMP[op]] is op


def test_not_is_null_equals_is_not_null():
    schema = {"a": DataType.Int64}
    assert (~col("a").is_null()).compile(schema) == col("a").is_not_null().compile(
        schema
    )


def test_null_ops_allowed_on_every_dtype():
    for dt in DataType:
        cf = col("x").is_null().compile({"x": dt})
        assert cf.clauses[0][0].kind == "null"


def test_unknown_column_deferred_to_collect(store_vecs):
    store, vecs = store_vecs
    plan = store.query(vecs[0].tolist(), Metric.Cosine).meta_filter(
        col("missing").is_null()
    )  # no raise here (deferred-error contract, meta.rs:605-616)
    with pytest.raises((OttersError, UnknownColumn)):
        plan.collect()


# ---------------------------------------------------------------------------
# row semantics (exact, device path vs hand-computed sets)
# ---------------------------------------------------------------------------


def test_is_null_rows(store_vecs):
    store, vecs = store_vecs
    assert _idxs(store, vecs, col("v").is_null()) == [2, 5]
    assert _idxs(store, vecs, col("s").is_null()) == [2, 7, 12, 17]


def test_is_not_null_rows(store_vecs):
    store, vecs = store_vecs
    assert _idxs(store, vecs, col("v").is_not_null()) == [
        i for i in range(20) if i not in (2, 5)
    ]


def test_isin_rows(store_vecs):
    store, vecs = store_vecs
    assert _idxs(store, vecs, col("v").isin([1, 4, 7])) == [0, 3, 6]
    # values that are nobody's: empty result
    assert _idxs(store, vecs, col("v").isin([99, 100])) == []


def test_between_rows(store_vecs):
    store, vecs = store_vecs
    # vals 4,5,7,8 at rows 3,4,6,7 (row 5 is null -> excluded)
    assert _idxs(store, vecs, col("v").between(4, 8)) == [3, 4, 6, 7]


def test_not_eq_excludes_nulls(store_vecs):
    store, vecs = store_vecs
    # ~eq(1) == neq(1): row 0 (value 1) and null rows 2, 5 excluded
    expected = [i for i in range(20) if i not in (0, 2, 5)]
    assert _idxs(store, vecs, ~col("v").eq(1)) == expected
    assert _idxs(store, vecs, col("v").neq(1)) == expected


def test_not_over_and_matches_oracle(store_vecs):
    store, vecs = store_vecs
    got = _idxs(store, vecs, ~(col("v").gt(5) & col("s").eq("alpha")))
    expected = []
    for i in range(20):
        a = VALS[i] is not None and VALS[i] <= 5  # ~gt with nulls excluded
        b = NAMES[i % len(NAMES)] is not None and NAMES[i % len(NAMES)] != "alpha"
        if a or b:
            expected.append(i)
    assert got == expected


@pytest.mark.parametrize(
    "make,oracle",
    [
        (lambda: ~col("s").contains("mm"), lambda v: "mm" not in v),
        (lambda: ~col("s").starts_with("be"), lambda v: not v.startswith("be")),
        (lambda: ~col("s").ends_with("ta"), lambda v: not v.endswith("ta")),
    ],
)
def test_negated_extended_string_predicates(store_vecs, make, oracle):
    store, vecs = store_vecs
    got = _idxs(store, vecs, make())
    expected = [
        i
        for i in range(20)
        if NAMES[i] is not None and oracle(NAMES[i])
    ]
    assert got == expected


def test_negated_fuzzy(store_vecs):
    store, vecs = store_vecs
    got = _idxs(store, vecs, ~col("s").fuzzy("beta", 1))
    # within 1 edit of "beta": only "beta" itself among the fixtures
    expected = [i for i in range(20) if NAMES[i] is not None and NAMES[i] != "beta"]
    assert got == expected


def test_mixed_null_and_value_clause(store_vecs):
    store, vecs = store_vecs
    # (v is null) OR (v between 18 and 20): rows 2, 5 (nulls) + 17, 18, 19
    got = _idxs(store, vecs, col("v").is_null() | col("v").between(18, 20))
    assert got == [2, 5, 17, 18, 19]


# ---------------------------------------------------------------------------
# chunk pruning (exact evaluated-chunk counts, zonemap-tests style)
# ---------------------------------------------------------------------------


def test_is_null_prunes_fully_non_null_chunks(store_vecs):
    store, vecs = store_vecs
    (
        store.query(vecs[0].tolist(), Metric.Cosine)
        .meta_filter(col("v").is_null())
        .take(5)
        .collect()
    )
    st = store.last_query_stats()
    # nulls in v sit at rows 2 and 5 -> chunks 0 and 1 of 5 (chunk_size=4)
    assert st.total_chunks == 5
    assert st.evaluated_chunks == 2
    assert st.pruned_chunks == 3


def test_is_not_null_prunes_all_null_chunk():
    vals = [None] * 4 + [1, 2, 3, 4]
    names = ["x"] * 8
    store, vecs = _build(vals, names, chunk=4)
    (
        store.query(vecs[0].tolist(), Metric.Cosine)
        .meta_filter(col("v").is_not_null())
        .take(8)
        .collect()
    )
    st = store.last_query_stats()
    assert st.total_chunks == 2
    assert st.evaluated_chunks == 1  # the all-null chunk is pruned


def test_negated_contains_chunk_pruning():
    # chunk 0 all contain "aa" -> pruned for ~contains("aa")
    names = ["aab", "aac", "aad", "aae", "zzb", "aaf", "zzc", "zzd"]
    store, vecs = _build([1] * 8, names, chunk=4)
    got = _idxs_n(store, vecs, ~col("s").contains("aa"), 8)
    assert got == [4, 6, 7]
    st = store.last_query_stats()
    assert st.evaluated_chunks == 1


def _idxs_n(store, vecs, expr, n):
    r = (
        store.query(vecs[0].tolist(), Metric.Cosine)
        .meta_filter(expr)
        .take(n)
        .collect()
    )
    return sorted(r.indices)


# ---------------------------------------------------------------------------
# sharded agreement
# ---------------------------------------------------------------------------


def test_sharded_store_agrees_on_extensions():
    import jax
    from jax.sharding import Mesh

    from otters_tpu.parallel import ShardedMetaStore

    rng = np.random.default_rng(1)
    n = 300
    vecs = rng.normal(size=(n, 16)).astype(np.float32)
    vals = [int(i) if i % 7 else None for i in range(n)]
    names = [
        ["red", "green", "blue", "cyan"][i % 4] if i % 5 else None
        for i in range(n)
    ]
    cols = [
        Column("v", DataType.Int64).from_values(vals),
        Column("s", DataType.String).from_values(names),
    ]
    store = (
        MetaStore.from_columns(cols)
        .with_vectors(vecs.tolist())
        .with_chunk_size(32)
        .build()
    )
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("rows", "batch"))
    sh = ShardedMetaStore.shard(store, mesh)
    exprs = [
        col("v").is_null(),
        col("v").is_not_null() & col("v").lt(50),
        ~col("s").contains("e"),
        col("s").is_null() | col("v").between(10, 20),
        col("v").isin([3, 8, 13]),
        ~col("s").fuzzy("red", 1),
    ]
    q = vecs[:8].tolist()
    for e in exprs:
        a = store.query_batch(q, Metric.Cosine).meta_filter(e).take(15).collect()
        b = sh.query_batch(q, Metric.Cosine).meta_filter(e).take(15).collect()
        assert sorted(a.indices) == sorted(b.indices)
        assert len(a.indices) == 15
