"""Z-order (Morton) multi-column clustering — the reference's roadmap item
"Ability to reorder metadata for better pruning (Something like Z-ordering)".

``with_sort_by`` clusters one column; ``with_z_order`` interleaves dense-rank
codes so EVERY listed column gets locality and zonemaps prune filters on any
of them. Results always report original ingestion-order row ids.
"""

import numpy as np
import pytest

from otters_tpu import Column, DataType, MetaStore, Metric, col
from otters_tpu.errors import OttersError

N = 4096
CHUNK = 128
rng = np.random.default_rng(3)
VECS = rng.normal(size=(N, 16)).astype(np.float32)
A = rng.integers(0, 100, N)
B = rng.integers(0, 100, N)


def _cols():
    return [
        Column("a", DataType.Int32).from_values(A.tolist()),
        Column("b", DataType.Int64).from_values(B.tolist()),
    ]


def _build(sort=None, z=None):
    bld = MetaStore.from_columns(_cols()).with_vectors(VECS.tolist())
    bld = bld.with_chunk_size(CHUNK)
    if sort:
        bld = bld.with_sort_by(sort)
    if z:
        bld = bld.with_z_order(z)
    return bld.build()


@pytest.fixture(scope="module")
def stores():
    return _build(), _build(sort="a"), _build(z=["a", "b"])


def _eval_chunks(store, expr):
    (
        store.query(VECS[0].tolist(), Metric.Cosine)
        .meta_filter(expr)
        .take(10)
        .collect()
    )
    return store.last_query_stats().evaluated_chunks


def test_zorder_prunes_every_listed_column(stores):
    plain, sort_a, zord = stores
    n_chunks = N // CHUNK
    # plain random layout: selective filters can't prune
    assert _eval_chunks(plain, col("a").lt(10)) == n_chunks
    assert _eval_chunks(plain, col("b").lt(10)) == n_chunks
    # single-column sort prunes its column only
    assert _eval_chunks(sort_a, col("a").lt(10)) <= n_chunks // 4
    assert _eval_chunks(sort_a, col("b").lt(10)) == n_chunks
    # z-order prunes BOTH
    assert _eval_chunks(zord, col("a").lt(10)) <= n_chunks // 2
    assert _eval_chunks(zord, col("b").lt(10)) <= n_chunks // 2


def test_results_agree_across_layouts(stores):
    plain, sort_a, zord = stores
    exprs = [
        col("a").lt(10),
        col("b").between(40, 60),
        col("a").gte(90) & col("b").lt(50),
    ]
    for e in exprs:
        got = [
            sorted(
                s.query(VECS[1].tolist(), Metric.Cosine)
                .meta_filter(e)
                .take(50)
                .collect()
                .indices
            )
            for s in (plain, sort_a, zord)
        ]
        assert got[0] == got[1] == got[2]
        assert got[0]  # non-trivial


def test_zorder_with_strings_and_nulls():
    n = 512
    v = np.random.default_rng(5).normal(size=(n, 8)).astype(np.float32)
    cats = [
        None if i % 97 == 0 else ["ant", "bee", "cat", "dog"][i % 4]
        for i in range(n)
    ]
    nums = [None if i % 89 == 0 else i % 50 for i in range(n)]
    cols = [
        Column("cat", DataType.String).from_values(cats),
        Column("num", DataType.Float64).from_values(
            [float(x) if x is not None else None for x in nums]
        ),
    ]
    store = (
        MetaStore.from_columns(cols)
        .with_vectors(v.tolist())
        .with_chunk_size(32)
        .with_z_order(["cat", "num"])
        .build()
    )
    r = (
        store.query(v[0].tolist(), Metric.Cosine)
        .meta_filter(col("cat").eq("bee") & col("num").lt(10.0))
        .take(n)
        .collect()
    )
    expected = sorted(
        i
        for i in range(n)
        if cats[i] == "bee" and nums[i] is not None and nums[i] < 10
    )
    assert sorted(r.indices) == expected
    # string equality gets locality too: Bloom + clustering prune chunks
    (
        store.query(v[0].tolist(), Metric.Cosine)
        .meta_filter(col("cat").eq("bee"))
        .take(5)
        .collect()
    )
    st = store.last_query_stats()
    assert st.evaluated_chunks < st.total_chunks


def test_zorder_save_load_round_trip(tmp_path):
    store = _build(z=["a", "b"])
    p = str(tmp_path / "z.npz")
    store.save(p)
    back = MetaStore.load(p)
    assert back._z_order == ("a", "b")
    e = col("a").lt(10)
    r0 = sorted(
        store.query(VECS[2].tolist(), Metric.Cosine)
        .meta_filter(e)
        .take(30)
        .collect()
        .indices
    )
    r1 = sorted(
        back.query(VECS[2].tolist(), Metric.Cosine)
        .meta_filter(e)
        .take(30)
        .collect()
        .indices
    )
    assert r0 == r1
    assert _eval_chunks(back, e) < N // CHUNK


def test_zorder_survives_append():
    store = _build(z=["a", "b"])
    m = 4
    new_vecs = np.random.default_rng(9).normal(size=(m, 16)).astype(np.float32)
    new = store.append(
        new_vecs, {"a": [1, 2, 3, 4], "b": [5, 6, 7, 8]}
    )
    assert new._z_order == ("a", "b")
    assert new.n_rows == N + m
    assert _eval_chunks(new, col("a").lt(10)) < new.last_query_stats().total_chunks


def test_zorder_validation():
    with pytest.raises(OttersError):
        MetaStore.from_columns(_cols()).with_z_order([])
    with pytest.raises(OttersError):
        MetaStore.from_columns(_cols()).with_z_order(["a"] * 2)
    with pytest.raises(OttersError):
        MetaStore.from_columns(_cols()).with_z_order(list("abcdefghi"))
    # unknown column surfaces at build
    with pytest.raises(OttersError):
        (
            MetaStore.from_columns(_cols())
            .with_vectors(VECS.tolist())
            .with_z_order(["a", "nope"])
            .build()
        )
    # mutually exclusive with sort_by
    with pytest.raises(OttersError):
        (
            MetaStore.from_columns(_cols())
            .with_vectors(VECS.tolist())
            .with_sort_by("a")
            .with_z_order(["b"])
            .build()
        )


def test_zorder_sharded_agrees():
    import jax
    from jax.sharding import Mesh

    from otters_tpu.parallel import ShardedMetaStore

    store = _build(z=["a", "b"])
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("rows", "batch"))
    sh = ShardedMetaStore.shard(store, mesh)
    assert sh._z_order == ("a", "b")
    e = col("a").lt(10) | col("b").gte(95)
    q = VECS[:4].tolist()
    a = store.query_batch(q, Metric.Cosine).meta_filter(e).take(20).collect()
    b = sh.query_batch(q, Metric.Cosine).meta_filter(e).take(20).collect()
    assert sorted(a.indices) == sorted(b.indices)
