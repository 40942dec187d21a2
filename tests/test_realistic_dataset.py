"""Realistic-workload integration test (the reference roadmap's "Test with
real datasets", done offline via otters_tpu.datasets.synthetic_catalog).

A clustered-embedding e-commerce catalog is driven through the full public
surface — build with Z-order, a realistic filtered/unfiltered query mix,
batch queries with vec_filter, persistence, mutation — and every result is
checked EXACTLY against a pure-numpy oracle (brute-force scores + host CNF
evaluation). Pruning rates are asserted, not just correctness.
"""

import numpy as np
import pytest

from otters_tpu import Cmp, MetaStore, Metric, col
from otters_tpu.datasets import synthetic_catalog

N = 6000
DIM = 64
CHUNK = 256


@pytest.fixture(scope="module")
def catalog():
    vecs, cols = synthetic_catalog(N, DIM, seed=42)
    store = (
        MetaStore.from_columns(list(cols.values()))
        .with_vectors(vecs)
        .with_chunk_size(CHUNK)
        .with_z_order(["category", "price"])
        .build()
    )
    return vecs, cols, store


def _col_arrays(cols):
    out = {}
    for name, c in cols.items():
        nulls = np.asarray(c.null_mask(), dtype=bool)
        vals = c.values()
        out[name] = (vals, nulls)
    return out


def _oracle(vecs, cols, q, mask_fn, k, metric=Metric.Cosine, vec_thr=None):
    """Brute-force numpy top-k over rows passing mask_fn(i)."""
    arrs = _col_arrays(cols)
    keep = np.fromiter((mask_fn(arrs, i) for i in range(N)), bool, count=N)
    if metric is Metric.Cosine:
        qs = np.asarray(q, dtype=np.float32)
        scores = vecs @ qs / (
            np.maximum(np.linalg.norm(vecs, axis=1), 1e-30) * np.linalg.norm(qs)
        )
        scores = np.where(np.linalg.norm(vecs, axis=1) == 0, 0.0, scores)
    else:
        raise NotImplementedError
    if vec_thr is not None:
        keep &= scores > vec_thr
    idx = np.flatnonzero(keep)
    order = idx[np.argsort(-scores[idx], kind="stable")][:k]
    return order.tolist(), scores


def test_deterministic_generation():
    v1, c1 = synthetic_catalog(500, 32, seed=7)
    v2, c2 = synthetic_catalog(500, 32, seed=7)
    assert np.array_equal(v1, v2)
    assert np.array_equal(
        np.asarray(c1["price"].values()),
        np.asarray(c2["price"].values()),
        equal_nan=True,  # null sentinel for Float64 is NaN
    )
    assert list(c1["brand"].values()) == list(c2["brand"].values())


def test_filtered_query_mix_matches_oracle(catalog):
    vecs, cols, store = catalog

    def ms(name, i, arrs):
        vals, nulls = arrs[name]
        return None if nulls[i] else vals[i]

    workload = [
        # (expression, oracle row predicate)
        (
            col("category").eq("electronics") & col("price").lt(40.0),
            lambda a, i: ms("category", i, a) == "electronics"
            and (ms("price", i, a) is not None and ms("price", i, a) < 40.0),
        ),
        (
            col("in_stock").eq(True) & col("rating").gte(4.5),
            lambda a, i: bool(ms("in_stock", i, a)) is True
            and ms("in_stock", i, a) is not None
            and (ms("rating", i, a) is not None and ms("rating", i, a) >= 4.5),
        ),
        (
            col("brand").isin(["brand_00", "brand_01", "brand_02"]),
            lambda a, i: ms("brand", i, a) in ("brand_00", "brand_01", "brand_02"),
        ),
        (
            col("listed").gte("2024-07-01") & col("reviews").gt(100),
            lambda a, i: (
                ms("listed", i, a) is not None
                and ms("listed", i, a) >= 1719792000000
            )
            and (ms("reviews", i, a) is not None and ms("reviews", i, a) > 100),
        ),
        (
            col("price").is_null() | col("brand").is_null(),
            lambda a, i: ms("price", i, a) is None or ms("brand", i, a) is None,
        ),
        (
            ~col("category").eq("grocery") & col("price").between(10.0, 20.0),
            lambda a, i: (
                ms("category", i, a) is not None
                and ms("category", i, a) != "grocery"
            )
            and (
                ms("price", i, a) is not None
                and 10.0 <= ms("price", i, a) <= 20.0
            ),
        ),
    ]
    rng = np.random.default_rng(1)
    for expr, pred in workload:
        q = vecs[rng.integers(0, N)]
        got = (
            store.query(q.tolist(), Metric.Cosine)
            .meta_filter(expr)
            .take(20)
            .collect()
        )
        want, scores = _oracle(vecs, cols, q, pred, 20)
        assert sorted(got.indices) == sorted(want), expr
        # scores must match brute force to f32 tolerance
        for gi, gs in zip(got.indices, got.scores):
            assert abs(scores[gi] - gs) < 5e-5


def test_zorder_pruning_pays_on_catalog(catalog):
    vecs, cols, store = catalog
    (
        store.query(vecs[0].tolist(), Metric.Cosine)
        .meta_filter(col("category").eq("electronics") & col("price").lt(30.0))
        .take(10)
        .collect()
    )
    st = store.last_query_stats()
    # z-order over (category, price) must prune a majority of chunks for a
    # category+price filter on clustered data
    assert st.pruned_chunks > st.total_chunks // 2
    assert st.vectors_compared < N


def test_unfiltered_and_vec_filter_batch(catalog):
    vecs, cols, store = catalog
    rng = np.random.default_rng(2)
    qs = vecs[rng.integers(0, N, size=4)]
    got = (
        store.query_batch(qs.tolist(), Metric.Cosine)
        .vec_filter(0.9, Cmp.Gt)
        .take(25)
        .collect()
    )
    # oracle: global merged top-k over the batch (vec.rs batch-merge semantics)
    pool = []
    for q in qs:
        want, scores = _oracle(
            vecs, cols, q, lambda a, i: True, N, vec_thr=0.9
        )
        pool.extend((scores[i], i) for i in want)
    pool.sort(key=lambda t: -t[0])
    want_idx = sorted({i for _, i in pool[:25]})
    assert sorted(set(got.indices)) == want_idx


def test_catalog_save_load_and_mutation(catalog, tmp_path):
    vecs, cols, store = catalog
    p = str(tmp_path / "catalog.npz")
    store.save(p)
    back = MetaStore.load(p)
    q = vecs[123]
    e = col("category").eq("home") & col("in_stock").eq(True)
    a = store.query(q.tolist(), Metric.Cosine).meta_filter(e).take(15).collect()
    b = back.query(q.tolist(), Metric.Cosine).meta_filter(e).take(15).collect()
    assert a.indices == b.indices

    # delete the current top hit; it must vanish from results
    top = a.indices[0]
    back.delete_rows([top])
    c = back.query(q.tolist(), Metric.Cosine).meta_filter(e).take(15).collect()
    assert top not in c.indices
    assert set(c.indices) >= set(a.indices[1:15])
