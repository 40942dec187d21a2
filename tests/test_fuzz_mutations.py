"""Differential fuzz #2: sort-by, tombstone deletes and extended string ops.

Extends tests/test_differential_fuzz.py to the beyond-reference features:
random clustering column, random deletions, and contains/starts_with leaves,
all validated against a brute-force numpy oracle on ORIGINAL row ids.
"""

import numpy as np
import pytest

from otters_tpu import Column, DataType, Metric, MetaStore, col


@pytest.mark.parametrize("trial", range(15))
def test_sorted_deleted_extended_matches_oracle(trial):
    rng = np.random.default_rng(5000 + trial)
    n = int(rng.integers(100, 600))
    d = int(rng.integers(4, 24))
    chunk = int(rng.choice([32, 128, 512]))

    price = rng.uniform(0, 100, n)
    names = [
        None if rng.random() < 0.1 else f"{rng.choice(['ab','cd','ef'])}_{i % 20}"
        for i in range(n)
    ]
    vectors = rng.normal(size=(n, d)).astype(np.float32)

    builder = (
        MetaStore.from_columns(
            [
                Column("price", DataType.Float64).from_values(list(price)),
                Column("name", DataType.String).from_values(names),
            ]
        )
        .with_vectors(vectors)
        .with_chunk_size(chunk)
    )
    use_sort = rng.random() < 0.6
    if use_sort:
        builder = builder.with_sort_by("price", descending=bool(rng.random() < 0.3))
    store = builder.build()

    deleted = set()
    if rng.random() < 0.7:
        deleted = set(rng.choice(n, size=rng.integers(1, n // 4), replace=False).tolist())
        store.delete_rows(sorted(deleted))
    assert len(store) == n - len(deleted)

    thr = float(rng.uniform(10, 90))
    prefix = str(rng.choice(["ab", "cd", "ef"]))
    variant = int(rng.integers(0, 3))
    if variant == 0:
        expr = col("price").lt(thr) & col("name").starts_with(prefix)
        pred = lambda i: price[i] < thr and names[i] is not None and names[i].startswith(prefix)  # noqa: E731
    elif variant == 1:
        expr = col("price").gte(thr) | col("name").contains("_1")
        pred = lambda i: price[i] >= thr or (names[i] is not None and "_1" in names[i])  # noqa: E731
    else:
        expr = col("name").ends_with("_7") & col("price").gt(thr)
        pred = lambda i: names[i] is not None and names[i].endswith("_7") and price[i] > thr  # noqa: E731

    k = int(rng.integers(1, 20))
    q = rng.normal(size=d).astype(np.float32)
    got = store.query(q, Metric.Cosine).meta_filter(expr).take(k).collect()

    # numpy oracle over original ids, deletions excluded
    qi = 1.0 / np.linalg.norm(q)
    vi = np.linalg.norm(vectors, axis=1)
    vi = np.where(vi != 0, 1.0 / vi, 0.0)
    sims = (vectors @ q) * qi * vi
    eligible = [i for i in range(n) if i not in deleted and pred(i)]
    want = sorted(eligible, key=lambda i: (-sims[i], i))[:k]

    assert got.indices == want, f"trial {trial}"
    np.testing.assert_allclose(
        got.scores, [sims[i] for i in want], rtol=2e-4, atol=2e-4
    )
    # materialized metadata corresponds to the original rows
    for pos, i in enumerate(got.indices):
        if names[i] is None:
            assert bool(got.column("name").null_mask()[pos])
        else:
            assert got.column("name").string_values()[pos] == names[i]
