"""Fuzzy string matching (bounded Levenshtein): DSL, kernels, parity."""

import numpy as np
import pytest

from otters_tpu import Column, DataType, Metric, MetaStore, col
from otters_tpu import native
from otters_tpu.errors import ExprError, OttersError
from otters_tpu.ops.strmatch import bounded_levenshtein, fuzzy_mask


@pytest.mark.parametrize("a,b,k,want", [
    ("otter", "otter", 0, True),
    ("otter", "otters", 0, False),
    ("otter", "otters", 1, True),
    ("otter", "oter", 1, True),       # deletion
    ("otter", "otster", 1, True),     # insertion
    ("otter", "ottar", 1, True),      # substitution
    ("otter", "ottt", 2, True),
    ("otter", "ott", 2, True),
    ("otter", "ot", 2, False),        # distance 3
    ("", "", 0, True),
    ("", "ab", 2, True),
    ("", "abc", 2, False),
    ("kitten", "sitting", 3, True),   # classic example, distance 3
    ("kitten", "sitting", 2, False),
])
def test_bounded_levenshtein(a, b, k, want):
    assert bounded_levenshtein(a.encode(), b.encode(), k) is want
    # symmetric
    assert bounded_levenshtein(b.encode(), a.encode(), k) is want


def test_native_matches_python_fallback():
    rng = np.random.default_rng(95)
    words = ["otter", "ottre", "oter", "badger", "otterz", "", "o",
             "ötter", "otteér"]  # incl. multi-byte UTF-8
    strings = [words[i] for i in rng.integers(0, len(words), 500)]
    nulls = rng.random(500) < 0.1
    for pattern, k in [("otter", 1), ("otter", 2), ("", 1), ("badger", 0)]:
        got = fuzzy_mask(strings, nulls, pattern, k)
        pat = pattern.encode()
        want = np.array([
            (not nulls[i]) and bounded_levenshtein(s.encode(), pat, k)
            for i, s in enumerate(strings)
        ])
        np.testing.assert_array_equal(got, want, err_msg=f"{pattern}/{k}")
    if not native.available():
        pytest.skip("native lib unavailable; python fallback self-compared")


def test_fuzzy_meta_filter_end_to_end():
    rng = np.random.default_rng(96)
    n, d = 800, 8
    base = ["otter", "ottre", "badger", "otterz", "weasel"]
    names = [base[i % 5] for i in range(n)]
    store = (
        MetaStore.from_columns(
            [Column("name", DataType.String).from_values(names)]
        )
        .with_vectors(rng.normal(size=(n, d)).astype(np.float32))
        .with_chunk_size(128)
        .build()
    )
    q = rng.normal(size=d).astype(np.float32)
    r = (
        store.query(q, Metric.Cosine)
        .meta_filter(col("name").fuzzy("otter", max_dist=1))
        .take(50)
        .collect()
    )
    # distance <= 1: otter (0), ottre (2? o-t-t-r-e vs o-t-t-e-r: swap = 2 subs),
    # otterz (1 insertion). ottre is distance 2 -> excluded.
    assert r.indices, "no fuzzy matches"
    for i in r.indices:
        assert names[i] in ("otter", "otterz"), names[i]
    # max_dist=2 admits ottre too
    r2 = (
        store.query(q, Metric.Cosine)
        .meta_filter(col("name").fuzzy("otter", max_dist=2))
        .take(800)
        .collect()
    )
    got = {names[i] for i in r2.indices}
    assert got == {"otter", "ottre", "otterz"}
    # pruning stats stay consistent
    st = store.last_query_stats()
    assert st.evaluated_chunks + st.pruned_chunks == st.total_chunks


def test_fuzzy_type_rules():
    store = MetaStore.from_columns(
        [Column("v", DataType.Int32).from_values([1, 2])]
    ).with_vectors(np.ones((2, 4), np.float32)).build()
    plan = store.query(np.ones(4, np.float32), Metric.Cosine).meta_filter(
        col("v").fuzzy("x", 1)
    )
    with pytest.raises(OttersError):
        plan.take(1).collect()
    with pytest.raises(ExprError):
        col("s").fuzzy(42)  # non-string pattern rejected at build


def test_fuzzy_on_sharded_store():
    from otters_tpu.parallel import ShardedMetaStore, make_mesh

    rng = np.random.default_rng(97)
    n, d = 1200, 8
    names = ["otter" if i % 3 == 0 else "badger" for i in range(n)]
    local = (
        MetaStore.from_columns(
            [Column("name", DataType.String).from_values(names)]
        )
        .with_vectors(rng.normal(size=(n, d)).astype(np.float32))
        .with_chunk_size(128)
        .build()
    )
    sharded = ShardedMetaStore.shard(local, make_mesh(rows=4, batch=2))
    q = rng.normal(size=(2, d)).astype(np.float32)
    a = local.query_batch(q, Metric.Cosine).meta_filter(
        col("name").fuzzy("otters", 1)).take(9).collect()
    b = sharded.query_batch(q, Metric.Cosine).meta_filter(
        col("name").fuzzy("otters", 1)).take(9).collect()
    assert a.indices == b.indices
    assert all(names[i] == "otter" for i in b.indices)
