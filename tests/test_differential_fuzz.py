"""Differential fuzzing: random stores + random filters vs a numpy oracle.

The oracle is an independent reimplementation of the reference semantics
(exact scoring, CNF row filtering with null exclusion, global merged top-k),
written directly in numpy. Any divergence in surviving row sets or scores is
a correctness bug in the device engine.
"""

import os

import numpy as np
import pytest

from otters_tpu import Cmp, Column, DataType, Metric, MetaStore, col
from otters_tpu.expr import Expr
from otters_tpu.types import CmpOp

DTYPES = [
    DataType.Int32,
    DataType.Int64,
    DataType.Float32,
    DataType.Float64,
    DataType.String,
    DataType.DateTime,
    DataType.Bool,
]


def _lev(a: str, b: str) -> int:
    """Independent Levenshtein for the fuzzy oracle (full DP, no banding)."""
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[lb]


def _random_column(name: str, dt: DataType, n: int, rng) -> tuple:
    """-> (Column, raw values list with None for nulls)."""
    null_p = rng.uniform(0, 0.3)
    nulls = rng.uniform(size=n) < null_p
    if dt is DataType.Int32:
        vals = rng.integers(-50, 50, n)
    elif dt is DataType.Int64:
        vals = rng.integers(-(2**40), 2**40, n)
    elif dt is DataType.Float32:
        vals = rng.normal(0, 10, n).astype(np.float32)
    elif dt is DataType.Float64:
        vals = rng.normal(0, 10, n)
    elif dt is DataType.String:
        vals = rng.choice([f"s{i}" for i in range(8)], n)
    elif dt is DataType.Bool:
        vals = rng.uniform(size=n) < 0.5
    else:  # DateTime: days in 2024
        vals = rng.integers(0, 300, n)
    raw = []
    for i in range(n):
        if nulls[i]:
            raw.append(None)
        elif dt is DataType.String:
            raw.append(str(vals[i]))
        elif dt is DataType.Bool:
            raw.append(bool(vals[i]))
        elif dt is DataType.DateTime:
            raw.append(1704067200000 + int(vals[i]) * 86400_000)  # 2024-01-01 + d
        elif dt in (DataType.Float32, DataType.Float64):
            raw.append(float(vals[i]))
        else:
            raw.append(int(vals[i]))
    return Column(name, dt).from_values(raw), raw


def _random_leaf(name: str, dt: DataType, raw, rng) -> Expr:
    c = col(name)
    non_null = [v for v in raw if v is not None]
    leaf = None
    if rng.random() < 0.12:
        leaf = c.is_null() if rng.random() < 0.5 else c.is_not_null()
    elif dt is DataType.Bool:
        target = bool(rng.random() < 0.5)
        leaf = c.eq(target) if rng.random() < 0.5 else c.neq(target)
    elif dt is DataType.String:
        target = str(rng.choice(non_null)) if non_null else "s0"
        choice = rng.random()
        if choice < 0.3:
            leaf = c.eq(target)
        elif choice < 0.5:
            leaf = c.neq(target)
        elif choice < 0.65:
            leaf = c.contains(target[: max(1, len(target) - 1)])
        elif choice < 0.75:
            leaf = c.starts_with(target[:1])
        elif choice < 0.85:
            leaf = c.ends_with(target[-1:])
        else:
            leaf = c.fuzzy(target, int(rng.integers(0, 3)))
    else:
        op = rng.choice(["eq", "neq", "lt", "lte", "gt", "gte"])
        if dt is DataType.DateTime:
            ms = int(rng.choice(non_null)) if non_null else 1704067200000
            import datetime

            s = datetime.datetime.fromtimestamp(
                ms / 1000, tz=datetime.timezone.utc
            ).strftime("%Y-%m-%dT%H:%M:%SZ")
            leaf = getattr(c, op)(s)
        elif dt in (DataType.Int32, DataType.Int64):
            choice = rng.random()
            if choice < 0.12 and len(non_null) >= 2:
                vals = [int(v) for v in rng.choice(non_null, size=3)]
                leaf = c.isin(vals)
            elif choice < 0.24 and len(non_null) >= 2:
                lo, hi = sorted(
                    (int(rng.choice(non_null)), int(rng.choice(non_null)))
                )
                leaf = c.between(lo, hi)
            else:
                v = int(rng.choice(non_null)) if non_null else 0
                leaf = getattr(c, op)(v)
        else:
            v = float(rng.choice(non_null)) if non_null else 0.0
            leaf = getattr(c, op)(v)
    # random negation exercises the De Morgan push-down on every leaf kind
    if rng.random() < 0.25:
        leaf = ~leaf
    return leaf


def _oracle_str(v: str, leaf_cmp: CmpOp, rhs) -> bool:
    if leaf_cmp is CmpOp.Eq:
        return v == rhs
    if leaf_cmp is CmpOp.Neq:
        return v != rhs
    if leaf_cmp is CmpOp.Contains:
        return rhs in v
    if leaf_cmp is CmpOp.StartsWith:
        return v.startswith(rhs)
    if leaf_cmp is CmpOp.EndsWith:
        return v.endswith(rhs)
    if leaf_cmp is CmpOp.Fuzzy:
        pattern, max_dist = rhs
        return _lev(v, pattern) <= max_dist
    if leaf_cmp is CmpOp.NotContains:
        return rhs not in v
    if leaf_cmp is CmpOp.NotStartsWith:
        return not v.startswith(rhs)
    if leaf_cmp is CmpOp.NotEndsWith:
        return not v.endswith(rhs)
    if leaf_cmp is CmpOp.NotFuzzy:
        pattern, max_dist = rhs
        return _lev(v, pattern) > max_dist
    raise AssertionError(leaf_cmp)


def _oracle_leaf_mask(dt: DataType, raw, leaf_cmp: CmpOp, rhs) -> np.ndarray:
    n = len(raw)
    out = np.zeros(n, dtype=bool)
    for i, v in enumerate(raw):
        if leaf_cmp is CmpOp.IsNull:
            out[i] = v is None
            continue
        if leaf_cmp is CmpOp.IsNotNull:
            out[i] = v is not None
            continue
        if v is None:
            continue
        if dt is DataType.String:
            out[i] = _oracle_str(v, leaf_cmp, rhs)
        else:
            out[i] = {
                CmpOp.Eq: v == rhs,
                CmpOp.Neq: v != rhs,
                CmpOp.Lt: v < rhs,
                CmpOp.Lte: v <= rhs,
                CmpOp.Gt: v > rhs,
                CmpOp.Gte: v >= rhs,
            }[leaf_cmp]
    return out


def _oracle(
    vectors, queries, metric, compiled, raw_cols, schema, k, thr, cmp,
    alive=None,
):
    n = len(vectors)
    mask = np.ones(n, dtype=bool)
    if alive is not None:
        mask &= alive
    for clause in compiled.clauses:
        cm = np.zeros(n, dtype=bool)
        for lf in clause:
            cm |= _oracle_leaf_mask(
                schema[lf.column], raw_cols[lf.column], lf.cmp, lf.rhs
            )
        mask &= cm
    if metric is Metric.DotProduct:
        s = queries @ vectors.T
        take_min = False
    elif metric is Metric.Cosine:
        qi = np.linalg.norm(queries, axis=1)
        qi = np.where(qi != 0, 1.0 / qi, 0.0)
        vi = np.linalg.norm(vectors, axis=1)
        vi = np.where(vi != 0, 1.0 / vi, 0.0)
        s = (queries @ vectors.T) * qi[:, None] * vi[None, :]
        take_min = False
    elif metric is Metric.Manhattan:
        s = np.abs(queries[:, None, :] - vectors[None, :, :]).sum(axis=2)
        take_min = True
    elif metric is Metric.Hamming:
        s = (queries[:, None, :] != vectors[None, :, :]).sum(axis=2).astype(
            np.float64
        )
        take_min = True
    elif metric is Metric.Jaccard:
        num = np.minimum(queries[:, None, :], vectors[None, :, :]).sum(axis=2)
        den = np.maximum(queries[:, None, :], vectors[None, :, :]).sum(axis=2)
        s = np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0)
        take_min = False
    else:
        s = (
            (queries**2).sum(1)[:, None]
            + (vectors**2).sum(1)[None, :]
            - 2 * queries @ vectors.T
        )
        take_min = True
    ok = np.broadcast_to(mask[None, :], s.shape).copy()
    if thr is not None:
        ok &= {
            Cmp.Gt: s > thr,
            Cmp.Lt: s < thr,
            Cmp.Gte: s >= thr,
            Cmp.Lte: s <= thr,
        }[cmp]
    vals = s[ok]
    order = np.sort(vals)
    return (order[:k] if take_min else order[::-1][:k]), mask


@pytest.mark.parametrize(
    "trial", range(int(os.environ.get("OTTERS_FUZZ_TRIALS", "40")))
)
def test_random_store_random_filter_matches_oracle(trial):
    rng = np.random.default_rng(1000 + trial)
    n = int(rng.integers(50, 800))
    d = int(rng.integers(4, 48))
    chunk = int(rng.choice([16, 64, 256, 1024]))
    n_cols = int(rng.integers(1, 4))

    cols, raws, schema = [], {}, {}
    for ci in range(n_cols):
        dt = DTYPES[rng.integers(0, len(DTYPES))]
        name = f"c{ci}"
        c, raw = _random_column(name, dt, n, rng)
        cols.append(c)
        raws[name] = raw
        schema[name] = dt

    vectors = rng.normal(size=(n, d)).astype(np.float32)
    store = (
        MetaStore.from_columns(cols)
        .with_vectors(vectors)
        .with_chunk_size(chunk)
        .build()
    )

    # random CNF expression over 1-3 leaves
    leaves = [
        _random_leaf(name, schema[name], raws[name], rng)
        for name in rng.choice(list(schema), size=rng.integers(1, 4))
    ]
    expr = leaves[0]
    for e in leaves[1:]:
        expr = (expr & e) if rng.random() < 0.5 else (expr | e)

    metric = [
        Metric.Cosine, Metric.DotProduct, Metric.Euclidean,
        Metric.Manhattan, Metric.Hamming, Metric.Jaccard,
    ][rng.integers(0, 6)]
    b = int(rng.integers(1, 4))
    if metric in (Metric.Hamming, Metric.Jaccard):
        # binary data: the natural domain (and where exact ties abound,
        # stressing the stable tie-breaking)
        vectors = (vectors > 0).astype(np.float32)
        queries = (rng.normal(size=(b, d)) > 0).astype(np.float32)
        store = (
            MetaStore.from_columns(cols)
            .with_vectors(vectors)
            .with_chunk_size(chunk)
            .build()
        )
    else:
        queries = rng.normal(size=(b, d)).astype(np.float32)
    k = int(rng.integers(1, 30))
    use_vf = rng.random() < 0.4
    thr = float(rng.normal(0, 5)) if use_vf else None
    vcmp = (
        Cmp.Gt
        if metric in (Metric.Cosine, Metric.DotProduct, Metric.Jaccard)
        else Cmp.Lt
    )

    plan = store.query_batch(queries, metric).meta_filter(expr).take(k)
    if use_vf:
        plan = plan.vec_filter(thr, vcmp)
    got = plan.collect()

    compiled = expr.compile(store.schema())
    want_scores, row_mask = _oracle(
        vectors, queries, metric, compiled, raws, schema, k,
        thr if use_vf else None, vcmp,
    )

    assert len(got) == len(want_scores), (
        f"trial {trial}: count {len(got)} vs oracle {len(want_scores)}"
    )
    np.testing.assert_allclose(
        got.scores, want_scores, rtol=2e-4, atol=2e-4,
        err_msg=f"trial {trial}",
    )
    # every returned row must satisfy the filter per the oracle
    for i in got.indices:
        assert row_mask[i], f"trial {trial}: row {i} fails the filter"
    # stats sanity: pruning never loses a matching chunk
    stats = store.last_query_stats()
    assert stats.evaluated_chunks + stats.pruned_chunks == stats.total_chunks


@pytest.mark.parametrize(
    "trial", range(int(os.environ.get("OTTERS_FUZZ_SHARDED_TRIALS", "12")))
)
def test_random_sharded_store_matches_oracle(trial, tmp_path):
    """The SPMD sharded engine under the same differential oracle: random
    stores built straight onto an 8-device mesh (4 row shards x 2 batch),
    random CNF filters over every dtype, every metric, random vec_filter,
    plus random mutations — tombstone deletes, compacting appends
    (sharded append rebuilds onto the mesh), and save -> load(mesh)
    roundtrips (direct sharded reload)."""
    from otters_tpu.parallel import make_mesh

    rng = np.random.default_rng(7000 + trial)
    n = int(rng.integers(50, 800))
    # few distinct dims/chunks keep the SPMD compile cache warm across trials
    d = int(rng.choice([8, 16, 32]))
    chunk = int(rng.choice([256, 512]))
    n_cols = int(rng.integers(1, 4))

    cols, raws, schema = [], {}, {}
    for ci in range(n_cols):
        dt = DTYPES[rng.integers(0, len(DTYPES))]
        name = f"c{ci}"
        c, raw = _random_column(name, dt, n, rng)
        cols.append(c)
        raws[name] = raw
        schema[name] = dt

    vectors = rng.normal(size=(n, d)).astype(np.float32)
    metric = [
        Metric.Cosine, Metric.DotProduct, Metric.Euclidean,
        Metric.Manhattan, Metric.Hamming, Metric.Jaccard,
    ][rng.integers(0, 6)]
    b = int(rng.integers(1, 4))
    if metric in (Metric.Hamming, Metric.Jaccard):
        vectors = (vectors > 0).astype(np.float32)
        queries = (rng.normal(size=(b, d)) > 0).astype(np.float32)
    else:
        queries = rng.normal(size=(b, d)).astype(np.float32)

    mesh = make_mesh(rows=4, batch=2)
    store = (
        MetaStore.from_columns(cols)
        .with_vectors(vectors)
        .with_chunk_size(chunk)
        .build_sharded(mesh)
    )

    alive = np.ones(n, dtype=bool)
    if rng.random() < 0.5:
        dead = rng.choice(n, size=int(rng.integers(1, max(2, n // 10))),
                          replace=False)
        store.delete_rows(dead.tolist())
        alive[dead] = False

    if rng.random() < 0.35:
        # compacting append: surviving + new rows, fresh ids — rebuild the
        # oracle's view the same way
        m = int(rng.integers(1, 60))
        new_vecs = rng.normal(size=(m, d)).astype(np.float32)
        if metric in (Metric.Hamming, Metric.Jaccard):
            new_vecs = (new_vecs > 0).astype(np.float32)
        new_raws = {
            name: _random_column(name, schema[name], m, rng)[1]
            for name in schema
        }
        store = store.append(new_vecs, dict(new_raws))
        keep = np.flatnonzero(alive)
        vectors = np.concatenate([vectors[keep], new_vecs], axis=0)
        raws = {
            name: [raws[name][i] for i in keep] + list(new_raws[name])
            for name in schema
        }
        n = vectors.shape[0]
        alive = np.ones(n, dtype=bool)

    if rng.random() < 0.25:
        # persistence roundtrip straight back onto the mesh
        path = str(tmp_path / f"fuzz_{trial}.npz")
        store.save(path)
        store = MetaStore.load(path, mesh=mesh)

    leaves = [
        _random_leaf(name, schema[name], raws[name], rng)
        for name in rng.choice(list(schema), size=rng.integers(1, 4))
    ]
    expr = leaves[0]
    for e in leaves[1:]:
        expr = (expr & e) if rng.random() < 0.5 else (expr | e)

    k = int(rng.integers(1, 30))
    use_vf = rng.random() < 0.4
    thr = float(rng.normal(0, 5)) if use_vf else None
    vcmp = (
        Cmp.Gt
        if metric in (Metric.Cosine, Metric.DotProduct, Metric.Jaccard)
        else Cmp.Lt
    )

    plan = store.query_batch(queries, metric).meta_filter(expr).take(k)
    if use_vf:
        plan = plan.vec_filter(thr, vcmp)
    got = plan.collect()

    compiled = expr.compile(store.schema())
    want_scores, row_mask = _oracle(
        vectors, queries, metric, compiled, raws, schema, k,
        thr if use_vf else None, vcmp, alive=alive,
    )

    assert len(got) == len(want_scores), (
        f"trial {trial}: count {len(got)} vs oracle {len(want_scores)}"
    )
    np.testing.assert_allclose(
        got.scores, want_scores, rtol=2e-4, atol=2e-4,
        err_msg=f"trial {trial}",
    )
    for i in got.indices:
        assert row_mask[i], f"trial {trial}: row {i} fails filter/alive"
    stats = store.last_query_stats()
    assert stats.evaluated_chunks + stats.pruned_chunks == stats.total_chunks
