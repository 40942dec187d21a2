"""Multi-device sharded search tests on an 8-way virtual CPU mesh.

The TPU-world substitute for a real pod (SURVEY.md §4): shard rows across a
jax.sharding Mesh, run the SPMD search, and assert exact agreement with the
single-device path and with numpy brute force.
"""

import numpy as np
import pytest

import jax

from otters_tpu import Cmp, Metric, TakeType, VecStore
from otters_tpu.parallel import ShardedVecStore, make_mesh


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)
    vectors = rng.normal(size=(1000, 32)).astype(np.float32)
    queries = rng.normal(size=(4, 32)).astype(np.float32)
    return vectors, queries


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.shape["rows"] == 8
    mesh2 = make_mesh(rows=4, batch=2)
    assert mesh2.shape["rows"] == 4 and mesh2.shape["batch"] == 2
    with pytest.raises(ValueError):
        make_mesh(rows=3, batch=2)


def test_sharded_matches_single_device(data):
    vectors, queries = data
    mesh = make_mesh(rows=8, batch=1)
    sharded = ShardedVecStore(mesh, vectors)
    local = VecStore(32)
    local.add_vectors(vectors)

    for metric, tt in [
        (Metric.DotProduct, None),
        (Metric.Cosine, None),
        (Metric.Euclidean, TakeType.Min),
    ]:
        got = sharded.search(queries, metric, k=10, take_type=tt)
        plan = local.query(queries, metric)
        plan = plan.take_min(10) if tt is TakeType.Min else plan.take(10)
        want = plan.collect()
        assert [r.index for r in got] == [r.index for r in want], metric
        np.testing.assert_allclose(
            [r.score for r in got], [r.score for r in want], rtol=1e-6, atol=1e-6
        )


def test_sharded_batch_axis(data):
    vectors, queries = data
    mesh = make_mesh(rows=4, batch=2)
    sharded = ShardedVecStore(mesh, vectors)
    got = sharded.search(queries, Metric.DotProduct, k=10)
    # brute force global merge over all (query, row) pairs
    scores = queries @ vectors.T
    best = np.sort(scores.reshape(-1))[-10:][::-1]
    np.testing.assert_allclose([r.score for r in got], best, rtol=1e-6, atol=1e-5)


def test_sharded_with_filter(data):
    vectors, queries = data
    mesh = make_mesh(rows=8, batch=1)
    sharded = ShardedVecStore(mesh, vectors)
    got = sharded.search(
        queries[:1], Metric.DotProduct, k=1000, vec_filter=(5.0, Cmp.Gt)
    )
    scores = (queries[:1] @ vectors.T).reshape(-1)
    want = np.sort(scores[scores > 5.0])[::-1]
    np.testing.assert_allclose([r.score for r in got], want, rtol=1e-6, atol=1e-5)


def test_sharded_odd_batch_padding(data):
    vectors, _ = data
    rng = np.random.default_rng(7)
    queries = rng.normal(size=(3, 32)).astype(np.float32)  # 3 queries, 2 shards
    mesh = make_mesh(rows=4, batch=2)
    sharded = ShardedVecStore(mesh, vectors)
    got = sharded.search(queries, Metric.DotProduct, k=5)
    scores = (queries @ vectors.T).reshape(-1)
    best = np.sort(scores)[-5:][::-1]
    np.testing.assert_allclose([r.score for r in got], best, rtol=1e-6, atol=1e-5)


def test_global_indices_across_shards(data):
    vectors, _ = data
    mesh = make_mesh(rows=8, batch=1)
    sharded = ShardedVecStore(mesh, vectors)
    # query equal to a specific stored row in the LAST shard's range
    target = 987
    got = sharded.search(vectors[target], Metric.Cosine, k=1)
    assert got[0].index == target
    assert abs(got[0].score - 1.0) < 1e-5
