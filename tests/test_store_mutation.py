"""Store mutation and edge-case behaviors."""

import numpy as np

from otters_tpu import Metric, VecStore


def test_append_after_query_invalidates_device_cache():
    store = VecStore(2)
    store.add_vector([1.0, 0.0])
    r1 = store.query([1.0, 0.0], Metric.DotProduct).take(5).collect()
    assert [r.index for r in r1] == [0]
    # append after the device array was materialized
    store.add_vector([2.0, 0.0])
    r2 = store.query([1.0, 0.0], Metric.DotProduct).take(5).collect()
    assert [r.index for r in r2] == [1, 0]
    assert abs(r2[0].score - 2.0) < 1e-6


def test_short_row_mask_missing_bits_default_true():
    """Mask shorter than the store: missing bits treated as True
    (reference vec.rs:231-237 `unwrap_or(true)`)."""
    store = VecStore(2)
    store.add_vectors([[1.0, 0.0], [0.9, 0.0], [0.8, 0.0]])
    mask = np.array([False])  # only row 0 masked; rows 1,2 unspecified
    results = (
        store.query([1.0, 0.0], Metric.DotProduct)
        .with_row_mask(mask)
        .take(3)
        .collect()
    )
    assert [r.index for r in results] == [1, 2]


def test_builder_chain_via_with_methods():
    from otters_tpu import VecQueryPlan

    store = VecStore(2)
    store.add_vectors([[1.0, 0.0], [0.0, 1.0]])
    results = (
        VecQueryPlan()
        .with_vector_store(store)
        .with_query_vectors([1.0, 0.0])
        .with_metric(Metric.Cosine)
        .take(1)
        .collect()
    )
    assert results[0].index == 0
