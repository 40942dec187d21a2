"""Evaluation helpers for approximate modes.

Exact modes (f32/verified-fast) have recall@k = 1.0 by construction; the
bfloat16 and int8 storage knobs trade exactness for HBM/speed. These helpers
quantify that trade on YOUR data (the reference's "test with real datasets"
roadmap item).
"""

from __future__ import annotations

from typing import Callable, Sequence


def exact_rerank(
    queries,
    cand_indices: Sequence[int],
    fetch_vectors: Callable,
    metric,
    k: int,
    take_min=None,
):
    """Re-rank a widened candidate set with exact f32 scores.

    The int8 path at extreme scale (e.g. 10M x 768 on one chip) returns
    quantized-cosine candidates; recall@k is recovered by taking k' >> k
    candidates and re-scoring just those rows in f32 against the true
    vectors. ``fetch_vectors(indices) -> [m, d] f32`` supplies the exact
    rows (host store, regeneration, disk, ...). Batch queries merge into ONE
    global top-k, matching the reference semantics (vec.rs:217-219).

    Returns (indices[k], scores[k]) sorted by the take direction.
    """
    import numpy as np

    from .types import Metric, TakeType, default_take_type

    if take_min is None:
        # distance metrics re-rank by SMALLEST score — the same default
        # direction the query plans use (a wrong direction here would
        # silently return the k worst candidates)
        take_min = default_take_type(metric) is TakeType.Min
    cand = np.asarray(list(dict.fromkeys(int(i) for i in cand_indices)))
    if cand.size == 0:
        return [], []
    v = np.asarray(fetch_vectors(cand), dtype=np.float32)
    q = np.asarray(queries, dtype=np.float32)
    if q.ndim == 1:
        q = q[None, :]
    if metric is Metric.Cosine:
        qn = np.linalg.norm(q, axis=1)
        vn = np.linalg.norm(v, axis=1)
        # guard the divisor BEFORE dividing: 1/qn on a zero-norm row emits
        # a RuntimeWarning even though np.where discards the result
        s = (q @ v.T) * np.where(qn > 0, 1 / np.where(qn > 0, qn, 1.0), 0)[:, None]
        s = s * np.where(vn > 0, 1 / np.where(vn > 0, vn, 1.0), 0)[None, :]
    elif metric is Metric.DotProduct:
        s = q @ v.T
    elif metric is Metric.Euclidean:
        s = (
            (q * q).sum(1)[:, None]
            + (v * v).sum(1)[None, :]
            - 2.0 * (q @ v.T)
        )
    elif metric is Metric.Hamming:
        s = (q[:, None, :] != v[None, :, :]).sum(axis=2).astype(np.float32)
    elif metric is Metric.Jaccard:
        num = np.minimum(q[:, None, :], v[None, :, :]).sum(axis=2)
        den = np.maximum(q[:, None, :], v[None, :, :]).sum(axis=2)
        s = np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0)
    else:  # Manhattan
        s = np.abs(q[:, None, :] - v[None, :, :]).sum(axis=2)
    flat = s.reshape(-1)
    # selection keyed by the take direction with lower-index-first tie
    # order, matching lax.top_k and the device paths; argpartition + a
    # (key, index) sort of the survivors beats a full stable argsort on the
    # serving path (this runs per batch inside take(k, rerank_from=...))
    key = flat if take_min else -flat
    k_sel = min(k, flat.shape[0])
    if 0 < k_sel < flat.shape[0] // 4:
        part = np.argpartition(key, k_sel - 1)[:k_sel]
        order = part[np.lexsort((part, key[part]))]
    else:
        order = np.argsort(key, kind="stable")[:k_sel]
    rows = cand[order % len(cand)]
    return rows.tolist(), flat[order].tolist()


def recall_at_k(exact_indices: Sequence[int], approx_indices: Sequence[int]) -> float:
    """|approx ∩ exact| / |exact| for one query's top-k lists.

    >>> recall_at_k([1, 2, 3, 4], [4, 2, 9, 1])
    0.75
    >>> recall_at_k([], [])
    1.0
    """
    if not exact_indices:
        return 1.0
    exact = set(exact_indices)
    return len(exact & set(approx_indices)) / len(exact)


def mean_recall_at_k(exact_lists, approx_lists) -> float:
    """Average recall over many queries' top-k lists."""
    pairs = list(zip(exact_lists, approx_lists, strict=True))
    if not pairs:
        return 1.0
    return sum(recall_at_k(e, a) for e, a in pairs) / len(pairs)
