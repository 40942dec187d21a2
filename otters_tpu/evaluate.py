"""Evaluation helpers for approximate modes.

Exact modes (f32/verified-fast) have recall@k = 1.0 by construction; the
bfloat16 and int8 storage knobs trade exactness for HBM/speed. These helpers
quantify that trade on YOUR data (the reference's "test with real datasets"
roadmap item).
"""

from __future__ import annotations

from typing import Sequence


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
