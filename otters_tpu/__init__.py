"""otters-tpu: exact in-memory vector search with metadata filtering, TPU-native.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the
reference `otters` library (Rust, SIMD+rayon): brute-force exact search
(recall@k = 1.0 by construction) over <= ~10M-scale vector sets with rich
metadata filtering, re-designed for TPU hardware:

- scoring = batched MXU matmuls with fused masking + exact top-k merges
- zonemap / Bloom pruning evaluated as device-resident predicate tensors
- multi-chip scaling via jax.sharding Mesh + shard_map row sharding with
  k-sized all-gather top-k merges over ICI

This module is the "prelude" (reference src/prelude.rs): one import surface.
"""

from .column import Column
from .errors import (
    ColumnError,
    ColumnParseError,
    ColumnTypeMismatch,
    ExprError,
    InvalidComparison,
    InvalidExpression,
    OttersError,
    TypeMismatch,
    UnknownColumn,
    UnsupportedStringOp,
)
from .expr import CompiledFilter, Expr, col, lit
from .meta import (
    MetaBuildStats,
    MetaQueryPlan,
    MetaQueryResults,
    MetaQueryStats,
    MetaStore,
    MetaStoreBuilder,
)
from .ops.distance import cosine_similarity, dot_product, euclidean_distance_squared
from .types import Cmp, CmpOp, DataType, Metric, SearchResult, TakeType
from .vec import VecQueryPlan, VecStore

# submodules with additional surface (importable as otters_tpu.<name>)
from . import adapters, aot, datasets, evaluate, io, parallel, utils  # noqa: E402,F401

__version__ = "0.5.0"

__all__ = [
    "Column",
    "ColumnError",
    "ColumnParseError",
    "ColumnTypeMismatch",
    "ExprError",
    "InvalidComparison",
    "InvalidExpression",
    "OttersError",
    "TypeMismatch",
    "UnknownColumn",
    "UnsupportedStringOp",
    "CompiledFilter",
    "Expr",
    "col",
    "lit",
    "MetaBuildStats",
    "MetaQueryPlan",
    "MetaQueryResults",
    "MetaQueryStats",
    "MetaStore",
    "MetaStoreBuilder",
    "cosine_similarity",
    "dot_product",
    "euclidean_distance_squared",
    "Cmp",
    "CmpOp",
    "DataType",
    "Metric",
    "SearchResult",
    "TakeType",
    "VecQueryPlan",
    "VecStore",
]
