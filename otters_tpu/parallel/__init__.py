"""Multi-device / multi-host scaling for otters-tpu.

The reference is single-process (rayon fork-join over chunks,
meta.rs:678-691). The TPU-native scaling story (SURVEY.md §2 parallelism
table): shard the row axis across a ``jax.sharding.Mesh`` ("chunk parallel"),
optionally shard the query batch, and merge per-shard exact top-k results
with k-sized all-gathers over ICI — cheap payloads, no full-score traffic.
"""

from .dist_query import ShardedVecStore, sharded_topk
from .mesh import init_distributed, make_mesh
from .meta_sharded import (
    ShardedMetaStore,
    build_sharded,
    materialize_f32_slabs_sharded,
    materialize_int8_slabs_sharded,
    sharded_geometry,
)

__all__ = [
    "ShardedVecStore",
    "sharded_topk",
    "init_distributed",
    "make_mesh",
    "ShardedMetaStore",
    "build_sharded",
    "materialize_f32_slabs_sharded",
    "materialize_int8_slabs_sharded",
    "sharded_geometry",
]
