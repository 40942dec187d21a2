"""Sharded exact top-k search over a device mesh.

Design (SURVEY.md §2 "Distributed communication backend"): the `[N, D]`
vector matrix (and any row mask) is sharded along the mesh 'rows' axis; the
query batch is sharded along 'batch'. Each device computes its **local exact
top-k** over its row shard with the same fused scoring core as the
single-chip path, then the k-sized `(score, global_index)` partials ride ICI
via `all_gather` over both axes and every device finishes an identical
replicated top-k merge. Payload per collective: O(devices * k), never the
score matrix.

Global indices are recovered with shard-offset arithmetic, the multi-chip
analog of the reference's per-chunk `base_offset` re-basing
(meta_compute.rs:184-188).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..errors import OttersError
from ..ops import scoring
from ..types import Cmp, Metric, SearchResult, TakeType, default_take_type


@partial(
    jax.jit,
    static_argnames=("mesh", "metric", "k", "take_min", "cmp", "prec", "tile"),
)
def _sharded_topk_program(
    vectors,
    norms_sq,
    inv_norms,
    valid,
    queries,
    q_valid,
    row_mask,
    thr,
    *,
    mesh: Mesh,
    metric: Metric,
    k: int,
    take_min: bool,
    cmp: Optional[Cmp],
    prec: str,
    tile: Optional[int],
):
    def local_fn(v, nsq, inv, vld, q, qv, rm, t):
        # Each shard runs the same exact-topk core the single chip runs.
        # A shard holds at most b_local * n_local candidates.
        k_local = min(k, q.shape[0] * v.shape[0])
        kwargs = dict(
            metric=metric, k=k_local, take_min=take_min, cmp=cmp, prec=prec,
            q_valid=qv,
        )
        if tile is not None and v.shape[0] % tile == 0 and v.shape[0] > tile:
            rows, scores, ok = scoring.scan_topk_core(
                v, nsq, inv, vld, q, rm, t, tile=tile, **kwargs
            )
        else:
            rows, scores, ok = scoring.direct_topk_core(
                v, nsq, inv, vld, q, rm, t, **kwargs
            )
        # local -> global row indices (shard-offset re-basing)
        shard = jax.lax.axis_index("rows")
        rows = rows + shard * v.shape[0]

        # k-sized partials ride ICI; every device merges identically
        axes = ("rows", "batch")
        rows_g = jax.lax.all_gather(rows, axes).reshape(-1)
        scores_g = jax.lax.all_gather(scores, axes).reshape(-1)
        ok_g = jax.lax.all_gather(ok, axes).reshape(-1)

        key = jnp.where(ok_g, scores_g, -jnp.inf if not take_min else jnp.inf)
        if take_min:
            key = -key
        _, sel = jax.lax.top_k(key, min(k, key.shape[0]))
        return rows_g[sel], scores_g[sel], ok_g[sel]

    in_specs = (
        P("rows", None),  # vectors
        P("rows"),  # norms_sq
        P("rows"),  # inv_norms
        P("rows"),  # valid
        P("batch", None),  # queries
        P("batch"),  # q_valid
        P("rows") if row_mask is not None else P(),
        P(),  # threshold scalar
    )
    out_specs = (P(), P(), P())
    fn = jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )
    return fn(vectors, norms_sq, inv_norms, valid, queries, q_valid, row_mask, thr)


def sharded_topk(
    mesh: Mesh,
    vectors,
    norms_sq,
    inv_norms,
    valid,
    queries: np.ndarray,
    metric: Metric,
    k: int,
    take_min: bool = False,
    cmp: Optional[Cmp] = None,
    thr: Optional[float] = None,
    row_mask=None,
    prec: str = "highest",
    tile: Optional[int] = None,
):
    """Run the sharded search; returns host (rows, scores, valid)."""
    n_rows_shards = mesh.shape["rows"]
    n_batch_shards = mesh.shape["batch"]
    n_pad = vectors.shape[0]
    if n_pad % n_rows_shards != 0:
        raise OttersError(
            f"padded rows {n_pad} not divisible by rows shards {n_rows_shards}"
        )
    b = queries.shape[0]
    b_pad = max(n_batch_shards, -(-b // n_batch_shards) * n_batch_shards)
    q_host = np.zeros((b_pad, queries.shape[1]), dtype=np.float32)
    q_host[:b] = queries
    q_valid = np.arange(b_pad) < b

    k_eff = min(k, b * n_pad)
    if k_eff <= 0:
        return np.array([], np.int32), np.array([], np.float32), np.array([], bool)

    qs = jax.device_put(q_host, NamedSharding(mesh, P("batch", None)))
    qv = jax.device_put(q_valid, NamedSharding(mesh, P("batch")))
    thr_arr = jnp.float32(0.0 if thr is None else thr)
    cmp_eff = None if thr is None else cmp

    rows, scores, ok = _sharded_topk_program(
        vectors,
        norms_sq,
        inv_norms,
        valid,
        qs,
        qv,
        row_mask,
        thr_arr,
        mesh=mesh,
        metric=metric,
        k=k_eff,
        take_min=take_min,
        cmp=cmp_eff,
        prec=prec,
        tile=tile,
    )
    return np.asarray(rows), np.asarray(scores), np.asarray(ok)


class ShardedVecStore:
    """A VecStore whose rows are sharded across a device mesh.

    Queries present the same surface as ``VecStore.query(...).collect()``
    but execute SPMD over the mesh with an ICI top-k merge.
    """

    def __init__(self, mesh: Mesh, vectors: np.ndarray, prec: str = "highest"):
        self.mesh = mesh
        self.dim = int(vectors.shape[1])
        self._n = int(vectors.shape[0])
        self.precision = prec
        n_shards = mesh.shape["rows"]
        unit = 128 * n_shards
        n_pad = max(unit, -(-self._n // unit) * unit)
        host = np.zeros((n_pad, self.dim), dtype=np.float32)
        host[: self._n] = vectors
        sharding = NamedSharding(mesh, P("rows", None))
        self.vectors = jax.device_put(host, sharding)
        self.valid = jax.device_put(
            np.arange(n_pad) < self._n, NamedSharding(mesh, P("rows"))
        )
        norms_sq, inv_norms = _sharded_norms(self.vectors)
        self.norms_sq = norms_sq
        self.inv_norms = inv_norms

    def __len__(self) -> int:
        return self._n

    def search(
        self,
        queries,
        metric: Metric,
        k: int,
        take_type: Optional[TakeType] = None,
        vec_filter: Optional[Tuple[float, Cmp]] = None,
    ):
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        if queries.shape[1] != self.dim:
            raise OttersError(
                f"Query vector length {queries.shape[1]} does not match "
                f"expected dimension {self.dim}"
            )
        tt = take_type or default_take_type(metric)
        thr, cmp = (None, None) if vec_filter is None else vec_filter
        rows, scores, ok = sharded_topk(
            self.mesh,
            self.vectors,
            self.norms_sq,
            self.inv_norms,
            self.valid,
            queries,
            metric,
            k,
            take_min=(tt is TakeType.Min),
            cmp=cmp,
            thr=thr,
            prec=self.precision,
        )
        return [
            SearchResult(int(r), float(s))
            for r, s, good in zip(rows, scores, ok)
            if good
        ]


@jax.jit
def _sharded_norms(vectors):
    v32 = vectors.astype(jnp.float32)
    norms_sq = jnp.sum(v32 * v32, axis=1)
    norms = jnp.sqrt(norms_sq)
    inv = jnp.where(norms != 0.0, 1.0 / norms, 0.0)
    return norms_sq, inv
