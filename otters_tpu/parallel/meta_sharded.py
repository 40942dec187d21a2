"""ShardedMetaStore: the full metadata-filtered search over a device mesh.

BASELINE config 5 (SURVEY.md §6): rows/chunks of the store — vectors, column
arrays, null masks, zonemaps and Bloom bit-matrices — are sharded along the
mesh 'rows' axis; the query batch along 'batch'. One SPMD program per query:

    local zonemap chunk-mask  ->  local row-mask  ->  local exact top-k
    -> all-gather k-sized partials over ICI -> replicated merge
    -> psum of pruning stats

Each device prunes and scores only its own shard (the multi-chip analog of
the reference's rayon chunk fork-join, meta.rs:678-691); the only cross-chip
traffic is O(devices * k) score/index pairs plus two scalar psums.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import numpy as np

from ..errors import OttersError
from ..meta import MetaStore, MetaStoreBuilder
from ..ops import predicate, scoring
from ..types import VPU_METRICS, Metric


def _jit_sharded_program():
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    @partial(
        jax.jit,
        static_argnames=(
            "mesh",
            "plan_static",
            "metric",
            "k",
            "take_min",
            "cmp",
            "prec",
            "tile",
            "chunk_size",
        ),
    )
    def sharded_meta_query(
        dv,
        cols,
        chunk_lens,
        queries,
        q_valid,
        plan_params,
        thr,
        *,
        mesh,
        plan_static,
        metric,
        k,
        take_min,
        cmp,
        prec,
        tile="auto",
        chunk_size=0,
    ):
        def local_fn(dv_l, cols_l, clens_l, q_l, qv_l, params_l, thr_l):
            n_local = dv_l.vectors.shape[0]
            n_chunks_l = clens_l.shape[0]
            if plan_static:
                cmask = predicate.chunk_mask(
                    plan_static, params_l, cols_l, n_chunks_l
                )
                ev = cmask.sum(dtype=np.int32)
                re_ = (clens_l * cmask).sum(dtype=np.int32)
                rmask = predicate.row_mask(
                    plan_static, params_l, cols_l, n_local
                )
            else:
                # padded chunks have len 0; count only real ones
                ev = (clens_l > 0).sum(dtype=np.int32)
                re_ = clens_l.sum(dtype=np.int32)
                rmask = None

            b_local = q_l.shape[0]
            k_local = min(k, b_local * n_local)
            kwargs = dict(
                metric=metric,
                k=k_local,
                take_min=take_min,
                cmp=cmp,
                prec=prec,
            )
            args = (
                dv_l.vectors,
                dv_l.norms_sq,
                dv_l.inv_norms,
                dv_l.valid,
                q_l,
                rmask,
                thr_l,
            )
            if tile == "pallas":
                # fused kernel per shard: locally-pruned tiles cost neither
                # HBM nor MXU on their device (requires the chunk axis to be
                # row-aligned per shard; see ShardedMetaStore.shard)
                from ..ops import pallas_topk as pk

                t_rows = pk.choose_tile(
                    dv_l.vectors.shape[1], n_local, pk._pad_b(b_local),
                    chunk=chunk_size,
                )
                if plan_static:
                    alive = pk.tiles_alive_from_chunk_mask(
                        cmask, chunk_size, n_local, t_rows
                    )
                else:
                    alive = jnp.ones(n_local // t_rows, dtype=jnp.bool_)
                rows, scores, ok, _ = pk.pallas_topk(
                    dv_l.vectors,
                    dv_l.norms_sq,
                    dv_l.inv_norms,
                    dv_l.valid,
                    q_l,
                    rmask,
                    thr_l,
                    alive,
                    fast=False,
                    q_valid=qv_l,
                    **kwargs,
                )
            elif b_local * n_local <= scoring.DIRECT_LIMIT or (
                n_local % scoring.PANEL_BIN != 0
            ):
                rows, scores, ok = scoring.direct_topk_core(
                    *args, q_valid=qv_l, **kwargs
                )
            else:
                rows, scores, ok = scoring.panel_topk_core(
                    *args, q_valid=qv_l, **kwargs
                )
            rows = rows + jax.lax.axis_index("rows") * n_local

            axes = ("rows", "batch")
            rows_g = jax.lax.all_gather(rows, axes).reshape(-1)
            scores_g = jax.lax.all_gather(scores, axes).reshape(-1)
            ok_g = jax.lax.all_gather(ok, axes).reshape(-1)
            key = jnp.where(
                ok_g, scores_g, -jnp.inf if not take_min else jnp.inf
            )
            if take_min:
                key = -key
            _, sel = jax.lax.top_k(key, min(k, key.shape[0]))

            ev_g = jax.lax.psum(ev, "rows")
            re_g = jax.lax.psum(re_, "rows")
            return rows_g[sel], scores_g[sel], ok_g[sel], ev_g, re_g

        col_specs = {
            name: {
                key: P("rows", None) if key == "bloom" else P("rows")
                for key in colarrs
            }
            for name, colarrs in cols.items()
        }
        dv_specs = scoring.DeviceVecs(
            P("rows", None), P("rows"), P("rows"), P("rows")
        )
        # per-leaf specs for the plan parameters: hostmask leaves carry a
        # row mask [n_pad] and a chunk mask [n_chunks] sharded along rows;
        # null leaves carry the [n_chunks] chunk-length array; every other
        # leaf (thresholds, hashes, Bloom probe coords) is replicated
        params_specs = tuple(
            tuple(
                (P("rows"), P("rows"))
                if leaf[0] == "hostmask"
                else (P("rows"),)
                if leaf[0] == "null"
                else tuple(P() for _ in params_leaf)
                for leaf, params_leaf in zip(clause, clause_params)
            )
            for clause, clause_params in zip(plan_static, plan_params)
        )
        fn = jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(
                dv_specs,
                col_specs,
                P("rows"),
                P("batch", None),
                P("batch"),
                params_specs,
                P(),
            ),
            out_specs=(P(), P(), P(), P(), P()),
            check_vma=False,
        )
        return fn(dv, cols, chunk_lens, queries, q_valid, plan_params, thr)

    return sharded_meta_query


_sharded_meta_query = _jit_sharded_program()


class ShardedMetaStore(MetaStore):
    """A MetaStore whose rows, zonemaps and Bloom bits live across a mesh.

    Construct via ``MetaStoreBuilder.build_sharded(mesh)`` or
    ``ShardedMetaStore.shard(store, mesh)``. The query API is identical to
    MetaStore (query/query_batch -> meta_filter/vec_filter/take -> collect).
    """

    _supports_windowed = False  # runs its own SPMD program instead

    def __init__(self, schema):
        super().__init__(schema)
        self.mesh = None

    @staticmethod
    def shard(store: MetaStore, mesh) -> "ShardedMetaStore":
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_shards = mesh.shape["rows"]
        out = ShardedMetaStore(store.schema())
        out.mesh = mesh
        out._columns = store._columns
        out._chunk_size = store._chunk_size
        out._n_rows = store._n_rows
        out._dim = store._dim
        out._bloom_params = store._bloom_params
        out._col_reprs = store._col_reprs
        out._build_stats = store._build_stats
        out.precision = store.precision
        out._index_map = store._index_map
        out._orig_columns = store._orig_columns
        out._sort_by = store._sort_by
        out._z_order = store._z_order
        out._n_deleted = store._n_deleted
        out._bloom_config = store._bloom_config
        out._storage_dtype = store._storage_dtype
        out._rerank_fetch = store._rerank_fetch

        # re-pad rows and chunks so both axes split evenly across shards.
        # When chunk_size and SCAN_TILE have a small lcm (e.g. power-of-two
        # chunk sizes), pad so every shard's chunk range exactly covers its
        # row range — the alignment the per-shard Pallas tile-skipping needs.
        import math

        dv = store._dv
        n_pad = dv.vectors.shape[0]
        cs = store._chunk_size
        lcm = scoring.SCAN_TILE * cs // math.gcd(scoring.SCAN_TILE, cs)
        aligned = lcm <= 4 * scoring.SCAN_TILE
        unit = (lcm if aligned else scoring.SCAN_TILE) * n_shards
        n_pad_s = max(unit, -(-n_pad // unit) * unit)
        n_chunks = store.n_chunks()
        if aligned:
            n_chunks_s = n_pad_s // cs
        else:
            n_chunks_s = max(n_shards, -(-n_chunks // n_shards) * n_shards)
        out._pallas_aligned = aligned
        out._n_chunks = n_chunks

        def put_rows(arr, fill):
            arr = np.asarray(arr)
            full = np.full((n_pad_s,) + arr.shape[1:], fill, dtype=arr.dtype)
            full[: arr.shape[0]] = arr
            spec = P("rows") if arr.ndim == 1 else P("rows", None)
            return jax.device_put(full, NamedSharding(mesh, spec))

        def put_chunks(arr, fill):
            arr = np.asarray(arr)
            full = np.full((n_chunks_s,) + arr.shape[1:], fill, dtype=arr.dtype)
            full[: arr.shape[0]] = arr
            spec = P("rows") if arr.ndim == 1 else P("rows", None)
            return jax.device_put(full, NamedSharding(mesh, spec))

        out._dv = scoring.DeviceVecs(
            put_rows(dv.vectors, 0.0),
            put_rows(dv.norms_sq, 0.0),
            put_rows(dv.inv_norms, 0.0),
            put_rows(dv.valid, False),
        )
        out._chunk_lens = put_chunks(store._chunk_lens, 0)

        row_keys = {"vals", "hi", "lo", "null", "rh_hi", "rh_lo"}
        dev_cols: Dict[str, Dict] = {}
        for name, colarrs in store._device_cols.items():
            shard_col = {}
            for key, arr in colarrs.items():
                if key in row_keys:
                    fill = True if key == "null" else 0
                    shard_col[key] = put_rows(arr, fill)
                elif key == "non_null":
                    shard_col[key] = put_chunks(arr, 0)
                elif key == "bloom":
                    shard_col[key] = put_chunks(arr, 0)
                else:  # zonemap min/max components: fill value irrelevant
                    # (padded chunks have non_null == 0 and never survive)
                    shard_col[key] = put_chunks(arr, 0)
            dev_cols[name] = shard_col
        out._device_cols = dev_cols
        return out

    def precompile(
        self,
        filters=None,
        batch_sizes=(1, 256),
        k: int = 10,
        metric: Metric = Metric.Cosine,
        with_vec_filter: bool = False,
    ) -> int:
        """Warm the SPMD program for each signature by running one query
        through the real sharded path (the base class's AOT machinery is
        single-device; resharding a multi-chip store through it would be
        wrong and could OOM one device)."""
        from .. import aot
        from ..types import Cmp, TakeType, default_take_type

        count = 0
        take_min = default_take_type(metric) is TakeType.Min
        for expr in filters if filters is not None else [None]:
            for b in batch_sizes:
                variants = [None]
                if with_vec_filter:
                    variants.append((0.0, Cmp.Lt if take_min else Cmp.Gt))
                for vf in variants:
                    plan = self.query_batch(
                        np.zeros((int(b), self._dim), np.float32), metric
                    )
                    if expr is not None:
                        plan = plan.meta_filter(expr)
                    if vf is not None:
                        plan = plan.vec_filter(*vf)
                    plan.take(k).collect()
                    count += 1
        aot.wait_jit_ready()
        return count

    # MetaQueryPlan calls this hook; run the SPMD program instead.
    def _run_query_program(
        self, cols_sub, queries, plan_params, thr, plan_static, metric, k,
        take_min, cmp, strict=False,
    ):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self._dv.vectors.dtype == jnp.int8 and metric is not Metric.Cosine:
            raise OttersError(
                "int8 quantized storage supports the Cosine metric only"
            )
        b = queries.shape[0]
        n_batch = self.mesh.shape["batch"]
        b_pad = max(n_batch, -(-b // n_batch) * n_batch)
        q_host = np.zeros((b_pad, queries.shape[1]), dtype=np.float32)
        q_host[:b] = np.asarray(queries)
        qs = jax.device_put(
            q_host, NamedSharding(self.mesh, P("batch", None))
        )
        qv = jax.device_put(
            np.arange(b_pad) < b, NamedSharding(self.mesh, P("batch"))
        )

        # per-shard scoring strategy (static): the fused Pallas kernel when
        # the local shapes qualify and the chunk axis is row-aligned per
        # shard; otherwise the XLA direct/panel paths inside local_fn
        from ..ops import pallas_topk as pk

        n_shards = self.mesh.shape["rows"]
        n_local = self._dv.vectors.shape[0] // n_shards
        b_local = b_pad // n_batch
        k_eff = min(k, b * self._dv.vectors.shape[0])
        tile = "auto"
        if (
            getattr(self, "_pallas_aligned", False)
            and metric not in VPU_METRICS
            and b_local * n_local > scoring.DIRECT_LIMIT
            and pk.pallas_ok(n_local, self._dim, b_local, k_eff)
        ):
            tile = "pallas"
        rows, scores, ok, ev, re_ = _sharded_meta_query(
            self._dv,
            cols_sub,
            self._chunk_lens,
            qs,
            qv,
            plan_params,
            jnp.float32(thr),
            mesh=self.mesh,
            plan_static=plan_static,
            metric=metric,
            k=k_eff,
            take_min=take_min,
            cmp=cmp,
            prec=self.precision,
            tile=tile,
            chunk_size=self._chunk_size,
        )
        return rows, scores, ok, True, ev, re_


def build_sharded(builder: MetaStoreBuilder, mesh) -> ShardedMetaStore:
    """Build then shard (convenience wrapper)."""
    return ShardedMetaStore.shard(builder.build(), mesh)
