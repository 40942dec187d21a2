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
            "fast",
            "certify",
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
        fast=False,
        certify=False,
    ):
        def local_fn(dv_l, cols_l, clens_l, q_l, qv_l, params_l, thr_l):
            n_local = dv_l.vectors.shape[0]
            n_chunks_l = clens_l.shape[0]
            axes = ("rows", "batch")
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
            # int8 exactness certificate, sharded composition: each shard
            # bounds its own unexamined rows; rows a shard returned but the
            # global merge dropped are bounded by the k-th merged quantized
            # score + the global slack. The psum-max of both is a sound
            # bound on every row the merged candidate set excludes.
            slack_g = None
            thr_core = thr_l
            q_core = q_l
            if certify:
                from ..types import Cmp as _Cmp

                # MIXED certified scan (see ops/scoring.cert_query_coeffs):
                # bf16-rounded queries x stored rows; the XLA cores below
                # dispatch on the bf16 query dtype, the pallas kernel
                # rounds internally from the f32 queries it receives.
                # Sharded slack composition: the per-query coefficient
                # maxima (batch axis) and per-row lane maxima (rows axis)
                # are each pmax'd over the WHOLE mesh before composing, so
                # slack_g covers every (query, row) pair any device scanned
                # — max of a sum <= sum of the maxes.
                d_l = dv_l.vectors.shape[1]
                qh32, c0, c1, c2 = scoring.cert_query_coeffs(
                    metric, q_l, d_l
                )
                lane_a, lane_b = scoring.cert_row_lanes(
                    metric, dv_l.vectors.dtype, dv_l.resid, dv_l.inv_norms,
                    dv_l.norms_sq, d_l,
                )
                c0 = jnp.where(qv_l, c0, 0.0)
                c1 = jnp.where(qv_l, c1, 0.0)
                c2 = jnp.where(qv_l, c2, 0.0)

                def _gmax(x):
                    m = jnp.max(x) if x.shape[0] else jnp.float32(0.0)
                    return jax.lax.pmax(m, axes)

                slack_g = (
                    _gmax(c0)
                    + _gmax(c1) * _gmax(lane_a)
                    + _gmax(c2) * jnp.sqrt(_gmax(dv_l.norms_sq))
                    + _gmax(lane_b)
                )
                if cmp in (_Cmp.Gt, _Cmp.Gte):
                    # same loosening as the single-device program: no truly
                    # passing row may be dropped on its scan score
                    thr_core = thr_l - slack_g
                elif cmp in (_Cmp.Lt, _Cmp.Lte):
                    thr_core = thr_l + slack_g
                q_core = qh32.astype(jnp.bfloat16)
            args = (
                dv_l.vectors,
                dv_l.norms_sq,
                dv_l.inv_norms,
                dv_l.valid,
                q_core,
                rmask,
                thr_core,
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
                rows, scores, ok, check, bound_l = pk.pallas_topk(
                    dv_l.vectors,
                    dv_l.norms_sq,
                    dv_l.inv_norms,
                    dv_l.valid,
                    q_l,
                    rmask,
                    thr_l,
                    alive,
                    fast=fast,
                    q_valid=qv_l,
                    certify=certify,
                    resid=dv_l.resid if certify else None,
                    resid_bin=dv_l.resid_bin if certify else None,
                    **kwargs,
                )
            elif tile == "scan_pruned":
                # filtered VPU-metric query: skip locally-pruned tiles
                from ..ops import pallas_topk as pk

                if plan_static:
                    alive = pk.tiles_alive_from_chunk_mask(
                        cmask, chunk_size, n_local, scoring.SCAN_TILE
                    )
                else:
                    alive = jnp.ones(
                        n_local // scoring.SCAN_TILE, dtype=jnp.bool_
                    )
                rows, scores, ok = scoring.scan_pruned_topk_core(
                    *args, alive, tile=scoring.SCAN_TILE, q_valid=qv_l,
                    **kwargs,
                )
                check = jnp.bool_(True)
                bound_l = jnp.float32(-jnp.inf)
            elif b_local * n_local <= scoring.DIRECT_LIMIT or (
                n_local % scoring.PANEL_BIN != 0
            ):
                rows, scores, ok = scoring.direct_topk_core(
                    *args, q_valid=qv_l, **kwargs
                )
                check = jnp.bool_(True)
                bound_l = _core_bound(scores, ok, slack_g, take_min) if certify else (
                    jnp.float32(-jnp.inf)
                )
            else:
                rows, scores, ok = scoring.panel_topk_core(
                    *args, q_valid=qv_l, **kwargs
                )
                check = jnp.bool_(True)
                bound_l = _core_bound(scores, ok, slack_g, take_min) if certify else (
                    jnp.float32(-jnp.inf)
                )
            rows = rows + jax.lax.axis_index("rows") * n_local

            # the verified fast-exact certificate must hold on EVERY shard:
            # one failed local check invalidates the global merge
            check_g = (
                jax.lax.psum((~check).astype(jnp.int32), axes) == 0
            )
            rows_g = jax.lax.all_gather(rows, axes).reshape(-1)
            scores_g = jax.lax.all_gather(scores, axes).reshape(-1)
            ok_g = jax.lax.all_gather(ok, axes).reshape(-1)
            key = jnp.where(
                ok_g, scores_g, -jnp.inf if not take_min else jnp.inf
            )
            if take_min:
                key = -key
            _, sel = jax.lax.top_k(key, min(k, key.shape[0]))

            if certify:
                merged_kth_ok = ok_g[sel][-1]
                kth_key = scores_g[sel][-1]
                if take_min:
                    kth_key = -kth_key  # bound lives in the KEY space
                bound_merged = jnp.where(
                    merged_kth_ok,
                    kth_key + slack_g,
                    jnp.float32(-jnp.inf),
                )
                bound_g = jnp.maximum(
                    jax.lax.pmax(bound_l, axes), bound_merged
                )
            else:
                bound_g = jnp.float32(-jnp.inf)

            ev_g = jax.lax.psum(ev, "rows")
            re_g = jax.lax.psum(re_, "rows")
            return (
                rows_g[sel], scores_g[sel], ok_g[sel], check_g, bound_g,
                ev_g, re_g,
            )

        col_specs = {
            name: {
                key: P("rows", None) if key == "bloom" else P("rows")
                for key in colarrs
            }
            for name, colarrs in cols.items()
        }
        dv_specs = scoring.DeviceVecs(
            P("rows", None), P("rows"), P("rows"), P("rows"),
            # certificate residuals: per-row + per-bin along rows, the
            # global max replicated (specs over None leaves are ignored)
            P("rows"), P("rows"), P(),
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
            out_specs=(P(), P(), P(), P(), P(), P(), P()),
            check_vma=False,
        )
        return fn(dv, cols, chunk_lens, queries, q_valid, plan_params, thr)

    return sharded_meta_query


def _core_bound(scores, ok, slack_g, take_min=False):
    """Local certificate bound for the XLA core paths: the k-th local scan
    KEY (negated score for take_min) + global slack covers every local row
    not returned (exact local top-k); an invalid k-th slot means EVERY
    passing local row was returned and nothing local is unexamined."""
    import jax.numpy as jnp

    kth = -scores[-1] if take_min else scores[-1]
    return jnp.where(ok[-1], kth + slack_g, jnp.float32(-jnp.inf))


_sharded_meta_query = _jit_sharded_program()


class ShardedMetaStore(MetaStore):
    """A MetaStore whose rows, zonemaps and Bloom bits live across a mesh.

    Construct via ``MetaStoreBuilder.build_sharded(mesh)`` or
    ``ShardedMetaStore.shard(store, mesh)``. The query API is identical to
    MetaStore (query/query_batch -> meta_filter/vec_filter/take -> collect).
    """

    # take-all runs per shard (each shard streams its own score windows to
    # the host from its own device; only k-sized merge state crosses) — see
    # _windowed_collect below
    _supports_windowed = True

    def __init__(self, schema):
        super().__init__(schema)
        self.mesh = None

    # -- mutability: delete_rows works through the base class (tombstones);
    # only the validity-mask placement differs. The mask is the ONE array
    # that moves: [n_pad] bool gathered to host, updated, re-placed on the
    # 'rows' sharding — every other shard stays put.
    def _place_valid(self, valid):
        return _put_padded(self.mesh, valid, valid.shape[0], False)

    def _host_gather(self, arr):
        if arr.is_fully_addressable:
            return np.asarray(arr)
        # multi-process mesh: replicate-gather (COLLECTIVE — all processes
        # must reach this point together; delete/append/save are collective)
        return np.asarray(_replicate_gather_fn(self.mesh)(arr))

    def _place_resid(self, resid_host):
        resid = _put_padded(self.mesh, resid_host, resid_host.shape[0], 0.0)
        r, rbin, rmax = _sharded_resid_finalize(self.mesh, resid, self._dv.valid)
        self._dv = self._dv._replace(resid=r, resid_bin=rbin, resid_max=rmax)

    def append(self, vectors, column_values):
        """Append rows: surviving + new rows are re-chunked and rebuilt
        DIRECTLY onto this store's mesh (same semantics as
        MetaStore.append — tombstones compacted, fresh ids). Unsorted
        stores rebuild by STREAMING: old rows flow device-shard -> bounded
        host slab -> new per-shard HBM, so host RAM never holds the store
        and append capacity scales with the mesh. Sorted/z-ordered stores
        (a rebuild re-sorts globally) and chunk sizes that don't align
        with the scan tile fall back to the host-staged path."""
        if self._index_map is None and scan_tile_aligned(self._chunk_size):
            # streaming rebuild: surviving rows flow device-shard ->
            # host-slab -> new per-shard HBM, one slab at a time — append
            # capacity scales with the mesh like build/query/save do.
            # Sorted stores can't stream (the rebuild applies a fresh
            # GLOBAL sort permutation) and take the staged path below.
            new = self._append_streaming(vectors, column_values)
        else:
            new = build_sharded_or_shard(
                self._append_builder(vectors, column_values), self.mesh
            )
        new.precision = self.precision
        self._carry_resid_forward(new)
        return new

    def _append_streaming(self, vectors, column_values) -> "ShardedMetaStore":
        """Mesh-scaled append for unsorted stores (round-4 item 4): old
        rows are re-ingested via bounded device->host slabs (never the
        whole store), quantized storage re-quantizes its own codes
        bit-identically (idempotent; see MetaStore._append_builder)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = self._n_rows
        keep, _, new_vecs, cols, cfg = self._append_prep(
            vectors, column_values
        )
        d = self._dim
        n_keep = len(keep)
        n_total = n_keep + new_vecs.shape[0]
        mesh = self.mesh

        if cfg is not None:
            old_host = (
                self._rerank_host[:n]
                if self._rerank_host is not None
                else np.asarray(
                    self._rerank_fetch(np.arange(n, dtype=np.int64)),
                    dtype=np.float32,
                )
            )
        else:
            old_host = None
            old_dev = self._dv.vectors
            # replicated-output gather: one slab of surviving rows lands on
            # the host per call, never the whole store (cached jit — a
            # fresh lambda would recompile on every append)
            ck = (id(mesh), "append_slab_gather")
            gather = _sharded_jit_cache.get(ck)
            if gather is None:
                gather = jax.jit(
                    lambda v, i: v[i].astype(jnp.float32),
                    out_shardings=NamedSharding(mesh, P()),
                )
                if len(_sharded_jit_cache) < 256:
                    _sharded_jit_cache[ck] = gather

        def slab_fn(start, rows):
            end = min(start + rows, n_total)
            out = np.zeros((rows, d), np.float32)
            if end <= start:
                return out
            o_end = min(end, n_keep)
            if o_end > start:
                ids = keep[start:o_end]
                if old_host is not None:
                    out[: o_end - start] = old_host[ids]
                else:
                    out[: o_end - start] = np.asarray(
                        gather(old_dev, jnp.asarray(ids))
                    )
            if end > max(start, n_keep):
                a = max(start, n_keep)
                out[a - start : end - start] = new_vecs[a - n_keep : end - n_keep]
            return out

        slab_rows = min(max(self._chunk_size, 1 << 16), 1 << 20)
        if self._storage_dtype == "int8":
            dv = materialize_int8_slabs_sharded(
                slab_fn, n_total, d, slab_rows, mesh,
                chunk_size=self._chunk_size,
            )
        else:
            dv = materialize_f32_slabs_sharded(
                slab_fn, n_total, d, slab_rows, mesh,
                chunk_size=self._chunk_size,
                dtype=(
                    jnp.bfloat16
                    if self._storage_dtype == "bfloat16"
                    else jnp.float32
                ),
            )
        builder = self._append_configured_builder(cols).with_vectors(
            dv, n_rows=n_total
        )
        new = build_sharded(builder, mesh)
        if cfg is not None:
            # keep_host_f32 cannot ride a pre-built DeviceVecs through the
            # builder; re-attach the (host-resident by contract) snapshot
            host = np.concatenate([old_host[keep], new_vecs], axis=0)
            new._rerank_host = host
            new._rerank_config = (None, True)

            def _fetch(ids, _hf=host):
                return _hf[np.asarray(ids, dtype=np.int64)]

            new._rerank_fetch = _fetch
        return new

    def save(self, path: str) -> None:
        """Serialize as ONE FILE PER ROW-SHARD (io.save_meta_sharded):
        host staging is bounded by a single shard, so persistence capacity
        scales with the mesh like query capacity does. On a multi-process
        mesh every process must call save with the same shared-filesystem
        path. Reload with ``MetaStore.load(path, mesh=...)`` (the directory
        layout is auto-detected; single-device reload also works). Use
        ``otters_tpu.io.save_meta(store, file)`` for the single-file
        format when the store comfortably fits one host."""
        from .. import io

        io.save_meta_sharded(self, path)

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
        out._rerank_config = store._rerank_config
        out._rerank_host = store._rerank_host

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

        valid_s = put_rows(dv.valid, False)
        if dv.resid is not None:
            # certificate residuals survive re-sharding: per-row values are
            # re-padded (0 on padding), bins/max re-derived on the mesh
            # (per-shard rows are SCAN_TILE multiples -> 512-bin aligned)
            resid_s, rbin_s, rmax_s = _sharded_resid_finalize(
                mesh, put_rows(dv.resid, 0.0), valid_s
            )
            out._dv = scoring.DeviceVecs(
                put_rows(dv.vectors, 0.0),
                put_rows(dv.norms_sq, 0.0),
                put_rows(dv.inv_norms, 0.0),
                valid_s,
                resid_s,
                rbin_s,
                rmax_s,
            )
        else:
            out._dv = scoring.DeviceVecs(
                put_rows(dv.vectors, 0.0),
                put_rows(dv.norms_sq, 0.0),
                put_rows(dv.inv_norms, 0.0),
                valid_s,
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
        rerank_from=None,
        pipeline_depths=(1,),
    ) -> int:
        """Ready the SPMD program for each signature by running one query
        through the real sharded path. Round-3: these now route through the
        AOT executable cache too — the first process compiles and persists
        serialized multi-device executables (keyed by the concrete device
        assignment), later processes on the same topology deserialize in
        well under a second."""
        from .. import aot
        from ..types import Cmp, TakeType, default_take_type

        count = self._precompile_rerank(
            filters, batch_sizes, k, metric, rerank_from, pipeline_depths
        )
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

    def _direct_k_ok(self, k: int, b: int) -> bool:
        # mirror of _run_query_program's safety net: the SPMD top-k merge
        # all-gathers O(k) results onto every device, so k past SCAN_K_MAX
        # must route through the per-shard windowed take-all instead
        k_eff = min(k, b * self._dv.vectors.shape[0])
        return k_eff <= scoring.SCAN_K_MAX and super()._direct_k_ok(k, b)

    # MetaQueryPlan calls this hook; run the SPMD program instead.
    def _run_query_program(
        self, cols_sub, queries, plan_params, thr, plan_static, metric, k,
        take_min, cmp, strict=False, certify=False,
    ):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self._dv.vectors.dtype == jnp.int8 and metric is not Metric.Cosine:
            raise OttersError(
                "int8 quantized storage supports the Cosine metric only"
            )
        b = queries.shape[0]
        if min(k, b * self._dv.vectors.shape[0]) > scoring.SCAN_K_MAX:
            # safety net: k this large always routes through the per-shard
            # windowed take-all (needs_windowed is True for every
            # k_eff > SCAN_K_MAX), never through the SPMD top-k program,
            # whose merge would all-gather O(k) results onto every device
            raise OttersError(
                f"internal: take({k}) reached the SPMD program; this size "
                "belongs to the windowed take-all path"
            )
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
        fast = False
        if (
            metric in VPU_METRICS
            and plan_static
            and getattr(self, "_pallas_aligned", False)
            # ^ same guard as the pallas branch: tile skipping maps LOCAL
            # chunk indices to LOCAL rows, which only holds when the chunk
            # axis splits row-aligned per shard (unaligned shard() stores
            # pad the chunk axis separately — skipping there would drop
            # matching rows)
            and n_local % scoring.SCAN_TILE == 0
            and n_local >= 4 * scoring.SCAN_TILE
            and k_eff <= scoring.SCAN_K_MAX
        ):
            tile = "scan_pruned"
        elif (
            getattr(self, "_pallas_aligned", False)
            and metric not in VPU_METRICS
            and b_local * n_local > scoring.DIRECT_LIMIT
            and pk.pallas_ok(n_local, self._dim, b_local, k_eff)
        ):
            tile = "pallas"
            # verified fast-exact per shard (round-3): bf16_3x phase 1 with
            # the sound error bound, certificates psum'd across the mesh;
            # a failed certificate triggers the caller's strict redo
            fast = (
                not strict
                and self._dv.vectors.dtype != jnp.int8
                and pk.fast_ok(metric, take_min, cmp, k_eff, self.precision)
            )
        certify = (
            certify
            and not strict
            and self._certify_supported(metric, take_min, cmp)
            and tile != "scan_pruned"
            and (tile != "pallas" or self._dv.resid_bin is not None)
        )
        # disjoint kernel modes; certify wins (the stronger guarantee)
        fast = fast and not certify
        static_kwargs = dict(
            mesh=self.mesh,
            plan_static=plan_static,
            metric=metric,
            k=k_eff,
            take_min=take_min,
            cmp=cmp,
            prec=self.precision,
            tile=tile,
            chunk_size=self._chunk_size,
            fast=fast,
            certify=certify,
        )
        args = (
            self._dv, cols_sub, self._chunk_lens, qs, qv, plan_params,
            jnp.float32(thr),
        )
        import os

        from .. import aot

        if os.environ.get("OTTERS_DISABLE_AOT"):
            return _sharded_meta_query(*args, **static_kwargs)
        # AOT executable cache for the SPMD program (round-3): the key pins
        # the concrete device assignment (mesh repr carries no ids), so a
        # blob only ever loads into the identical topology
        memo = (plan_static, b_pad, k_eff, metric, take_min, cmp,
                self.precision, tile, fast, certify)
        key = self._aot_key_cache.get(memo)
        if key is None:
            dev_ids = tuple(d.id for d in self.mesh.devices.flat)
            key = aot.signature(
                "sharded_meta_query",
                repr(sorted(static_kwargs.items(), key=str)) + repr(dev_ids),
                args,
                {},
            )
            self._aot_key_cache[memo] = key
        if aot.jit_is_ready(key):
            return _sharded_meta_query(*args, **static_kwargs)
        compiled = aot.lookup(key) or aot.load_or_compile(
            key, _sharded_meta_query, args, static_kwargs
        )
        aot.ensure_jit_warm(key, _sharded_meta_query, args, static_kwargs)
        return compiled(*args)

    def _run_exact_mask_query(
        self, queries, exact_mask, metric, k, take_min, cmp, thr
    ):
        """Hash-collision fallback, shard-aware: the exact host row mask
        rides the SPMD program as a synthetic hostmask plan leaf (sharded
        along 'rows'), so the re-run never gathers the store onto one
        device. The chunk mask is all-ones (conservative; this is a
        p ~ 2^-64 path — correctness over stats)."""
        import jax
        import jax.numpy as jnp

        from ..types import CmpOp

        queries = np.asarray(queries, dtype=np.float32)
        m = np.asarray(exact_mask, dtype=bool)
        n_chunks_dev = int(self._chunk_lens.shape[0])
        plan_static = ((("hostmask", "", CmpOp.Contains),),)
        plan_params = (
            (
                (
                    jnp.asarray(m),
                    jnp.asarray(np.ones(n_chunks_dev, dtype=bool)),
                ),
            ),
        )
        b = queries.shape[0]
        n_pad = self._dv.vectors.shape[0]
        k_eff = min(k, b * n_pad)
        if scoring.needs_windowed(n_pad, b, k_eff):
            # take-all-sized redo: the SPMD top-k program can't hold k_eff;
            # re-run through the same per-shard windowed path
            rows, scores, ok, _, _, _, _ = self._windowed_collect(
                {}, queries, plan_params, plan_static, k_eff,
                metric, take_min, thr, cmp,
            )
            return rows, scores, ok
        rows, scores, ok, _, _, _, _ = jax.device_get(
            self._run_query_program(
                {}, queries, plan_params,
                0.0 if thr is None else thr,
                plan_static, metric, k, take_min,
                None if thr is None else cmp,
                strict=True,
            )
        )
        return rows, scores, ok

    def _windowed_collect(
        self, cols_sub, queries, plan_params, plan_static, k_eff,
        metric, take_min, thr, cmp,
    ):
        """Sharded take-all (reference meta.rs:638-640 returns EVERY row).

        Runs the single-device windowed collection PER ROW SHARD, on each
        shard's own device: the shard's arrays are taken zero-copy from
        its addressable shards, the pruning/mask program runs locally, and
        scoring.collect_all streams that shard's score windows to the
        host. Rows never cross devices — only per-shard candidate lists
        (<= k_eff each) meet on the host, where the global top-k_eff is
        reproduced in the exact single-device order via the flat
        (query, global row) tie key. O(b*n) host traffic is inherent to
        take-all; what this avoids is the all-gather of O(n) results onto
        EVERY device that the SPMD top-k merge would imply.

        Host memory: the merge holds ~17 bytes per retained candidate
        (f32 key + i32 flat + i32 row + f32 score + bool) in preallocated
        buffers, ~9 GB at the TAKE_ALL_LIMIT admit ceiling, on top of one
        shard's [b, n_loc] staging inside collect_all. Mask programs for
        every shard are dispatched up front (device-parallel); window
        STREAMING stays sequential per shard — D2H shares one host bus
        and at take-all sizes the final host sort dominates, so
        cross-shard overlap buys little (collect_all already
        double-buffers within a shard).
        """
        import jax

        n_pad = self._dv.vectors.shape[0]
        b = queries.shape[0]
        if b * n_pad > scoring.TAKE_ALL_LIMIT:
            raise OttersError(
                f"take-all over {b} queries x {n_pad} rows stages "
                f"{b * n_pad} candidate scores (> {scoring.TAKE_ALL_LIMIT});"
                " use a smaller take(k) or fewer queries per batch"
            )
        multiproc = jax.process_count() > 1
        if multiproc:
            # cross-process merge replicates every shard's k_r-sized
            # candidate list onto every host; cap the replicated state
            n_shards = self.mesh.shape["rows"]
            n_loc_g = n_pad // n_shards
            k_r_g = min(k_eff, b * n_loc_g)
            if n_shards * k_r_g > (1 << 27):
                raise OttersError(
                    "take-all on a multi-process sharded store replicates "
                    f"{n_shards} x {k_r_g} merged candidates per host "
                    "(> 2^27); use a smaller take(k), fewer queries per "
                    "batch, or a single-process mesh"
                )

        # one (row_start, device) per distinct row block: replica 0 only,
        # so batch-axis replicas collapse AND no row block is double-
        # collected across processes
        blocks = {}
        for sh in self._dv.vectors.addressable_shards:
            start = sh.index[0].start or 0
            if sh.replica_id != 0:
                continue
            if start not in blocks:
                blocks[start] = (sh.device, sh.data.shape[0])
        chunk_ranges = {}  # device -> (chunk_start, chunk_len)
        for sh in self._chunk_lens.addressable_shards:
            chunk_ranges[sh.device] = (
                sh.index[0].start or 0, sh.data.shape[0]
            )
        n_chunks_dev = int(self._chunk_lens.shape[0])

        host_cache = {}  # id(x) -> host copy: ONE gather per array per query

        def on_dev(x, dev, row_sl, chunk_sl):
            """Shard-local view of x on dev: zero-copy when x is sharded
            there, host-sliced otherwise (unsharded hostmask params)."""
            if isinstance(x, jax.Array) and len(x.devices()) > 1:
                for s in x.addressable_shards:
                    if s.device == dev:
                        return s.data
            arr = host_cache.get(id(x))
            if arr is None:
                arr = np.asarray(x)
                host_cache[id(x)] = arr
            if arr.ndim >= 1 and arr.shape[0] == n_pad:
                return arr[row_sl]
            if arr.ndim >= 1 and arr.shape[0] == n_chunks_dev:
                return arr[chunk_sl]
            return arr

        block_list = []  # (row_start, dv_loc, rmask-or-None, ev, re_)
        for row_start in sorted(blocks):
            dev, n_loc = blocks[row_start]
            row_sl = slice(row_start, row_start + n_loc)
            cstart, clen = chunk_ranges[dev]
            chunk_sl = slice(cstart, cstart + clen)
            loc = lambda x: on_dev(x, dev, row_sl, chunk_sl)  # noqa: E731
            dv_loc = scoring.DeviceVecs(
                loc(self._dv.vectors), loc(self._dv.norms_sq),
                loc(self._dv.inv_norms), loc(self._dv.valid),
            )
            if plan_static:
                from .. import meta as meta_mod

                cols_loc = jax.tree_util.tree_map(loc, cols_sub)
                # only hostmask/null leaves carry geometry-shaped params;
                # every other leaf's params are scalars/probe coords
                params_loc = tuple(
                    tuple(
                        tuple(loc(p) for p in leaf_params)
                        if st[0] in ("hostmask", "null")
                        else leaf_params
                        for st, leaf_params in zip(st_clause, pr_clause)
                    )
                    for st_clause, pr_clause in zip(plan_static, plan_params)
                )
                # dispatch only — every shard's mask program runs
                # device-parallel before any window streaming starts
                rmask, ev, re_ = meta_mod._mask_program(
                    cols_loc, loc(self._chunk_lens), params_loc,
                    plan_static=plan_static, n_pad=n_loc,
                )
            else:
                rmask, ev, re_ = None, None, None
            block_list.append((row_start, dv_loc, rmask, ev, re_))

        # preallocated merge buffers: f32 keys (the dtype the single-device
        # path sorts) + i32 flat tie index (b * n_pad <= TAKE_ALL_LIMIT
        # < 2^31, so i32 is exact)
        k_per = [
            min(k_eff, b * dvl.vectors.shape[0])
            for _, dvl, _, _, _ in block_list
        ]
        total = int(np.sum(k_per, dtype=np.int64))
        key = np.empty(total, np.float32)
        flat = np.empty(total, np.int32)
        rows_all = np.empty(total, np.int32)
        sc_all = np.empty(total, np.float32)
        ok_all = np.empty(total, bool)
        ev_total = np.int32(0)
        re_total = np.int32(0)
        off = 0
        for (row_start, dv_loc, rmask, ev, re_), k_r in zip(
            block_list, k_per
        ):
            if ev is not None:
                ev, re_ = jax.device_get((ev, re_))
                ev_total += ev
                re_total += re_
            rows_r, sc_r, ok_r, q_r = scoring.collect_all(
                dv_loc, queries, metric, k_r,
                take_min=take_min, cmp=cmp, thr=thr, row_mask=rmask,
                prec=self.precision, return_qidx=True,
            )
            sl = slice(off, off + k_r)
            off += k_r
            grow = rows_r.astype(np.int64) + row_start
            kf = np.where(
                ok_r, sc_r, np.float32(np.inf if take_min else -np.inf)
            )
            key[sl] = -kf if not take_min else kf
            flat[sl] = q_r.astype(np.int64) * n_pad + grow
            rows_all[sl] = grow
            sc_all[sl] = sc_r
            ok_all[sl] = ok_r

        if multiproc:
            # cross-process merge: every process contributes its local
            # shards' candidate lists at their GLOBAL shard slots (padding
            # slots sort last: ok=False, key=+inf), then one allgather +
            # the same exact tie-order sort everywhere
            from jax.experimental import multihost_utils as mhu

            gtotal = n_shards * k_r_g
            gkey = np.full(gtotal, np.inf, np.float32)
            gflat = np.full(gtotal, np.iinfo(np.int32).max, np.int32)
            grows = np.zeros(gtotal, np.int32)
            gsc = np.zeros(gtotal, np.float32)
            gok = np.zeros(gtotal, bool)
            off = 0
            for (row_start, dv_loc, *_), k_r in zip(block_list, k_per):
                slot = (row_start // n_loc_g) * k_r_g
                sl_l = slice(off, off + k_r)
                sl_g = slice(slot, slot + k_r)
                gkey[sl_g] = key[sl_l]
                gflat[sl_g] = flat[sl_l]
                grows[sl_g] = rows_all[sl_l]
                gsc[sl_g] = sc_all[sl_l]
                gok[sl_g] = ok_all[sl_l]
                off += k_r
            # min-reduce keys slot-wise across processes (each slot is
            # owned by exactly one process; others hold the +inf padding)
            allg = mhu.process_allgather(
                (gkey, gflat, grows, gsc, gok, np.int64(ev_total),
                 np.int64(re_total)),
                tiled=False,
            )
            akey, aflat, arows, asc, aok, aev, are_ = allg
            key = np.asarray(akey).reshape(-1)
            flat = np.asarray(aflat).reshape(-1)
            rows_all = np.asarray(arows).reshape(-1)
            sc_all = np.asarray(asc).reshape(-1)
            ok_all = np.asarray(aok).reshape(-1)
            ev_total = np.int32(np.asarray(aev).sum())
            re_total = np.int32(np.asarray(are_).sum())
        if not plan_static:
            ev_total = np.int32(self.n_chunks())
            re_total = np.int32(self.n_rows)
        order = np.lexsort((flat, key))[:k_eff]
        return (
            rows_all[order], sc_all[order], ok_all[order],
            np.bool_(True), np.float32(-np.inf), ev_total, re_total,
        )


# ---------------------------------------------------------------------------
# Direct sharded ingest + build (round-3: capacity scale-out)
#
# ShardedMetaStore.shard() materializes the FULL single-device store first and
# round-trips it through host numpy — an 8-chip mesh could only serve a store
# that already fit one chip's HBM. build_sharded() places every slab, column
# array, zonemap and Bloom matrix straight into per-shard HBM: the whole store
# never exists on one device, so capacity scales with the mesh (BASELINE
# config 5; the multi-chip analog of the reference's scale loop,
# meta.rs:678-691).
# ---------------------------------------------------------------------------


def sharded_geometry(n_rows: int, chunk: int, n_shards: int):
    """-> (n_pad_s, n_chunks_s, n_chunks): row/chunk padding so both axes
    split evenly across shards AND every shard's chunk range exactly covers
    its row range (the alignment per-shard Pallas tile-skipping needs)."""
    import math

    lcm = scoring.SCAN_TILE * chunk // math.gcd(scoring.SCAN_TILE, chunk)
    if lcm > 4 * scoring.SCAN_TILE:
        raise OttersError(
            f"build_sharded requires a chunk size aligning with the scan "
            f"tile ({scoring.SCAN_TILE}); chunk_size={chunk} does not. Use "
            "a power-of-two chunk size, or build single-device and "
            "ShardedMetaStore.shard(...) it."
        )
    unit = lcm * n_shards
    n_pad_s = max(unit, -(-max(n_rows, 1) // unit) * unit)
    n_chunks = -(-n_rows // chunk) if n_rows else 0
    return n_pad_s, n_pad_s // chunk, n_chunks


def scan_tile_aligned(chunk: int) -> bool:
    """True when direct sharded ingest supports this chunk size: its lcm
    with the scan tile keeps the per-shard padding unit small (see
    ``sharded_geometry``). Unaligned sizes (possible on shard()-created
    stores) must stage single-device first."""
    import math

    lcm = scoring.SCAN_TILE * chunk // math.gcd(scoring.SCAN_TILE, chunk)
    return lcm <= 4 * scoring.SCAN_TILE


def build_sharded_or_shard(builder, mesh) -> "ShardedMetaStore":
    """``build_sharded`` when the chunk size aligns with the scan tile,
    else single-device build + ``shard()`` (which supports unaligned
    chunk geometries at the cost of staging the whole store on one device
    first — so the fallback only works for stores that fit one chip).
    Used by sharded ``append`` and ``load(mesh=...)`` so stores built with
    any valid single-device chunk size stay mutable/reloadable on a mesh."""
    if scan_tile_aligned(builder._chunk_size):
        return build_sharded(builder, mesh)
    return ShardedMetaStore.shard(builder.build(), mesh)


def _row_sharding(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P("rows"))


def _replicate_gather_fn(mesh):
    """Cached jitted identity with replicated out-sharding: a fresh
    ``jax.jit(lambda ...)`` per call would recompile on every
    delete/append/save (jit caches by function object)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    ck = (id(mesh), "replicate_gather")
    fn = _sharded_jit_cache.get(ck)
    if fn is None:
        fn = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))
        if len(_sharded_jit_cache) < 256:
            _sharded_jit_cache[ck] = fn
    return fn


def _put_padded(mesh, arr: np.ndarray, n_target: int, fill):
    """Place a host [n, ...] array as a padded [n_target, ...] array sharded
    along 'rows' WITHOUT forming the padded whole anywhere: each shard's
    callback slices + pads only its own block."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    arr = np.asarray(arr)
    shape = (n_target,) + arr.shape[1:]
    spec = P("rows") if arr.ndim == 1 else P("rows", None)
    sharding = NamedSharding(mesh, spec)

    def cb(index):
        sl = index[0]
        start = sl.start or 0
        stop = sl.stop if sl.stop is not None else n_target
        out = np.full((stop - start,) + arr.shape[1:], fill, dtype=arr.dtype)
        avail = min(max(arr.shape[0] - start, 0), stop - start)
        if avail > 0:
            out[:avail] = arr[start : start + avail]
        return out

    return jax.make_array_from_callback(shape, sharding, cb)


_sharded_jit_cache: Dict = {}


def _sharded_call(mesh, key, fn, *args):
    """jit ``fn`` with all outputs forced onto the 'rows' sharding (a single
    sharding is a valid pytree prefix: dim 0 sharded, rest replicated)."""
    import jax

    ck = (id(mesh), key)
    jitted = _sharded_jit_cache.get(ck)
    if jitted is None:
        jitted = jax.jit(fn, out_shardings=_row_sharding(mesh))
        if len(_sharded_jit_cache) < 256:
            _sharded_jit_cache[ck] = jitted
    return jitted(*args)


def _sharded_zeros(mesh, shape, dtype):
    import jax.numpy as jnp

    return _sharded_call(
        mesh, ("zeros", shape, str(dtype)), lambda: jnp.zeros(shape, dtype)
    )


def materialize_int8_slabs_sharded(
    slab_fn, n: int, d: int, slab_rows: int, mesh, chunk_size: int = 1024
) -> scoring.DeviceVecs:
    """Slab-streamed int8 ingest straight into per-shard HBM.

    Same ``slab_fn(start, rows) -> f32 [rows, d]`` contract as
    ``scoring.materialize_int8_slabs``; peak per-device HBM = the store's
    shard + ONE f32 slab. ``chunk_size`` must match the builder's so the
    padded geometry agrees (``sharded_geometry``)."""
    import jax
    import jax.numpy as jnp

    n_shards = mesh.shape["rows"]
    n_pad_s, _, _ = sharded_geometry(n, chunk_size, n_shards)
    buf8 = _sharded_zeros(mesh, (n_pad_s, d), jnp.int8)
    nsq = _sharded_zeros(mesh, (n_pad_s,), jnp.float32)
    inv = _sharded_zeros(mesh, (n_pad_s,), jnp.float32)
    resid = _sharded_zeros(mesh, (n_pad_s,), jnp.float32)
    slab_rows = min(slab_rows, n_pad_s)
    for start in range(0, n_pad_s, slab_rows):
        rows = min(slab_rows, n_pad_s - start)
        slab = jnp.asarray(slab_fn(start, rows), dtype=jnp.float32)
        buf8, nsq, inv, resid = scoring._int8_ingest_slab(
            buf8, nsq, inv, resid, slab, jnp.int32(start)
        )
    # sharding propagation through the donated updates keeps the buffers on
    # their shards; the device_put is a no-op guarantee of that contract
    sh2 = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("rows", None))
    sh1 = _row_sharding(mesh)
    buf8 = jax.device_put(buf8, sh2)
    nsq = jax.device_put(nsq, sh1)
    inv = jax.device_put(inv, sh1)
    resid = jax.device_put(resid, sh1)
    valid = _sharded_call(
        mesh, ("valid", n_pad_s, n),
        lambda: jnp.arange(n_pad_s, dtype=jnp.int32) < n,
    )
    resid, rbin, rmax = _sharded_resid_finalize(mesh, resid, valid)
    return scoring.DeviceVecs(buf8, nsq, inv, valid, resid, rbin, rmax)


def _sharded_resid_finalize(mesh, resid, valid):
    """Mask padding rows out of the residuals, then derive the per-bin
    maxima (sharded along rows — shard sizes are SCAN_TILE multiples, so
    bins never straddle shards) and the replicated global max."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_pad_s = resid.shape[0]

    def fin(r, v):
        r = jnp.where(v, r, 0.0)
        rbin = jnp.max(r.reshape(-1, scoring.CERT_BIN), axis=1)
        return r, rbin, jnp.max(r)

    fn = jax.jit(
        fin,
        out_shardings=(
            _row_sharding(mesh),
            _row_sharding(mesh),
            NamedSharding(mesh, P()),
        ),
    )
    return fn(resid, valid)


def materialize_f32_slabs_sharded(
    slab_fn, n: int, d: int, slab_rows: int, mesh, chunk_size: int = 1024,
    dtype=None,
) -> scoring.DeviceVecs:
    """Slab-streamed f32/bf16 ingest straight into per-shard HBM."""
    import jax
    import jax.numpy as jnp

    dtype = jnp.float32 if dtype is None else dtype
    bf16 = dtype == jnp.bfloat16
    n_shards = mesh.shape["rows"]
    n_pad_s, _, _ = sharded_geometry(n, chunk_size, n_shards)
    buf = _sharded_zeros(mesh, (n_pad_s, d), dtype)
    # bf16 storage: per-row ABSOLUTE rounding residuals computed slab-wise
    # (the f32 source exists only inside this loop) — they power the
    # Cosine/Dot/Euclidean exactness certificate (scoring.cert_row_lanes)
    resid = _sharded_zeros(mesh, (n_pad_s,), jnp.float32) if bf16 else None
    slab_rows = min(slab_rows, n_pad_s)
    for start in range(0, n_pad_s, slab_rows):
        rows = min(slab_rows, n_pad_s - start)
        slab = jnp.asarray(slab_fn(start, rows), dtype=jnp.float32)
        if bf16:
            resid = scoring._resid_ingest_slab(
                resid, scoring.bf16_abs_resid(slab), jnp.int32(start)
            )
        # reuse the module-level donated-update jit (a per-call jit would
        # retrace + recompile EVERY slab)
        buf = scoring._f32_ingest_slab(
            buf, slab.astype(dtype), jnp.int32(start)
        )
    sh2 = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("rows", None))
    buf = jax.device_put(buf, sh2)
    nsq, invn = _sharded_call(
        mesh, ("norms", n_pad_s, d, str(dtype)),
        lambda v: scoring._device_norms(v), buf,
    )
    valid = _sharded_call(
        mesh, ("valid", n_pad_s, n),
        lambda: jnp.arange(n_pad_s, dtype=jnp.int32) < n,
    )
    if bf16:
        resid = jax.device_put(resid, _row_sharding(mesh))
        resid, rbin, rmax = _sharded_resid_finalize(mesh, resid, valid)
        return scoring.DeviceVecs(buf, nsq, invn, valid, resid, rbin, rmax)
    return scoring.DeviceVecs(buf, nsq, invn, valid)




def _stage_column_host(colo, n: int):
    """Host staging for one column's device arrays (fills match the
    single-device zonemap padding in ops/zonemap.py): ->
    (rep, [(key, host_array [n], pad_fill)], nulls_np, str_hashes)."""
    from ..types import DataType
    from ..ops import hashing, wide64

    _I32 = np.iinfo(np.int32)
    nulls = np.asarray(colo.null_mask(), dtype=bool)[:n]
    dt = colo.dtype
    if dt is DataType.Int32 or dt is DataType.Bool:
        vals = np.asarray(colo.values(), dtype=np.int32)[:n] if (
            dt is DataType.Int32
        ) else np.asarray(colo.values(), dtype=np.bool_)[:n].astype(np.int32)
        return "i32", [("vals", vals, _I32.min)], nulls, None
    if dt is DataType.Float32:
        vals = np.asarray(colo.values(), dtype=np.float32)[:n]
        return "f32", [("vals", vals, np.nan)], nulls, None
    if dt in (DataType.Int64, DataType.DateTime):
        hi, lo = wide64.split_i64(np.asarray(colo.values(), dtype=np.int64)[:n])
        return "w64", [("hi", hi, _I32.min), ("lo", lo, 0)], nulls, None
    if dt is DataType.Float64:
        hi, lo = wide64.split_f64(np.asarray(colo.values(), dtype=np.float64)[:n])
        return "w64f", [("hi", hi, 0), ("lo", lo, 0)], nulls, None
    strings = list(colo.values())[:n]
    g1, g2 = hashing.hash_strings(strings)
    rh_hi, rh_lo = hashing.identity_halves(g1)
    return (
        "str",
        [("rh_hi", np.where(nulls, 0, rh_hi), 0),
         ("rh_lo", np.where(nulls, 0, rh_lo), 0)],
        nulls,
        (g1, g2),
    )


def _zm_sharded(mesh, kind, args, statics):
    """Run a zonemap program (ops/zonemap.py) over sharded, PRE-PADDED
    inputs (n == n_pad, so the internal pads are no-ops and every reduction
    stays shard-local: n_pad_s / n_shards is a chunk multiple by
    construction)."""
    from ..ops import zonemap as zm

    inner = {
        "i32": zm._build_i32_jit,
        "f32": zm._build_f32_jit,
        "w64": zm._build_w64_jit,
        "w64f": zm._build_w64f_jit,
        "str": zm._build_str_rows_jit,
    }[kind]
    key = ("zm", kind) + tuple(sorted(statics.items()))
    return _sharded_call(mesh, key, partial(inner, **statics), *args)


def _bloom_sharded(mesh, g1, g2, nulls_np, c, n_pad_s, n_chunks_s, params):
    """Per-shard DEVICE Bloom scatter: hashes stay host-computed, each
    shard scatters its own rows into its own chunk rows (rows are
    chunk-aligned per shard by construction), out-shardings pinned to the
    chunk axis. Bit-for-bit the host ``build_matrix`` layout — pinned by
    tests/test_build_sharded.py."""
    import jax
    from jax.sharding import PartitionSpec as P

    from ..ops import bloom as bloom_ops

    n_shards = mesh.shape["rows"]
    nc_loc = n_chunks_s // n_shards
    g1 = np.ascontiguousarray(g1, dtype=np.uint64)
    g2 = np.ascontiguousarray(g2, dtype=np.uint64)
    u32 = np.uint64(0xFFFFFFFF)
    args = (
        _put_padded(mesh, (g1 >> np.uint64(32)).astype(np.uint32), n_pad_s, 0),
        _put_padded(mesh, (g1 & u32).astype(np.uint32), n_pad_s, 0),
        _put_padded(mesh, (g2 >> np.uint64(32)).astype(np.uint32), n_pad_s, 0),
        _put_padded(mesh, (g2 & u32).astype(np.uint32), n_pad_s, 0),
        # padding rows hash as null: they scatter into the dump slot only
        _put_padded(mesh, np.asarray(nulls_np, dtype=bool), n_pad_s, True),
    )

    def local(g1h, g1l, g2h, g2l, nl):
        return bloom_ops._build_matrix_device_jit(
            g1h, g1l, g2h, g2l, nl, chunk_size=c, n_chunks=nc_loc,
            bits=params.bits, words=params.words, k=params.k_hashes,
        )

    ck = (
        id(mesh),
        ("bloomdev", n_pad_s, c, params.bits, params.words, params.k_hashes),
    )
    fn = _sharded_jit_cache.get(ck)
    if fn is None:
        fn = jax.jit(
            jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P("rows"),) * 5,
                out_specs=P("rows", None),
                check_vma=False,
            )
        )
        if len(_sharded_jit_cache) < 256:
            _sharded_jit_cache[ck] = fn
    return fn(*args)


def build_sharded(builder: MetaStoreBuilder, mesh) -> ShardedMetaStore:
    """Build a ShardedMetaStore by DIRECT sharded ingest: vectors, column
    arrays, null masks, zonemaps and Bloom matrices are placed straight into
    per-shard HBM — the full store never exists on one device and never
    round-trips through host numpy after placement. Capacity therefore
    scales with the mesh (round-2 verdict item 1; BASELINE config 5).

    Accepts the same vector inputs as ``build()`` except that pre-built
    DeviceVecs must already be sharded over THIS mesh with the matching
    geometry (use ``materialize_int8_slabs_sharded`` /
    ``materialize_f32_slabs_sharded``)."""
    import time

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .. import meta as meta_mod
    from ..ops import bloom as bloom_ops

    b = builder
    if b._vectors is None:
        raise OttersError("vectors must be provided to build MetaStore")
    n_shards = mesh.shape["rows"]
    c = b._chunk_size
    vectors = b._vectors
    pre_built = isinstance(vectors, scoring.DeviceVecs)
    from_device = (not pre_built) and isinstance(vectors, jax.Array)

    # ---- resolve n_rows / dim (mirrors MetaStoreBuilder.build) ----
    if pre_built:
        if b._vectors_n is None:
            raise OttersError(
                "with_vectors(DeviceVecs) requires n_rows (the logical row "
                "count; the buffers are padded)"
            )
        n_rows = int(b._vectors_n)
        dim = int(vectors.vectors.shape[1])
        if vectors.vectors.dtype == jnp.int8:
            b._storage_dtype = "int8"
        elif vectors.vectors.dtype == jnp.bfloat16:
            b._storage_dtype = "bfloat16"
    elif from_device:
        n_rows = int(
            b._vectors_n if b._vectors_n is not None else vectors.shape[0]
        )
        dim = int(vectors.shape[1])
    else:
        if not isinstance(vectors, np.ndarray):
            vectors = np.asarray(
                [np.asarray(v, dtype=np.float32) for v in vectors],
                dtype=np.float32,
            )
        vectors = vectors.astype(np.float32, copy=False)
        n_rows, dim = vectors.shape
    if dim == 0 and n_rows > 0:
        raise OttersError("vector dimension cannot be zero")
    for name in b._schema:
        colo = b._columns.get(name)
        if colo is None:
            raise OttersError(f"missing column '{name}' in builder columns")
        if len(colo) != n_rows:
            raise OttersError(
                f"column '{name}' length {len(colo)} does not match vectors "
                f"length {n_rows}"
            )

    n_pad_s, n_chunks_s, n_chunks = sharded_geometry(n_rows, c, n_shards)
    build_start = time.perf_counter()

    # ---- optional clustering (host-array vectors only) ----
    columns = b._columns
    index_map = None
    orig_columns = None
    if b._sort_by is not None or b._z_order is not None:
        if pre_built or from_device:
            raise OttersError(
                "with_sort_by / with_z_order under build_sharded require "
                "host-array vectors (generate device slabs in sorted order "
                "instead)"
            )
        if b._sort_by is not None:
            sort_col, desc = b._sort_by
            if sort_col not in b._schema:
                raise OttersError(
                    f"unknown column '{sort_col}' not present in schema"
                )
            perm = meta_mod._sort_permutation(columns[sort_col], n_rows, desc)
        else:
            for nm in b._z_order:
                if nm not in b._schema:
                    raise OttersError(
                        f"unknown column '{nm}' not present in schema"
                    )
            perm = meta_mod._zorder_permutation(columns, b._z_order, n_rows)
        orig_columns = columns
        columns = {
            name: meta_mod._permute_column(col_, perm)
            for name, col_ in columns.items()
        }
        vectors = vectors[perm]
        index_map = perm

    # ---- rerank source (host snapshot BEFORE placement) ----
    rerank_fetch = None
    if b._rerank is not None:
        fetch, keep = b._rerank
        if keep:
            if pre_built or from_device:
                raise OttersError(
                    "keep_host_f32 under build_sharded requires host-array "
                    "vectors; pass fetch_vectors instead"
                )
            host_f32 = (
                vectors if index_map is None else vectors[_inverse(index_map)]
            )

            def rerank_fetch(ids, _hf=host_f32):
                return _hf[np.asarray(ids, dtype=np.int64)]

        else:
            rerank_fetch = fetch

    # ---- vector ingest: straight to per-shard HBM ----
    ingest_start = time.perf_counter()
    sh1 = _row_sharding(mesh)
    sh2 = NamedSharding(mesh, P("rows", None))
    if pre_built:
        dv = vectors
        if int(dv.vectors.shape[0]) != n_pad_s:
            raise OttersError(
                f"pre-built DeviceVecs has {int(dv.vectors.shape[0])} padded "
                f"rows; this mesh/chunk geometry needs {n_pad_s} — build it "
                "with materialize_*_slabs_sharded(mesh=..., chunk_size=...)"
            )
    else:
        if from_device:
            placed = jax.device_put(vectors.astype(jnp.float32), sh2)
            if int(placed.shape[0]) != n_pad_s:
                placed = _sharded_call(
                    mesh, ("padrows", n_pad_s, dim, int(placed.shape[0])),
                    lambda v: jnp.pad(
                        v[:min(v.shape[0], n_pad_s)],
                        ((0, max(0, n_pad_s - v.shape[0])), (0, 0)),
                    ),
                    placed,
                )
        else:
            placed = _put_padded(mesh, vectors, n_pad_s, 0.0)
        if b._storage_dtype == "int8":

            def _quant(v):
                return scoring._quantize_rows_int8_resid(v)

            v8, nsq, invn, resid8 = _sharded_call(
                mesh, ("quant8r", n_pad_s, dim), _quant, placed
            )
            vecs_dev = v8
        elif b._storage_dtype == "bfloat16":

            def _castb(v):
                vv = v.astype(jnp.bfloat16)
                nsq, invn = scoring._device_norms(vv)
                # absolute rounding residuals: the bf16 exactness
                # certificate's per-row term (scoring.cert_row_lanes)
                return vv, nsq, invn, scoring.bf16_abs_resid(v)

            vecs_dev, nsq, invn, resid8 = _sharded_call(
                mesh, ("castb", n_pad_s, dim), _castb, placed
            )
        else:
            resid8 = None

            def _caststats(v):
                vv = v.astype(jnp.float32)
                nsq, invn = scoring._device_norms(vv)
                return vv, nsq, invn

            vecs_dev, nsq, invn = _sharded_call(
                mesh, ("cast", n_pad_s, dim, b._storage_dtype), _caststats,
                placed,
            )
        valid = _sharded_call(
            mesh, ("valid", n_pad_s, n_rows),
            lambda: jnp.arange(n_pad_s, dtype=jnp.int32) < n_rows,
        )
        if resid8 is not None:
            resid8, rbin8, rmax8 = _sharded_resid_finalize(mesh, resid8, valid)
            dv = scoring.DeviceVecs(
                vecs_dev, nsq, invn, valid, resid8, rbin8, rmax8
            )
        else:
            dv = scoring.DeviceVecs(vecs_dev, nsq, invn, valid)
    jax.block_until_ready(dv)
    ingest_dur = time.perf_counter() - ingest_start

    # ---- columns: pad host-side per shard, zonemaps computed ON shard ----
    zstart = time.perf_counter()
    device_cols: Dict[str, Dict] = {}
    col_reprs: Dict[str, str] = {}
    bloom_params: Dict[str, bloom_ops.BloomParams] = {}
    statics = dict(c=c, n_chunks=n_chunks_s, n_pad=n_pad_s)
    for name in b._schema:
        rep, parts, nulls_np, str_aux = _stage_column_host(columns[name], n_rows)
        args = [
            _put_padded(mesh, arr, n_pad_s, fill) for _, arr, fill in parts
        ]
        args.append(_put_padded(mesh, nulls_np, n_pad_s, True))
        devcol = dict(_zm_sharded(mesh, rep, tuple(args), statics))
        if rep == "str":
            g1, g2 = str_aux
            kind, val = b._bloom
            if kind == "fpr":
                params = bloom_ops.BloomParams.from_fpr(val, c)
            else:
                params = bloom_ops.BloomParams.from_bits(val, c)
            import os

            # OTTERS_BLOOM_DEVICE semantics match meta.py: unset (or
            # "0"/"false"/"") = host native build — it wins 20x on
            # hardware (hwlogs/bloom.log); set truthy = device scatter
            _env = os.environ.get("OTTERS_BLOOM_DEVICE")
            use_dev = (
                _env is not None
                and _env.lower() not in ("0", "false", "")
                and bloom_ops.device_build_ok(params, n_chunks_s // n_shards)
                and n_chunks_s % n_shards == 0
            )
            if use_dev:
                # TPU path: per-shard device bit scatter from host hashes
                # (SURVEY C10/C13 TPU-native column; round-4 item 5)
                devcol["bloom"] = _bloom_sharded(
                    mesh, g1, g2, nulls_np, c, n_pad_s, n_chunks_s, params
                )
            else:
                chunk_ids = np.arange(n_rows, dtype=np.int64) // c
                matrix = bloom_ops.build_matrix(
                    g1, g2, nulls_np, chunk_ids, n_chunks, params,
                    chunk_size=c,
                )
                devcol["bloom"] = _put_padded(mesh, matrix, n_chunks_s, 0)
            bloom_params[name] = params
        device_cols[name] = devcol
        col_reprs[name] = rep
    chunk_lens = np.zeros(n_chunks_s, dtype=np.int32)
    if n_chunks:
        chunk_lens[:n_chunks] = np.minimum(
            np.full(n_chunks, c, dtype=np.int64),
            n_rows - np.arange(n_chunks, dtype=np.int64) * c,
        ).astype(np.int32)
    chunk_lens_dev = _put_padded(mesh, chunk_lens, n_chunks_s, 0)
    if device_cols:
        jax.block_until_ready(device_cols)
    zonemap_dur = time.perf_counter() - zstart

    # ---- assemble ----
    out = ShardedMetaStore(b._schema)
    out.mesh = mesh
    out._columns = columns
    out._chunk_size = c
    out._n_rows = n_rows
    out._dim = dim
    out._n_chunks = n_chunks
    out._dv = dv
    out._device_cols = device_cols
    out._col_reprs = col_reprs
    out._bloom_params = bloom_params
    out._chunk_lens = chunk_lens_dev
    out._bloom_config = b._bloom
    out._index_map = index_map
    out._orig_columns = orig_columns
    out._sort_by = b._sort_by
    out._z_order = b._z_order
    out._storage_dtype = b._storage_dtype
    out._rerank_fetch = rerank_fetch
    out._rerank_config = b._rerank
    if b._rerank is not None and b._rerank[1]:
        out._rerank_host = host_f32  # direct ref: save/append reuse it
    out._pallas_aligned = True
    out._build_stats = meta_mod.MetaBuildStats(
        n_rows=n_rows,
        dim=dim,
        n_chunks=n_chunks,
        vectors_ingest_duration=ingest_dur,
        zonemap_build_duration=zonemap_dur,
        build_total_duration=time.perf_counter() - build_start,
    )
    return out


def _inverse(perm: np.ndarray) -> np.ndarray:
    inv = np.empty(len(perm), dtype=np.int64)
    inv[perm] = np.arange(len(perm))
    return inv
