"""Persistence: save/load stores to disk.

The reference lists persistence as roadmap (README.md:207 "Persistence
(save/load MetaStore to/from disk)"); otters-tpu ships it. Format: a single
``.npz`` (no pickling — strings are stored as UTF-8 byte arenas + offsets)
plus an embedded JSON manifest. Loading rebuilds device state through the
normal build path, so zonemaps/Bloom bits are reconstructed deterministically
from the same configuration.
"""

from __future__ import annotations

import json


import numpy as np

from .column import Column
from .errors import OttersError
from .meta import MetaStore
from .types import DataType
from .vec import VecStore

_FORMAT_VERSION = 1


def _pack_strings(strings):
    from .native import pack_utf8_arena

    return pack_utf8_arena(strings)


def _unpack_strings(data: np.ndarray, offsets: np.ndarray):
    buf = data.tobytes()
    return [
        buf[offsets[i] : offsets[i + 1]].decode("utf-8")
        for i in range(len(offsets) - 1)
    ]


def _column_blocks(arrays: dict, columns, n: int) -> dict:
    """Serialize columns into ``arrays`` (shared by both store formats);
    returns the schema dict."""
    schema = {}
    for name, col in columns.items():
        dt = col.dtype
        schema[name] = dt.value
        arrays[f"col_null::{name}"] = np.asarray(col.null_mask())[:n]
        if dt is DataType.String:
            data, offsets = _pack_strings(list(col.values())[:n])
            arrays[f"col_strdata::{name}"] = data
            arrays[f"col_stroff::{name}"] = offsets
        else:
            arrays[f"col_vals::{name}"] = np.asarray(col.values())[:n]
    return schema


def _read_column_blocks(z, manifest) -> list:
    """Rebuild Column objects from a ``_column_blocks`` payload."""
    n = manifest["n_rows"]
    cols = []
    for name, dt_name in manifest["schema"].items():
        dt = DataType(dt_name)
        col = Column(name, dt)
        nulls = z[f"col_null::{name}"]
        if dt is DataType.String:
            vals = _unpack_strings(
                z[f"col_strdata::{name}"], z[f"col_stroff::{name}"]
            )
        else:
            vals = z[f"col_vals::{name}"]
        col._set_raw(vals, nulls)
        assert len(col) == n
        cols.append(col)
    return cols


def save_meta(store: MetaStore, path: str) -> None:
    """Serialize a MetaStore (vectors + columns + config) to ``path``.

    Sorted stores are saved in ORIGINAL ingestion order (the sort is
    re-applied on load); tombstoned deletions are preserved. For a
    ``keep_host_f32`` rerank store the TRUE f32 snapshot is saved as the
    vector payload (the same rows the original build quantized, so the
    rebuilt int8/bf16 codes are identical) and the rerank source is
    restored on load; a ``fetch_vectors`` source cannot be serialized —
    the manifest records it so load can say so."""
    n = store.n_rows
    arrays = {}
    cfg = store._rerank_config
    keep_rerank = bool(cfg is not None and cfg[1])
    if keep_rerank and store._rerank_fetch is not None:
        # true-f32 snapshot, already in ORIGINAL ingestion order; the
        # direct ref (when present) avoids an n x d transient copy
        vectors = (
            store._rerank_host[:n]
            if store._rerank_host is not None
            else np.asarray(
                store._rerank_fetch(np.arange(n, dtype=np.int64)),
                dtype=np.float32,
            )
        )
    else:
        vectors = (
            np.asarray(store._dv.vectors)[:n]
            if store._dv is not None
            else np.zeros((0, store._dim), np.float32)
        )
        if vectors.dtype != np.float32:
            # bfloat16 storage: upcast (exact) — npz cannot round-trip
            # ml_dtypes
            vectors = vectors.astype(np.float32)
    deleted = (
        ~np.asarray(store._dv.valid)[:n]
        if store._dv is not None
        else np.zeros(0, bool)
    )
    columns = store.columns()
    if store._index_map is not None:
        inv = np.empty(n, dtype=np.int64)
        inv[store._index_map] = np.arange(n)
        if not keep_rerank:
            vectors = vectors[inv]  # device order -> original order
        deleted = deleted[inv]
        columns = store._orig_columns
    arrays["vectors"] = vectors
    arrays["deleted"] = deleted
    schema = _column_blocks(arrays, columns, n)
    bloom_kind, bloom_val = store._bloom_config
    manifest = {
        "format_version": _FORMAT_VERSION,
        "kind": "MetaStore",
        "n_rows": n,
        "dim": store._dim,
        "chunk_size": store.chunk_size(),
        "bloom_kind": bloom_kind,
        "bloom_val": bloom_val,
        "schema": schema,
        "sort_by": list(store._sort_by) if store._sort_by else None,
        "z_order": list(store._z_order) if store._z_order else None,
        "storage_dtype": store._storage_dtype,
        "rerank": (
            "keep_host_f32"
            if keep_rerank
            else ("fetch" if cfg is not None else None)
        ),
        # certificate widths that certified for this store: a fresh process
        # starts at the persisted width instead of re-paying the widen
        # discovery (wasted full scans per plan shape)
        "cert_hints": store.cert_hints() or None,
    }
    arrays["manifest"] = np.frombuffer(
        json.dumps(manifest).encode("utf-8"), dtype=np.uint8
    )
    # write through a file object so the EXACT path is used (np.savez appends
    # '.npz' to bare paths, which load_meta would then fail to find)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_meta(path: str, mesh=None) -> MetaStore:
    """Load a MetaStore saved with :func:`save_meta` (device state rebuilt).

    With ``mesh`` the store is rebuilt by DIRECT sharded ingest onto that
    mesh (``build_sharded``): every array lands straight in per-shard HBM,
    so a store larger than one chip can be reloaded without ever existing
    on a single device. A saved ``keep_host_f32`` rerank source is
    restored; a ``fetch_vectors`` source cannot be serialized — re-attach
    it by rebuilding from columns if needed.

    ``path`` may be either the single-file ``.npz`` format or a per-shard
    directory written by :func:`save_meta_sharded` (auto-detected)."""
    import os

    if os.path.isdir(path):
        return load_meta_dir(path, mesh=mesh)
    with np.load(path) as z:
        manifest = json.loads(bytes(z["manifest"]).decode("utf-8"))
        if manifest.get("kind") != "MetaStore":
            raise OttersError(f"{path} does not contain a MetaStore")
        n = manifest["n_rows"]
        cols = _read_column_blocks(z, manifest)
        builder = MetaStore.from_columns(cols).with_vectors(
            np.asarray(z["vectors"])
        ).with_chunk_size(manifest["chunk_size"])
        if manifest["bloom_kind"] == "fpr":
            builder = builder.with_bloom_fpr(manifest["bloom_val"])
        else:
            builder = builder.with_bloom_bits(int(manifest["bloom_val"]))
        if manifest.get("sort_by"):
            sc, desc = manifest["sort_by"]
            builder = builder.with_sort_by(sc, desc)
        if manifest.get("z_order"):
            builder = builder.with_z_order(manifest["z_order"])
        builder = builder.with_storage_dtype(
            manifest.get("storage_dtype", "float32")
        )
        if manifest.get("rerank") == "keep_host_f32":
            builder = builder.with_rerank_source(keep_host_f32=True)
        if mesh is not None:
            # unaligned chunk sizes fall back to single-device build +
            # shard() inside the helper
            from .parallel.meta_sharded import build_sharded_or_shard

            store = build_sharded_or_shard(builder, mesh)
        else:
            store = builder.build()
        if "deleted" in z:
            deleted = np.flatnonzero(np.asarray(z["deleted"]))
            if deleted.size:
                store.delete_rows(deleted)
        store._restore_cert_hints(manifest.get("cert_hints"))
        return store


# ---- per-shard sharded format (sharded-v1) -----------------------------------
#
# Mesh-scaled persistence: neither save nor load ever stages the full vector
# payload on one host (reference roadmap README.md:207; SURVEY §5 checkpoint
# row). Layout: a DIRECTORY holding
#   manifest_{process:05d}.json  -- base config + that process's shard files
#   meta.npz                     -- columns (+ deleted ids, index_map)
#   shard_{row_start:012d}.npz   -- one device shard's valid rows ("rows",
#                                   and "resid" for quantized payloads)
# The vector payload is always stored in DEVICE row order; sorted stores
# record their index_map and are rebuilt WITHOUT re-sorting (zonemaps are
# recomputed over the same device-order columns, so the loaded store is
# bit-identical in behavior). On a multi-process mesh every process calls
# save with the same shared-filesystem path and writes its own shards.


def save_meta_sharded(store, path: str) -> None:
    """Serialize a ShardedMetaStore as one file per row-shard (see above).

    Host staging is bounded by ONE shard at a time; ``save_meta``'s
    whole-store gather never happens. ``keep_host_f32`` stores save the
    TRUE f32 rows (host-resident already) so the rebuilt quantized codes
    are identical; other stores save the device payload directly (int8
    codes round-trip bit-exactly: re-quantizing codes is idempotent
    because each row's max |code| is exactly 127)."""
    import os

    import jax

    from .parallel.meta_sharded import ShardedMetaStore

    if not isinstance(store, ShardedMetaStore):
        raise OttersError("save_meta_sharded requires a ShardedMetaStore")
    if os.path.exists(path) and not os.path.isdir(path):
        raise OttersError(f"{path} exists and is not a directory")
    os.makedirs(path, exist_ok=True)
    n = store.n_rows
    dv = store._dv
    cfg = store._rerank_config
    keep_rerank = bool(
        cfg is not None and cfg[1] and store._rerank_fetch is not None
    )

    resid_by_start = {}
    if dv.resid is not None and not keep_rerank:
        for s in dv.resid.addressable_shards:
            resid_by_start[s.index[0].start or 0] = s
    ranges, files = [], []
    seen = set()
    for s in sorted(
        dv.vectors.addressable_shards, key=lambda s: s.index[0].start or 0
    ):
        lo = s.index[0].start or 0
        if s.replica_id != 0:
            # replicated copy (e.g. along a batch mesh axis): exactly one
            # process owns replica 0 of each row block, so only it writes —
            # cross-process duplicates would tear files on a shared FS and
            # double-list ranges in the manifests
            continue
        if lo in seen:
            continue
        seen.add(lo)
        data = np.asarray(s.data)
        hi = min(lo + data.shape[0], n)
        if hi <= lo:
            continue  # all-padding shard
        if keep_rerank:
            # true-f32 rows for THIS device range (original -> device order
            # via index_map; pure host slicing of the resident snapshot)
            ids = (
                store._index_map[lo:hi]
                if store._index_map is not None
                else np.arange(lo, hi, dtype=np.int64)
            )
            rows = (
                store._rerank_host[ids]
                if store._rerank_host is not None
                else np.asarray(store._rerank_fetch(ids), dtype=np.float32)
            )
            payload = {"rows": np.asarray(rows, dtype=np.float32)}
        else:
            rows = data[: hi - lo]
            if rows.dtype not in (np.float32, np.int8):
                rows = rows.view(np.uint16)  # bfloat16: exact uint16 bits
            payload = {"rows": rows}
            rs = resid_by_start.get(lo)
            if rs is not None:
                payload["resid"] = np.asarray(rs.data)[: hi - lo]
        fname = f"shard_{lo:012d}.npz"
        with open(os.path.join(path, fname), "wb") as f:
            np.savez(f, **payload)
        ranges.append([int(lo), int(hi)])
        files.append(fname)

    bloom_kind, bloom_val = store._bloom_config
    if keep_rerank:
        payload_dtype = "float32"
    elif dv.vectors.dtype == np.int8:
        payload_dtype = "int8"
    elif np.dtype(dv.vectors.dtype).itemsize == 2:
        payload_dtype = "bfloat16"
    else:
        payload_dtype = "float32"
    manifest = {
        "format_version": _FORMAT_VERSION,
        "kind": "MetaStore",
        "layout": "sharded-v1",
        "n_rows": n,
        "dim": store._dim,
        "chunk_size": store.chunk_size(),
        "bloom_kind": bloom_kind,
        "bloom_val": bloom_val,
        "schema": {k: c.dtype.value for k, c in store._columns.items()},
        "sort_by": list(store._sort_by) if store._sort_by else None,
        "z_order": list(store._z_order) if store._z_order else None,
        "storage_dtype": store._storage_dtype,
        "rerank": (
            "keep_host_f32"
            if keep_rerank
            else ("fetch" if cfg is not None else None)
        ),
        "payload_dtype": payload_dtype,
        "order": "device",
        "row_ranges": ranges,
        "files": files,
        "has_resid": bool(resid_by_start) and not keep_rerank,
        "cert_hints": store.cert_hints() or None,
        # load merges EXACTLY manifests 0..process_count-1: a re-save from
        # fewer processes must not resurrect a stale higher-numbered
        # manifest left in the directory
        "process_count": jax.process_count(),
    }
    pid = jax.process_index()
    with open(os.path.join(path, f"manifest_{pid:05d}.json"), "w") as f:
        json.dump(manifest, f)
    # the deleted set is the only device-derived piece (n bools). The
    # gather is a COLLECTIVE on multi-process meshes, so every process
    # must execute it — only the write below is process-0-gated.
    valid = store._host_valid()
    if pid == 0:
        # columns are host-replicated on every process
        pos = np.flatnonzero(~valid[:n]).astype(np.int64)
        arrays = {
            "deleted": (
                store._index_map[pos] if store._index_map is not None else pos
            )
        }
        if store._index_map is not None:
            arrays["index_map"] = np.asarray(store._index_map, np.int64)
        _column_blocks(arrays, store._columns, n)  # DEVICE order
        with open(os.path.join(path, "meta.npz"), "wb") as f:
            np.savez(f, **arrays)


def load_meta_dir(path: str, mesh=None) -> MetaStore:
    """Load a ``sharded-v1`` directory (see :func:`save_meta_sharded`).

    With ``mesh`` the payload streams shard-file-by-shard-file straight
    into per-shard HBM (host peak = one shard file + one slab); without it
    the store is rebuilt single-device through the same slab streaming."""
    import glob
    import os

    import jax.numpy as jnp

    mfs = sorted(glob.glob(os.path.join(path, "manifest_*.json")))
    if not mfs:
        raise OttersError(f"{path} does not contain a sharded MetaStore")
    with open(mfs[0]) as f:
        m0 = json.load(f)
    if m0.get("kind") != "MetaStore" or m0.get("layout") != "sharded-v1":
        raise OttersError(f"{path} does not contain a sharded MetaStore")
    # merge exactly the manifests the LAST save wrote (stale higher-numbered
    # manifests from an earlier wider-cluster save are ignored)
    n_procs = int(m0.get("process_count", len(mfs)))
    manifests = [m0]
    for pid_i in range(1, n_procs):
        p = os.path.join(path, f"manifest_{pid_i:05d}.json")
        if not os.path.exists(p):
            raise OttersError(
                f"sharded store at {path} was saved by {n_procs} processes "
                f"but manifest_{pid_i:05d}.json is missing"
            )
        with open(p) as f:
            manifests.append(json.load(f))
    n, d = m0["n_rows"], m0["dim"]
    chunk = m0["chunk_size"]
    storage = m0.get("storage_dtype", "float32")
    payload_dtype = m0.get("payload_dtype", "float32")
    pieces = sorted(
        (int(r[0]), int(r[1]), os.path.join(path, f))
        for mf in manifests
        for r, f in zip(mf["row_ranges"], mf["files"])
    )
    covered = 0
    for lo, hi, _ in pieces:
        if lo != covered:
            raise OttersError(
                f"sharded store at {path} is missing rows "
                f"[{covered}, {lo}) — were all processes' shards saved?"
            )
        covered = hi
    if covered != n:
        raise OttersError(
            f"sharded store at {path} is missing rows [{covered}, {n})"
        )

    with np.load(os.path.join(path, "meta.npz")) as z:
        cols = _read_column_blocks(z, m0)
        deleted = (
            np.asarray(z["deleted"], np.int64)
            if "deleted" in z
            else np.zeros(0, np.int64)
        )
        index_map = (
            np.asarray(z["index_map"], np.int64) if "index_map" in z else None
        )

    cache: dict = {}

    def _read(a, b, key="rows"):
        """Rows [a, b) of the logical payload; ONE file resident at a
        time (ranges are visited in order by the slab streamers)."""
        parts = []
        for lo, hi, f in pieces:
            if hi <= a or lo >= b:
                continue
            if cache.get("f") != f:
                with np.load(f) as zz:
                    cache.clear()
                    cache["f"] = f
                    cache["rows"] = zz["rows"]
                    if "resid" in zz:
                        cache["resid"] = zz["resid"]
            parts.append(cache[key][max(a, lo) - lo : min(b, hi) - lo])
        return parts[0] if len(parts) == 1 else np.concatenate(parts)

    def slab_fn(start, rows):
        end = min(start + rows, n)
        if end <= start:
            return np.zeros((rows, d), np.float32)
        block = _read(start, end)
        if payload_dtype == "bfloat16":
            import ml_dtypes

            block = block.view(ml_dtypes.bfloat16)
        block = np.asarray(block, dtype=np.float32)
        if block.shape[0] < rows:
            block = np.concatenate(
                [block, np.zeros((rows - block.shape[0], d), np.float32)]
            )
        return block

    slab_rows = min(max(chunk, 1 << 16), 1 << 20)
    if mesh is not None:
        from .parallel import meta_sharded as msh

        if not msh.scan_tile_aligned(chunk):
            # unaligned chunk sizes (possible on shard()-created stores)
            # cannot go through direct sharded ingest; rebuild
            # single-device and re-shard, like build_sharded_or_shard
            return msh.ShardedMetaStore.shard(
                load_meta_dir(path, mesh=None), mesh
            )
        if storage == "int8":
            dv = msh.materialize_int8_slabs_sharded(
                slab_fn, n, d, slab_rows, mesh, chunk_size=chunk
            )
        else:
            dv = msh.materialize_f32_slabs_sharded(
                slab_fn, n, d, slab_rows, mesh, chunk_size=chunk,
                dtype=jnp.bfloat16 if storage == "bfloat16" else jnp.float32,
            )
    else:
        from .ops import scoring

        if storage == "int8":
            dv = scoring.materialize_int8_slabs(slab_fn, n, d, slab_rows)
        elif storage == "bfloat16":
            # bf16 single-device: host assembly (the small-store path)
            dv = scoring.materialize(
                slab_fn(0, n)[:n], dtype=jnp.bfloat16
            )
        else:
            dv = scoring.materialize_f32_slabs(slab_fn, n, d, slab_rows)

    builder = (
        MetaStore.from_columns(cols)
        .with_vectors(dv, n_rows=n)
        .with_chunk_size(chunk)
    )
    if m0["bloom_kind"] == "fpr":
        builder = builder.with_bloom_fpr(m0["bloom_val"])
    else:
        builder = builder.with_bloom_bits(int(m0["bloom_val"]))
    # NO with_sort_by / with_z_order: the payload and columns are already
    # in device (sorted) order — re-sorting a pre-built DeviceVecs is
    # impossible and unnecessary; the sort metadata is re-attached below
    store = builder.build_sharded(mesh) if mesh is not None else builder.build()

    if index_map is not None:
        store._index_map = index_map
        store._sort_by = (
            tuple(m0["sort_by"]) if m0.get("sort_by") else None
        )
        store._z_order = list(m0["z_order"]) if m0.get("z_order") else None
        inv = np.empty(n, dtype=np.int64)
        inv[index_map] = np.arange(n)
        orig = {}
        for name, colo in store._columns.items():
            vals = colo.values()
            nulls = np.asarray(colo.null_mask(), dtype=bool)[:n]
            if isinstance(vals, np.ndarray):
                ovals = vals[:n][inv]
            else:
                ovals = [vals[i] for i in inv]
            oc = Column(name, colo.dtype)
            oc._set_raw(ovals, nulls[inv])
            orig[name] = oc
        store._orig_columns = orig

    if m0.get("rerank") == "keep_host_f32":
        host = np.empty((n, d), dtype=np.float32)
        ids_all = index_map if index_map is not None else None
        for lo, hi, f in pieces:
            with np.load(f) as zz:
                rows = np.asarray(zz["rows"], dtype=np.float32)
            if ids_all is not None:
                host[ids_all[lo:hi]] = rows
            else:
                host[lo:hi] = rows
        store._rerank_host = host
        store._rerank_config = (None, True)

        def _fetch(ids, _hf=host):
            return _hf[np.asarray(ids, dtype=np.int64)]

        store._rerank_fetch = _fetch
    elif m0.get("rerank") == "fetch":
        store._rerank_config = None  # fetch fns cannot be serialized

    if m0.get("has_resid") and storage in ("int8", "bfloat16"):
        # the ORIGINAL true-f32 residual bounds (sound vs the source data,
        # not just vs the codes) — restore so a re-attached fetch_vectors
        # source keeps the exactness certificate valid
        resid_host = np.zeros(dv.vectors.shape[0], dtype=np.float32)
        resid_host[:n] = np.concatenate(
            [_read(lo, hi, "resid") for lo, hi, _ in pieces]
        )
        if mesh is not None:
            from .parallel import meta_sharded as msh

            r = msh._put_padded(mesh, resid_host, dv.vectors.shape[0], 0.0)
            r, rbin, rmax = msh._sharded_resid_finalize(
                mesh, r, store._dv.valid
            )
        else:
            from .ops import scoring

            r = jnp.where(
                store._dv.valid, jnp.asarray(resid_host), 0.0
            )
            rbin, rmax = scoring.finalize_resid(r)
        store._dv = store._dv._replace(
            resid=r, resid_bin=rbin, resid_max=rmax
        )

    if deleted.size:
        store.delete_rows(deleted)
    store._restore_cert_hints(m0.get("cert_hints"))
    return store


def save_vec(store: VecStore, path: str) -> None:
    manifest = {
        "format_version": _FORMAT_VERSION,
        "kind": "VecStore",
        "dim": store.dim,
        "n": len(store),
        "dtype": store._dtype,
    }
    with open(path, "wb") as f:
        np.savez(
            f,
            vectors=store._host_matrix(),
            manifest=np.frombuffer(
                json.dumps(manifest).encode("utf-8"), np.uint8
            ),
        )


def load_vec(path: str) -> VecStore:
    with np.load(path) as z:
        manifest = json.loads(bytes(z["manifest"]).decode("utf-8"))
        if manifest.get("kind") != "VecStore":
            raise OttersError(f"{path} does not contain a VecStore")
        store = VecStore(manifest["dim"], dtype=manifest.get("dtype", "float32"))
        vectors = np.asarray(z["vectors"])
        if len(vectors):
            store.add_vectors(vectors)
        return store
