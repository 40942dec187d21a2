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
    it by rebuilding from columns if needed."""
    with np.load(path) as z:
        manifest = json.loads(bytes(z["manifest"]).decode("utf-8"))
        if manifest.get("kind") != "MetaStore":
            raise OttersError(f"{path} does not contain a MetaStore")
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
