"""Ahead-of-time compilation cache: cut cold-start from minutes to seconds.

The fused meta-query program embeds a Mosaic (Pallas) kernel; on hosts that
compile through a remote service the first compile can take minutes, and
JAX's persistent compilation cache does not capture those kernels. This
module persists the **final serialized executable**
(``jax.experimental.serialize_executable``) to disk, keyed by

    (jax version, backend platform + device kind, program name,
     static arguments, every argument's shape/dtype)

so a fresh process deserializes and runs in well under a second. Tree
structures are never pickled: the input treedef is recomputed from the call
arguments and the output treedef via ``jax.eval_shape`` (pure tracing).

Usage: ``MetaStore.precompile(...)`` populates the cache for the signatures
a deployment serves; ``_run_query_program`` consults it transparently on
every query. Set ``OTTERS_AOT_CACHE=<dir>`` to relocate (default
``~/.cache/otters_tpu/aot``), ``OTTERS_AOT_CACHE=0`` to disable.
"""

from __future__ import annotations

import hashlib
import os
import threading
from typing import Any, Dict, Optional

_mem: Dict[str, Any] = {}
_lock = threading.Lock()
_MEM_LIMIT = 64
stats = {"disk_hits": 0, "compiles": 0}


def cache_dir() -> Optional[str]:
    env = os.environ.get("OTTERS_AOT_CACHE")
    if env == "0":
        return None
    return env or os.path.expanduser("~/.cache/otters_tpu/aot")


def _backend_tag() -> str:
    import jax

    dev = jax.devices()[0]
    return f"{jax.__version__}|{dev.platform}|{dev.device_kind}"


def _aval_sig(tree) -> str:
    import jax

    leaves = jax.tree.leaves(tree)
    parts = []
    for x in leaves:
        dt = getattr(x, "dtype", type(x).__name__)
        sh = getattr(x, "shape", ())
        parts.append(f"{dt}{list(sh)}")
    return ",".join(parts)


def signature(name: str, static_repr: str, args, kwargs) -> str:
    raw = "|".join(
        [_backend_tag(), name, static_repr, _aval_sig((args, kwargs))]
    )
    return hashlib.sha256(raw.encode()).hexdigest()[:32]


def _blob_path(key: str) -> Optional[str]:
    d = cache_dir()
    if d is None:
        return None
    import jax

    if jax.devices()[0].platform != "tpu" and not os.environ.get(
        "OTTERS_AOT_CACHE"
    ):
        # CPU AOT blobs are machine-feature sensitive (risk of SIGILL on a
        # different host); default the disk layer on only for TPU backends.
        # Set OTTERS_AOT_CACHE explicitly to opt in elsewhere.
        return None
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"{key}.jaxexe")


def lookup(key: str):
    """In-memory lookup only (no disk I/O on the query hot path)."""
    return _mem.get(key)


def load_or_compile(key: str, jitted, args, static_kwargs):
    """Return a Compiled executable for ``jitted(*args, **static_kwargs)``.

    ``args`` are the dynamic (traced) positional arguments; every static
    argument must be a keyword. Order: in-memory cache -> disk blob
    (deserialize; treedefs recomputed from args + eval_shape, nothing is
    pickled) -> lower+compile (persisting the blob for the next process).
    Call the result with the dynamic args only: ``compiled(*args)``.
    """
    with _lock:
        hit = _mem.get(key)
    if hit is not None:
        return hit
    import jax

    compiled = None
    path = _blob_path(key)
    # deserialized executables bind to the compile-time device assignment;
    # only load blobs on single-device backends (the serving shape — multi
    # -chip stores go through the shard_map path, which keeps its own jit)
    if path and os.path.exists(path) and len(jax.local_devices()) == 1:
        try:
            from jax.experimental.serialize_executable import (
                deserialize_and_load,
            )

            with open(path, "rb") as f:
                blob = f.read()
            in_tree = jax.tree.structure((tuple(args), {}))
            out_tree = jax.tree.structure(
                jax.eval_shape(jitted, *args, **static_kwargs)
            )
            compiled = deserialize_and_load(blob, in_tree, out_tree)
            stats["disk_hits"] += 1
        except Exception:
            compiled = None  # stale/corrupt/foreign blob: recompile below
    if compiled is None:
        lowered = jitted.lower(*args, **static_kwargs)
        compiled = lowered.compile()
        stats["compiles"] += 1
        if path:
            try:
                from jax.experimental.serialize_executable import serialize

                blob, _, _ = serialize(compiled)
                tmp = f"{path}.tmp.{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)
            except Exception:
                pass  # backend can't serialize: still cached in memory
    with _lock:
        if len(_mem) < _MEM_LIMIT:
            _mem[key] = compiled
    return compiled


def clear_memory_cache() -> None:
    with _lock:
        _mem.clear()
