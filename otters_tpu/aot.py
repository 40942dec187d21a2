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
_MEM_LIMIT = 256
_hits: Dict[str, int] = {}  # per-signature use counts (gates the jit warm)
stats = {"disk_hits": 0, "compiles": 0}


def cache_dir() -> Optional[str]:
    env = os.environ.get("OTTERS_AOT_CACHE")
    if env == "0":
        return None
    return env or os.path.expanduser("~/.cache/otters_tpu/aot")


_code_salt: Optional[str] = None


def _code_version() -> str:
    """Content hash of the package sources: a code change invalidates every
    blob (a stale executable would otherwise silently serve the OLD program
    semantics — the key has no view into the traced computation)."""
    global _code_salt
    if _code_salt is None:
        import glob

        root = os.path.dirname(__file__)
        h = hashlib.sha256()
        for p in sorted(glob.glob(os.path.join(root, "**", "*.py"), recursive=True)):
            with open(p, "rb") as f:
                h.update(f.read())
        _code_salt = h.hexdigest()[:12]
    return _code_salt


def _backend_tag() -> str:
    import jax

    dev = jax.devices()[0]
    try:
        # includes the runtime/libtpu build, which can change codegen even
        # when jax.__version__ does not
        runtime = jax.extend.backend.get_backend().platform_version
    except Exception:
        runtime = ""
    flags = os.environ.get("XLA_FLAGS", "") + "|" + os.environ.get(
        "OTTERS_PALLAS_INTERPRET", ""
    )
    extra = hashlib.sha256(f"{runtime}|{flags}".encode()).hexdigest()[:8]
    # process index + first LOCAL device id: single-device program blobs
    # bind to their compile-time device; without these a multihost peer (or
    # a process pinned to a different local device) sharing the cache dir
    # would deserialize a blob it cannot dispatch
    loc = jax.local_devices()[0]
    try:
        pidx = jax.process_index()
    except Exception:
        pidx = 0
    return (
        f"{jax.__version__}|{dev.platform}|{dev.device_kind}|"
        f"n{len(jax.devices())}p{pidx}d{loc.id}|{extra}|{_code_version()}"
    )


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
    if os.environ.get("OTTERS_DISABLE_AOT"):
        return None  # kill-switch: never read or write blobs
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
    try:
        os.makedirs(d, exist_ok=True)
    except OSError:
        return None  # read-only FS / path occupied: degrade to memory-only
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
    # deserialized executables bind to the compile-time device assignment.
    # That is safe here because the key pins it: _backend_tag carries the
    # device count, and multi-device programs put their Mesh (with concrete
    # device ids) in the static repr — a blob is only ever found by a
    # process with the identical topology + assignment.
    if path and os.path.exists(path):
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
        if len(_mem) >= _MEM_LIMIT:  # FIFO eviction: never re-load per query
            _mem.pop(next(iter(_mem)))
        _mem[key] = compiled
    return compiled


def clear_memory_cache() -> None:
    with _lock:
        _mem.clear()
        _hits.clear()
        _jit_ready.clear()
        _warming.clear()


# --- background jit warm-up -------------------------------------------------
#
# Deserialized executables answer the FIRST queries in well under a second,
# but their Python call path dispatches ~1ms slower per call and pipelines
# worse than jit's C++ fast path. So while Compiled serves traffic, a
# background thread warms the jit cache for the same signature; once ready,
# dispatch switches over (jit steady-state ~7ms/batch vs ~28ms via Compiled
# at 1M x 768 x 256q).

_jit_ready: set = set()
_warming: set = set()
_import_time = __import__("time").monotonic()
_WARM_MIN_AGE_S = 60.0  # don't warm in processes younger than this


def jit_is_ready(key: str) -> bool:
    return key in _jit_ready


def ensure_jit_warm(key: str, jitted, args, static_kwargs) -> None:
    """Compile-and-run ``jitted`` once in a background thread; mark ``key``
    ready when done.

    Only triggers once a signature has been used TWICE *and* the process has
    been alive for a minute: short-lived scripts never start the warm (whose
    non-daemon thread would otherwise make the process wait out a full
    compile at exit — and a daemon thread killed mid-XLA-compile aborts the
    interpreter), while any serving loop warms within its first minute plus
    one query. No-op if already ready/warming or if OTTERS_AOT_NO_WARM is
    set.

    NOTE: the thread's closure keeps ``args`` (device buffers) alive until
    the warm finishes; before dropping a multi-GB store to rebuild another,
    call :func:`wait_jit_ready` so HBM is actually released."""
    import time as _time

    if os.environ.get("OTTERS_AOT_NO_WARM"):
        return
    with _lock:
        _hits[key] = _hits.get(key, 0) + 1
        if (
            _hits[key] < 2
            or _time.monotonic() - _import_time < _WARM_MIN_AGE_S
            or key in _jit_ready
            or key in _warming
        ):
            return
        _warming.add(key)

    def work():
        import time as _time

        import jax

        # let the first (AOT-served) queries drain before compiling: on
        # remote-compile backends the compile contends with execution and
        # would stall the very warm-up the blob just saved
        _time.sleep(3.0)
        try:
            out = jitted(*args, **static_kwargs)
            jax.block_until_ready(out)
            with _lock:
                _jit_ready.add(key)
        except Exception as e:  # keep serving via the Compiled path
            stats["warm_fail"] = stats.get("warm_fail", 0) + 1
            if os.environ.get("OTTERS_AOT_DEBUG"):
                import traceback

                print(f"aot warm {key[:8]} failed: {e!r}", flush=True)
                traceback.print_exc()
        finally:
            with _lock:
                _warming.discard(key)

    # non-daemon: a daemon thread killed mid-XLA-compile aborts the process
    # at interpreter exit; a clean join costs at most one compile wait
    threading.Thread(
        target=work, daemon=False, name=f"aot-warm-{key[:8]}"
    ).start()


def wait_jit_ready(timeout: float = 600.0) -> bool:
    """Block until every in-flight background jit warm finishes (True) or
    the timeout elapses (False). Useful before latency-sensitive serving or
    benchmarking: afterwards, dispatch uses jit's fast path."""
    import time as _time

    t0 = _time.time()
    while _time.time() - t0 < timeout:
        with _lock:
            if not _warming:
                return True
        _time.sleep(0.25)
    return False
