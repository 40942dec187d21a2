"""Native (C++) ingest kernels, loaded via ctypes.

Compiles ``otters_native.cpp`` on first use with g++ (-O3 -fopenmp) into a
cached shared object next to the source. Every entry point has a pure-Python
fallback (ops/hashing.py, ops/bloom.py), so a missing compiler only costs
ingest speed, never correctness. Hash outputs are bit-for-bit identical to
the Python implementation (tested in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "otters_native.cpp")
_LIB_NAME = f"otters_native_{sys.implementation.cache_tag}.so"

_lib = None
_tried = False


def _compile(out_path: str) -> bool:
    cmds = [
        ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-fopenmp",
         _SRC, "-o", out_path],
        ["g++", "-O3", "-fPIC", "-shared", _SRC, "-o", out_path],
        ["cc", "-O3", "-fPIC", "-shared", "-x", "c++", _SRC, "-o", out_path,
         "-lstdc++"],
    ]
    for cmd in cmds:
        try:
            r = subprocess.run(
                cmd, capture_output=True, timeout=120, check=False
            )
            if r.returncode == 0 and os.path.exists(out_path):
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    candidates = [
        os.path.join(_DIR, _LIB_NAME),
        os.path.join(tempfile.gettempdir(), _LIB_NAME),
    ]

    def _fresh(p: str) -> bool:  # stale .so (older than the source) is rebuilt
        try:
            return os.path.getmtime(p) >= os.path.getmtime(_SRC)
        except OSError:
            return False

    path = next((p for p in candidates if os.path.exists(p) and _fresh(p)), None)
    if path is None:
        for p in candidates:
            if _compile(p):
                path = p
                break
    if path is None:  # no compiler: fall back to any existing (stale) build
        path = next((p for p in candidates if os.path.exists(p)), None)
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.otters_hash_strings.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.otters_hash_strings.restype = None
    lib.otters_bloom_build.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p,
    ]
    lib.otters_bloom_build.restype = None
    try:
        lib.otters_fuzzy_mask.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.otters_fuzzy_mask.restype = None
    except AttributeError:
        pass  # stale cached .so from before the fuzzy kernel existed
    try:
        lib.otters_substr_mask.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.otters_substr_mask.restype = None
    except AttributeError:
        pass  # stale cached .so from before the substring kernel existed
    _lib = lib
    return _lib


def pack_utf8_arena(strings: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
    """[data uint8, offsets int64]: the contiguous UTF-8 arena layout shared
    by the native kernels and the .npz string persistence format."""
    encoded = [s.encode("utf-8") for s in strings]
    offsets = np.zeros(len(encoded) + 1, dtype=np.int64)
    np.cumsum([len(e) for e in encoded], out=offsets[1:])
    data = (
        np.frombuffer(b"".join(encoded), dtype=np.uint8)
        if encoded
        else np.zeros(0, np.uint8)
    )
    return np.ascontiguousarray(data), offsets


def available() -> bool:
    return _load() is not None


def hash_strings(strings: Sequence[str]) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Bulk stable 64-bit hashing; None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(strings)
    data, offsets = pack_utf8_arena(strings)
    g1 = np.empty(n, dtype=np.uint64)
    g2 = np.empty(n, dtype=np.uint64)
    lib.otters_hash_strings(
        data.ctypes.data, offsets.ctypes.data, n, g1.ctypes.data, g2.ctypes.data
    )
    return g1, g2


def bloom_build(
    g1: np.ndarray,
    g2: np.ndarray,
    nulls: np.ndarray,
    chunk_size: int,
    n_rows: int,
    n_chunks: int,
    words: int,
    bits: int,
    k: int,
) -> Optional[np.ndarray]:
    """Bloom bit matrix for chunk-contiguous rows; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    starts = np.minimum(
        np.arange(n_chunks + 1, dtype=np.int64) * chunk_size, n_rows
    )
    g1 = np.ascontiguousarray(g1, dtype=np.uint64)
    g2 = np.ascontiguousarray(g2, dtype=np.uint64)
    nulls8 = np.ascontiguousarray(nulls, dtype=np.uint8)
    matrix = np.zeros(n_chunks * words, dtype=np.uint32)
    lib.otters_bloom_build(
        g1.ctypes.data, g2.ctypes.data, nulls8.ctypes.data, starts.ctypes.data,
        n_chunks, words, bits, k, matrix.ctypes.data,
    )
    return matrix.reshape(n_chunks, words)


_SUBSTR_MODES = {"contains": 0, "starts_with": 1, "ends_with": 2}


def substr_mask_arena(
    data: np.ndarray, offsets: np.ndarray, pattern: str, mode: str
):
    """uint8[n] substring/prefix/suffix mask over a packed UTF-8 arena
    (``pack_utf8_arena`` layout); None if the native lib lacks the kernel.

    Semantics match Python's ``pattern in s`` / ``s.startswith`` /
    ``s.endswith`` on the same strings (byte-level comparison is exact for
    whole-pattern UTF-8 matching). Nulls are the CALLER's job to mask."""
    lib = _load()
    if lib is None or not hasattr(lib, "otters_substr_mask"):
        return None
    n = len(offsets) - 1
    pat = np.frombuffer(pattern.encode("utf-8"), dtype=np.uint8)
    plen = len(pat)
    pat = np.ascontiguousarray(pat) if plen else np.zeros(1, np.uint8)
    data = np.ascontiguousarray(data, dtype=np.uint8)
    if not len(data):
        data = np.zeros(1, np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    out = np.zeros(n, dtype=np.uint8)
    lib.otters_substr_mask(
        data.ctypes.data, offsets.ctypes.data, n,
        pat.ctypes.data, plen, _SUBSTR_MODES[mode], out.ctypes.data,
    )
    return out


def fuzzy_mask(strings: Sequence[str], pattern: str, max_dist: int):
    """uint8[n] bounded-Levenshtein mask; None if the native lib lacks it.

    ``max_dist`` is clamped to the kernel's band width (16) — callers
    needing larger distances must use the Python fallback."""
    max_dist = min(int(max_dist), 16)
    lib = _load()
    if lib is None or not hasattr(lib, "otters_fuzzy_mask"):
        return None
    n = len(strings)
    data, offsets = pack_utf8_arena(strings)
    pat = np.frombuffer(pattern.encode("utf-8"), dtype=np.uint8)
    pat = np.ascontiguousarray(pat) if len(pat) else np.zeros(1, np.uint8)
    out = np.zeros(n, dtype=np.uint8)
    lib.otters_fuzzy_mask(
        data.ctypes.data, offsets.ctypes.data, n,
        pat.ctypes.data, len(pattern.encode("utf-8")), int(max_dist),
        out.ctypes.data,
    )
    return out
