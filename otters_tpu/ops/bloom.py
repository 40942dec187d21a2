"""Per-chunk Bloom filters as a device-resident bit matrix.

The reference builds one ``fastbloom::BloomFilter`` per chunk per string
column (meta_compute.rs:99-116) and probes it host-side during pruning
(meta.rs:523-544). The TPU-native formulation keeps all chunks of a column in
one ``uint32[n_chunks, words]`` matrix in HBM:

- **build** (host, vectorized numpy): double hashing h_i = g1 + i*g2 over the
  pre-computed string hashes, scattered with ``np.bitwise_or.at``;
- **probe** (device): the query string's k probe (word, bit) coordinates are
  tiny traced arrays; the probe is a gather of k columns from the matrix and
  a bitwise AND-reduce, producing the `[n_chunks]` "maybe contains" mask
  without leaving the TPU.

No false negatives by construction; false-positive rate configured like the
reference via ``with_bloom_fpr`` (clamped [1e-2, 0.5], meta.rs:92-101) or
``with_bloom_bits`` (min 64, meta.rs:106-110).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from . import hashing

_LN2 = math.log(2.0)


@dataclass(frozen=True)
class BloomParams:
    bits: int  # per-chunk bits, multiple of 32
    k_hashes: int
    words: int

    @staticmethod
    def from_fpr(fpr: float, expected_items: int) -> "BloomParams":
        n = max(1, expected_items)
        bits = max(64, math.ceil(-n * math.log(fpr) / (_LN2 * _LN2)))
        bits = ((bits + 31) // 32) * 32
        k = max(1, round(bits / n * _LN2))
        return BloomParams(bits=bits, k_hashes=min(k, 16), words=bits // 32)

    @staticmethod
    def from_bits(bits: int, expected_items: int) -> "BloomParams":
        bits = max(64, bits)
        bits = ((bits + 31) // 32) * 32
        n = max(1, expected_items)
        k = max(1, round(bits / n * _LN2))
        return BloomParams(bits=bits, k_hashes=min(k, 16), words=bits // 32)


def build_matrix(
    g1: np.ndarray,
    g2: np.ndarray,
    null_mask: np.ndarray,
    chunk_ids: np.ndarray,
    n_chunks: int,
    params: BloomParams,
    chunk_size: int = 0,
) -> np.ndarray:
    """uint32[n_chunks, words] bloom bit matrix from per-row string hashes."""
    if chunk_size > 0 and len(g1) > 4096:
        # rows are chunk-contiguous -> native parallel build
        from .. import native

        m = native.bloom_build(
            g1, g2, null_mask, chunk_size, len(g1), n_chunks,
            params.words, params.bits, params.k_hashes,
        )
        if m is not None:
            return m
    matrix = np.zeros(n_chunks * params.words, dtype=np.uint32)
    keep = ~np.asarray(null_mask, dtype=bool)
    g1 = g1[keep]
    g2 = g2[keep]
    cid = np.asarray(chunk_ids)[keep].astype(np.int64)
    bits = np.uint64(params.bits)
    for i in range(params.k_hashes):
        pos = ((g1 + np.uint64(i) * g2) % bits).astype(np.int64)
        flat = cid * params.words + (pos >> 5)
        np.bitwise_or.at(matrix, flat, np.uint32(1) << (pos & 31).astype(np.uint32))
    return matrix.reshape(n_chunks, params.words)


def device_build_ok(params: BloomParams, n_chunks: int) -> bool:
    """Can the on-device scatter build handle this geometry?

    The modular-reduction kernel needs 2*bits < 2^32 headroom and the
    flat bit index must fit int32."""
    return (
        params.bits < (1 << 24)
        and n_chunks * params.bits + 1 < (1 << 31)
        and n_chunks > 0
    )


def _mod64_pos(g1_hi, g1_lo, g2_hi, g2_lo, j: int, bits: int):
    """((g1 + j*g2) mod 2^64) mod bits, exactly, in 32-bit device math.

    Matches the host/native uint64 computation bit for bit: the 64-bit sum
    is assembled from 16-bit limb products (j < 16 is a static int, so every
    partial product fits uint32 with explicit carry detection), then reduced
    mod ``bits`` by one uint32 remainder on the high word and 32 binary
    shift-in steps for the low word.
    """
    import jax.numpy as jnp

    u16 = jnp.uint32(0xFFFF)
    a = g2_lo & u16
    b = g2_lo >> 16
    jb = jnp.uint32(j) * b  # < 2^20
    t1 = (jb & u16) << 16
    ja = jnp.uint32(j) * a  # < 2^20
    lo = t1 + ja  # may wrap once
    carry1 = (lo < t1).astype(jnp.uint32)
    jl2_hi = (jb >> 16) + carry1
    jh2 = jnp.uint32(j) * g2_hi  # wraps mod 2^32 (top bits beyond 64 drop)
    s_lo = g1_lo + lo
    carry2 = (s_lo < g1_lo).astype(jnp.uint32)
    s_hi = g1_hi + jh2 + jl2_hi + carry2

    B = jnp.uint32(bits)
    r = s_hi % B
    for t in range(32):
        bit = (s_lo >> jnp.uint32(31 - t)) & jnp.uint32(1)
        r = r * 2 + bit  # r < 2*bits < 2^25: no overflow
        r = jnp.where(r >= B, r - B, r)
    return r


def _build_matrix_device_jit(
    g1_hi, g1_lo, g2_hi, g2_lo, nulls, *, chunk_size: int, n_chunks: int,
    bits: int, words: int, k: int,
):
    """uint32[n_chunks, words] Bloom matrix, built ON DEVICE.

    Replaces the last host-side build loop (round-2 verdict item 8;
    reference analog meta_compute.rs:99-116): per hash j, the probe
    positions scatter constant-True bits into a flat per-chunk bitmap
    (duplicate writes of the same value are order-independent, so one
    scatter per hash suffices), null rows land in a dump slot, and the
    bitmap packs into uint32 words with a weighted sum over the bit axis.
    """
    import jax.numpy as jnp

    n = g1_hi.shape[0]
    cid = jnp.arange(n, dtype=jnp.int32) // jnp.int32(chunk_size)
    base = cid * jnp.int32(bits)
    dump = jnp.int32(n_chunks * bits)
    flat = jnp.zeros(n_chunks * bits + 1, dtype=jnp.bool_)
    for j in range(k):
        pos = _mod64_pos(g1_hi, g1_lo, g2_hi, g2_lo, j, bits)
        idx = jnp.where(nulls, dump, base + pos.astype(jnp.int32))
        flat = flat.at[idx].set(True)
    packed = flat[:-1].reshape(n_chunks, words, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(
        packed.astype(jnp.uint32) * weights, axis=2, dtype=jnp.uint32
    )


_device_jit = None


def build_matrix_device(
    g1: np.ndarray,
    g2: np.ndarray,
    null_mask: np.ndarray,
    chunk_size: int,
    n_chunks: int,
    params: BloomParams,
):
    """Device-resident Bloom build from host uint64 hashes (rows must be
    chunk-contiguous). Returns a device uint32[n_chunks, words] array."""
    global _device_jit
    import jax

    from .zonemap import _aot_call

    if _device_jit is None:
        _device_jit = jax.jit(
            _build_matrix_device_jit,
            static_argnames=("chunk_size", "n_chunks", "bits", "words", "k"),
        )
    g1 = np.ascontiguousarray(g1, dtype=np.uint64)
    g2 = np.ascontiguousarray(g2, dtype=np.uint64)
    args = (
        jnp.asarray((g1 >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((g1 & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((g2 >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((g2 & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray(np.asarray(null_mask, dtype=bool)),
    )
    statics = dict(
        chunk_size=chunk_size, n_chunks=n_chunks, bits=params.bits,
        words=params.words, k=params.k_hashes,
    )
    return _aot_call("bloom_build", _device_jit, args, statics)


def probe_coords(rhs: str, params: BloomParams) -> Tuple[np.ndarray, np.ndarray]:
    """Host: k probe coordinates (word_idx int32 [k], bit_mask uint32 [k])."""
    g1, g2 = hashing.hash_string(rhs)
    idx = np.arange(params.k_hashes, dtype=np.uint64)
    pos = (np.uint64(g1) + idx * np.uint64(g2)) % np.uint64(params.bits)
    words = (pos >> np.uint64(5)).astype(np.int32)
    masks = (np.uint32(1) << (pos & np.uint64(31)).astype(np.uint32)).astype(np.uint32)
    return words, masks


def probe(matrix, word_idx, bit_mask):
    """Device: [n_chunks] bool 'chunk may contain the query string'."""
    gathered = matrix[:, word_idx]  # [n_chunks, k]
    hit = (gathered & bit_mask[None, :]) != 0
    return jnp.all(hit, axis=1)
