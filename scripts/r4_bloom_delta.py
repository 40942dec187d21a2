"""Record the device-vs-host Bloom build-time delta at 10M rows (round-4
item 5's last TODO, VERDICT round-3 "Next round" #5).

Builds the Bloom bit-matrix for a 10M-row string column twice — once with
the host scatter (`build_matrix`, which routes to the C++ native build) and
once with the on-device scatter (`build_matrix_device`) — on whatever
backend is active, and prints both times plus a bit-for-bit parity check.
Hashes are host-computed in both cases (that is the design: the device path
replaces only the scatter).
"""
import os
import time

import numpy as np

from otters_tpu.utils import honor_jax_platforms_env

honor_jax_platforms_env()

import jax

from otters_tpu.ops import bloom as bloom_ops
from otters_tpu.ops import hashing

N = int(os.environ.get("BLOOM_DELTA_N", 10_000_000))
CHUNK = 2048


def main():
    print("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(11)
    # ~200k distinct short strings over 10M rows, like a tag column
    vocab = np.array([f"tag_{i:06d}" for i in range(200_000)])
    values = vocab[rng.integers(0, len(vocab), N)].tolist()
    nulls = np.zeros(N, dtype=bool)
    n_chunks = (N + CHUNK - 1) // CHUNK

    params = bloom_ops.BloomParams.from_fpr(0.01, CHUNK)
    print(f"params: bits={params.bits} words={params.words} k={params.k_hashes}")
    assert bloom_ops.device_build_ok(params, n_chunks)

    t0 = time.perf_counter()
    g1, g2 = hashing.hash_strings(values)
    t_hash = time.perf_counter() - t0
    print(f"hash_strings (host, shared by both paths): {t_hash:.2f}s")

    # ADVICE r4: label which host path build_matrix actually took — on a
    # native-load failure it silently falls back to the much slower
    # np.bitwise_or.at scatter, which would corrupt the recorded delta
    from otters_tpu import native

    host_path = "C++ native" if native._load() is not None else (
        "numpy FALLBACK (native lib failed to load — delta not comparable)"
    )
    chunk_ids = (np.arange(N, dtype=np.int64) // CHUNK).astype(np.int64)
    t0 = time.perf_counter()
    host_m = bloom_ops.build_matrix(
        g1, g2, nulls, chunk_ids, n_chunks, params, chunk_size=CHUNK
    )
    t_host = time.perf_counter() - t0
    print(f"host build_matrix [{host_path}]: {t_host:.2f}s")

    t0 = time.perf_counter()
    dev_m = bloom_ops.build_matrix_device(g1, g2, nulls, CHUNK, n_chunks, params)
    dev_np = np.asarray(dev_m)
    t_dev = time.perf_counter() - t0
    # ADVICE r4: build_matrix_device goes through the persistent AOT
    # executable cache — on a warm cache this first call measures dispatch,
    # not compile
    print(f"device build_matrix_device (first call; compile only if the "
          f"persistent AOT cache is cold): {t_dev:.2f}s")

    # steady-state (compiled) device time
    t0 = time.perf_counter()
    dev_m2 = bloom_ops.build_matrix_device(g1, g2, nulls, CHUNK, n_chunks, params)
    np.asarray(dev_m2)
    t_dev2 = time.perf_counter() - t0
    print(f"device build (compiled): {t_dev2:.2f}s")

    ok = np.array_equal(np.asarray(host_m, np.uint32), dev_np.astype(np.uint32))
    print(f"bit-for-bit parity host vs device: {ok}")
    print(
        f"DELTA: device {'beats' if t_dev2 < t_host else 'trails'} host by "
        f"{abs(t_host - t_dev2):.2f}s ({t_host / max(t_dev2, 1e-9):.2f}x) "
        f"at N={N} chunk={CHUNK}"
    )
    assert ok


if __name__ == "__main__":
    main()
