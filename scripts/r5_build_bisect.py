"""Round-5 build-time bisect at the bench's 10M-with-strings config.

VERDICT r4 item 3: the 10M build regressed 17.8 s (r3) -> 51.8 s (r4) and
nothing attributes it. Candidates named there: the int8 residual pass
(now fused into the ingest slab, so it lands in the SYNTHESIS number, not
build), the device Bloom scatter (new in r4 on the single-device path),
and column staging changes. This script rebuilds the exact bench store
under one-variable-at-a-time variants and prints a table.

Variants (all timed with true value-fetch syncs, like bench.build_10m):
  full       — bench default (strings + datetime, device Bloom)
  host_bloom — OTTERS_BLOOM_DEVICE=0 (r3's host Bloom path)
  no_string  — numeric + datetime only (no hashing, no Bloom at all)
  no_dt      — numeric + string (isolates the r4 bulk-datetime path)
  numeric    — price/version only (zonemaps + vector placement floor)

Run ONLY on hardware (the synthesis is reused across variants: one int8
materialization, many builds).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402

bench._configure_jax()

import jax.numpy as jnp  # noqa: E402

from otters_tpu import MetaStore  # noqa: E402
from otters_tpu.ops import scoring  # noqa: E402

N = bench.N10
D = bench.D
CHUNK = bench.CHUNK


def sync_store(store):
    float(jnp.asarray(store._chunk_lens[0]))


def build_variant(dv8, cols, label, env=None):
    saved = {}
    env = env or {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        t0 = time.perf_counter()
        store = (
            MetaStore.from_columns(cols)
            .with_vectors(dv8, n_rows=N)
            .with_chunk_size(CHUNK)
            .build()
        )
        sync_store(store)
        dt = time.perf_counter() - t0
        bs = store.build_stats()
        print(
            f"  {label:<11} total={dt:7.2f}s zonemap={bs.zonemap_build_duration:6.2f}s"
            f" ingest={bs.vectors_ingest_duration:6.2f}s chunks={bs.n_chunks}",
            flush=True,
        )
        del store
        return dt
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    t0 = time.perf_counter()
    dv8 = scoring.materialize_int8_slabs(bench.row_vectors, N, D, bench.SLAB)
    float(np.asarray(dv8.norms_sq[12345]))
    print(f"synthesis+int8 (shared across variants): {time.perf_counter()-t0:.1f}s",
          flush=True)

    cols_full, _ = bench._columns(N, with_strings=True)
    cols_numeric = [c for c in cols_full if c.name in ("price", "version")]
    cols_no_string = [c for c in cols_full if c.name != "category"]
    cols_no_dt = [c for c in cols_full if c.name != "listed"]

    print("variants (each timed twice; 2nd run shows the recompile share):",
          flush=True)
    for label, cols, env in (
        ("full", cols_full, None),
        ("host_bloom", cols_full, {"OTTERS_BLOOM_DEVICE": "0"}),
        ("no_string", cols_no_string, None),
        ("no_dt", cols_no_dt, None),
        ("numeric", cols_numeric, None),
    ):
        a = build_variant(dv8, cols, label, env)
        b = build_variant(dv8, cols, label + "/2", env)
        print(f"    -> {label}: first {a:.2f}s, repeat {b:.2f}s", flush=True)


if __name__ == "__main__":
    main()
