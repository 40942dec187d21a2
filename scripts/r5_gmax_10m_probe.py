"""Does resolve()-unit overlap pay at 10M? (real TPU)

P3b (hwlogs/p3.log) swept OTTERS_RESOLVE_GROUP_MAX at 2M rows and found
gmax=0 (one unit, fewest roundtrips) best: per-unit device->host fetches
cost ~31 ms each and the 2M scans (~3 ms) are too short to hide them. At
10M the filtered scan is ~14 ms/batch, so a split unit's rerank chain can
overlap 5x more scan time — this probe re-runs the sweep at the REAL
headline shape (bench.build_10m, filtered + rerank + certify, 16x256q).

Usage: python scripts/r5_gmax_10m_probe.py
"""

import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402


def main():
    bench._configure_jax()
    import jax
    import jax.numpy as jnp

    from otters_tpu import Metric, aot
    from otters_tpu.meta import resolve

    print("platform:", jax.devices()[0].platform, flush=True)
    store, build_s, synth_s = bench.build_10m()
    print(f"build {build_s:.1f}s synth {synth_s:.1f}s", flush=True)

    rng = np.random.default_rng(1)
    batches = [
        jnp.asarray(rng.normal(size=(bench.B, bench.D)).astype(np.float32))
        for _ in range(bench.TIMED_BATCHES)
    ]
    jax.block_until_ready(batches)
    filt = bench._filter_expr()
    bi = [0]

    def dispatch():
        q = batches[bi[0] % bench.TIMED_BATCHES]
        bi[0] += 1
        return (
            store.query_batch(q, Metric.Cosine)
            .meta_filter(filt)
            .take(bench.K, rerank_from=bench.K_WIDE)
            .collect_async()
        )

    dispatch().result()  # compile the scan/rerank base shapes
    aot.wait_jit_ready(timeout=420.0)

    for gmax in (0, 8, 4, 2):
        os.environ["OTTERS_RESOLVE_GROUP_MAX"] = str(gmax)
        # warm this gmax's group-size shapes (P=gmax rerank program)
        resolve([dispatch() for _ in range(bench.TIMED_BATCHES)])
        aot.wait_jit_ready(timeout=420.0)
        vals = []
        for _ in range(4):
            t0 = time.perf_counter()
            results = resolve(
                [dispatch() for _ in range(bench.TIMED_BATCHES)]
            )
            dt = time.perf_counter() - t0
            assert all(len(r) == bench.K for r in results)
            vals.append(bench.B * bench.TIMED_BATCHES / dt)
        print(
            f"gmax={gmax}: median {statistics.median(vals):.0f} q/s "
            f"(min {min(vals):.0f}, max {max(vals):.0f})",
            flush=True,
        )
    os.environ.pop("OTTERS_RESOLVE_GROUP_MAX", None)


if __name__ == "__main__":
    main()
