"""Interleaved A/B: certified vs uncertified filtered headline at 10M x 768.

The round-5 artifact shows certified 12,024 q/s vs uncertified 15,791 —
but those configs were timed MINUTES apart and tunnel load varies 15x
(ROUND3.md), so the 1.31x ratio is not trustworthy as a tax measurement.
The known hardware floor is the mixed-scan MXU rate: bf16(q) x int8 rows
runs at ~1/1.16 the int8 x int8 rate (hwlogs/p0.log), which end-to-end
showed as 1.16x at 2M (hwlogs/p3.log). This probe interleaves the two
variants round-by-round at the FULL headline shape (10M, 16 x 256-query
pipelined batches) so the ratio is load-controlled:

    A B B A  A B B A ...   (ABBA order cancels linear drift)

Prints per-round q/s and the paired per-block ratios; the median paired
ratio is the measured certified tax.

Usage:  python scripts/r5_cert_tax_ab.py [n_blocks]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")  # repo root: bench.py helpers

import bench  # noqa: E402


def main() -> None:
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    bench._configure_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from otters_tpu import Metric, aot
    from otters_tpu.meta import resolve

    store, build_s, synth_s = bench.build_10m()
    bench.log(f"store ready (synth {synth_s:.1f}s, build {build_s:.1f}s)")

    rng = np.random.default_rng(7)
    batches = [
        jnp.asarray(rng.normal(size=(bench.B, bench.D)).astype(np.float32))
        for _ in range(bench.TIMED_BATCHES)
    ]
    jax.block_until_ready(batches)
    filt = bench._filter_expr()
    bi = [0]

    def dispatch(certify):
        q = batches[bi[0] % bench.TIMED_BATCHES]
        bi[0] += 1
        return (
            store.query_batch(q, Metric.Cosine)
            .meta_filter(filt)
            .take(bench.K, rerank_from=bench.K_WIDE, certify=certify)
            .collect_async()
        )

    def timed_round(certify):
        t0 = time.perf_counter()
        results = resolve(
            [dispatch(certify) for _ in range(bench.TIMED_BATCHES)]
        )
        dt = time.perf_counter() - t0
        assert all(len(r) == bench.K for r in results)
        return bench.B * bench.TIMED_BATCHES / dt

    # warm both variants to full pipeline depth (bench.py's lesson: the
    # grouped device rerank compiles per group-size shape; twice so the
    # background jit warm for each signature actually starts)
    for certify in (None, False):
        for _ in range(2):
            resolve([dispatch(certify) for _ in range(bench.TIMED_BATCHES)])
    aot.wait_jit_ready(timeout=420.0)
    st = store.last_query_stats()
    bench.log(
        f"warm: {st.evaluated_chunks}/{st.total_chunks} chunks evaluated"
    )

    cert_vals, unc_vals, ratios = [], [], []
    for blk in range(n_blocks):
        order = (
            [None, False, False, None] if blk % 2 == 0
            else [False, None, None, False]
        )
        block = {}
        for certify in order:
            qps = timed_round(certify)
            key = "cert" if certify is None else "uncert"
            block.setdefault(key, []).append(qps)
            bench.log(f"block {blk} {key}: {qps:.1f} q/s")
        c = statistics.median(block["cert"])
        u = statistics.median(block["uncert"])
        cert_vals.append(c)
        unc_vals.append(u)
        ratios.append(u / c)
        bench.log(f"block {blk}: paired tax = {u / c:.3f}x")

    bench.log(
        f"certified median {statistics.median(cert_vals):.1f} q/s, "
        f"uncertified median {statistics.median(unc_vals):.1f} q/s, "
        f"median paired tax {statistics.median(ratios):.3f}x "
        f"(blocks: {[round(r, 3) for r in ratios]})"
    )


if __name__ == "__main__":
    main()
