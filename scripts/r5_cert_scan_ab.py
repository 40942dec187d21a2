"""Kernel-level interleaved A/B: certified vs uncertified SCAN at 10M.

Companion to r5_cert_tax_ab.py (end-to-end tax 1.294x measured): times
ONLY the fused Pallas scan (ops.pallas_topk) at the headline shape —
10M x 768 int8, b=256, k'=100, 50% of chunk-aligned tiles alive, no score
filter — certify on vs off, ABBA-interleaved. Splits the end-to-end tax
into its scan-rate component (bf16-mixed MXU dots + per-row fold + bound
pass vs native int8 dots; hardware floor ~1.16x per hwlogs/p0.log) and
whatever the resolve()/result() path adds on top.

Usage:  python scripts/r5_cert_scan_ab.py [n_blocks]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402


def main() -> None:
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    bench._configure_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from otters_tpu import Metric
    from otters_tpu.ops import scoring
    from otters_tpu.ops.pallas_topk import (
        _pad_b,
        choose_tile,
        pallas_topk,
    )

    t0 = time.perf_counter()
    dv = scoring.materialize_int8_slabs(
        bench.row_vectors, bench.N10, bench.D, bench.SLAB
    )
    float(np.asarray(dv.norms_sq[12345]))  # tunnel-safe sync
    bench.log(f"10M int8 slabs: {time.perf_counter() - t0:.1f}s")

    n_pad = dv.vectors.shape[0]
    tile = choose_tile(
        bench.D, n_pad, _pad_b(bench.B), chunk=bench.CHUNK
    )
    n_tiles = n_pad // tile
    # odd chunks alive (the headline filter's shape) at tile granularity
    chunks_per_tile = tile // bench.CHUNK
    alive = np.zeros(n_tiles, dtype=bool)
    for ti in range(n_tiles):
        c0 = ti * chunks_per_tile
        alive[ti] = any(
            (c0 + j) % 2 == 1 for j in range(chunks_per_tile)
        )
    tile_alive = jnp.asarray(alive)
    bench.log(
        f"tile={tile} n_tiles={n_tiles} alive={int(alive.sum())}"
    )

    rng = np.random.default_rng(11)
    batches = [
        jnp.asarray(rng.normal(size=(bench.B, bench.D)).astype(np.float32))
        for _ in range(bench.TIMED_BATCHES)
    ]
    jax.block_until_ready(batches)

    def dispatch(q, certify):
        return pallas_topk(
            dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid, q,
            None, jnp.float32(0.0), tile_alive,
            metric=Metric.Cosine, k=bench.K_WIDE, take_min=False,
            cmp=None, certify=certify,
            resid=dv.resid if certify else None,
            resid_bin=dv.resid_bin if certify else None,
        )

    def timed_round(certify):
        t0 = time.perf_counter()
        outs = [
            dispatch(batches[i % bench.TIMED_BATCHES], certify)
            for i in range(bench.TIMED_BATCHES)
        ]
        jax.device_get([o[1] for o in outs])  # k-sized score fetch = sync
        dt = time.perf_counter() - t0
        return bench.B * bench.TIMED_BATCHES / dt, dt

    for certify in (True, False):  # compile + warm
        timed_round(certify)
        timed_round(certify)

    cert_ms, unc_ms, ratios = [], [], []
    for blk in range(n_blocks):
        order = (
            [True, False, False, True] if blk % 2 == 0
            else [False, True, True, False]
        )
        block = {True: [], False: []}
        for certify in order:
            qps, dt = timed_round(certify)
            block[certify].append(dt)
            bench.log(
                f"block {blk} {'cert' if certify else 'uncert'}: "
                f"{qps:.1f} q/s ({dt * 1000 / bench.TIMED_BATCHES:.2f} "
                f"ms/batch)"
            )
        c = statistics.median(block[True])
        u = statistics.median(block[False])
        cert_ms.append(c * 1000 / bench.TIMED_BATCHES)
        unc_ms.append(u * 1000 / bench.TIMED_BATCHES)
        ratios.append(c / u)
        bench.log(f"block {blk}: scan-only tax = {c / u:.3f}x")

    bench.log(
        f"certified scan {statistics.median(cert_ms):.2f} ms/batch, "
        f"uncertified {statistics.median(unc_ms):.2f} ms/batch, "
        f"median scan tax {statistics.median(ratios):.3f}x "
        f"(blocks: {[round(r, 3) for r in ratios]})"
    )


if __name__ == "__main__":
    main()
