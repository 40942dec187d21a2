"""Multi-chip sharded search over a jax.sharding Mesh.

Runs on real chips when available; set
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``
to try it on a virtual 8-device CPU mesh. On a multi-host pod, call
``otters_tpu.parallel.init_distributed()`` first.

Usage: python examples/multichip.py [n_rows] [dim]
"""

import sys

import jax
import numpy as np

from otters_tpu.utils import honor_jax_platforms_env

honor_jax_platforms_env()  # JAX_PLATFORMS=cpu must win over sitecustomize

from otters_tpu import Column, DataType, Metric, MetaStore, col  # noqa: E402
from otters_tpu.parallel import ShardedMetaStore, make_mesh  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    n_dev = len(jax.devices())
    batch = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
    mesh = make_mesh(rows=n_dev // batch, batch=batch)
    print(f"mesh: {dict(mesh.shape)} over {n_dev} x {jax.devices()[0].device_kind}")

    rng = np.random.default_rng(0)
    # DIRECT sharded build (round 3): every array is placed straight into
    # per-shard HBM — the store never exists on one device, so capacity
    # scales with the mesh. (ShardedMetaStore.shard(local, mesh) still
    # re-shards an existing single-device store.)
    store = (
        MetaStore.from_columns(
            [
                Column("price", DataType.Float64).from_values(
                    list(rng.uniform(1, 100, n))
                )
            ]
        )
        .with_vectors(rng.normal(size=(n, d)).astype(np.float32))
        .with_chunk_size(1024)
        .build_sharded(mesh)
    )
    assert isinstance(store, ShardedMetaStore)

    queries = rng.normal(size=(8, d)).astype(np.float32)
    results = (
        store.query_batch(queries, Metric.Cosine)
        .meta_filter(col("price").lt(25.0))
        .take(10)
        .collect()
    )
    print(results)
    store.print_last_query_stats()

    # mutate in place: tombstone deletes, then a compacting append — both
    # stay on the mesh (append rebuilds straight into per-shard HBM)
    store.delete_rows([int(results.indices[0])])
    store = store.append(
        rng.normal(size=(4, d)).astype(np.float32),
        {"price": [9.5, 10.5, 11.5, 12.5]},
    )
    print(f"after delete+append: {len(store)} rows")

    # persistence at mesh scale: save gathers to one .npz; load(mesh=...)
    # rebuilds by direct sharded ingest (no single-device staging)
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "store.npz")
        store.save(path)
        reloaded = MetaStore.load(path, mesh=mesh)
    assert isinstance(reloaded, ShardedMetaStore)
    r2 = (
        reloaded.query_batch(queries, Metric.Cosine)
        .meta_filter(col("price").lt(25.0))
        .take(10)
        .collect()
    )
    assert r2.indices == (
        store.query_batch(queries, Metric.Cosine)
        .meta_filter(col("price").lt(25.0))
        .take(10)
        .collect()
        .indices
    )
    print("sharded save -> load(mesh) roundtrip: identical results")


if __name__ == "__main__":
    main()
