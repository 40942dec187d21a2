"""E-commerce catalog walkthrough: the round-2 query surface end to end.

Usage: python examples/catalog.py [n_rows] [dim]

Shows, on a realistic clustered dataset (otters_tpu.datasets):
- Z-order clustering over (category, price) so zonemaps prune BOTH columns
- Bool columns, null predicates, isin/between sugar, and `~` (NOT)
- fuzzy string matching
- build/query stats tables demonstrating the pruning
"""

import sys

import numpy as np

from otters_tpu.utils import honor_jax_platforms_env

honor_jax_platforms_env()  # JAX_PLATFORMS=cpu must win over sitecustomize

from otters_tpu import MetaStore, Metric, col  # noqa: E402
from otters_tpu.datasets import synthetic_catalog  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    print(f"=== Generating a {n} x {dim} catalog ===")
    vecs, cols = synthetic_catalog(n, dim, seed=7)

    store = (
        MetaStore.from_columns(list(cols.values()))
        .with_vectors(vecs)
        .with_chunk_size(512)
        .with_z_order(["category", "price"])  # both columns get locality
        .build()
    )
    store.print_build_stats()
    print("\n=== First rows ===")
    store.head()

    q = vecs[0]

    print("\n=== Cheap in-stock electronics (category+price both prune) ===")
    r = (
        store.query(q.tolist(), Metric.Cosine)
        .meta_filter(
            col("category").eq("electronics")
            & col("price").between(5.0, 40.0)
            & col("in_stock").eq(True)
        )
        .take(5)
        .collect()
    )
    print(r)
    store.print_last_query_stats()

    print("\n=== Rows missing a price or brand (null predicates) ===")
    r = (
        store.query(q.tolist(), Metric.Cosine)
        .meta_filter(col("price").is_null() | col("brand").is_null())
        .take(5)
        .collect()
    )
    print(r)

    print("\n=== NOT + isin: anything except groceries, from three brands ===")
    r = (
        store.query(q.tolist(), Metric.Cosine)
        .meta_filter(
            ~col("category").eq("grocery")
            & col("brand").isin(["brand_00", "brand_01", "brand_02"])
        )
        .take(5)
        .collect()
    )
    print(r)

    print("\n=== Fuzzy brand match (<= 1 edit of 'brand_0x') ===")
    r = (
        store.query(q.tolist(), Metric.Cosine)
        .meta_filter(col("brand").fuzzy("brand_0x", 1))
        .take(5)
        .collect()
    )
    print(r)

    print("\n=== Recent, well-reviewed listings (datetime + int64) ===")
    r = (
        store.query(q.tolist(), Metric.Cosine)
        .meta_filter(col("listed").gte("2024-10-01") & col("reviews").gt(50))
        .take(5)
        .collect()
    )
    print(r)
    store.print_last_query_stats()

    print("\n=== int8 storage + exact re-rank (recall recovery) ===")
    # quarter-HBM quantized storage; take(k, rerank_from=k') re-scores the
    # widened candidate set in exact f32 via the builder's rerank source
    store8 = (
        MetaStore.from_columns(list(cols.values()))
        .with_vectors(vecs)
        .with_chunk_size(512)
        .with_storage_dtype("int8")
        .with_rerank_source(keep_host_f32=True)
        .build()
    )
    r = (
        store8.query(q.tolist(), Metric.Cosine)
        .meta_filter(col("category").eq("electronics"))
        .take(5, rerank_from=100)
        .collect()
    )
    print(r)


if __name__ == "__main__":
    main()
