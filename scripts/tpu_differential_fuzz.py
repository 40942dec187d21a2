"""TPU-scale differential fuzz: pallas (fast+strict) vs XLA panel, random configs.

Round-2 surface included: narrow batches (b=1/4/8 ride the 8-sublane kernel),
Euclidean fast-exact, and int8 quantized storage (pallas vs XLA int8 paths
must agree bit-for-bit on rows).
"""
import os, time, numpy as np, jax, jax.numpy as jnp
from otters_tpu import Column, DataType, MetaStore, Metric, col
from otters_tpu.ops import scoring

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
except Exception:
    pass

rng = np.random.default_rng(7)
for trial in range(8):
    N = int(rng.choice([600_000, 1_000_000]))
    D = int(rng.choice([64, 128, 256, 768]))
    B = int(rng.choice([1, 4, 8, 32, 64, 256]))  # narrow batches incl. b=1
    K = int(rng.choice([5, 10, 50, 100]))
    CHUNK = int(rng.choice([512, 1000, 1024, 4096]))  # incl. tile-misaligned 1000
    dtype = "int8" if rng.random() < 0.25 else "float32"
    n_pad = scoring.pad_rows(N)
    V = jax.random.normal(jax.random.PRNGKey(trial), (n_pad, D), dtype=jnp.float32)
    price = rng.uniform(0, 100, N)
    sel = float(rng.uniform(10, 90))
    cols = [Column("price", DataType.Float64).from_values(price)]
    store = (MetaStore.from_columns(cols).with_vectors(V, n_rows=N)
             .with_chunk_size(CHUNK).with_storage_dtype(dtype).build())
    q = rng.normal(size=(B, D)).astype(np.float32)
    if dtype == "int8":
        metric = Metric.Cosine
    else:
        metric = [Metric.Cosine, Metric.DotProduct, Metric.Euclidean][
            int(rng.integers(0, 3))
        ]
    t0 = time.perf_counter()
    def run():
        return (store.query_batch(q, metric)
                .meta_filter(col("price").lt(sel)).take(K).collect())
    r1 = run()  # pallas (fast where eligible)
    os.environ["OTTERS_DISABLE_PALLAS"] = "1"
    r2 = run()  # XLA panel
    del os.environ["OTTERS_DISABLE_PALLAS"]
    close = np.allclose(r1.scores, r2.scores, rtol=1e-5, atol=1e-5)
    if dtype == "int8":
        # quantized scores are coarse -> exact ties are common, and the two
        # paths may order tied rows differently; indices must agree except
        # where the rank-wise scores tie
        same_idx = all(
            i == j or abs(s1 - s2) <= 1e-6
            for i, j, s1, s2 in zip(
                r1.indices, r2.indices, r1.scores, r2.scores
            )
        )
    else:
        same_idx = r1.indices == r2.indices
    # spot-verify filter satisfaction
    filt_ok = all(price[i] < sel for i in r1.indices)
    print(f"trial {trial}: N={N} D={D} B={B} K={K} chunk={CHUNK} "
          f"dtype={dtype} metric={metric.value} ({time.perf_counter()-t0:.0f}s)"
          f" -> idx_match={same_idx} scores_close={close} filter_ok={filt_ok}",
          flush=True)
    assert same_idx and close and filt_ok, f"MISMATCH trial {trial}"
print("ALL TPU FUZZ TRIALS PASSED", flush=True)
