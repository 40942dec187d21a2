"""TPU-scale differential fuzz: pallas (fast+strict) vs XLA panel, random configs."""
import os, numpy as np, jax, jax.numpy as jnp
from otters_tpu import Column, DataType, MetaStore, Metric, col
from otters_tpu.ops import scoring

rng = np.random.default_rng(7)
for trial in range(8):
    N = int(rng.choice([600_000, 1_000_000]))
    D = int(rng.choice([64, 128, 256, 768]))
    B = int(rng.choice([32, 64, 256]))  # >= 32: below that pallas_ok routes to panel
    K = int(rng.choice([5, 10, 50, 100]))
    CHUNK = int(rng.choice([512, 1000, 1024, 4096]))  # incl. tile-misaligned 1000
    n_pad = scoring.pad_rows(N)
    V = jax.random.normal(jax.random.PRNGKey(trial), (n_pad, D), dtype=jnp.float32)
    price = rng.uniform(0, 100, N)
    sel = float(rng.uniform(10, 90))
    cols = [Column("price", DataType.Float64).from_values(list(price))]
    store = (MetaStore.from_columns(cols).with_vectors(V, n_rows=N)
             .with_chunk_size(CHUNK).build())
    q = rng.normal(size=(B, D)).astype(np.float32)
    metric = [Metric.Cosine, Metric.DotProduct][int(rng.integers(0, 2))]
    def run():
        return (store.query_batch(q, metric)
                .meta_filter(col("price").lt(sel)).take(K).collect())
    r1 = run()  # pallas (fast where eligible)
    os.environ["OTTERS_DISABLE_PALLAS"] = "1"
    r2 = run()  # XLA panel
    del os.environ["OTTERS_DISABLE_PALLAS"]
    same_idx = r1.indices == r2.indices
    close = np.allclose(r1.scores, r2.scores, rtol=1e-5, atol=1e-5)
    # spot-verify filter satisfaction
    filt_ok = all(price[i] < sel for i in r1.indices)
    print(f"trial {trial}: N={N} D={D} B={B} K={K} chunk={CHUNK} metric={metric.value}"
          f" -> idx_match={same_idx} scores_close={close} filter_ok={filt_ok}", flush=True)
    assert same_idx and close and filt_ok, f"MISMATCH trial {trial}"
print("ALL TPU FUZZ TRIALS PASSED", flush=True)
