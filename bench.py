"""Headline benchmark: batched DiskANN search latency on one TPU chip.

Mirrors the reference's JMH FormatBenchmarkQueryWithRandomVectors setup
(random vectors, dim 128; README.md:90-98): build a Vamana graph, then
measure average per-query search latency with the recall@10 gate reported
alongside. Baseline: jvector fp32 at 100k docs = 0.451 ms/op (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms/query", "vs_baseline": N}
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

N = int(os.environ.get("BENCH_N", 100_000))
DIM = int(os.environ.get("BENCH_DIM", 128))
Q = int(os.environ.get("BENCH_Q", 512))
K = int(os.environ.get("BENCH_K", 10))
EF = int(os.environ.get("BENCH_EF", 100))
# "sift": low-effective-dimension synthetic (latent 16 -> DIM linear map +
# noise), matching the geometry of real image-descriptor sets like
# SIFT-128 (effective dim ~15-20; real datasets unavailable offline).
# "gaussian": i.i.d. N(0,1) — the adversarial concentrated-distance case.
DATA = os.environ.get("BENCH_DATA", "sift")
BASELINE_MS = 0.451  # reference jvector fp32, 100k docs, dim 128 (README.md:92)


def make_data(rng):
    if DATA == "gaussian":
        vectors = rng.standard_normal((N, DIM)).astype(np.float32)
        queries = rng.standard_normal((Q, DIM)).astype(np.float32)
        return vectors, queries
    latent = 16
    a = rng.standard_normal((latent, DIM)).astype(np.float32) / np.sqrt(latent)
    vectors = (rng.standard_normal((N, latent)).astype(np.float32) @ a
               + 0.05 * rng.standard_normal((N, DIM)).astype(np.float32))
    queries = (rng.standard_normal((Q, latent)).astype(np.float32) @ a
               + 0.05 * rng.standard_normal((Q, DIM)).astype(np.float32))
    return vectors, queries


def main():
    import jax
    import jax.numpy as jnp

    from opensearch_jvector_tpu.models.builder import GraphIndexBuilder
    from opensearch_jvector_tpu.models import searcher
    from opensearch_jvector_tpu.models.searcher import SearchParams
    from opensearch_jvector_tpu.ops.distances import SimilarityFunction
    from opensearch_jvector_tpu.utils.ground_truth import (
        ground_truth_topk,
        recall_at_k,
    )

    simf = SimilarityFunction.EUCLIDEAN
    rng = np.random.default_rng(7)
    v_np, q_np = make_data(rng)
    vectors, queries = jnp.asarray(v_np), jnp.asarray(q_np)

    t0 = time.time()
    builder = GraphIndexBuilder(
        dim=DIM, max_degree=48, beam_width=100, batch_size=1024
    )
    graph = builder.build(vectors, simf)
    build_s = time.time() - t0
    print(f"# build: {N} vectors in {build_s:.1f}s "
          f"({N / build_s:.0f} vec/s)", file=sys.stderr)

    params = SearchParams(k=K, ef_search=EF, overquery_factor=5)

    def run():
        res = searcher.search(
            graph.adjacency, graph.live, graph.entry, queries, params, simf,
            vectors=vectors,
        )
        jax.block_until_ready(res.ids)
        return res

    res = run()  # compile + warm
    truth = ground_truth_topk(queries, vectors, K, simf)
    rec = recall_at_k(np.asarray(res.ids), truth, K)
    print(f"# recall@{K}: {rec:.4f}", file=sys.stderr)

    iters = 5
    t0 = time.time()
    for _ in range(iters):
        run()
    total = time.time() - t0
    ms_per_query = total / iters / Q * 1000.0

    print(json.dumps({
        "metric": f"search_ms_per_query_batched ({DATA} N={N}, d={DIM}, "
                  f"batch={Q}, recall@{K}={rec:.3f})",
        "value": round(ms_per_query, 5),
        "unit": "ms/query",
        "vs_baseline": round(BASELINE_MS / ms_per_query, 2),
    }))


if __name__ == "__main__":
    main()
