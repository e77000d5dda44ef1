import os, time, numpy as np
import jax, jax.numpy as jnp
from opensearch_jvector_tpu.models.builder import GraphIndexBuilder
from opensearch_jvector_tpu.models import searcher
from opensearch_jvector_tpu.models.searcher import SearchParams
from opensearch_jvector_tpu.ops.distances import SimilarityFunction
from opensearch_jvector_tpu.utils.ground_truth import ground_truth_topk, recall_at_k

N, D, Q, K = 100_000, 128, 512, 10
rng = np.random.default_rng(7)
latent = 16
a = rng.standard_normal((latent, D)).astype(np.float32) / np.sqrt(latent)
v = rng.standard_normal((N, latent)).astype(np.float32) @ a + 0.05*rng.standard_normal((N, D)).astype(np.float32)
q = rng.standard_normal((Q, latent)).astype(np.float32) @ a + 0.05*rng.standard_normal((Q, D)).astype(np.float32)
vectors, queries = jnp.asarray(v), jnp.asarray(q)
simf = SimilarityFunction.EUCLIDEAN
truth = ground_truth_topk(queries, vectors, K, simf)

def recall_of(g):
    params = SearchParams(k=K, ef_search=100, overquery_factor=5)
    res = searcher.search(g.adjacency, g.live, g.entry, queries, params, simf, vectors=vectors)
    return recall_at_k(np.asarray(res.ids), truth, K)

def run(tag, **kw):
    b = GraphIndexBuilder(dim=D, max_degree=48, beam_width=100, batch_size=2048, **kw)
    t0 = time.time(); g = b.build(vectors, simf); cold = time.time()-t0
    b2 = GraphIndexBuilder(dim=D, max_degree=48, beam_width=100, batch_size=2048, **kw)
    t0 = time.time(); g = b2.build(vectors, simf); warm = time.time()-t0
    print(f"{tag}: cold {cold:.1f}s warm {warm:.1f}s ({N/warm:.0f} vec/s) recall {recall_of(g):.4f}", flush=True)
    if b2.counters.phase_s:
        tot = sum(b2.counters.phase_s.values())
        print(f"  phases({tot:.1f}s of {warm:.1f}s): " + ", ".join(
            f"{k}={s:.1f}s" for k, s in sorted(b2.counters.phase_s.items(), key=lambda kv: -kv[1])), flush=True)

run("fp32")
run("bf16", score_dtype="bf16")
import opensearch_jvector_tpu.models.builder as bmod
bmod.BUILD_PROFILE = True
run("fp32+profile")
run("bf16+profile", score_dtype="bf16")
