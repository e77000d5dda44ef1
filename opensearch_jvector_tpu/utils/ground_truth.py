"""Brute-force ground truth + recall (test/bench harness utility).

Mirrors the reference's `TestUtils.computeGroundTruthValues` used by the
recall gate (RecallTestsIT.java:72-79).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from opensearch_jvector_tpu.ops.distances import SimilarityFunction, pairwise_scores


def ground_truth_topk(
    queries: jax.Array, vectors: jax.Array, k: int, simf: SimilarityFunction
) -> np.ndarray:
    """Exact top-k ids per query by full scan, [Q, k]."""
    scores = pairwise_scores(jnp.asarray(queries), jnp.asarray(vectors), simf)
    _, ids = jax.lax.top_k(scores, k)
    return np.asarray(ids)


def recall_at_k(result_ids: np.ndarray, truth_ids: np.ndarray, k: int) -> float:
    """Mean |results ∩ truth| / k over the query batch."""
    hits = 0
    q = truth_ids.shape[0]
    for i in range(q):
        hits += len(set(result_ids[i, :k].tolist()) & set(truth_ids[i, :k].tolist()))
    return hits / (q * k)
