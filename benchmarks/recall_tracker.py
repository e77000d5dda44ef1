"""Memory-efficient incremental ground-truth recall tracker.

Counterpart of the reference's python harness utility
(scripts/jvector_index_and_search/jvector_utils/recall_measurement.py:
"memory-efficient incremental ground-truth recall tracker", SURVEY.md §4.7):
exact top-k over an arbitrarily large corpus is computed in corpus CHUNKS,
carrying only the running [Q, k] best lists — never the full [Q, N] score
matrix — so ground truth for multi-million-vector runs fits in memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from opensearch_jvector_tpu.ops.distances import SimilarityFunction, pairwise_scores


class IncrementalRecallTracker:
    def __init__(self, queries: np.ndarray, k: int,
                 simf: SimilarityFunction = SimilarityFunction.EUCLIDEAN,
                 chunk: int = 100_000):
        self.queries = jnp.asarray(queries, jnp.float32)
        self.k = k
        self.simf = simf
        self.chunk = chunk
        q = self.queries.shape[0]
        self._best_scores = jnp.full((q, k), -jnp.inf)
        self._best_ids = jnp.full((q, k), -1, jnp.int64)
        self._offset = 0

    def update(self, vectors: np.ndarray) -> None:
        """Feed the next corpus chunk (ids continue from the last call)."""
        v = np.asarray(vectors)
        for s in range(0, v.shape[0], self.chunk):
            blk = jnp.asarray(v[s : s + self.chunk], jnp.float32)
            scores = pairwise_scores(self.queries, blk, self.simf)
            ids = (jnp.arange(blk.shape[0], dtype=jnp.int64)
                   + self._offset + s)
            ids = jnp.broadcast_to(ids[None, :], scores.shape)
            all_s = jnp.concatenate([self._best_scores, scores], axis=1)
            all_i = jnp.concatenate([self._best_ids, ids], axis=1)
            top_s, idx = jax.lax.top_k(all_s, self.k)
            self._best_scores = top_s
            self._best_ids = jnp.take_along_axis(all_i, idx, axis=1)
        self._offset += v.shape[0]

    def ground_truth(self) -> np.ndarray:
        return np.asarray(self._best_ids)

    def recall(self, result_ids: np.ndarray) -> float:
        truth = self.ground_truth()
        q = truth.shape[0]
        hits = 0
        for i in range(q):
            hits += len(set(result_ids[i, : self.k].tolist())
                        & set(truth[i].tolist()))
        return hits / (q * self.k)
