"""Incremental recall tracker equals one-shot ground truth."""

import numpy as np

from benchmarks.recall_tracker import IncrementalRecallTracker
from opensearch_jvector_tpu.ops.distances import SimilarityFunction
from opensearch_jvector_tpu.utils.ground_truth import ground_truth_topk


def test_incremental_matches_oneshot():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((1500, 16)).astype(np.float32)
    q = rng.standard_normal((8, 16)).astype(np.float32)
    tr = IncrementalRecallTracker(q, k=10, chunk=400)
    tr.update(v[:700])   # two chunks internally
    tr.update(v[700:])   # ids continue across update calls
    truth = ground_truth_topk(q, v, 10, SimilarityFunction.EUCLIDEAN)
    got = tr.ground_truth()
    for i in range(8):
        assert set(got[i].tolist()) == set(truth[i].tolist())
    assert tr.recall(truth.astype(np.int64)) == 1.0
