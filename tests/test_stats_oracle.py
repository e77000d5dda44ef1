"""Counter-by-counter stats oracle over a known operation sequence.

The reference asserts exact counter movement in its stats ITs
(KNNStatsTests / StatsIT in qa/rolling-upgrade): each op must bump its
counter and ONLY its counter family. Here a private registry (not the
process-global STATS) runs: flush x2 -> quantized queries (plain,
filtered, batched) -> merge -> script-score — and every counter's
movement is asserted against what the sequence implies.
"""

import numpy as np

from opensearch_jvector_tpu.api.config import DiskAnnConfig, SearchConfig
from opensearch_jvector_tpu.api.stats import Counter, StatsRegistry
from opensearch_jvector_tpu.index.index import VectorIndex
from opensearch_jvector_tpu.ops.distances import SimilarityFunction
from opensearch_jvector_tpu.query import knn
from opensearch_jvector_tpu.query.builder import parse_knn_query

DIM = 16
N = 600


def test_counter_oracle_sequence(tmp_path):
    reg = StatsRegistry()
    # min_batch below the flush sizes so PQ actually trains (default 1024
    # would leave both 300/400-doc flushes on the fp32 path and
    # quantization_training_time at 0)
    cfg = DiskAnnConfig(dim=DIM, similarity=SimilarityFunction.EUCLIDEAN,
                        m=8, ef_construction=48, quantization_type="pq",
                        min_batch_size_for_quantization=64)
    idx = VectorIndex(tmp_path, cfg, stats=reg)
    rng = np.random.default_rng(3)
    v = rng.standard_normal((N, DIM)).astype(np.float32)

    # two flushes: flush_count == 2, build time accrues, PQ training ran
    idx.add_batch(np.arange(400), v[:400])
    idx.flush()
    idx.add_batch(np.arange(400, N), v[400:])
    idx.flush()
    snap = reg.snapshot()
    assert snap["knn_flush_count"] == 2
    assert snap["knn_graph_build_time"] > 0
    assert snap["knn_quantization_training_time"] > 0
    assert snap["knn_merge_count"] == 0
    assert snap["knn_query_count"] == 0

    # 3 plain queries (each fans out to BOTH segments: per-segment readers
    # count per-segment query dispatches)
    seg_count = len(idx.segment_names)
    assert seg_count == 2
    sc = SearchConfig(k=5, ef_search=48)
    for qi in (5, 450, 32):
        idx.search(v[qi][None], sc)
    snap = reg.snapshot()
    assert snap["knn_query_count"] == 3 * seg_count
    assert snap["knn_query_with_filter_count"] == 0
    assert snap["knn_query_visited_nodes"] > 0
    assert snap["knn_query_reranked_count"] > 0  # pq tier reranks fp32
    q_before = snap["knn_query_count"]

    # 1 filtered query bumps BOTH query_count and with_filter_count
    accept = np.zeros(N, bool)
    accept[::3] = True
    idx.search(v[9][None], sc, accept_docs=accept)
    snap = reg.snapshot()
    assert snap["knn_query_count"] == q_before + seg_count
    assert snap["knn_query_with_filter_count"] == seg_count

    # a BATCH of 4 queries counts 4 per segment, not 1
    idx.search(v[:4], sc)
    snap2 = reg.snapshot()
    assert (snap2["knn_query_count"] - snap["knn_query_count"]
            == 4 * seg_count)

    # merge: merge_count == 1, merge time accrues, doc count intact
    idx.force_merge()
    snap = reg.snapshot()
    assert snap["knn_merge_count"] == 1
    assert snap["knn_graph_merge_time"] > 0
    assert len(idx.segment_names) == 1

    # reset zeroes everything
    reg.reset()
    assert all(val == 0 for val in reg.snapshot().values())
    idx.close()


def test_script_query_counters(tmp_path):
    """script_query_requests moves on the exact script-score surface and
    errors are counted separately (KNNCounter.SCRIPT_QUERY_ERRORS parity)."""
    import pytest

    reg = StatsRegistry()
    cfg = DiskAnnConfig(dim=DIM, similarity=SimilarityFunction.EUCLIDEAN,
                        m=8, ef_construction=48, quantization_type="none")
    idx = VectorIndex(tmp_path, cfg, stats=reg)
    rng = np.random.default_rng(4)
    v = rng.standard_normal((100, DIM)).astype(np.float32)
    idx.add_batch(np.arange(100), v)
    idx.flush()

    res = knn.execute_script_score(idx, "l2", v[3], k=5)
    assert res.doc_ids[0, 0] == 3
    snap = reg.snapshot()
    assert snap["script_query_requests"] == 1
    assert snap["script_query_errors"] == 0

    with pytest.raises(ValueError):
        knn.execute_script_score(idx, "not_a_space", v[3], k=5)
    snap = reg.snapshot()
    assert snap["script_query_requests"] == 2
    assert snap["script_query_errors"] == 1
    idx.close()


def test_aggregate_sums_node_registries():
    a, b = StatsRegistry(), StatsRegistry()
    a.increment(Counter.KNN_QUERY_COUNT, 3)
    b.increment(Counter.KNN_QUERY_COUNT, 4)
    b.increment(Counter.KNN_FLUSH_COUNT, 1)
    agg = StatsRegistry.aggregate([a, b])
    assert agg["knn_query_count"] == 7
    assert agg["knn_flush_count"] == 1
