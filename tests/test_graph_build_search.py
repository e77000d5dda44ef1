"""End-to-end slice: Vamana build -> beam search -> recall vs brute force.

Models the reference's recall gate (RecallTestsIT.java:54-80: 10k docs,
k, queries vs exact ground truth, per space type) at unit-test scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opensearch_jvector_tpu.models.builder import GraphIndexBuilder
from opensearch_jvector_tpu.models import searcher
from opensearch_jvector_tpu.models.searcher import SearchParams
from opensearch_jvector_tpu.ops.distances import SimilarityFunction
from opensearch_jvector_tpu.utils.ground_truth import ground_truth_topk, recall_at_k


def _mk_data(n, d, q, seed=0):
    rng = np.random.default_rng(seed)
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    return jnp.asarray(vectors), jnp.asarray(queries)


@pytest.mark.parametrize(
    "simf",
    [
        SimilarityFunction.EUCLIDEAN,
        SimilarityFunction.DOT_PRODUCT,
        SimilarityFunction.COSINE,
    ],
)
def test_recall_fp32(simf):
    n, d, q, k = 2000, 32, 32, 10
    vectors, queries = _mk_data(n, d, q)
    builder = GraphIndexBuilder(dim=d, max_degree=24, beam_width=64, batch_size=256)
    graph = builder.build(vectors, simf)

    params = SearchParams(k=k, ef_search=96, overquery_factor=5)
    res = searcher.search(
        graph.adjacency, graph.live, graph.entry, queries, params, simf,
        vectors=vectors,
    )
    truth = ground_truth_topk(queries, vectors, k, simf)
    rec = recall_at_k(np.asarray(res.ids), truth, k)
    assert rec >= 0.90, f"recall@{k}={rec:.3f} for {simf}"


def test_counters_populated():
    n, d, q, k = 1000, 16, 8, 5
    vectors, queries = _mk_data(n, d, q, seed=1)
    builder = GraphIndexBuilder(dim=d, max_degree=16, beam_width=48, batch_size=256)
    graph = builder.build(vectors, SimilarityFunction.EUCLIDEAN)
    res = searcher.search(
        graph.adjacency, graph.live, graph.entry, queries,
        SearchParams(k=k, ef_search=48), SimilarityFunction.EUCLIDEAN,
        vectors=vectors,
    )
    assert np.all(np.asarray(res.visited_count) > 0)
    assert np.all(np.asarray(res.expanded_count) > 0)
    assert np.all(np.asarray(res.reranked_count) == 0)  # exact phase, no rerank
    assert np.all(np.asarray(res.ids) >= 0)


def test_degree_bound_respected():
    n, d = 1200, 16
    vectors, _ = _mk_data(n, d, 1, seed=2)
    builder = GraphIndexBuilder(dim=d, max_degree=12, beam_width=32, batch_size=256)
    graph = builder.build(vectors, SimilarityFunction.EUCLIDEAN)
    deg = np.asarray(graph.degrees)
    assert deg.max() <= 12
    adj = np.asarray(graph.adjacency)
    # neighbor lists only reference live in-range nodes
    valid = adj[adj >= 0]
    assert valid.max() < n
    live = np.asarray(graph.live)
    assert live.all()
    assert live[np.unique(valid)].all()


def test_filtered_search_accept_mask():
    n, d, q, k = 1500, 16, 8, 10
    vectors, queries = _mk_data(n, d, q, seed=3)
    builder = GraphIndexBuilder(dim=d, max_degree=16, beam_width=48, batch_size=256)
    graph = builder.build(vectors, SimilarityFunction.EUCLIDEAN)
    accept = np.zeros((n,), bool)
    accept[: n // 2] = True  # only first half of ids may be returned
    res = searcher.search(
        graph.adjacency, graph.live, graph.entry, queries,
        SearchParams(k=k, ef_search=96), SimilarityFunction.EUCLIDEAN,
        vectors=vectors, accept=jnp.asarray(accept),
    )
    ids = np.asarray(res.ids)
    returned = ids[ids >= 0]
    assert returned.size > 0
    assert (returned < n // 2).all()


def test_deletes_cleanup():
    n, d, q, k = 1200, 16, 8, 10
    vectors, queries = _mk_data(n, d, q, seed=4)
    simf = SimilarityFunction.EUCLIDEAN
    builder = GraphIndexBuilder(dim=d, max_degree=16, beam_width=48, batch_size=256)
    graph = builder.build(vectors, simf)
    deleted = np.arange(0, n, 3)
    graph = GraphIndexBuilder.mark_deleted(graph, deleted)
    graph = builder.cleanup(graph, vectors, simf)
    adj = np.asarray(graph.adjacency)
    live = np.asarray(graph.live)
    # no live node links to a deleted node
    rows = adj[live]
    nbrs = rows[rows >= 0]
    assert live[nbrs].all()
    # search never returns deleted ids
    res = searcher.search(
        graph.adjacency, graph.live, graph.entry, queries,
        SearchParams(k=k, ef_search=64), simf, vectors=vectors,
    )
    ids = np.asarray(res.ids)
    ids = ids[ids >= 0]
    assert ids.size > 0
    assert live[ids].all()
