"""End-to-end slice: Vamana build -> beam search -> recall vs brute force.

Models the reference's recall gate (RecallTestsIT.java:54-80: 10k docs,
k, queries vs exact ground truth, per space type) at unit-test scale.

One graph is built per space type (module-scoped) and shared by every test
in this file: builds dominate suite wall-clock on the single-core CI host,
and VamanaGraph is immutable (functional updates), so sharing is safe.
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

N, D, Q, K, M = 1500, 32, 32, 10, 16

SPACES = [
    SimilarityFunction.EUCLIDEAN,
    SimilarityFunction.DOT_PRODUCT,
    SimilarityFunction.COSINE,
]


def _builder():
    return GraphIndexBuilder(dim=D, max_degree=M, beam_width=48,
                             batch_size=256)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    vectors = rng.standard_normal((N, D)).astype(np.float32)
    queries = rng.standard_normal((Q, D)).astype(np.float32)
    return jnp.asarray(vectors), jnp.asarray(queries)


@pytest.fixture(scope="module")
def graphs(data):
    vectors, _ = data
    return {simf: _builder().build(vectors, simf) for simf in SPACES}


@pytest.mark.parametrize("simf", SPACES)
def test_recall_fp32(simf, data, graphs):
    vectors, queries = data
    graph = graphs[simf]
    params = SearchParams(k=K, ef_search=96, overquery_factor=5)
    res = searcher.search(
        graph.adjacency, graph.live, graph.entry, queries, params, simf,
        vectors=vectors,
    )
    truth = ground_truth_topk(queries, vectors, K, simf)
    rec = recall_at_k(np.asarray(res.ids), truth, K)
    assert rec >= 0.90, f"recall@{K}={rec:.3f} for {simf}"


def test_counters_populated(data, graphs):
    vectors, queries = data
    graph = graphs[SimilarityFunction.EUCLIDEAN]
    res = searcher.search(
        graph.adjacency, graph.live, graph.entry, queries[:8],
        SearchParams(k=5, ef_search=48), SimilarityFunction.EUCLIDEAN,
        vectors=vectors,
    )
    assert np.all(np.asarray(res.visited_count) > 0)
    assert np.all(np.asarray(res.expanded_count) > 0)
    assert np.all(np.asarray(res.reranked_count) == 0)  # exact phase, no rerank
    assert np.all(np.asarray(res.ids) >= 0)


def test_degree_bound_respected(graphs):
    graph = graphs[SimilarityFunction.EUCLIDEAN]
    deg = np.asarray(graph.degrees)
    assert deg.max() <= M
    adj = np.asarray(graph.adjacency)
    # neighbor lists only reference live in-range nodes
    valid = adj[adj >= 0]
    assert valid.max() < N
    live = np.asarray(graph.live)
    assert live[:N].all()
    assert not live[N:].any()  # capacity-bucket padding stays dead
    assert live[np.unique(valid)].all()


def test_filtered_search_accept_mask(data, graphs):
    vectors, queries = data
    graph = graphs[SimilarityFunction.EUCLIDEAN]
    accept = np.zeros((N,), bool)
    accept[: N // 2] = True  # only first half of ids may be returned
    res = searcher.search(
        graph.adjacency, graph.live, graph.entry, queries,
        SearchParams(k=K, ef_search=96), SimilarityFunction.EUCLIDEAN,
        vectors=vectors, accept=jnp.asarray(accept),
    )
    ids = np.asarray(res.ids)
    returned = ids[ids >= 0]
    assert returned.size > 0
    assert (returned < N // 2).all()


def test_deletes_cleanup(data, graphs):
    vectors, queries = data
    simf = SimilarityFunction.EUCLIDEAN
    # VamanaGraph updates are functional: mark_deleted/cleanup return new
    # graphs, the module-shared one is untouched
    graph = GraphIndexBuilder.mark_deleted(
        graphs[simf], np.arange(0, N, 3)
    )
    graph = _builder().cleanup(graph, vectors, simf)
    adj = np.asarray(graph.adjacency)
    live = np.asarray(graph.live)
    # no live node links to a deleted node
    rows = adj[live]
    nbrs = rows[rows >= 0]
    assert live[nbrs].all()
    # search never returns deleted ids
    res = searcher.search(
        graph.adjacency, graph.live, graph.entry, queries,
        SearchParams(k=K, ef_search=64), simf, vectors=vectors,
    )
    ids = np.asarray(res.ids)
    ids = ids[ids >= 0]
    assert ids.size > 0
    assert live[ids].all()


def test_bf16_scored_build_recall(data):
    """score_dtype="bf16" builds (half-HBM construction beam) must match
    fp32-build search quality: prune distances stay fp32, so the graph's
    edge choices are full precision."""
    vectors, queries = data
    simf = SimilarityFunction.EUCLIDEAN
    b = GraphIndexBuilder(dim=D, max_degree=M, beam_width=48,
                          batch_size=256, score_dtype="bf16")
    graph = b.build(vectors, simf)
    params = SearchParams(k=K, ef_search=96, overquery_factor=5)
    res = searcher.search(
        graph.adjacency, graph.live, graph.entry, queries, params, simf,
        vectors=vectors,
    )
    truth = ground_truth_topk(queries, vectors, K, simf)
    rec = recall_at_k(np.asarray(res.ids), truth, K)
    assert rec >= 0.90, f"bf16-build recall@{K}={rec:.3f}"


def test_score_dtype_validation():
    with pytest.raises(ValueError):
        GraphIndexBuilder(dim=D, score_dtype="fp16")
