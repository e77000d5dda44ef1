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


def _bfs_reachable(adjacency, live, entry):
    adj = np.asarray(adjacency)
    lv = np.asarray(live)
    seen = np.zeros(lv.shape[0], bool)
    seen[entry] = True
    frontier = np.asarray([entry])
    while frontier.size:
        nb = adj[frontier].reshape(-1)
        nb = nb[nb >= 0]
        nb = nb[lv[nb] & ~seen[nb]]
        if nb.size == 0:
            break
        nb = np.unique(nb)
        seen[nb] = True
        frontier = nb
    return seen


def test_multi_cluster_islands_fully_reachable():
    """Regression: separated clusters built a one-way island graph — the
    forward-only bootstrap left whole clusters without in-edges, and orphan
    repair then thrashed the single boundary host's row (all repairs landed
    on the same max_degree slots, evicting the entry cluster's own edges).
    Every live node must be reachable from the entry, and recall at each
    cluster's center must be perfect at full-corpus ef."""
    dim = 8
    rng = np.random.default_rng(21)
    centers = rng.standard_normal((3, dim)).astype(np.float32) * 6
    vecs = np.concatenate([
        centers[i] + 0.6 * rng.standard_normal((40, dim)).astype(np.float32)
        for i in range(3)
    ])
    simf = SimilarityFunction.EUCLIDEAN
    b = GraphIndexBuilder(dim=dim, max_degree=8, beam_width=32)
    g = b.build(jnp.asarray(vecs), simf)
    seen = _bfs_reachable(g.adjacency, g.live, int(g.entry))
    n_live = int(np.asarray(g.live).sum())
    assert int(seen.sum()) == n_live, (
        f"only {int(seen.sum())}/{n_live} nodes reachable from entry"
    )
    vpad = jnp.asarray(np.pad(vecs, ((0, g.capacity - len(vecs)), (0, 0))))
    res = searcher.search(
        g.adjacency, g.live, g.entry, jnp.asarray(centers),
        SearchParams(k=10, ef_search=64), simf, vectors=vpad,
    )
    truth = ground_truth_topk(jnp.asarray(centers), jnp.asarray(vecs), 10,
                              simf)
    rec = recall_at_k(np.asarray(res.ids), truth, 10)
    assert rec >= 0.99, f"cluster-center recall@10={rec:.3f}"


def test_orphan_chain_repair_bounded_eviction():
    """The chained orphan repair must cost each host/orphan row at most one
    slot: after repair, every node keeps >= max_degree - 1 of its original
    edges (no row is wholesale overwritten)."""
    dim = 8
    rng = np.random.default_rng(33)
    # two far clusters; the small one becomes the orphan island
    a = rng.standard_normal((60, dim)).astype(np.float32)
    bclust = rng.standard_normal((20, dim)).astype(np.float32) + 40.0
    vecs = np.concatenate([a, bclust])
    simf = SimilarityFunction.EUCLIDEAN
    b = GraphIndexBuilder(dim=dim, max_degree=8, beam_width=32)
    g = b.build(jnp.asarray(vecs), simf)
    seen = _bfs_reachable(g.adjacency, g.live, int(g.entry))
    assert int(seen.sum()) == int(np.asarray(g.live).sum())
    deg = np.asarray((np.asarray(g.adjacency)[: len(vecs)] >= 0).sum(axis=1))
    # every node with any edges keeps a meaningful neighborhood
    assert (deg[deg > 0] >= 2).all()


def test_pq_score_source_padded_to_capacity(data):
    """build()/add_nodes() normalize row-indexed PQ score-source arrays to
    the graph's pow2 capacity (_pad_pq): a caller handing build() a
    base-rows slice and add_nodes() the full-corpus cache must hit ONE
    program family (the r04 'incremental merge slower than fresh build'
    anomaly was recompilation from this shape mismatch), and the delta
    insert must still produce a searchable graph."""
    vectors, queries = data
    b = _builder()
    # unit check: both score-source layouts pad to capacity; None passes
    padded = b._pad_pq({"decoded": jnp.zeros((100, D), jnp.bfloat16)}, 256)
    assert padded["decoded"].shape == (256, D)
    assert b._pad_pq(None, 256) is None

    # functional check: quantized build on a slice + delta with the full
    # cache — distinct caller shapes, same searchable result
    simf = SimilarityFunction.EUCLIDEAN
    base, total = 1200, N
    dec = vectors.astype(jnp.bfloat16)
    g = b.build(vectors[:base], simf,
                pq={"decoded": dec[:base]}, capacity=total)
    g = b.add_nodes(g, vectors, np.arange(base, total), simf,
                    pq={"decoded": dec})
    res = searcher.search(
        g.adjacency, g.live, g.entry, queries,
        SearchParams(k=K, ef_search=64), simf,
        vectors=vectors,
    )
    truth = ground_truth_topk(queries, vectors, K, simf)
    rec = recall_at_k(np.asarray(res.ids), truth, K)
    assert rec >= 0.9, rec


def test_orphan_nearest_host_block_scan_matches_full_pairwise():
    """The orphan-repair nearest-host argmax scans the corpus in blocks
    (one [512, capacity] pass is 8.6GB f32 at 4M capacity — measured OOM
    on chip); the running (score, argmax) merge must agree exactly with
    the single-pass formulation, including the hostable-mask exclusion."""
    import opensearch_jvector_tpu.models.builder as b_mod
    from opensearch_jvector_tpu.models.builder import _nearest_hostable
    from opensearch_jvector_tpu.ops.distances import pairwise_scores

    rng = np.random.default_rng(5)
    cap, d = 1024, 16
    v = jnp.asarray(rng.standard_normal((cap, d)).astype(np.float32))
    hostable = np.zeros(cap, bool)
    hostable[rng.choice(cap, 300, replace=False)] = True
    hostable_dev = jnp.asarray(hostable)
    ob = jnp.asarray(rng.integers(0, cap, 512), jnp.int32)
    simf = SimilarityFunction.EUCLIDEAN

    # force multiple blocks (cap=1024 -> 8 blocks of 128)
    orig = b_mod.ORPHAN_SCAN_BLOCK
    b_mod.ORPHAN_SCAN_BLOCK = 128
    try:
        got = np.asarray(_nearest_hostable(ob, v, hostable_dev, simf))
    finally:
        b_mod.ORPHAN_SCAN_BLOCK = orig

    sc = pairwise_scores(v[ob], v, simf)
    sc = jnp.where(hostable_dev[None, :], sc, -jnp.inf)
    want = np.asarray(jnp.argmax(sc, axis=1))
    # ties broken differently are acceptable only if scores equal; with
    # continuous random data ties have measure zero -> exact id match
    np.testing.assert_array_equal(got, want)
    assert hostable[got].all()
