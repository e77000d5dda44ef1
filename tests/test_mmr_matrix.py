"""MMR selection-semantics matrix against an independent greedy oracle.

The reference spends ~3.3k test LoC on the MMR pipeline pair
(search/processor/mmr/*Tests: MMRRerankProcessorTests greedy-selection
cells, MMRSearchExtBuilderTests param validation, oversample transform
tests). This matrix drives `mmr_rerank` / `mmr_search` through the same
semantic cells: greedy argmax of
    (1 - diversity) * relevance - diversity * maxSimToSelected
(MMRRerankProcessor.java:201-237), endpoint behaviors at diversity 0/1,
oversample (`candidates`) handling, and batched-vs-single consistency.
"""

import numpy as np
import pytest

from opensearch_jvector_tpu.api.config import (
    QUANT_NONE,
    DiskAnnConfig,
    SearchConfig,
    ValidationError,
)
from opensearch_jvector_tpu.index.index import VectorIndex
from opensearch_jvector_tpu.ops.distances import SimilarityFunction
from opensearch_jvector_tpu.query import mmr

DIM = 8


def _oracle_mmr(vectors, relevance, size, diversity, simf):
    """Independent greedy MMR: recompute the penalty term from scratch each
    step (no incremental max_sim state), using the same score space as the
    engine's pairwise_scores."""
    import jax.numpy as jnp

    from opensearch_jvector_tpu.ops.distances import pairwise_scores

    sims = np.asarray(pairwise_scores(
        jnp.asarray(vectors, jnp.float32), jnp.asarray(vectors, jnp.float32),
        simf,
    ))
    c = relevance.shape[0]
    chosen = []
    for _ in range(min(size, c)):
        best, best_val = -1, -np.inf
        for i in range(c):
            if i in chosen or relevance[i] == -np.inf:
                continue
            penal = max((sims[j][i] for j in chosen), default=0.0)
            val = (1.0 - diversity) * relevance[i] - diversity * penal
            if val > best_val:
                best, best_val = i, val
        if best < 0:
            break
        chosen.append(best)
    return np.asarray(chosen, np.int64)


@pytest.mark.parametrize("diversity", [0.0, 0.3, 0.5, 0.8, 1.0])
@pytest.mark.parametrize("simf", [SimilarityFunction.EUCLIDEAN,
                                  SimilarityFunction.COSINE])
def test_greedy_matches_oracle(diversity, simf):
    rng = np.random.default_rng(17)
    vecs = rng.standard_normal((12, DIM)).astype(np.float32)
    rel = rng.standard_normal(12).astype(np.float32)
    got = mmr.mmr_rerank(vecs, rel, size=6, diversity=diversity, simf=simf)
    want = _oracle_mmr(vecs, rel, 6, diversity, simf)
    np.testing.assert_array_equal(got, want)


def test_diversity_zero_is_relevance_order():
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((10, DIM)).astype(np.float32)
    rel = np.asarray([5, 1, 9, 2, 8, 3, 7, 0, 6, 4], np.float32)
    got = mmr.mmr_rerank(vecs, rel, size=5, diversity=0.0,
                         simf=SimilarityFunction.EUCLIDEAN)
    np.testing.assert_array_equal(got, np.argsort(-rel)[:5])


def test_diversity_one_separates_duplicates():
    """Two exact duplicate vectors with the top relevances: at diversity=1
    the duplicate of the first pick is chosen LAST among the finite-penalty
    candidates (its similarity penalty is maximal)."""
    rng = np.random.default_rng(5)
    base = rng.standard_normal((6, DIM)).astype(np.float32)
    base[1] = base[0]  # duplicate pair, ids 0 and 1
    rel = np.asarray([10.0, 9.9, 1.0, 0.9, 0.8, 0.7], np.float32)
    got = mmr.mmr_rerank(base, rel, size=6, diversity=1.0,
                         simf=SimilarityFunction.EUCLIDEAN)
    # 0 goes first (no penalty yet, ties broken by argmax order);
    # 1 must NOT be second — a duplicate has the highest possible penalty
    assert got[0] == 0
    assert got[1] != 1
    assert 1 in got  # still selected eventually (size covers all)


def test_size_larger_than_candidates_returns_all():
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((4, DIM)).astype(np.float32)
    rel = rng.standard_normal(4).astype(np.float32)
    got = mmr.mmr_rerank(vecs, rel, size=10, diversity=0.5,
                         simf=SimilarityFunction.EUCLIDEAN)
    assert got.size == 4
    assert set(got.tolist()) == {0, 1, 2, 3}


def test_neginf_relevance_never_selected():
    """-inf relevance marks a hit with no diversity vector (vector_source
    miss) — it must be skipped even when size covers everything."""
    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((5, DIM)).astype(np.float32)
    rel = np.asarray([1.0, -np.inf, 0.5, -np.inf, 0.2], np.float32)
    got = mmr.mmr_rerank(vecs, rel, size=5, diversity=0.5,
                         simf=SimilarityFunction.EUCLIDEAN)
    assert set(got.tolist()) == {0, 2, 4}


# ---------------------------------------------------------------------------
# mmr_search pipeline cells (oversample + rerank through a real index)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mmr_index(tmp_path_factory):
    root = tmp_path_factory.mktemp("mmridx")
    cfg = DiskAnnConfig(dim=DIM, similarity=SimilarityFunction.EUCLIDEAN,
                        m=8, ef_construction=32,
                        quantization_type=QUANT_NONE)
    idx = VectorIndex(root, cfg)
    rng = np.random.default_rng(21)
    # 3 separated clusters so diversity has something to trade against.
    # Spread 0.6 (not ~0): near-duplicate clusters degrade the Vamana graph
    # into alpha-pruned chains (every cluster-mate prunes every other) that
    # beam search cannot exhaust within its hop budget — a real DiskANN
    # property, but not what this MMR cell probes.
    centers = rng.standard_normal((3, DIM)).astype(np.float32) * 6
    vecs = np.concatenate([
        centers[i] + 0.6 * rng.standard_normal((40, DIM)).astype(np.float32)
        for i in range(3)
    ])
    idx.add_batch(np.arange(len(vecs)), vecs)
    idx.flush()
    return idx, vecs, centers


def test_oversample_default_is_3x_size(mmr_index):
    idx, vecs, centers = mmr_index
    res = mmr.mmr_search(idx, centers[0], size=4)
    assert res.doc_ids.shape == (1, 4)
    # all 4 results exist and are live docs
    assert (res.doc_ids >= 0).all()


def test_candidates_param_bounds_pool(mmr_index):
    """`candidates` < size*3 shrinks the pool: selection is a subset of the
    top-`candidates` ANN hits."""
    idx, vecs, centers = mmr_index
    sc = SearchConfig(k=6)
    ann = idx.search(centers[0][None], sc)
    res = mmr.mmr_search(idx, centers[0], size=4,
                         params=mmr.MMRParams(diversity=0.9, candidates=6))
    assert set(res.doc_ids[0].tolist()) <= set(ann.doc_ids[0].tolist())


def test_high_diversity_crosses_clusters(mmr_index):
    """diversity=0 stays in the query's cluster; diversity=0.95 must pull
    at least one hit from another cluster into the top-4."""
    idx, vecs, centers = mmr_index

    def clusters_of(ids):
        return {int(i) // 40 for i in ids if i >= 0}

    rel = mmr.mmr_search(idx, centers[0], size=4,
                         params=mmr.MMRParams(diversity=0.0, candidates=60))
    div = mmr.mmr_search(idx, centers[0], size=4,
                         params=mmr.MMRParams(diversity=0.95, candidates=60))
    assert clusters_of(rel.doc_ids[0]) == {0}
    assert len(clusters_of(div.doc_ids[0])) > 1


def test_batched_matches_single(mmr_index):
    idx, vecs, centers = mmr_index
    qs = np.stack([centers[0], centers[1], centers[2]])
    batched = mmr.mmr_search(idx, qs, size=5,
                             params=mmr.MMRParams(diversity=0.5))
    for qi in range(3):
        single = mmr.mmr_search(idx, qs[qi], size=5,
                                params=mmr.MMRParams(diversity=0.5))
        np.testing.assert_array_equal(batched.doc_ids[qi],
                                      single.doc_ids[0])


def test_scores_are_original_relevance(mmr_index):
    """MMR reorders but reports the ORIGINAL relevance scores (the
    reference's rerank processor preserves hit scores' meaning)."""
    idx, vecs, centers = mmr_index
    sc = SearchConfig(k=12)
    ann = idx.search(centers[0][None], sc)
    by_doc = dict(zip(ann.doc_ids[0].tolist(), ann.scores[0].tolist()))
    res = mmr.mmr_search(idx, centers[0], size=4,
                         params=mmr.MMRParams(diversity=0.7, candidates=12))
    for d, s in zip(res.doc_ids[0].tolist(), res.scores[0].tolist()):
        assert d in by_doc
        assert s == pytest.approx(by_doc[d], rel=1e-6)


def test_diversity_validation():
    with pytest.raises(ValidationError):
        mmr.MMRParams(diversity=-0.1)
    with pytest.raises(ValidationError):
        mmr.MMRParams(diversity=1.0001)
