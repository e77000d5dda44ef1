"""Filters and radial queries ACROSS quantization tiers.

The reference exercises filtered + quantized search together in its codec
tests (KNNJVectorTests quantized flush/rerank cases run under
FixedBitSet filters; JVectorEngineIT covers filtered CRUD) — here each
quantized tier (pq, nvq+pq, 1bit scalar, pq-on_disk) serves:

  * a half-corpus filter, checked against the brute-force oracle restricted
    to the allowed subset (rerank is exact fp32, so recall stays high),
  * a restrictive filter (exact fallback: visited == 0, exact order),
  * a filter racing deletes (tombstoned docs never surface even when the
    filter accepts them),
  * a radial min_score query (every score above the floor, self doc found).
"""

import numpy as np
import pytest

from opensearch_jvector_tpu.api.config import DiskAnnConfig
from opensearch_jvector_tpu.index.index import VectorIndex
from opensearch_jvector_tpu.ops.distances import SimilarityFunction
from opensearch_jvector_tpu.query import knn
from opensearch_jvector_tpu.query.builder import parse_knn_query
from opensearch_jvector_tpu.utils.ground_truth import ground_truth_topk

DIM = 16
N = 600
K = 10

TIERS = [
    ("pq", "in_memory"),
    ("nvq+pq", "in_memory"),
    ("1bit", "in_memory"),
    ("pq", "on_disk"),
]


def _tier_id(t):
    qt, mode = t
    return f"{qt}-{mode}"


def _vectors():
    rng = np.random.default_rng(42)
    return rng.standard_normal((N, DIM)).astype(np.float32)


@pytest.fixture(scope="module", params=TIERS, ids=_tier_id)
def tier_index(request, tmp_path_factory):
    qt, mode = request.param
    root = tmp_path_factory.mktemp(f"fq_{qt.replace('+', '_')}_{mode}")
    cfg = DiskAnnConfig(dim=DIM, similarity=SimilarityFunction.EUCLIDEAN,
                        m=8, ef_construction=48, quantization_type=qt,
                        mode=mode)
    idx = VectorIndex(root, cfg)
    v = _vectors()
    idx.add_batch(np.arange(N), v)
    idx.flush()
    return idx, v


def test_half_corpus_filter_matches_oracle(tier_index):
    idx, v = tier_index
    accept = np.zeros(N, bool)
    accept[::2] = True  # 300 allowed docs >> k*oq -> stays on the ANN path
    rng = np.random.default_rng(7)
    hits = total = 0
    sub = v[accept]
    sub_ids = np.nonzero(accept)[0]
    for qi in rng.integers(0, N, size=8):
        q = parse_knn_query({"vector": v[qi] + 0.01, "k": K,
                             "filter": accept})
        res = knn.execute_knn_query(idx, q)
        got = res.doc_ids[res.doc_ids >= 0]
        assert accept[got].all(), f"filtered-out doc returned: {got}"
        truth = sub_ids[np.asarray(ground_truth_topk(
            (v[qi] + 0.01)[None], sub, K, SimilarityFunction.EUCLIDEAN))[0]]
        hits += np.isin(got[:K], truth).sum()
        total += K
    assert hits / total >= 0.85, f"filtered recall {hits/total:.3f}"


def test_restrictive_filter_exact_fallback(tier_index):
    idx, v = tier_index
    accept = np.zeros(N, bool)
    accept[100:115] = True  # 15 docs << k*oq -> exact fallback
    q = parse_knn_query({"vector": v[103], "k": 5, "filter": accept})
    res = knn.execute_knn_query(idx, q)
    assert res.visited == 0  # graph/scan never walked
    ids = res.doc_ids[res.doc_ids >= 0]
    assert ids.size > 0 and ((ids >= 100) & (ids < 115)).all()
    # exact fallback scores fp32 originals even on quantized tiers
    assert res.doc_ids[0, 0] == 103


def test_filter_never_surfaces_deleted_docs(tier_index):
    idx, v = tier_index
    accept = np.zeros(N, bool)
    accept[:200] = True
    idx.delete(np.arange(0, 50))  # tombstone docs the filter accepts
    try:
        q = parse_knn_query({"vector": v[10], "k": K, "filter": accept})
        res = knn.execute_knn_query(idx, q)
        got = res.doc_ids[res.doc_ids >= 0]
        assert got.size > 0
        assert (got >= 50).all(), f"deleted doc returned: {got}"
        assert accept[got].all()
    finally:
        # module-scoped fixture: put the tombstoned docs back for the
        # cells that run after this one
        idx.add_batch(np.arange(0, 50), v[:50])
        idx.flush()


def test_radial_min_score_on_quantized(tier_index):
    idx, v = tier_index
    q = parse_knn_query({"vector": v[33], "min_score": 0.9})
    res = knn.execute_knn_query(idx, q)
    ids = res.doc_ids[res.doc_ids >= 0]
    assert 33 in ids  # the identical vector scores 1.0
    assert (res.scores[res.doc_ids >= 0] >= 0.9).all()
