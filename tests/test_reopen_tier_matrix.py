"""Reopen-from-commit ACROSS quantization tiers.

The reference's restart-upgrade QA suite (qa/restart-upgrade: IndexingIT,
QueryANNIT, RecallIT) reopens indexes from disk and re-serves them; its
codec tests reopen quantized segments through a fresh reader
(KNNJVectorTests compound-file + quantized multi-segment cases). Here each
tier (fp32, pq, nvq+pq, 1bit scalar, pq-on_disk) goes through:

  flush -> delete -> second flush -> REOPEN -> search agreement with the
  pre-reopen index -> merge on the REOPENED index -> search again.

This is the full store/reader roundtrip per codec: quantized sidecars
(codebooks/codes, NVQ aux, scalar thresholds), raw row files for on_disk,
tombstone commits, and docmaps all have to survive the restart.
"""

import numpy as np
import pytest

from opensearch_jvector_tpu.api.config import DiskAnnConfig, SearchConfig
from opensearch_jvector_tpu.index.index import VectorIndex
from opensearch_jvector_tpu.ops.distances import SimilarityFunction

DIM = 16
N = 600
K = 8

TIERS = [
    ("none", "in_memory"),
    ("pq", "in_memory"),
    ("nvq+pq", "in_memory"),
    ("1bit", "in_memory"),
    ("pq", "on_disk"),
]


def _vectors(seed=5):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((N, DIM)).astype(np.float32)


def _ids(res):
    return [sorted(int(d) for d in row if d >= 0) for row in res.doc_ids]


@pytest.mark.parametrize("qt,mode", TIERS, ids=lambda p: str(p))
def test_reopen_serves_identically_then_merges(tmp_path, qt, mode):
    cfg = DiskAnnConfig(dim=DIM, similarity=SimilarityFunction.EUCLIDEAN,
                        m=8, ef_construction=48, quantization_type=qt,
                        mode=mode)
    idx = VectorIndex(tmp_path, cfg)
    v = _vectors()
    idx.add_batch(np.arange(400), v[:400])
    idx.flush()
    idx.delete(np.arange(100, 130))
    idx.add_batch(np.arange(400, N), v[400:])
    idx.flush()

    queries = _vectors(seed=9)[:6]
    sc = SearchConfig(k=K, ef_search=64)
    before = idx.search(queries, sc)
    idx.close()

    # reopen WITHOUT config: everything comes back from commits.json +
    # segment files
    idx2 = VectorIndex(tmp_path)
    assert idx2.config.quantization_type == qt
    assert idx2.config.mode == mode
    assert idx2.doc_count() == N - 30
    after = idx2.search(queries, sc)
    assert _ids(after) == _ids(before)
    got = after.doc_ids[after.doc_ids >= 0]
    assert not ((got >= 100) & (got < 130)).any(), "tombstone lost on reopen"

    # merge on the reopened index: deletes fold in, search still agrees on
    # the self-query (exact rerank) and never surfaces a deleted doc
    idx2.force_merge()
    assert idx2.doc_count() == N - 30
    merged = idx2.search(queries, sc)
    got = merged.doc_ids[merged.doc_ids >= 0]
    assert not ((got >= 100) & (got < 130)).any()
    self_q = v[200][None]
    res = idx2.search(self_q, sc)
    assert res.doc_ids[0, 0] == 200
    idx2.close()


@pytest.mark.parametrize("qt,mode", TIERS, ids=lambda p: str(p))
def test_double_reopen_after_merge(tmp_path, qt, mode):
    """Reopen -> merge -> reopen again: the merged segment's sidecars are
    re-read by a second fresh process-equivalent."""
    cfg = DiskAnnConfig(dim=DIM, similarity=SimilarityFunction.EUCLIDEAN,
                        m=8, ef_construction=48, quantization_type=qt,
                        mode=mode)
    idx = VectorIndex(tmp_path, cfg)
    v = _vectors(seed=21)
    idx.add_batch(np.arange(300), v[:300])
    idx.flush()
    idx.add_batch(np.arange(300, N), v[300:])
    idx.flush()
    idx.close()

    idx2 = VectorIndex(tmp_path)
    idx2.force_merge()
    idx2.close()

    idx3 = VectorIndex(tmp_path)
    assert idx3.doc_count() == N
    assert len(idx3.segment_names) == 1
    # ef_search=256: the 1-bit Hamming beam needs headroom to pull the
    # self-doc into the rerank set on a 600-doc merged segment; once there,
    # exact rerank pins it at rank 0
    res = idx3.search(v[77][None], SearchConfig(k=5, ef_search=256))
    assert res.doc_ids[0, 0] == 77
    idx3.close()
