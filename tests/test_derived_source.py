"""Derived-source read-back matrix (DerivedSourceIT coverage model).

The reference stores vectors once — stripped from _source and re-injected
from the vector index at read time (codec/derivedsource/, default-on for
knn indices, JVectorKNNPlugin.java:217-228). Here the single copy lives in
the segment and `VectorIndex.get_vectors` serves read-back; this matrix
pins that behavior across quantization modes x lifecycle states
(multi-segment, deletes, merge, on_disk paging, sharded routing).
"""

import numpy as np
import pytest

from opensearch_jvector_tpu.api.config import DiskAnnConfig, SearchConfig
from opensearch_jvector_tpu.index.index import VectorIndex
from opensearch_jvector_tpu.index.scheduler import ForceMergesOnlyMergePolicy
from opensearch_jvector_tpu.ops.distances import SimilarityFunction

DIM = 16
N = 300


def _cfg(**kw):
    base = dict(dim=DIM, similarity=SimilarityFunction.EUCLIDEAN, m=8,
                ef_construction=32, quantization_type="none")
    base.update(kw)
    return DiskAnnConfig(**base)


def _vectors(n, seed=0):
    return np.random.default_rng(seed).standard_normal((n, DIM)).astype(
        np.float32)


def _ingest_two_segments(idx, v):
    half = v.shape[0] // 2
    for i in range(half):
        idx.add(i, v[i])
    idx.flush()
    for i in range(half, v.shape[0]):
        idx.add(i, v[i])
    idx.flush()


# quantization_type -> (config kwargs, read-back exactness)
MODES = {
    "none": (dict(quantization_type="none"), True),
    "pq": (dict(quantization_type="pq",
                min_batch_size_for_quantization=64,
                num_pq_subspaces=4), True),  # fp32 stays resident for rerank
    "nvq+pq": (dict(quantization_type="nvq+pq",
                    min_batch_size_for_quantization=64,
                    num_pq_subspaces=4), False),  # inline NVQ: lossy decode
    "1bit": (dict(quantization_type="1bit",
                  min_batch_size_for_quantization=64), True),
}


@pytest.mark.parametrize("mode", sorted(MODES))
def test_readback_across_quantization_and_lifecycle(tmp_path, mode):
    kw, exact = MODES[mode]
    idx = VectorIndex(tmp_path, _cfg(**kw),
                      merge_policy=ForceMergesOnlyMergePolicy())
    v = _vectors(N, seed=31)
    _ingest_two_segments(idx, v)

    def check(doc_ids):
        vecs, found = idx.get_vectors(doc_ids)
        assert found.all()
        if exact:
            np.testing.assert_allclose(vecs, v[doc_ids], rtol=1e-6)
        else:  # NVQ decode: per-subvector sigmoid codec, bounded error
            err = np.abs(vecs - v[doc_ids]).max()
            assert err < 0.2, f"NVQ read-back error {err}"

    # spans both segments
    check(np.array([0, 1, N // 2, N - 1, 77]))

    # deletes: read-back refuses deleted docs
    idx.delete([5, N - 2])
    vecs, found = idx.get_vectors([5, 6, N - 2])
    assert found.tolist() == [False, True, False]

    # merge (incremental or rebuild by mode) preserves the mapping
    idx.force_merge()
    assert len(idx.segment_names) == 1
    check(np.array([6, N // 2 + 3, N - 1]))
    assert idx.get_vector(5) is None  # delete survived the merge


def test_readback_on_disk_pages_rows(tmp_path):
    """on_disk mode serves read-back by paging just the requested rows from
    the native row store (exact fp32, not a quantized decode)."""
    idx = VectorIndex(
        tmp_path,
        _cfg(mode="on_disk", quantization_type="pq",
             min_batch_size_for_quantization=64, num_pq_subspaces=4),
        merge_policy=ForceMergesOnlyMergePolicy(),
    )
    v = _vectors(N, seed=32)
    _ingest_two_segments(idx, v)
    ids = np.array([2, N // 2 + 1, N - 1])
    vecs, found = idx.get_vectors(ids)
    assert found.all()
    np.testing.assert_allclose(vecs, v[ids], rtol=1e-6)
    # unknown / negative ids report not-found without erroring
    vecs, found = idx.get_vectors([10_000, -1, 3])
    assert found.tolist() == [False, False, True]


def test_readback_routes_across_shards(tmp_path):
    """Sharded read-back: each doc comes back from whichever shard holds
    it (the transport-level derived-source fan-out)."""
    from opensearch_jvector_tpu.parallel.distributed import (
        ShardedVectorIndex,
    )

    idx = ShardedVectorIndex(tmp_path, _cfg(), n_shards=3)
    v = _vectors(N, seed=33)
    for i in range(N):
        idx.add(i, v[i])
    idx.flush()
    ids = np.arange(0, N, 17)
    vecs, found = idx.get_vectors(ids)
    assert found.all()
    np.testing.assert_allclose(vecs, v[ids], rtol=1e-6)
    idx.delete([int(ids[2])])
    vecs, found = idx.get_vectors(ids)
    assert not found[2] and found.sum() == ids.size - 1


def test_rescore_uses_readback_consistently(tmp_path):
    """Rescore oversampling reads exact vectors back through the same
    derived-source path — top hit after rescore matches brute force even
    when the approximate phase is quantized."""
    from opensearch_jvector_tpu.query.builder import KnnQuery, Rescore
    from opensearch_jvector_tpu.query.knn import execute_knn_query
    from opensearch_jvector_tpu.utils.ground_truth import ground_truth_topk

    idx = VectorIndex(
        tmp_path,
        _cfg(quantization_type="pq", min_batch_size_for_quantization=64,
             num_pq_subspaces=2),
        merge_policy=ForceMergesOnlyMergePolicy(),
    )
    v = _vectors(N, seed=34)
    _ingest_two_segments(idx, v)
    q = _vectors(4, seed=35)
    truth = ground_truth_topk(q, v, 1, SimilarityFunction.EUCLIDEAN)
    res = execute_knn_query(
        idx,
        KnnQuery(vector=q, k=5, ef_search=64,
                 rescore=Rescore(oversample_factor=3.0)),
    )
    assert (res.doc_ids[:, 0] == truth[:, 0]).all()
