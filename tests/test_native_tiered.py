"""Native paged store + tiered (larger-than-memory) reader-path tests."""

import numpy as np
import pytest

from opensearch_jvector_tpu.api.config import DiskAnnConfig, SearchConfig
from opensearch_jvector_tpu.index.reader import SegmentReader
from opensearch_jvector_tpu.index.segment import read_segment, write_segment
from opensearch_jvector_tpu.index.writer import IndexWriter
from opensearch_jvector_tpu.ops.distances import SimilarityFunction
from opensearch_jvector_tpu.utils import native_store
from opensearch_jvector_tpu.utils.ground_truth import ground_truth_topk, recall_at_k


def test_native_store_gather(tmp_path):
    rng = np.random.default_rng(0)
    v = rng.standard_normal((500, 32)).astype(np.float32)
    p = tmp_path / "rows.f32"
    native_store.write_row_file(p, v)
    store = native_store.PagedVectorStore(p, dim=32)
    assert store.num_rows == 500
    ids = np.asarray([3, 499, 0, 123, -1, 600])  # incl. out-of-range
    store.prefetch(ids)
    out = store.gather(ids)
    np.testing.assert_array_equal(out[0], v[3])
    np.testing.assert_array_equal(out[1], v[499])
    np.testing.assert_array_equal(out[3], v[123])
    assert (out[4] == 0).all() and (out[5] == 0).all()
    store.close()


def test_native_library_builds():
    # the C++ library must actually compile in this image (the numpy
    # fallback exists for hostile environments, not for CI)
    assert native_store.native_available()


def test_tiered_reader_path_recall(tmp_path):
    """on_disk mode through the PRODUCTION reader: device holds graph + PQ
    codes; fp32 rows are paged from the native host store for rerank."""
    rng = np.random.default_rng(1)
    n, d, qn, k = 1000, 32, 16, 10
    v = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((qn, d)).astype(np.float32)
    cfg = DiskAnnConfig(
        dim=d, similarity=SimilarityFunction.EUCLIDEAN, m=16,
        ef_construction=48, quantization_type="pq", num_pq_subspaces=8,
        min_batch_size_for_quantization=64, mode="on_disk",
    )
    writer = IndexWriter(tmp_path, cfg)
    for i in range(n):
        writer.add_document(i, v[i])
    path = writer.flush()

    seg = read_segment(path)
    assert seg.row_store is not None and seg.vectors is None  # host tier
    reader = SegmentReader(seg)
    res = reader.search(q, SearchConfig(k=k, ef_search=96))
    truth = ground_truth_topk(q, v, k, SimilarityFunction.EUCLIDEAN)
    rec = recall_at_k(res.doc_ids, truth, k)
    assert rec >= 0.85, rec
    assert res.reranked > 0
