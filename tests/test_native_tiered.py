"""Native paged store + tiered (larger-than-memory) search tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from opensearch_jvector_tpu.api.config import SearchConfig
from opensearch_jvector_tpu.index.docmap import DocMap
from opensearch_jvector_tpu.index import tiered
from opensearch_jvector_tpu.models import pq as pq_mod
from opensearch_jvector_tpu.models.builder import GraphIndexBuilder
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


def test_tiered_search_recall(tmp_path):
    rng = np.random.default_rng(1)
    n, d, qn, k = 3000, 32, 16, 10
    v = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((qn, d)).astype(np.float32)
    simf = SimilarityFunction.EUCLIDEAN
    vj = jnp.asarray(v)

    builder = GraphIndexBuilder(dim=d, max_degree=16, beam_width=48,
                                batch_size=512)
    graph = builder.build(vj, simf)
    pq = pq_mod.train_pq(vj, simf, num_subspaces=8, iters=4)
    pqv = pq_mod.PQVectors(pq=pq, codes=pq_mod.encode(pq, vj, simf))
    docmap = DocMap(np.arange(n, dtype=np.int64))

    seg = tiered.build_tiered(tmp_path, graph, pqv, docmap, v, simf)
    res = tiered.tiered_search(seg, q, SearchConfig(k=k, ef_search=96))
    truth = ground_truth_topk(q, v, k, simf)
    rec = recall_at_k(res.doc_ids, truth, k)
    assert rec >= 0.85, rec
    assert res.reranked > 0
    seg.store.close()
