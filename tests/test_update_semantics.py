"""Document update (re-index same _id) semantics.

Lucene's updateDocument — which OpenSearch indexing rides — replaces the
previous copy of a doc id. Reference behavior exercised all over the IT
suites (e.g. DocValueFieldsIT reindex/update-by-query cells). Here:
within one buffer the LAST add of an id wins (writer dedup at flush);
across segments the freshly flushed copy tombstones committed copies in
prior segments (same scoped-delete machinery as delete())."""

import numpy as np
import pytest

from opensearch_jvector_tpu.api.config import DiskAnnConfig, SearchConfig
from opensearch_jvector_tpu.index.index import VectorIndex
from opensearch_jvector_tpu.ops.distances import SimilarityFunction
from opensearch_jvector_tpu.parallel.distributed import ShardedVectorIndex

DIM = 16


def _cfg(**kw):
    base = dict(dim=DIM, similarity=SimilarityFunction.EUCLIDEAN, m=8,
                ef_construction=32, quantization_type="none")
    base.update(kw)
    return DiskAnnConfig(**base)


def _vectors(n, seed=0):
    return np.random.default_rng(seed).standard_normal((n, DIM)).astype(
        np.float32)


def test_readd_supersedes_committed_copy(tmp_path):
    v = _vectors(60)
    idx = VectorIndex(tmp_path, _cfg())
    for i in range(60):
        idx.add(i, v[i])
    idx.flush()
    new5 = (v[5] + 10.0).astype(np.float32)
    idx.add(5, new5)
    idx.flush()

    # the old location no longer matches doc 5; the new one does
    res = idx.search(v[5], SearchConfig(k=3, ef_search=32))
    assert 5 not in res.doc_ids[0][:1]
    res = idx.search(new5, SearchConfig(k=1, ef_search=32))
    assert int(res.doc_ids[0, 0]) == 5

    vecs, found = idx.get_vectors([5])
    assert found[0]
    np.testing.assert_allclose(vecs[0], new5, rtol=1e-6)
    assert idx.doc_count() == 60
    idx.close()


def test_buffer_duplicate_last_add_wins(tmp_path):
    v = _vectors(40, seed=1)
    idx = VectorIndex(tmp_path, _cfg())
    for i in range(40):
        idx.add(i, v[i])
    replacement = (v[7] + 5.0).astype(np.float32)
    idx.add(7, replacement)  # same buffer, before any flush
    idx.flush()
    assert idx.doc_count() == 40
    vecs, found = idx.get_vectors([7])
    assert found[0]
    np.testing.assert_allclose(vecs[0], replacement, rtol=1e-6)
    # exactly one live copy in the segment
    name = idx.segment_names[0]
    docs = idx._segment_docs(name)
    assert int((docs == 7).sum()) == 1
    idx.close()


def test_delete_then_readd_still_fresh(tmp_path):
    """Regression: scoped-delete semantics (delete, then re-add in a later
    segment) must survive the update-tombstone generalization."""
    v = _vectors(50, seed=2)
    idx = VectorIndex(tmp_path, _cfg())
    for i in range(50):
        idx.add(i, v[i])
    idx.flush()
    idx.delete([9])
    assert idx.doc_count() == 49
    idx.add(9, v[9])
    idx.flush()
    assert idx.doc_count() == 50
    res = idx.search(v[9], SearchConfig(k=1, ef_search=32))
    assert int(res.doc_ids[0, 0]) == 9
    idx.close()


def test_update_survives_merge(tmp_path):
    from opensearch_jvector_tpu.index.scheduler import (
        ForceMergesOnlyMergePolicy,
    )

    v = _vectors(80, seed=3)
    idx = VectorIndex(tmp_path, _cfg(),
                      merge_policy=ForceMergesOnlyMergePolicy())
    for i in range(80):
        idx.add(i, v[i])
    idx.flush()
    new_ids = [3, 44, 61]
    news = {d: (v[d] - 7.0).astype(np.float32) for d in new_ids}
    for d, nv in news.items():
        idx.add(d, nv)
    idx.flush()
    idx.force_merge()
    assert len(idx.segment_names) == 1
    assert idx.doc_count() == 80
    for d, nv in news.items():
        vecs, found = idx.get_vectors([d])
        assert found[0]
        np.testing.assert_allclose(vecs[0], nv, rtol=1e-6)
        res = idx.search(nv, SearchConfig(k=1, ef_search=48))
        assert int(res.doc_ids[0, 0]) == d
    idx.close()


def test_repeated_updates_latest_wins(tmp_path):
    v = _vectors(30, seed=4)
    idx = VectorIndex(tmp_path, _cfg())
    for i in range(30):
        idx.add(i, v[i])
    idx.flush()
    final = None
    for round_ in range(3):
        final = (v[11] + float(round_ + 1) * 3.0).astype(np.float32)
        idx.add(11, final)
        idx.flush()
    assert idx.doc_count() == 30
    vecs, found = idx.get_vectors([11])
    assert found[0]
    np.testing.assert_allclose(vecs[0], final, rtol=1e-6)
    idx.close()


def test_sharded_update_routes_to_same_shard(tmp_path):
    v = _vectors(200, seed=5)
    idx = ShardedVectorIndex(tmp_path, _cfg(), n_shards=4)
    for i in range(200):
        idx.add(i, v[i])
    idx.flush()
    new17 = (v[17] + 9.0).astype(np.float32)
    idx.add(17, new17)
    idx.flush()
    assert idx.doc_count() == 200
    vecs, found = idx.get_vectors([17])
    assert found[0]
    np.testing.assert_allclose(vecs[0], new17, rtol=1e-6)
    res = idx.search(new17, SearchConfig(k=1, ef_search=48))
    assert int(res.doc_ids[0, 0]) == 17
    res = idx.search(v[17], SearchConfig(k=3, ef_search=48))
    assert int(res.doc_ids[0, 0]) != 17
    idx.close()


def test_nested_child_update_same_parent(tmp_path):
    v = _vectors(10, seed=6)
    idx = VectorIndex(tmp_path, _cfg())
    # parent 0 with children 100..102
    for c in range(3):
        idx.add(100 + c, v[c], parent_id=0)
    idx.flush()
    newc = (v[1] + 4.0).astype(np.float32)
    idx.add(101, newc, parent_id=0)
    idx.flush()
    vecs, found = idx.get_vectors([101])
    assert found[0]
    np.testing.assert_allclose(vecs[0], newc, rtol=1e-6)
    # collapsed knn query still returns the parent once (collapse happens
    # in the query layer, same as the reference's nested query wrapper)
    from opensearch_jvector_tpu.query import knn
    from opensearch_jvector_tpu.query.builder import parse_knn_query

    res = knn.execute_knn_query(
        idx, parse_knn_query({"vector": newc, "k": 2}))
    ids = res.doc_ids[0]
    assert int(ids[0]) == 0
    assert int((ids == 0).sum()) == 1
    idx.close()


def test_rest_reindex_updates_doc(tmp_path):
    """REST analog of testIndexing_base64_reindexAndUpdateByQuery: POST
    the same _id again, flush, GET returns the new source and _count is
    unchanged."""
    import http.client
    import json

    from opensearch_jvector_tpu.service.http import KnnService

    svc = KnnService(tmp_path)
    svc.start()
    try:
        def req(method, path, body=None):
            conn = http.client.HTTPConnection("127.0.0.1", svc.port,
                                              timeout=300)
            conn.request(method, path,
                         json.dumps(body) if body is not None else None,
                         {"Content-Type": "application/json"})
            r = conn.getresponse()
            data = json.loads(r.read())
            conn.close()
            return r.status, data

        v = _vectors(30, seed=7)
        status, _ = req("PUT", "/upd", {"mappings": {"properties": {
            "vec": {"type": "knn_vector", "dimension": DIM,
                    "space_type": "l2",
                    "method": {"name": "disk_ann", "engine": "jvector",
                               "parameters": {"m": 8,
                                              "ef_construction": 32}}}}}})
        assert status == 200
        req("POST", "/upd/_bulk", {"docs": [
            {"_id": i, "vec": v[i].tolist()} for i in range(30)]})
        req("POST", "/upd/_flush")
        new3 = (v[3] + 6.0).astype(np.float32)
        status, _ = req("POST", "/upd/_doc/3", {"vec": new3.tolist()})
        assert status == 201
        req("POST", "/upd/_flush")
        status, out = req("GET", "/upd/_count")
        assert out["count"] == 30
        status, out = req("GET", "/upd/_doc/3")
        assert status == 200
        np.testing.assert_allclose(
            np.asarray(out["_source"]["vec"], np.float32), new3, rtol=1e-6)
    finally:
        svc.stop()
