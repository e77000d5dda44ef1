"""Script-score query path (painless knn_score engine parity)."""

import json
import http.client

import numpy as np
import pytest

from opensearch_jvector_tpu.api.config import DiskAnnConfig
from opensearch_jvector_tpu.index.index import VectorIndex
from opensearch_jvector_tpu.ops.distances import SimilarityFunction
from opensearch_jvector_tpu.query import knn
from opensearch_jvector_tpu.service.http import KnnService

DIM = 16


def test_execute_script_score_all_spaces(tmp_path):
    idx = VectorIndex(tmp_path, DiskAnnConfig(
        dim=DIM, m=8, ef_construction=32, quantization_type="none"))
    rng = np.random.default_rng(0)
    v = rng.standard_normal((300, DIM)).astype(np.float32)
    for i in range(300):
        idx.add(i, v[i])
    idx.flush()
    q = v[42] + 0.001
    for space in ("l2", "l1", "linf", "innerproduct", "cosinesimil"):
        res = knn.execute_script_score(idx, space, q, k=5)
        if space in ("l2", "l1", "linf", "cosinesimil"):
            assert res.doc_ids[0][0] == 42, space
        assert (res.scores[0][:-1] >= res.scores[0][1:]).all()
    # deletes respected
    idx.delete(42)
    res = knn.execute_script_score(idx, "l2", q, k=5)
    assert 42 not in res.doc_ids[0]


def test_script_score_over_rest(tmp_path):
    svc = KnnService(tmp_path)
    svc.start()
    try:
        def req(method, path, body=None):
            conn = http.client.HTTPConnection("127.0.0.1", svc.port,
                                              timeout=300)
            conn.request(method, path,
                         json.dumps(body) if body is not None else None)
            r = conn.getresponse()
            out = json.loads(r.read())
            conn.close()
            return r.status, out

        rng = np.random.default_rng(1)
        v = rng.standard_normal((200, DIM)).astype(np.float32)
        req("PUT", "/s", {"mappings": {"properties": {"vec": {
            "type": "knn_vector", "dimension": DIM}}}})
        req("POST", "/s/_bulk",
            {"docs": [{"_id": i, "vec": v[i].tolist()} for i in range(200)]})
        req("POST", "/s/_flush")
        status, out = req("POST", "/s/_search", {
            "size": 3,
            "query": {"script_score": {"script": {
                "source": "knn_score", "lang": "knn",
                "params": {"field": "vec", "query_value": v[9].tolist(),
                           "space_type": "l1"},
            }}},
        })
        assert status == 200
        assert out["hits"]["hits"][0]["_id"] == 9
        # non-allowlisted script rejected
        status, _ = req("POST", "/s/_search", {
            "query": {"script_score": {"script": {
                "source": "evil_script", "params": {}}}},
        })
        assert status == 400
    finally:
        svc.stop()
