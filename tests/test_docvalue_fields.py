"""docvalue_fields REST coverage: vectors re-read from index storage.

Models the reference's DocValueFieldsIT.java (2,239 LoC): doc-value
vector retrieval through _search — with knn / match_all queries, multiple
vector fields, deletes, force-merge, pagination, missing fields, custom
format rejection, and nested (collapse vs expand) hits. Vectors are
stored ONCE in the segment (derived source, codec/derivedsource/) and
re-injected at read time via VectorIndex.get_vectors."""

import http.client
import json

import numpy as np
import pytest

from opensearch_jvector_tpu.service.http import KnnService

DIM = 16


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    svc = KnnService(tmp_path_factory.mktemp("dvsvc"))
    svc.start()
    yield svc
    svc.stop()


def _req(svc, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", svc.port, timeout=300)
    conn.request(method, path, json.dumps(body) if body is not None else None,
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    data = json.loads(r.read())
    conn.close()
    return r.status, data


def _mapping(*names):
    return {"mappings": {"properties": {n: {
        "type": "knn_vector", "dimension": DIM, "space_type": "l2",
        "method": {"name": "disk_ann", "engine": "jvector",
                   "parameters": {"m": 8, "ef_construction": 32}},
    } for n in names}}}


@pytest.fixture(scope="module")
def corpus(service):
    """120 docs in field `vec`; docs 0..59 also carry `aux`."""
    rng = np.random.default_rng(3)
    v = rng.standard_normal((120, DIM)).astype(np.float32)
    a = rng.standard_normal((60, DIM)).astype(np.float32)
    status, _ = _req(service, "PUT", "/dv", _mapping("vec", "aux"))
    assert status == 200
    docs = []
    for i in range(120):
        d = {"_id": i, "vec": v[i].tolist()}
        if i < 60:
            d["aux"] = a[i].tolist()
        docs.append(d)
    status, out = _req(service, "POST", "/dv/_bulk", {"docs": docs})
    assert status == 200 and out["indexed"] == 120
    status, _ = _req(service, "POST", "/dv/_flush")
    assert status == 200
    return v, a


def test_knn_hits_carry_docvalue_vectors(service, corpus):
    """testDocValueFields_withKnnQuery_topK + vectorValuesMatchSource."""
    v, _ = corpus
    status, out = _req(service, "POST", "/dv/_search", {
        "size": 5, "docvalue_fields": ["vec"],
        "query": {"knn": {"vec": {"vector": v[7].tolist(), "k": 5}}},
    })
    assert status == 200
    hits = out["hits"]["hits"]
    assert hits[0]["_id"] == 7
    for h in hits:
        got = np.asarray(h["fields"]["vec"][0], np.float32)
        np.testing.assert_allclose(got, v[h["_id"]], rtol=1e-6)


def test_match_all_returns_all_docs_with_vectors(service, corpus):
    """testDocValueFields_withMatchAllQuery."""
    v, _ = corpus
    status, out = _req(service, "POST", "/dv/_search", {
        "size": 200, "docvalue_fields": ["vec"],
        "query": {"match_all": {}},
    })
    assert status == 200
    assert out["hits"]["total"]["value"] == 120
    hits = out["hits"]["hits"]
    assert [h["_id"] for h in hits] == list(range(120))
    got = np.asarray(hits[41]["fields"]["vec"][0], np.float32)
    np.testing.assert_allclose(got, v[41], rtol=1e-6)


def test_multiple_vector_fields_and_missing_field(service, corpus):
    """testDocValueFields_multipleVectorFields +
    testDocValueFields_docsWithoutVectorField_returnsEmptyFields: docs
    60+ have no `aux` vector, so their hits carry no aux entry."""
    v, a = corpus
    status, out = _req(service, "POST", "/dv/_search", {
        "size": 120, "docvalue_fields": ["vec", "aux"],
        "query": {"match_all": {}},
    })
    assert status == 200
    for h in out["hits"]["hits"]:
        d = h["_id"]
        assert "vec" in h["fields"]
        if d < 60:
            np.testing.assert_allclose(
                np.asarray(h["fields"]["aux"][0], np.float32), a[d],
                rtol=1e-6)
        else:
            assert "aux" not in h["fields"]


def test_pagination_with_from(service, corpus):
    """testDocValueFields_paginationWithFrom: two pages tile, no overlap."""
    status, p1 = _req(service, "POST", "/dv/_search", {
        "size": 40, "from": 0, "docvalue_fields": ["vec"],
        "query": {"match_all": {}},
    })
    status2, p2 = _req(service, "POST", "/dv/_search", {
        "size": 40, "from": 40, "docvalue_fields": ["vec"],
        "query": {"match_all": {}},
    })
    assert status == 200 and status2 == 200
    ids1 = [h["_id"] for h in p1["hits"]["hits"]]
    ids2 = [h["_id"] for h in p2["hits"]["hits"]]
    assert len(ids1) == len(ids2) == 40
    assert not set(ids1) & set(ids2)
    assert ids1 + ids2 == list(range(80))

    # knn pagination: from skips the best hits
    v, _ = corpus
    _, full = _req(service, "POST", "/dv/_search", {
        "size": 10, "query": {"knn": {"vec": {"vector": v[7].tolist(),
                                              "k": 10}}},
    })
    _, page = _req(service, "POST", "/dv/_search", {
        "size": 5, "from": 5,
        "query": {"knn": {"vec": {"vector": v[7].tolist(), "k": 10}}},
    })
    assert ([h["_id"] for h in page["hits"]["hits"]]
            == [h["_id"] for h in full["hits"]["hits"]][5:10])


def test_custom_format_rejected(service, corpus):
    """testDocValueFields_customFormat_throwsError."""
    v, _ = corpus
    status, out = _req(service, "POST", "/dv/_search", {
        "size": 5,
        "docvalue_fields": [{"field": "vec", "format": "use_field_mapping"}],
        "query": {"knn": {"vec": {"vector": v[0].tolist(), "k": 5}}},
    })
    assert status == 400
    assert "format" in out["error"]


def test_unmapped_docvalue_field_silently_omitted(service, corpus):
    v, _ = corpus
    status, out = _req(service, "POST", "/dv/_search", {
        "size": 3, "docvalue_fields": ["vec", "nope"],
        "query": {"knn": {"vec": {"vector": v[0].tolist(), "k": 3}}},
    })
    assert status == 200
    for h in out["hits"]["hits"]:
        assert "nope" not in h.get("fields", {})
        assert "vec" in h["fields"]


def test_empty_index_match_all_returns_empty(service):
    """testDocValueFields_emptyIndex_returnsEmptyHits."""
    status, _ = _req(service, "PUT", "/dvempty", _mapping("vec"))
    assert status == 200
    status, out = _req(service, "POST", "/dvempty/_search", {
        "size": 10, "docvalue_fields": ["vec"], "query": {"match_all": {}},
    })
    assert status == 200
    assert out["hits"]["total"]["value"] == 0
    assert out["hits"]["hits"] == []


def test_deleted_docs_leave_no_ghost_vectors(service):
    """testDocValueFields_afterDocDeletion_noGhostVectors +
    afterForcemerge_returnsCorrectly."""
    rng = np.random.default_rng(9)
    v = rng.standard_normal((80, DIM)).astype(np.float32)
    status, _ = _req(service, "PUT", "/dvdel", _mapping("vec"))
    assert status == 200
    docs = [{"_id": i, "vec": v[i].tolist()} for i in range(80)]
    _req(service, "POST", "/dvdel/_bulk", {"docs": docs})
    _req(service, "POST", "/dvdel/_flush")
    for d in (3, 4, 5):
        status, _ = _req(service, "DELETE", f"/dvdel/_doc/{d}")
        assert status == 200
    status, out = _req(service, "POST", "/dvdel/_search", {
        "size": 100, "docvalue_fields": ["vec"], "query": {"match_all": {}},
    })
    ids = [h["_id"] for h in out["hits"]["hits"]]
    assert out["hits"]["total"]["value"] == 77
    assert not {3, 4, 5} & set(ids)
    # after force-merge the same holds and vectors still match
    status, _ = _req(service, "POST", "/dvdel/_forcemerge")
    assert status == 200
    status, out = _req(service, "POST", "/dvdel/_search", {
        "size": 100, "docvalue_fields": ["vec"], "query": {"match_all": {}},
    })
    assert out["hits"]["total"]["value"] == 77
    for h in out["hits"]["hits"][:10]:
        np.testing.assert_allclose(
            np.asarray(h["fields"]["vec"][0], np.float32), v[h["_id"]],
            rtol=1e-6)


def test_script_score_hits_carry_docvalues(service, corpus):
    """testDocValueFields_scriptScoreQuery analog (exact scoring path)."""
    v, _ = corpus
    status, out = _req(service, "POST", "/dv/_search", {
        "size": 4, "docvalue_fields": ["vec"],
        "query": {"script_score": {"script": {
            "source": "knn_score", "lang": "knn",
            "params": {"field": "vec", "query_value": v[11].tolist(),
                       "space_type": "l2"}}}},
    })
    assert status == 200
    hits = out["hits"]["hits"]
    assert hits[0]["_id"] == 11
    np.testing.assert_allclose(
        np.asarray(hits[0]["fields"]["vec"][0], np.float32), v[11],
        rtol=1e-6)


def test_batched_queries_one_readback_per_field(service, corpus):
    """Batched (msearch-style) surface: every response's hits carry doc
    values; the read-back is one bulk get_vectors per field."""
    v, _ = corpus
    status, out = _req(service, "POST", "/dv/_search", {
        "size": 3, "docvalue_fields": ["vec"],
        "query": {"knn": {"vec": {
            "vector": [v[5].tolist(), v[9].tolist()], "k": 3}}},
    })
    assert status == 200
    assert len(out["responses"]) == 2
    for r, want in zip(out["responses"], (5, 9)):
        h = r["hits"]["hits"][0]
        assert h["_id"] == want
        np.testing.assert_allclose(
            np.asarray(h["fields"]["vec"][0], np.float32), v[want],
            rtol=1e-6)


def test_nested_collapse_empty_expand_returns_child_vectors(service):
    """testDocValueFields_nestedField_topLevelReturnsEmpty +
    nestedField_innerHitsReturnsVector: collapsed parent hits have no
    stored vector (parents are not vector docs); expand_nested hits are
    child docs whose vectors round-trip."""
    rng = np.random.default_rng(13)
    centers = rng.standard_normal((20, DIM)).astype(np.float32)
    status, _ = _req(service, "PUT", "/dvnest", _mapping("vec"))
    assert status == 200
    child, childvec = 1000, {}
    docs = []
    for parent in range(20):
        for _ in range(3):
            cv = centers[parent] + 0.05 * rng.standard_normal(DIM).astype(
                np.float32)
            docs.append({"_id": child, "_parent": parent,
                         "vec": cv.tolist()})
            childvec[child] = cv
            child += 1
    status, out = _req(service, "POST", "/dvnest/_bulk", {"docs": docs})
    assert status == 200 and out["indexed"] == 60
    _req(service, "POST", "/dvnest/_flush")

    status, out = _req(service, "POST", "/dvnest/_search", {
        "size": 3, "docvalue_fields": ["vec"],
        "query": {"knn": {"vec": {"vector": centers[4].tolist(), "k": 3}}},
    })
    assert status == 200
    hits = out["hits"]["hits"]
    assert hits[0]["_id"] == 4  # collapsed to parent ids
    for h in hits:
        assert "fields" not in h  # parents carry no stored vector

    status, out = _req(service, "POST", "/dvnest/_search", {
        "size": 3, "docvalue_fields": ["vec"],
        "query": {"knn": {"vec": {"vector": centers[4].tolist(), "k": 3,
                                  "expand_nested_docs": True}}},
    })
    assert status == 200
    for h in out["hits"]["hits"]:
        assert h["_id"] >= 1000
        np.testing.assert_allclose(
            np.asarray(h["fields"]["vec"][0], np.float32),
            childvec[h["_id"]], rtol=1e-6, atol=1e-6)


def test_get_doc_returns_derived_source(service, corpus):
    """DerivedSourceIT analog: GET /{index}/_doc/{id} re-synthesizes
    _source from index storage — every mapped field the doc carries."""
    v, a = corpus
    status, out = _req(service, "GET", "/dv/_doc/12")
    assert status == 200 and out["found"]
    np.testing.assert_allclose(
        np.asarray(out["_source"]["vec"], np.float32), v[12], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out["_source"]["aux"], np.float32), a[12], rtol=1e-6)
    # doc 100 has no aux vector: _source carries only vec
    status, out = _req(service, "GET", "/dv/_doc/100")
    assert status == 200 and set(out["_source"]) == {"vec"}
    # absent doc -> found: false, 404
    status, out = _req(service, "GET", "/dv/_doc/99999")
    assert status == 404 and out["found"] is False


def test_get_doc_after_delete_not_found(service):
    rng = np.random.default_rng(21)
    v = rng.standard_normal((40, DIM)).astype(np.float32)
    status, _ = _req(service, "PUT", "/dvget", _mapping("vec"))
    assert status == 200
    _req(service, "POST", "/dvget/_bulk", {
        "docs": [{"_id": i, "vec": v[i].tolist()} for i in range(40)]})
    _req(service, "POST", "/dvget/_flush")
    status, out = _req(service, "GET", "/dvget/_doc/5")
    assert status == 200 and out["found"]
    _req(service, "DELETE", "/dvget/_doc/5")
    status, out = _req(service, "GET", "/dvget/_doc/5")
    assert status == 404 and out["found"] is False


def test_negative_from_or_size_rejected(service, corpus):
    for bad in ({"from": -1}, {"size": -2}):
        body = {"query": {"match_all": {}}, **bad}
        status, _ = _req(service, "POST", "/dv/_search", body)
        assert status == 400
