"""Nested (parent/child) vector tests.

Models the reference's nested-doc coverage (lucenelib nested queries,
nested iterators, merge-with-nested-children tests in
JVectorMergeWithDeletedDocsTests)."""

import numpy as np
import pytest

from opensearch_jvector_tpu.api.config import DiskAnnConfig
from opensearch_jvector_tpu.index.index import VectorIndex
from opensearch_jvector_tpu.ops.distances import SimilarityFunction
from opensearch_jvector_tpu.query import knn
from opensearch_jvector_tpu.query.builder import parse_knn_query

DIM = 16


def _cfg():
    return DiskAnnConfig(dim=DIM, similarity=SimilarityFunction.EUCLIDEAN,
                         m=8, ef_construction=32, quantization_type="none")


@pytest.fixture(scope="module")
def nested_index(tmp_path_factory):
    """100 parents x 4 child vectors each; child doc ids 1000+."""
    root = tmp_path_factory.mktemp("nested")
    idx = VectorIndex(root, _cfg())
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((100, DIM)).astype(np.float32)
    child_id = 1000
    children = {}
    for parent in range(100):
        for _ in range(4):
            v = centers[parent] + 0.05 * rng.standard_normal(DIM).astype(
                np.float32)
            idx.add(child_id, v, parent_id=parent)
            children[child_id] = parent
            child_id += 1
    idx.flush()
    return idx, centers, children


def test_nested_collapses_to_parents(nested_index):
    idx, centers, children = nested_index
    assert idx.has_nested()
    q = parse_knn_query({"vector": centers[7], "k": 5})
    res = knn.execute_knn_query(idx, q)
    ids = res.doc_ids[0]
    assert ids[0] == 7  # best parent first
    valid = ids[ids >= 0]
    assert valid.size == 5
    assert len(set(valid.tolist())) == valid.size  # parents, deduped
    assert (valid < 100).all()  # parent ids, not child ids


def test_expand_nested_returns_children(nested_index):
    idx, centers, children = nested_index
    q = parse_knn_query({"vector": centers[7], "k": 8,
                         "expand_nested_docs": True})
    res = knn.execute_knn_query(idx, q)
    ids = res.doc_ids[0][res.doc_ids[0] >= 0]
    assert (ids >= 1000).all()  # raw child doc ids
    # the 4 children of parent 7 are the nearest vectors
    top4 = set(ids[:4].tolist())
    expected = {cid for cid, p in children.items() if p == 7}
    assert top4 == expected


def test_nested_survives_merge(nested_index, tmp_path):
    idx, centers, children = nested_index
    idx.force_merge()
    assert idx.has_nested()
    q = parse_knn_query({"vector": centers[13], "k": 3})
    res = knn.execute_knn_query(idx, q)
    assert res.doc_ids[0][0] == 13


def test_nested_delete_merge_matrix(tmp_path):
    """nested children x deletes x merge (JVectorMergeWithDeletedDocsTests
    cells :71-1540): parents must survive a merge that folds tombstones.

    Round-1 regression: force_merge rebuilt the DocMap without
    ord_to_parent, silently un-nesting the index after any delete+merge.
    """
    rng = np.random.default_rng(1)
    centers = rng.standard_normal((20, DIM)).astype(np.float32)
    import dataclasses

    for incremental in (True, False):
        cfg = dataclasses.replace(
            _cfg(), leading_segment_merge_disabled=not incremental)
        idx = VectorIndex(tmp_path / f"ndm_{incremental}", cfg)
        children = {}
        child_id = 1000
        for parent in range(20):
            for _ in range(3):
                v = centers[parent] + 0.05 * rng.standard_normal(
                    DIM).astype(np.float32)
                idx.add(child_id, v, parent_id=parent)
                children[child_id] = parent
                child_id += 1
        idx.flush()
        # second segment (drives a real multi-segment merge)
        for parent in range(20):
            v = centers[parent] + 0.05 * rng.standard_normal(DIM).astype(
                np.float32)
            idx.add(child_id, v, parent_id=parent)
            children[child_id] = parent
            child_id += 1
        idx.flush()

        # delete one child of parent 5 and ALL children of parent 9
        dead = [cid for cid, p in children.items() if p == 9]
        dead.append(next(cid for cid, p in children.items() if p == 5))
        idx.delete(dead)

        # before the merge: tombstones ride the accept mask
        q = parse_knn_query({"vector": centers[9], "k": 3})
        res = knn.execute_knn_query(idx, q)
        assert 9 not in res.doc_ids[0].tolist()

        idx.force_merge()
        assert idx.has_nested(), f"nested lost (incremental={incremental})"
        # parent 5 still reachable through its surviving children
        res = knn.execute_knn_query(
            idx, parse_knn_query({"vector": centers[5], "k": 3}))
        assert res.doc_ids[0][0] == 5
        assert (res.doc_ids[0][res.doc_ids[0] >= 0] < 100).all()
        # parent 9 fully deleted
        res = knn.execute_knn_query(
            idx, parse_knn_query({"vector": centers[9], "k": 5}))
        assert 9 not in res.doc_ids[0].tolist()


def test_delete_heavy_index_still_returns_k(tmp_path):
    """Tombstoned docs must not consume result slots (liveDocs parity):
    with most docs deleted, the k results are all live matches."""
    cfg = _cfg()
    idx = VectorIndex(tmp_path / "dh", cfg)
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((200, DIM)).astype(np.float32)
    for i in range(200):
        idx.add(i, vecs[i])
    idx.flush()
    idx.delete(list(range(150)))  # 75% deleted, NOT merged
    q = parse_knn_query({"vector": vecs[170], "k": 10})
    res = knn.execute_knn_query(idx, q)
    ids = res.doc_ids[0]
    assert (ids >= 0).all(), f"short results: {ids}"
    assert (ids >= 150).all()
    assert ids[0] == 170


def test_parents_of_lookup(nested_index):
    idx, _, children = nested_index
    some = np.asarray([[1000, 1001, 1399, -1]])
    p = idx.parents_of(some)
    assert p[0, 0] == children[1000]
    assert p[0, 2] == children[1399]
    assert p[0, 3] == -1
