"""Codec-level behavior cells from the reference's KNNJVectorTests matrix
(KNNJVectorTests.java:73-1660): MIP / cosine end-to-end, sparse doc ids
(missing-field analog), delete-then-readd updates, reopen + continue
ingest, merge with a doc updated across segments.

Sizes stay in the shared dim-16 / m-8 program family (single-core CI host:
XLA traces dominate, so new cells reuse existing compiled families).
"""

import numpy as np
import pytest

from opensearch_jvector_tpu.api.config import DiskAnnConfig, SearchConfig
from opensearch_jvector_tpu.index.index import VectorIndex
from opensearch_jvector_tpu.ops.distances import SimilarityFunction
from opensearch_jvector_tpu.utils.ground_truth import (
    ground_truth_topk,
    recall_at_k,
)

DIM = 16


def _cfg(simf=SimilarityFunction.EUCLIDEAN, **kw):
    base = dict(dim=DIM, similarity=simf, m=8, ef_construction=32,
                quantization_type="none")
    base.update(kw)
    return DiskAnnConfig(**base)


def _vectors(n, seed=0):
    return np.random.default_rng(seed).standard_normal((n, DIM)).astype(
        np.float32)


def test_mip_end_to_end(tmp_path):
    """Max-inner-product search through the full index stack; jVector
    DOT_PRODUCT score convention (1+dot)/2 ordering vs brute force
    (KNNJVectorTests MIP cases; score fixup JVectorReader.java:221-240)."""
    simf = SimilarityFunction.DOT_PRODUCT
    idx = VectorIndex(tmp_path, _cfg(simf))
    v = _vectors(400, seed=1)
    # give vectors distinct norms so MIP ordering != cosine ordering
    v *= np.linspace(0.5, 2.0, 400)[:, None].astype(np.float32)
    for i in range(400):
        idx.add(i, v[i])
    idx.flush()
    q = _vectors(8, seed=2)
    truth = ground_truth_topk(q, v, 10, simf)
    res = idx.search(q, SearchConfig(k=10, ef_search=96))
    assert recall_at_k(res.doc_ids, truth, 10) >= 0.9
    # top-1 exact-MIP agreement on the easy top hit
    dots = q @ v.T
    np.testing.assert_array_equal(res.doc_ids[:, 0], dots.argmax(axis=1))


def test_cosine_end_to_end(tmp_path):
    simf = SimilarityFunction.COSINE
    idx = VectorIndex(tmp_path, _cfg(simf))
    v = _vectors(400, seed=3) * np.linspace(
        0.1, 10.0, 400)[:, None].astype(np.float32)  # norms must not matter
    for i in range(400):
        idx.add(i, v[i])
    idx.flush()
    q = _vectors(8, seed=4)
    truth = ground_truth_topk(q, v, 10, simf)
    res = idx.search(q, SearchConfig(k=10, ef_search=96))
    assert recall_at_k(res.doc_ids, truth, 10) >= 0.9


def test_sparse_doc_ids(tmp_path):
    """Doc-id space with large gaps (docs without vectors never enter the
    index — the reference's missing-field case, KNNJVectorTests
    testMissingFields): mapping survives flush, search, delete, merge."""
    idx = VectorIndex(tmp_path, _cfg())
    v = _vectors(50, seed=5)
    doc_ids = (np.arange(50) * 977 + 13).tolist()  # sparse, non-contiguous
    for i, d in enumerate(doc_ids):
        idx.add(d, v[i])
    idx.flush()
    res = idx.search(v[7], SearchConfig(k=3, ef_search=32))
    assert res.doc_ids[0][0] == doc_ids[7]
    idx.delete(doc_ids[7])
    res = idx.search(v[7], SearchConfig(k=3, ef_search=32))
    assert doc_ids[7] not in res.doc_ids[0].tolist()
    idx.force_merge()
    assert idx.doc_count() == 49
    res = idx.search(v[8], SearchConfig(k=3, ef_search=32))
    assert res.doc_ids[0][0] == doc_ids[8]


def test_delete_then_readd_same_doc(tmp_path):
    """Update semantics: delete + re-add under the same doc id, across a
    flush boundary; the newest vector wins after merge."""
    idx = VectorIndex(tmp_path, _cfg())
    v = _vectors(100, seed=6)
    for i in range(100):
        idx.add(i, v[i])
    idx.flush()
    new7 = (v[50] + 0.01).astype(np.float32)  # doc 7 moves near doc 50
    idx.delete(7)
    idx.add(7, new7)
    idx.flush()
    res = idx.search(new7, SearchConfig(k=2, ef_search=32))
    assert res.doc_ids[0][0] == 7  # the NEW vector is what's found
    old_hits = idx.search(v[7], SearchConfig(k=1, ef_search=32))
    assert old_hits.doc_ids[0][0] != 7  # the old location is gone
    idx.force_merge()
    assert idx.doc_count() == 100
    res = idx.search(new7, SearchConfig(k=2, ef_search=32))
    assert res.doc_ids[0][0] == 7


@pytest.mark.slow  # 27s cell; reopen stays fast-covered by
# test_reopen_from_commit + the reopen-tier matrix
def test_reopen_continue_ingest_and_merge(tmp_path):
    """Commit-model lifecycle: reopen from commits.json, keep ingesting,
    merge across the reopen boundary (restart-upgrade IndexingIT intent)."""
    idx = VectorIndex(tmp_path, _cfg())
    v = _vectors(300, seed=7)
    for i in range(150):
        idx.add(i, v[i])
    idx.flush()
    idx.delete([3])
    del idx

    idx2 = VectorIndex(tmp_path)  # restored: config + segments + tombstones
    assert idx2.doc_count() == 149
    for i in range(150, 300):
        idx2.add(i, v[i])
    idx2.flush()
    idx2.force_merge()
    assert idx2.doc_count() == 299
    q = _vectors(8, seed=8)
    live_mask = np.ones(300, bool)
    live_mask[3] = False
    truth = ground_truth_topk(q[..., :], v[live_mask], 10,
                              SimilarityFunction.EUCLIDEAN)
    # map truth back to original doc ids (3 removed shifts ids >= 3 by one)
    orig = np.nonzero(live_mask)[0]
    truth = orig[truth]
    res = idx2.search(q, SearchConfig(k=10, ef_search=64))
    assert recall_at_k(res.doc_ids, truth, 10) >= 0.85
    assert 3 not in res.doc_ids.reshape(-1).tolist()


def test_duplicate_vectors_and_tiny_corpus(tmp_path):
    """Degenerate inputs: n=1 corpus, all-identical vectors, k > n."""
    idx = VectorIndex(tmp_path / "one", _cfg())
    idx.add(42, np.ones(DIM, np.float32))
    idx.flush()
    res = idx.search(np.ones(DIM, np.float32), SearchConfig(k=5, ef_search=8))
    assert res.doc_ids[0][0] == 42
    assert (res.doc_ids[0][1:] == -1).all()  # k > corpus pads with -1

    idx2 = VectorIndex(tmp_path / "dup", _cfg())
    for i in range(20):
        idx2.add(i, np.ones(DIM, np.float32))  # identical vectors
    idx2.flush()
    res = idx2.search(np.ones(DIM, np.float32),
                      SearchConfig(k=10, ef_search=32))
    ids = res.doc_ids[0]
    assert (ids >= 0).all() and len(set(ids.tolist())) == 10  # deduped ids


def test_every_byte_flip_is_caught_by_check_integrity(tmp_path):
    """Corruption fuzz (CodecUtil-footer parity): flipping ANY byte of ANY
    committed segment file — containers, raw on_disk row file, or its CRC
    sidecar — must surface as CorruptSegmentError from check_integrity,
    never pass silently. Truncation too."""
    from opensearch_jvector_tpu.index.segment import check_integrity
    from opensearch_jvector_tpu.index.store import CorruptSegmentError

    rng = np.random.default_rng(33)
    v = _vectors(300, seed=33)
    cfg = _cfg(mode="on_disk", quantization_type="pq", num_pq_subspaces=4,
               min_batch_size_for_quantization=64)
    idx = VectorIndex(tmp_path, cfg)
    idx.add_batch(np.arange(300), v)
    idx.flush()
    seg_dir = tmp_path / idx.segment_names[0]
    idx.close()

    files = sorted(
        list(seg_dir.glob("*.jvtpu")) + list(seg_dir.glob("*.f32"))
        + list(seg_dir.glob("*.f32.crc"))
    )
    assert any(f.suffix == ".jvtpu" for f in files)
    assert any(f.name.endswith(".f32") for f in files)
    assert any(f.name.endswith(".crc") for f in files)
    assert check_integrity(seg_dir)

    for f in files:
        raw = bytearray(f.read_bytes())
        offsets = rng.integers(0, len(raw), size=min(12, len(raw)))
        for off in np.unique(offsets):
            orig = raw[off]
            raw[off] = orig ^ 0xA5
            f.write_bytes(bytes(raw))
            with pytest.raises(CorruptSegmentError):
                check_integrity(seg_dir)
            raw[off] = orig
        # truncation by one byte must also be caught
        f.write_bytes(bytes(raw[:-1]))
        with pytest.raises(CorruptSegmentError):
            check_integrity(seg_dir)
        f.write_bytes(bytes(raw))

    assert check_integrity(seg_dir)  # restored tree verifies clean
