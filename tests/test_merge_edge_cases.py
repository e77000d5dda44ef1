"""Merge edge cases (JVectorMergeWithDeletedDocsTests coverage model):
all-deleted segments, empty-segment merges, NVQ merge recompute, incremental
vs guard-forced rebuild, leading-merge disable flag."""

import numpy as np
import pytest

from opensearch_jvector_tpu.api.config import (
    QUANT_NVQ,
    QUANT_PQ,
    DiskAnnConfig,
    SearchConfig,
)
from opensearch_jvector_tpu.index.index import VectorIndex
from opensearch_jvector_tpu.index.scheduler import ForceMergesOnlyMergePolicy
from opensearch_jvector_tpu.index.segment import read_segment
from opensearch_jvector_tpu.ops.distances import SimilarityFunction
from opensearch_jvector_tpu.utils.ground_truth import (
    ground_truth_topk,
    recall_at_k,
)

DIM = 16


def _cfg(**kw):
    base = dict(dim=DIM, similarity=SimilarityFunction.EUCLIDEAN, m=8,
                ef_construction=32, quantization_type="none")
    base.update(kw)
    return DiskAnnConfig(**base)


def _vectors(n, seed=0):
    return np.random.default_rng(seed).standard_normal((n, DIM)).astype(
        np.float32)


def test_merge_with_everything_deleted(tmp_path):
    idx = VectorIndex(tmp_path, _cfg())
    v = _vectors(200)
    for i in range(200):
        idx.add(i, v[i])
    idx.flush()
    idx.delete(list(range(200)))
    idx.force_merge()
    assert idx.doc_count() == 0
    res = idx.search(_vectors(2, seed=1), SearchConfig(k=5, ef_search=32))
    assert (res.doc_ids == -1).all()
    # the index keeps working after new ingest
    for i in range(200, 260):
        idx.add(i, v[i % 200])
    idx.flush()
    res = idx.search(v[7], SearchConfig(k=3, ef_search=32))
    assert (res.doc_ids[0] >= 200).all()


def test_merge_mixed_deleted_segments(tmp_path):
    idx = VectorIndex(tmp_path, _cfg())
    v = _vectors(400, seed=2)
    for i in range(200):
        idx.add(i, v[i])
    idx.flush()
    for i in range(200, 400):
        idx.add(i, v[i])
    idx.flush()
    idx.delete(list(range(0, 200)))  # first segment fully dead
    idx.force_merge()
    assert len(idx.segment_names) == 1
    assert idx.doc_count() == 200
    res = idx.search(v[250], SearchConfig(k=3, ef_search=32))
    assert res.doc_ids[0][0] == 250


def test_nvq_merge_recomputes(tmp_path):
    cfg = _cfg(quantization_type=QUANT_NVQ,
               min_batch_size_for_quantization=128, num_pq_subspaces=4)
    idx = VectorIndex(tmp_path, cfg)
    v = _vectors(300, seed=3)
    for i in range(150):
        idx.add(i, v[i])
    idx.flush()
    for i in range(150, 300):
        idx.add(i, v[i])
    idx.flush()
    idx.force_merge()
    seg = read_segment(tmp_path / idx.segment_names[0])
    assert seg.nvq is not None  # recomputed over the merged corpus
    assert seg.docmap.num_ordinals == 300  # recomputed over merged corpus
    res = idx.search(v[200], SearchConfig(k=3, ef_search=48))
    assert res.doc_ids[0][0] == 200


def test_leading_merge_disabled_forces_rebuild(tmp_path):
    cfg = _cfg(quantization_type=QUANT_PQ,
               min_batch_size_for_quantization=128, num_pq_subspaces=4,
               leading_segment_merge_disabled=True)
    idx = VectorIndex(tmp_path, cfg)
    v = _vectors(600, seed=4)
    for i in range(500):
        idx.add(i, v[i])
    idx.flush()
    for i in range(500, 600):
        idx.add(i, v[i])
    idx.flush()
    idx.force_merge()
    seg = read_segment(tmp_path / idx.segment_names[0])
    # full rebuild compacts: used ordinals == live count (capacity is the
    # pow2 device bucket)
    assert seg.docmap.num_ordinals == 600
    res = idx.search(v[550], SearchConfig(k=3, ef_search=48))
    assert res.doc_ids[0][0] == 550


def test_incremental_merge_keeps_capacity_structure(tmp_path):
    cfg = _cfg(quantization_type=QUANT_PQ,
               min_batch_size_for_quantization=128, num_pq_subspaces=4)
    idx = VectorIndex(tmp_path, cfg)
    v = _vectors(600, seed=5)
    for i in range(500):
        idx.add(i, v[i])
    idx.flush()
    for i in range(500, 600):
        idx.add(i, v[i])
    idx.flush()
    idx.force_merge()
    seg = read_segment(tmp_path / idx.segment_names[0])
    # incremental path: leading 500 used ordinals + 100 appended
    assert seg.docmap.num_ordinals == 600
    assert seg.pqv is not None  # codebooks reused + refined, re-encoded
    assert seg.pqv.codes.shape[0] >= 600
    res = idx.search(v[550], SearchConfig(k=3, ef_search=48))
    assert res.doc_ids[0][0] == 550


def test_mixed_quantization_merge_reuses_leading_codebooks(tmp_path):
    """A PQ-trained segment merged with a below-min-batch fp32 segment:
    the leading (PQ) codebooks are reused + refined and the merged segment
    is fully PQ-encoded (JVectorWriter.mergePQ:1110-1125 reuse path)."""
    cfg = _cfg(quantization_type=QUANT_PQ,
               min_batch_size_for_quantization=256, num_pq_subspaces=4)
    idx = VectorIndex(tmp_path, cfg,
                      merge_policy=ForceMergesOnlyMergePolicy())
    v = _vectors(400, seed=21)
    for i in range(300):          # >= min batch -> PQ segment (leading)
        idx.add(i, v[i])
    idx.flush()
    for i in range(300, 400):     # < min batch -> fp32 segment
        idx.add(i, v[i])
    idx.flush()
    segs = [read_segment(tmp_path / n) for n in idx.segment_names]
    assert sorted(s.pqv is not None for s in segs) == [False, True]
    idx.force_merge()
    seg = read_segment(tmp_path / idx.segment_names[0])
    assert seg.pqv is not None
    assert seg.docmap.num_ordinals == 400  # incremental append, no compaction
    res = idx.search(v[350], SearchConfig(k=3, ef_search=48))
    assert res.doc_ids[0][0] == 350


def test_mixed_quantization_merge_trains_when_leading_fp32(tmp_path):
    """Two below-min-batch fp32 segments whose merged size crosses the
    min-batch threshold: merge trains FRESH codebooks
    (JVectorWriter.mergePQ:1088-1100 train path)."""
    cfg = _cfg(quantization_type=QUANT_PQ,
               min_batch_size_for_quantization=256, num_pq_subspaces=4)
    idx = VectorIndex(tmp_path, cfg,
                      merge_policy=ForceMergesOnlyMergePolicy())
    v = _vectors(400, seed=22)
    for i in range(200):
        idx.add(i, v[i])
    idx.flush()
    for i in range(200, 400):
        idx.add(i, v[i])
    idx.flush()
    segs = [read_segment(tmp_path / n) for n in idx.segment_names]
    assert all(s.pqv is None for s in segs)  # both below min batch
    idx.force_merge()
    seg = read_segment(tmp_path / idx.segment_names[0])
    assert seg.pqv is not None  # 400 >= 256 -> trained on merge
    res = idx.search(v[123], SearchConfig(k=3, ef_search=48))
    assert res.doc_ids[0][0] == 123


def test_low_density_leading_forces_compacting_rebuild(tmp_path):
    """Deleting most of the leading segment trips the density < 0.4 guard
    (JVectorWriter.java:1202-1222): the merge falls back to a full rebuild
    whose ordinal space is compacted to the live docs."""
    idx = VectorIndex(tmp_path, _cfg(),
                      merge_policy=ForceMergesOnlyMergePolicy())
    v = _vectors(500, seed=23)
    for i in range(400):
        idx.add(i, v[i])
    idx.flush()
    for i in range(400, 500):
        idx.add(i, v[i])
    idx.flush()
    idx.delete(list(range(0, 300)))  # leading density 100/400 = 0.25
    idx.force_merge()
    seg = read_segment(tmp_path / idx.segment_names[0])
    assert seg.docmap.num_ordinals == 200  # compacted: 100 + 100 live
    assert seg.live_count() == 200
    assert idx.doc_count() == 200
    truth = ground_truth_topk(v[:8], v[300:], 5,
                              SimilarityFunction.EUCLIDEAN)
    res = idx.search(v[:8], SearchConfig(k=5, ef_search=64))
    assert recall_at_k(res.doc_ids, truth + 300, 5) >= 0.85


@pytest.mark.slow  # stress-tier: repeated-cycle torture; merge+delete correctness is
# guarded fast by the lifecycle oracles and test_deletes_cleanup
def test_repeated_merge_delete_cycles(tmp_path):
    """Churn: repeated (ingest -> delete -> force_merge) cycles keep the
    doc count exact and recall high — the long-haul shape of the
    reference's merge+deletes suites."""
    idx = VectorIndex(tmp_path, _cfg(),
                      merge_policy=ForceMergesOnlyMergePolicy())
    rng = np.random.default_rng(24)
    alive: dict[int, np.ndarray] = {}
    next_id = 0
    for cycle in range(3):
        vecs = rng.standard_normal((150, DIM)).astype(np.float32)
        for row in vecs:
            idx.add(next_id, row)
            alive[next_id] = row
            next_id += 1
        idx.flush()
        doomed = rng.choice(sorted(alive), size=40, replace=False)
        idx.delete([int(d) for d in doomed])
        for d in doomed:
            del alive[int(d)]
        idx.force_merge()
        assert len(idx.segment_names) == 1
        assert idx.doc_count() == len(alive)
    ids = np.array(sorted(alive))
    corpus = np.stack([alive[int(i)] for i in ids])
    q = rng.standard_normal((8, DIM)).astype(np.float32)
    truth = ground_truth_topk(q, corpus, 10, SimilarityFunction.EUCLIDEAN)
    res = idx.search(q, SearchConfig(k=10, ef_search=64))
    assert recall_at_k(res.doc_ids, ids[truth], 10) >= 0.85


def test_sorted_flush_then_merge_keeps_mapping(tmp_path):
    """Index sorting at flush (sort_map) composes with a later merge: the
    merged docmap still points each vector at its SORTED doc id."""
    idx = VectorIndex(tmp_path, _cfg(),
                      merge_policy=ForceMergesOnlyMergePolicy())
    v = _vectors(100, seed=25)
    for i in range(100):
        idx.add(i, v[i])
    sort_map = np.arange(100)[::-1].copy()  # old doc i -> new doc 99-i
    idx.flush(sort_map=sort_map)
    for i in range(100, 150):
        idx.add(i, v[i % 100] + 2.0)
    idx.flush()
    idx.force_merge()
    # vector v[i] now lives at doc id 99-i; nearest to v[30] must be doc 69
    res = idx.search(v[30], SearchConfig(k=3, ef_search=48))
    assert res.doc_ids[0][0] == 69
    got = idx.get_vector(69)
    np.testing.assert_allclose(got, v[30], rtol=1e-6)


def test_tiered_policy_background_merge_concurrent_with_ingest(tmp_path):
    """Background merges run on the niced merge pool while ingest continues
    (JVectorFormat.java:197-212 scheduler parity); ForceMergesOnly stays the
    deterministic default."""
    from opensearch_jvector_tpu.api.config import SearchConfig
    from opensearch_jvector_tpu.index.scheduler import TieredMergePolicy
    from opensearch_jvector_tpu.utils.ground_truth import (
        ground_truth_topk,
        recall_at_k,
    )

    idx = VectorIndex(
        tmp_path, _cfg(),
        merge_policy=TieredMergePolicy(max_segments=2, merge_factor=3),
    )
    v = _vectors(600, seed=11)
    # 6 flushes of 100 docs each; merges fire automatically from flush 3 on,
    # while later adds/flushes keep arriving
    for chunk in range(6):
        for i in range(chunk * 100, (chunk + 1) * 100):
            idx.add(i, v[i])
        idx.flush()
        # searches are served from a stable snapshot mid-merge
        res = idx.search(v[:4], SearchConfig(k=3, ef_search=32))
        assert (res.doc_ids[np.arange(4), 0] == np.arange(4)).all()
    idx.await_merges()
    assert len(idx.segment_names) < 6  # compaction actually happened
    assert idx.doc_count() == 600

    q = _vectors(8, seed=12)
    truth = ground_truth_topk(q, v, 10, SimilarityFunction.EUCLIDEAN)
    res = idx.search(q, SearchConfig(k=10, ef_search=64))
    assert recall_at_k(res.doc_ids, truth, 10) >= 0.85

    # deletes racing a merge stay masked either way
    idx.delete([5, 6])
    for i in range(600, 700):
        idx.add(i, v[i % 600] + 1.0)
    idx.flush()
    idx.await_merges()
    res = idx.search(v[5], SearchConfig(k=5, ef_search=32))
    assert 5 not in res.doc_ids[0].tolist()
    assert idx.doc_count() == 698


def test_force_merges_only_policy_never_auto_merges(tmp_path):
    # the deterministic test/bench override (reference polarity:
    # ForceMergesOnlyMergePolicy.java:20-23); passed EXPLICITLY since the
    # production default is TieredMergePolicy
    idx = VectorIndex(tmp_path, _cfg(),
                      merge_policy=ForceMergesOnlyMergePolicy())
    v = _vectors(300, seed=13)
    for chunk in range(6):
        for i in range(chunk * 50, (chunk + 1) * 50):
            idx.add(i, v[i])
        idx.flush()
    idx.await_merges()
    assert len(idx.segment_names) == 6  # untouched until force_merge
    idx.force_merge()
    assert len(idx.segment_names) == 1


def test_default_policy_background_compaction(tmp_path):
    """The production DEFAULT policy compacts segments in the background
    (reference rides Lucene's tiered scheduler by default): a churn of
    small flushes never accumulates segments without bound, and results
    stay correct through the auto-merges."""
    idx = VectorIndex(tmp_path, _cfg())  # default = TieredMergePolicy
    assert getattr(idx.merge_policy, "auto", False)
    v = _vectors(400, seed=17)
    for chunk in range(8):
        for i in range(chunk * 50, (chunk + 1) * 50):
            idx.add(i, v[i])
        idx.flush()
    idx.await_merges()
    assert len(idx.segment_names) <= idx.merge_policy.max_segments + 1
    assert idx.doc_count() == 400
    truth = ground_truth_topk(v[:8], v, 5, SimilarityFunction.EUCLIDEAN)
    res = idx.search(v[:8], SearchConfig(k=5, ef_search=64))
    assert recall_at_k(res.doc_ids, truth, 5) >= 0.85
