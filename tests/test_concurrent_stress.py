"""Concurrent ingest + search + delete + background merge stress.

Parity target: JVectorConcurrentQueryTests (many readers, one writer) plus
the reference's implicit contract that Lucene searches serve a stable
snapshot while flushes/merges proceed. Single chip: the JAX dispatch path
is thread-safe; VectorIndex guards its segment list with a lock.
"""

import threading

import numpy as np
import pytest

from opensearch_jvector_tpu.api.config import DiskAnnConfig, SearchConfig
from opensearch_jvector_tpu.index.index import VectorIndex
from opensearch_jvector_tpu.index.scheduler import TieredMergePolicy
from opensearch_jvector_tpu.ops.distances import SimilarityFunction

DIM = 16


def test_delete_racing_inflight_flush_still_masks(tmp_path, monkeypatch):
    """A delete arriving AFTER a flush snapshotted the buffer but BEFORE it
    commits must still mask the doc in the new segment (the in-flight
    pending set). Deterministic: the builder blocks on an event so the
    delete lands inside the window."""
    from opensearch_jvector_tpu.models.builder import GraphIndexBuilder

    cfg = DiskAnnConfig(dim=DIM, similarity=SimilarityFunction.EUCLIDEAN,
                        m=8, ef_construction=32, quantization_type="none")
    idx = VectorIndex(tmp_path, cfg)
    v = np.random.default_rng(1).standard_normal((80, DIM)).astype(
        np.float32)
    for i in range(80):
        idx.add(i, v[i])

    in_build = threading.Event()
    release = threading.Event()
    orig_build = GraphIndexBuilder.build

    def slow_build(self, *a, **k):
        in_build.set()
        assert release.wait(30)
        return orig_build(self, *a, **k)

    monkeypatch.setattr(GraphIndexBuilder, "build", slow_build)
    flusher = threading.Thread(target=idx.flush)
    flusher.start()
    assert in_build.wait(30)  # buffer snapshotted, build in progress
    idx.delete([7])  # buffer already empty: must ride the pending set
    release.set()
    flusher.join(60)

    assert idx.doc_count() == 79
    res = idx.search(v[7], SearchConfig(k=3, ef_search=32))
    assert 7 not in res.doc_ids[0].tolist()
    idx.force_merge()
    assert idx.doc_count() == 79


@pytest.mark.slow  # stress-tier: reader stability under writer churn is a torture cell;
# the close-vs-ingest race and update semantics have dedicated fast cells
def test_readers_stable_while_writer_churns(tmp_path):
    cfg = DiskAnnConfig(dim=DIM, similarity=SimilarityFunction.EUCLIDEAN,
                        m=8, ef_construction=32, quantization_type="none")
    idx = VectorIndex(tmp_path, cfg,
                      merge_policy=TieredMergePolicy(max_segments=2,
                                                     merge_factor=3))
    rng = np.random.default_rng(0)
    v = rng.standard_normal((800, DIM)).astype(np.float32)
    for i in range(200):
        idx.add(i, v[i])
    idx.flush()

    stop = threading.Event()
    errors: list[Exception] = []

    def reader():
        q = v[:4]
        while not stop.is_set():
            try:
                res = idx.search(q, SearchConfig(k=5, ef_search=32))
                ids = res.doc_ids
                # every returned id is a real doc; the top hit for v[i]
                # is never a deleted doc (deletes target 100..119 only)
                assert ids.shape == (4, 5)
                live_top = ids[np.arange(4), 0]
                assert (live_top >= 0).all()
                assert not np.isin(live_top, np.arange(100, 120)).any() or (
                    not deleted_done.is_set()
                )
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                return

    deleted_done = threading.Event()
    readers = [threading.Thread(target=reader) for _ in range(3)]
    for t in readers:
        t.start()

    try:
        # writer churn: 6 flushes racing the background merges
        for chunk in range(6):
            base = 200 + chunk * 100
            for i in range(base, base + 100):
                idx.add(i, v[i % 800])
            idx.flush()
        idx.delete(list(range(100, 120)))
        deleted_done.set()
        for i in range(800, 850):
            idx.add(i, v[i % 800] + 0.5)
        idx.flush()
        idx.await_merges()
    finally:
        stop.set()
        for t in readers:
            t.join()

    assert not errors, errors[:1]
    assert idx.doc_count() == 830  # 200 + 600 + 50 - 20 deleted
    # deleted docs stay masked through every surviving segment
    res = idx.search(v[100:104], SearchConfig(k=5, ef_search=48))
    assert not np.isin(res.doc_ids, np.arange(100, 120)).any()
    idx.force_merge()
    assert idx.doc_count() == 830


def test_close_races_ingest_and_search(tmp_path):
    """close() during concurrent ingest/search: reads keep serving the
    committed snapshot, racing flushes either complete or raise the
    closed error, and the storage is quiescent afterwards (the DELETE
    /{index} precondition)."""
    rng = np.random.default_rng(41)
    cfg = DiskAnnConfig(dim=DIM, similarity=SimilarityFunction.EUCLIDEAN,
                        m=8, ef_construction=32, quantization_type="none")
    idx = VectorIndex(tmp_path, cfg,
                      merge_policy=TieredMergePolicy(max_segments=2,
                                                     merge_factor=3))
    v = rng.standard_normal((300, DIM)).astype(np.float32)
    for i in range(100):
        idx.add(i, v[i])
    idx.flush()

    stop = threading.Event()
    errors: list[BaseException] = []

    def writer():
        i = 100
        while not stop.is_set() and i < 300:
            try:
                idx.add(i, v[i])
                if i % 25 == 0:
                    idx.flush()
            except RuntimeError:
                return  # closed mid-churn: expected
            except BaseException as e:  # noqa: BLE001
                errors.append(e)
                return
            i += 1

    def reader():
        while not stop.is_set():
            try:
                res = idx.search(v[:4], SearchConfig(k=5, ef_search=32))
                assert res.doc_ids.shape == (4, 5)
            except BaseException as e:  # noqa: BLE001
                errors.append(e)
                return

    threads = [threading.Thread(target=writer),
               threading.Thread(target=reader)]
    for t in threads:
        t.start()
    try:
        idx.close()
    finally:  # a close() failure must not leave the reader spinning
        stop.set()
        for t in threads:
            t.join()
    assert not errors, errors

    with pytest.raises(RuntimeError):
        idx.flush()
    assert idx.maybe_merge() is None
    # committed state is intact and reopenable after the quiesce
    idx2 = VectorIndex(tmp_path)
    assert idx2.doc_count() >= 100
    res = idx2.search(v[3], SearchConfig(k=3, ef_search=32))
    assert res.doc_ids[0][0] == 3


@pytest.mark.slow  # stress-tier: convergence torture; update replace semantics are
# guarded fast by test_update_semantics.py
def test_concurrent_updaters_converge_to_final_versions(tmp_path):
    """Three updater threads re-index DISJOINT id ranges (several versions
    each) while flushes and tiered merges churn. After the final flush,
    every id must serve exactly its thread's LAST version — update
    tombstones must not lose copies or resurrect stale ones under
    concurrency."""
    rng = np.random.default_rng(17)
    cfg = DiskAnnConfig(dim=DIM, similarity=SimilarityFunction.EUCLIDEAN,
                        m=8, ef_construction=32, quantization_type="none")
    idx = VectorIndex(tmp_path, cfg, merge_policy=TieredMergePolicy())
    base = rng.standard_normal((90, DIM)).astype(np.float32)
    idx.add_batch(np.arange(90), base)
    idx.flush()

    finals: dict[int, np.ndarray] = {}
    errors: list[BaseException] = []
    lock = threading.Lock()

    def updater(lo: int, hi: int, seed: int):
        try:
            r = np.random.default_rng(seed)
            for version in range(4):
                for d in range(lo, hi):
                    v = r.standard_normal(DIM).astype(np.float32)
                    idx.add(d, v)
                    with lock:
                        finals[d] = v
                idx.flush()
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=updater, args=(lo, lo + 30, 100 + lo))
               for lo in (0, 30, 60)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    idx.flush()

    assert idx.doc_count() == 90
    ids = np.arange(90)
    vecs, found = idx.get_vectors(ids)
    assert found.all()
    for d in range(90):
        np.testing.assert_allclose(vecs[d], finals[d], rtol=1e-6,
                                   err_msg=f"doc {d} serves a stale version")
    # merges must not bring stale copies back
    idx.force_merge()
    vecs2, found2 = idx.get_vectors(ids)
    assert found2.all()
    np.testing.assert_allclose(vecs2, vecs, rtol=1e-6)
    idx.close()
