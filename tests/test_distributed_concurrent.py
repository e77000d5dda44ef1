"""Sharded index, concurrent queries, BWC format gates, pools, derived source.

Models: reference multi-shard ITs (JVectorEngineIT multi-shard filter test),
JVectorConcurrentQueryTests (concurrency), backward_codecs format gating,
derived-source read-back."""

import struct
import threading

import numpy as np
import pytest

from opensearch_jvector_tpu.api.config import DiskAnnConfig, SearchConfig
from opensearch_jvector_tpu.index import store
from opensearch_jvector_tpu.index.index import VectorIndex
from opensearch_jvector_tpu.ops.distances import SimilarityFunction
from opensearch_jvector_tpu.parallel.distributed import ShardedVectorIndex
from opensearch_jvector_tpu.parallel.pools import ComputePools
from opensearch_jvector_tpu.utils.ground_truth import ground_truth_topk, recall_at_k

DIM = 16


def _cfg(**kw):
    base = dict(dim=DIM, similarity=SimilarityFunction.EUCLIDEAN, m=8,
                ef_construction=32, quantization_type="none")
    base.update(kw)
    return DiskAnnConfig(**base)


def _vectors(n, seed=0):
    return np.random.default_rng(seed).standard_normal((n, DIM)).astype(
        np.float32)


def test_sharded_index_search_and_stats(tmp_path):
    v = _vectors(400)
    idx = ShardedVectorIndex(tmp_path, _cfg(), n_shards=4)
    for i in range(400):
        idx.add(i, v[i])
    idx.flush()
    assert idx.doc_count() == 400

    q = _vectors(8, seed=1)
    truth = ground_truth_topk(q, v, 10, SimilarityFunction.EUCLIDEAN)
    res = idx.search(q, SearchConfig(k=10, ef_search=64))
    rec = recall_at_k(res.doc_ids, truth, 10)
    assert rec >= 0.85, rec

    stats = idx.stats()
    assert stats["knn_query_count"] == 4 * 8  # every shard saw the batch

    # deletes route to the right shard
    idx.delete([0, 1, 2, 3])
    res = idx.search(q, SearchConfig(k=10, ef_search=64))
    assert not np.isin(res.doc_ids, [0, 1, 2, 3]).any()
    assert idx.doc_count() == 396


def test_mesh_full_engine_search_matches_host_path(tmp_path):
    """The mesh path runs the FULL per-shard engine (PQ/ADC approximate
    phase + exact rerank + docmap + tombstones + filters) and must agree
    with the host scatter-gather loop: same recall, same counter totals.
    """
    import jax

    from opensearch_jvector_tpu.parallel import sharded

    n = 1600
    v = _vectors(n, seed=7)
    cfg = _cfg(quantization_type="pq", num_pq_subspaces=8,
               min_batch_size_for_quantization=64)
    n_shards = 8
    mesh = sharded.make_mesh(jax.devices()[:n_shards])
    idx = ShardedVectorIndex(tmp_path, cfg, n_shards=n_shards, mesh=mesh)
    for i in range(n):
        idx.add(i, v[i])
    idx.flush()
    for shard in idx.shards:  # PQ segments for every shard
        assert shard._reader(shard._segments[0]).seg.pqv is not None

    q = _vectors(16, seed=8)
    truth = ground_truth_topk(q, v, 10, SimilarityFunction.EUCLIDEAN)
    sc = SearchConfig(k=10, ef_search=64)

    res_mesh = idx.search(q, sc)
    assert idx._mesh_state is not None, "mesh path did not run"
    rec_mesh = recall_at_k(res_mesh.doc_ids, truth, 10)

    # identical query through the host loop (mesh detached)
    idx_host = ShardedVectorIndex(tmp_path)  # reopened: no mesh
    res_host = idx_host.search(q, sc)
    rec_host = recall_at_k(res_host.doc_ids, truth, 10)

    assert rec_mesh >= 0.9, rec_mesh
    assert abs(rec_mesh - rec_host) <= 0.05, (rec_mesh, rec_host)

    # counters aggregate identically in structure: every shard saw the batch
    stats = idx.stats()
    assert stats["knn_query_count"] == n_shards * 16
    assert stats["knn_query_reranked_count"] > 0  # rerank ran on-mesh
    assert stats["knn_query_visited_nodes"] > 0

    # tombstones are masked inside the mesh program
    top0 = int(res_mesh.doc_ids[0, 0])
    idx.delete([top0])
    res2 = idx.search(q, sc)
    assert top0 not in res2.doc_ids[0].tolist()

    # accept filter plumbs doc space -> per-shard ordinal space
    accept = np.zeros(n, bool)
    accept[: n // 2] = True
    res3 = idx.search(q, sc, accept_docs=accept)
    ids = res3.doc_ids[res3.doc_ids >= 0]
    assert ids.size and (ids < n // 2).all()


def test_mesh_multi_segment_shards_match_host_path(tmp_path):
    """Steady-state ingest: every shard holds TWO un-merged segments. The
    mesh path must still serve (segments stacked on the [D, G, n] axis,
    searched via vmap + local merge per device) and agree with the host
    loop — including deletes landing in different segments."""
    import jax

    from opensearch_jvector_tpu.parallel import sharded

    n = 1600
    v = _vectors(n, seed=21)
    cfg = _cfg(quantization_type="pq", num_pq_subspaces=8,
               min_batch_size_for_quantization=64)
    n_shards = 4
    mesh = sharded.make_mesh(jax.devices()[:n_shards])
    idx = ShardedVectorIndex(tmp_path, cfg, n_shards=n_shards, mesh=mesh)
    for i in range(n // 2):
        idx.add(i, v[i])
    idx.flush()
    for i in range(n // 2, n):
        idx.add(i, v[i])
    idx.flush()
    for shard in idx.shards:
        assert len(shard.segment_names) == 2  # really multi-segment

    q = _vectors(16, seed=22)
    truth = ground_truth_topk(q, v, 10, SimilarityFunction.EUCLIDEAN)
    sc = SearchConfig(k=10, ef_search=64)
    res_mesh = idx.search(q, sc)
    assert idx._mesh_state is not None, "mesh path did not run"
    assert idx._mesh_state.n_segments == 2
    rec_mesh = recall_at_k(res_mesh.doc_ids, truth, 10)

    idx_host = ShardedVectorIndex(tmp_path)  # reopened: no mesh
    res_host = idx_host.search(q, sc)
    rec_host = recall_at_k(res_host.doc_ids, truth, 10)
    assert rec_mesh >= 0.9, rec_mesh
    assert abs(rec_mesh - rec_host) <= 0.05, (rec_mesh, rec_host)

    # deletes in BOTH segment generations stay masked on the mesh
    early = int(res_mesh.doc_ids[0, 0])
    late_candidates = res_mesh.doc_ids[res_mesh.doc_ids >= n // 2]
    idx.delete([early] + ([int(late_candidates[0])]
                          if late_candidates.size else []))
    res2 = idx.search(q, sc)
    assert early not in res2.doc_ids[0].tolist()
    if late_candidates.size:
        assert int(late_candidates[0]) not in res2.doc_ids.flatten().tolist()

    # restack churn is measured
    stats = idx.stats()
    assert stats["knn_mesh_restack_count"] >= n_shards


def test_mesh_partial_restack_one_shard_changed(tmp_path):
    """When one shard's segment set changes but the stacked shapes hold
    (same slot count / capacity / mode), only that shard is re-stacked:
    the restack is device-side slice writes, not a full-corpus re-upload,
    and results still agree with the host path."""
    import jax

    from opensearch_jvector_tpu.parallel import sharded

    n_shards = 4
    half = 256 * n_shards  # 256/shard: uniform PQ codebooks (K=min(256,n))
    n_total = 2 * half
    v = _vectors(n_total, seed=41)
    cfg = _cfg(quantization_type="pq", num_pq_subspaces=8,
               min_batch_size_for_quantization=64)
    mesh = sharded.make_mesh(jax.devices()[:n_shards])
    idx = ShardedVectorIndex(tmp_path, cfg, n_shards=n_shards, mesh=mesh)
    for i in range(half):  # 256/shard -> capacity bucket 256 everywhere
        idx.add(i, v[i])
    idx.flush()
    for i in range(half, n_total):  # 256/shard second segment
        idx.add(i, v[i])
    idx.flush()

    q = _vectors(8, seed=42)
    sc = SearchConfig(k=10, ef_search=64)
    idx.search(q, sc)
    assert idx._mesh_state is not None, "mesh path did not run"
    assert idx._mesh_state.n_segments == 2
    n_local = idx._mesh_state.n_local

    # empty shard 0's big first segment, then merge ONLY that shard: the
    # merged segment (64 live docs) fits a smaller bucket, other shards
    # keep 2 segments -> g_max and n are unchanged -> partial restack
    deleted = list(range(0, half, n_shards))  # shard 0's first-flush docs
    idx.delete(deleted)
    idx.shards[0].force_merge()
    res = idx.search(q, sc)
    assert idx._mesh_state is not None, "mesh path dropped after merge"
    assert idx._mesh_state.n_local == n_local  # shapes really held
    stats = idx.stats()
    assert stats["knn_mesh_restack_partial_count"] >= n_shards  # 1/registry

    vv = v.copy()
    vv[deleted] = 1e6  # deleted docs cannot be neighbors
    truth = ground_truth_topk(q, vv, 10, SimilarityFunction.EUCLIDEAN)
    rec_mesh = recall_at_k(res.doc_ids, truth, 10)
    assert not np.isin(res.doc_ids, deleted).any()
    idx_host = ShardedVectorIndex(tmp_path)  # reopened: no mesh
    rec_host = recall_at_k(idx_host.search(q, sc).doc_ids, truth, 10)
    assert rec_mesh >= 0.85, rec_mesh
    assert abs(rec_mesh - rec_host) <= 0.05, (rec_mesh, rec_host)


def test_mesh_nvq_shards_match_host_path(tmp_path):
    """NVQ ("nvq+pq") shards serve on the mesh: the beam rides the aux PQ,
    rerank decodes the inline NVQ codes on-device. Must agree with the host
    path (which uses the same provider composition)."""
    import jax

    from opensearch_jvector_tpu.parallel import sharded

    n = 1200
    v = _vectors(n, seed=31)
    cfg = _cfg(quantization_type="nvq+pq", num_pq_subspaces=8,
               min_batch_size_for_quantization=64)
    n_shards = 4
    mesh = sharded.make_mesh(jax.devices()[:n_shards])
    idx = ShardedVectorIndex(tmp_path, cfg, n_shards=n_shards, mesh=mesh)
    for i in range(n):
        idx.add(i, v[i])
    idx.flush()
    for shard in idx.shards:  # inline NVQ + aux PQ on every shard
        seg = shard._reader(shard.segment_names[0]).seg
        assert seg.nvq is not None and seg.pqv is not None
        assert seg.vectors is None  # NVQ replaces fp32 inline rows

    q = _vectors(16, seed=32)
    truth = ground_truth_topk(q, v, 10, SimilarityFunction.EUCLIDEAN)
    sc = SearchConfig(k=10, ef_search=64)
    res_mesh = idx.search(q, sc)
    assert idx._mesh_state is not None, "mesh path did not run"
    assert idx._mesh_state.use_nvq and idx._mesh_state.use_pq
    rec_mesh = recall_at_k(res_mesh.doc_ids, truth, 10)

    idx_host = ShardedVectorIndex(tmp_path)  # reopened: no mesh
    res_host = idx_host.search(q, sc)
    rec_host = recall_at_k(res_host.doc_ids, truth, 10)
    assert rec_mesh >= 0.85, rec_mesh  # NVQ rerank is lossy vs fp32
    assert abs(rec_mesh - rec_host) <= 0.05, (rec_mesh, rec_host)
    assert res_mesh.reranked > 0  # NVQ rerank ran on-mesh

    # tombstones stay masked through the NVQ mesh program
    top0 = int(res_mesh.doc_ids[0, 0])
    idx.delete([top0])
    res2 = idx.search(q, sc)
    assert top0 not in res2.doc_ids[0].tolist()


def test_sharded_index_reopen(tmp_path):
    v = _vectors(200, seed=2)
    idx = ShardedVectorIndex(tmp_path, _cfg(), n_shards=2)
    for i in range(200):
        idx.add(i, v[i])
    idx.flush()
    idx2 = ShardedVectorIndex(tmp_path)  # restored from shards.json
    assert idx2.n_shards == 2
    assert idx2.doc_count() == 200


def test_concurrent_queries_one_index(tmp_path):
    """Parity with JVectorConcurrentQueryTests: many threads, one reader."""
    v = _vectors(300, seed=3)
    idx = VectorIndex(tmp_path, _cfg())
    for i in range(300):
        idx.add(i, v[i])
    idx.flush()
    q = _vectors(4, seed=4)
    expected = idx.search(q, SearchConfig(k=5, ef_search=48)).doc_ids

    errors: list[Exception] = []
    results: list[np.ndarray] = [None] * 8

    def worker(slot):
        try:
            r = idx.search(q, SearchConfig(k=5, ef_search=48))
            results[slot] = r.doc_ids
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    for r in results:
        np.testing.assert_array_equal(r, expected)  # deterministic


def test_format_version_gate(tmp_path):
    """BWC gate: files from a NEWER format version are refused cleanly."""
    p = tmp_path / "x.jvtpu"
    store.write_container(p, {"a": 1}, {"z": np.zeros(4, np.float32)})
    raw = bytearray(p.read_bytes())
    # bump the on-disk format version field past FORMAT_VERSION
    newver = struct.pack("<I", 999)
    off = len(store.MAGIC)
    raw[off:off + 4] = newver
    p.write_bytes(bytes(raw))
    with pytest.raises(store.CorruptSegmentError, match="format version"):
        store.read_container(p, verify=False)


def test_writer_sort_map(tmp_path):
    """Index sorting at flush updates the ordinal->doc map (apply_sort)."""
    idx = VectorIndex(tmp_path, _cfg())
    v = _vectors(50, seed=5)
    for i in range(50):
        idx.add(i, v[i])
    sort_map = np.arange(50)[::-1].copy()  # old doc i -> new doc 49-i
    path = idx.writer.flush(sort_map=sort_map)
    from opensearch_jvector_tpu.index.segment import read_segment

    seg = read_segment(path)
    np.testing.assert_array_equal(seg.docmap.ord_to_doc, 49 - np.arange(50))


def test_derived_source_get_vector(tmp_path):
    idx = VectorIndex(tmp_path, _cfg())
    v = _vectors(100, seed=6)
    for i in range(100):
        idx.add(i, v[i])
    idx.flush()
    got = idx.get_vector(42)
    np.testing.assert_allclose(got, v[42], rtol=1e-6)
    idx.delete(42)
    assert idx.get_vector(42) is None
    assert idx.get_vector(10_000) is None


def test_compute_pools():
    pools = ComputePools.instance()
    f1 = pools.submit_flush(lambda: 40 + 2)
    f2 = pools.submit_merge(lambda: "merged")
    assert f1.result(timeout=10) == 42
    assert f2.result(timeout=10) == "merged"
    assert pools is ComputePools.instance()  # singleton


def test_mesh_falls_back_to_host_loop_for_flat_disk_shards(tmp_path):
    """FLAT on_disk shards (graph-less scan tier) cannot beam on the mesh:
    ShardedVectorIndex must silently serve through the host scatter-gather
    with identical result semantics. (Vamana on_disk shards DO serve on
    the mesh — test_mesh_on_disk_shards_match_host_path.)"""
    import jax

    from opensearch_jvector_tpu.parallel import sharded

    n = 600
    v = _vectors(n, seed=9)
    cfg = _cfg(quantization_type="pq", num_pq_subspaces=8,
               min_batch_size_for_quantization=64, mode="on_disk",
               index_type="flat")
    mesh = sharded.make_mesh(jax.devices()[:2])
    idx = ShardedVectorIndex(tmp_path, cfg, n_shards=2, mesh=mesh)
    for i in range(n):
        idx.add(i, v[i])
    idx.flush()
    for shard in idx.shards:  # rows really live in the host store
        assert shard._reader(shard._segments[0]).seg.row_store is not None

    q = _vectors(8, seed=10)
    truth = ground_truth_topk(q, v, 10, SimilarityFunction.EUCLIDEAN)
    res = idx.search(q, SearchConfig(k=10, ef_search=96, overquery_factor=8))
    assert idx._mesh_state is None  # mesh path declined, host loop served
    assert recall_at_k(res.doc_ids, truth, 10) >= 0.85
    idx.delete([int(res.doc_ids[0, 0])])
    res2 = idx.search(q, SearchConfig(k=10, ef_search=96))
    assert res.doc_ids[0, 0] not in res2.doc_ids[0].tolist()


def test_sharded_nested_docs_collapse(tmp_path):
    """Nested children co-locate with their parent shard (routing by
    parent id); parent collapse works across the sharded surface and
    deletes reach parent-routed children."""
    from opensearch_jvector_tpu.query.builder import parse_knn_query
    from opensearch_jvector_tpu.query.knn import execute_knn_query

    rng = np.random.default_rng(51)
    idx = ShardedVectorIndex(tmp_path, _cfg(), n_shards=3)
    # 40 parents x 3 children; child ids in a disjoint range
    n_parents, per = 40, 3
    cvecs = rng.standard_normal((n_parents * per, DIM)).astype(np.float32)
    cid = 1000
    for p in range(n_parents):
        for c in range(per):
            idx.add(cid, cvecs[p * per + c], parent_id=p)
            cid += 1
    idx.flush()
    assert idx.has_nested()

    # children of one parent all landed on the parent's shard
    shard = idx.shards[0 % idx.n_shards]
    assert shard.parents_of(np.asarray([1000, 1001, 1002]))[0] == 0

    target = cvecs[7 * per]  # a child of parent 7
    query = parse_knn_query({"vector": target.tolist(), "k": 5})
    res = execute_knn_query(idx, query)
    ids = res.doc_ids[0]
    assert ids[0] == 7  # collapsed to the parent id
    assert len(set(int(i) for i in ids if i >= 0)) == len(
        [i for i in ids if i >= 0])  # parents deduped

    # deleting a child (routed by parent) really tombstones it: the
    # exact-match score disappears (siblings are i.i.d. — parent 7 may
    # legitimately drop in rank once its best child is gone)
    assert res.scores[0][0] > 0.999  # it WAS an exact match
    idx.delete([1000 + 7 * per])
    res2 = execute_knn_query(idx, query)
    assert res2.scores[0][0] < 0.999


def test_sharded_mmr_pipeline(tmp_path):
    """MMR rerank over a sharded index: oversampled scatter-gather search
    + routed bulk vector read-back (derived source across shards)."""
    from opensearch_jvector_tpu.query.mmr import MMRParams, mmr_search

    rng = np.random.default_rng(61)
    v = rng.standard_normal((300, DIM)).astype(np.float32)
    idx = ShardedVectorIndex(tmp_path, _cfg(), n_shards=3)
    for i in range(300):
        idx.add(i, v[i])
    idx.flush()

    q = v[5] + 0.01 * rng.standard_normal(DIM).astype(np.float32)
    res = mmr_search(idx, q, 8, MMRParams(diversity=0.5),
                     SearchConfig(k=8, ef_search=64))
    ids = res.doc_ids[0]
    assert ids[0] == 5  # most-relevant first regardless of diversity
    assert (ids >= 0).sum() == 8
    # diversity=0 degenerates to plain relevance ordering
    res_rel = mmr_search(idx, q, 8, MMRParams(diversity=0.0),
                         SearchConfig(k=8, ef_search=64))
    plain = idx.search(np.atleast_2d(q), SearchConfig(k=8, ef_search=64))
    assert res_rel.doc_ids[0].tolist() == plain.doc_ids[0].tolist()


def test_mesh_scalar_shards_match_host_path(tmp_path):
    """Scalar (1-bit) shards serve on the mesh with the SAME algorithm as
    the host path: Hamming approximate phase over bit-packed codes + fp32
    exact rerank."""
    import jax

    from opensearch_jvector_tpu.parallel import sharded

    v = _vectors(800, seed=71)
    cfg = _cfg(quantization_type="1bit",
               min_batch_size_for_quantization=64)
    mesh = sharded.make_mesh(jax.devices()[:2])
    idx = ShardedVectorIndex(tmp_path, cfg, n_shards=2, mesh=mesh)
    for i in range(800):
        idx.add(i, v[i])
    idx.flush()
    for shard in idx.shards:  # really scalar segments
        assert shard._reader(shard.segment_names[0]).seg.scalar_codes \
            is not None

    q = _vectors(8, seed=72)
    sc = SearchConfig(k=10, ef_search=96, overquery_factor=8)
    res = idx.search(q, sc)
    assert idx._mesh_state is not None, "mesh path did not run"
    assert idx._mesh_state.use_scalar and not idx._mesh_state.use_pq
    truth = ground_truth_topk(q, v, 10, SimilarityFunction.EUCLIDEAN)
    rec_mesh = recall_at_k(res.doc_ids, truth, 10)
    assert res.reranked > 0  # fp32 rerank ran on-mesh

    idx_host = ShardedVectorIndex(tmp_path)  # reopened: no mesh
    rec_host = recall_at_k(idx_host.search(q, sc).doc_ids, truth, 10)
    assert rec_mesh >= 0.8, rec_mesh  # 1-bit approx phase is lossy
    assert abs(rec_mesh - rec_host) <= 0.05, (rec_mesh, rec_host)

    # tombstones stay masked through the scalar mesh program
    top0 = int(res.doc_ids[0, 0])
    idx.delete([top0])
    res2 = idx.search(q, sc)
    assert top0 not in res2.doc_ids[0].tolist()


@pytest.mark.slow  # stress-tier: restack-vs-search race torture; restack correctness is
# guarded fast by test_mesh_partial_restack_one_shard_changed
def test_mesh_restack_race_concurrent_search_and_merge(tmp_path):
    """Concurrent searches racing single-shard merges: every restack must
    keep the (state, names) pair matched (a mismatch would slice-write the
    wrong shards on the next partial restack) — results stay valid and
    phantom-free throughout."""
    import jax

    from opensearch_jvector_tpu.parallel import sharded

    rng = np.random.default_rng(81)
    n_shards = 2
    half = 256 * n_shards
    v = rng.standard_normal((2 * half, DIM)).astype(np.float32)
    cfg = _cfg(quantization_type="pq", num_pq_subspaces=8,
               min_batch_size_for_quantization=64)
    mesh = sharded.make_mesh(jax.devices()[:n_shards])
    idx = ShardedVectorIndex(tmp_path, cfg, n_shards=n_shards, mesh=mesh)
    idx.add_batch(np.arange(half), v[:half])
    idx.flush()
    idx.add_batch(np.arange(half, 2 * half), v[half:])
    idx.flush()

    q = rng.standard_normal((4, DIM)).astype(np.float32)
    sc = SearchConfig(k=10, ef_search=64)
    idx.search(q, sc)  # initial stack

    errors: list[Exception] = []
    stop = threading.Event()

    def searcher():
        while not stop.is_set():
            try:
                res = idx.search(q, sc)
                ids = res.doc_ids[res.doc_ids >= 0]
                if ids.size and int(ids.max()) >= 2 * half:
                    raise AssertionError(f"phantom doc {int(ids.max())}")
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                return

    threads = [threading.Thread(target=searcher) for _ in range(3)]
    for t in threads:
        t.start()
    try:
        for s in range(n_shards):  # serial merges racing the searches
            idx.shards[s].force_merge()
            idx.search(q, sc)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=120)
    assert not errors, errors[0]
    res = idx.search(q, sc)
    assert (res.doc_ids >= 0).any()


def test_restack_shape_fallbacks(tmp_path):
    """restack_engine_state: unchanged names -> no rebuild; a segment-slot
    (G) change -> full restack; only same-shape changes take the partial
    path (pins the fallback semantics)."""
    from opensearch_jvector_tpu.parallel import sharded

    v = _vectors(512, seed=91)
    idx = ShardedVectorIndex(tmp_path, _cfg(), n_shards=2)
    idx.add_batch(np.arange(256), v[:256])
    idx.flush()

    lists, reject = idx._mesh_ready_segments()
    assert reject is None
    names = [[s.name for s in lst] for lst in lists]
    state = sharded.stack_engine_state(lists)

    # unchanged -> zero rebuilt, same object
    st2, rebuilt = sharded.restack_engine_state(state, names, lists, names)
    assert rebuilt == 0 and st2 is state

    # one shard gains a second segment: g_max 1 -> 2 -> FULL restack
    idx.shards[0].add_batch(np.arange(1000, 1064),
                            _vectors(64, seed=92))
    idx.shards[0].flush()
    lists2, reject2 = idx._mesh_ready_segments()
    assert reject2 is None
    names2 = [[s.name for s in lst] for lst in lists2]
    st3, rebuilt2 = sharded.restack_engine_state(state, names, lists2,
                                                 names2)
    assert rebuilt2 == idx.n_shards  # shape changed -> full
    assert st3.n_segments == 2


def test_mesh_on_disk_shards_match_host_path(tmp_path):
    """on_disk shards serve on the mesh: PQ beam over HBM codes inside the
    mesh program, fp32 rows paged from each segment's host store, one
    batched device rerank (BASELINE config 5's larger-than-memory sharded
    shape). Must agree with the host loop, incl. deletes and filters."""
    import jax

    from opensearch_jvector_tpu.parallel import sharded

    n = 1600
    v = _vectors(n, seed=31)
    cfg = _cfg(mode="on_disk", quantization_type="pq", num_pq_subspaces=8,
               min_batch_size_for_quantization=64)
    n_shards = 4
    mesh = sharded.make_mesh(jax.devices()[:n_shards])
    idx = ShardedVectorIndex(tmp_path, cfg, n_shards=n_shards, mesh=mesh)
    for i in range(n):
        idx.add(i, v[i])
    idx.flush()
    for shard in idx.shards:  # on_disk: rows in the host store, codes HBM
        seg = shard._reader(shard._segments[0]).seg
        assert seg.row_store is not None and seg.pqv is not None

    q = _vectors(16, seed=32)
    truth = ground_truth_topk(q, v, 10, SimilarityFunction.EUCLIDEAN)
    sc = SearchConfig(k=10, ef_search=64)

    res_mesh = idx.search(q, sc)
    assert idx._mesh_state is not None, "mesh path did not run"
    assert idx._mesh_state.approx_only
    rec_mesh = recall_at_k(res_mesh.doc_ids, truth, 10)

    idx_host = ShardedVectorIndex(tmp_path)  # reopened: no mesh
    res_host = idx_host.search(q, sc)
    rec_host = recall_at_k(res_host.doc_ids, truth, 10)

    assert rec_mesh >= 0.9, rec_mesh
    assert abs(rec_mesh - rec_host) <= 0.05, (rec_mesh, rec_host)
    assert res_mesh.reranked > 0 and res_mesh.visited > 0

    stats = idx.stats()
    assert stats["knn_query_count"] == n_shards * 16
    assert stats["knn_query_reranked_count"] > 0

    # tombstones mask inside the mesh approximate phase
    top0 = int(res_mesh.doc_ids[0, 0])
    idx.delete([top0])
    res2 = idx.search(q[:1], sc)
    assert top0 not in res2.doc_ids[0].tolist()

    # filters ride the same ordinal accept masks
    accept = np.arange(n // 2)
    res3 = idx.search(q, sc, accept_docs=accept)
    ids = res3.doc_ids[res3.doc_ids >= 0]
    assert ids.size and (ids < n // 2).all()

    # exact-score agreement: mesh rerank scores are fp32-exact
    res4 = idx.search(v[77], SearchConfig(k=1, ef_search=64))
    assert int(res4.doc_ids[0, 0]) == 77
    np.testing.assert_allclose(
        res4.scores[0, 0], 1.0, rtol=1e-5)  # self-match (L2 score 1.0)


@pytest.mark.slow  # 50s cell; the synthetic-donor-code path stays fast-
# covered by test_mesh_on_disk_mixed_small_flush_stays_on_mesh (9s)
def test_mesh_mixed_pq_fp32_shards_serve_via_synthetic_codes(tmp_path):
    """The min-batch steady state: a big PQ segment plus a small fresh
    fp32 flush in each shard. The mesh keeps serving by encoding the
    small segments with donor codebooks (synthetic codes; rerank stays
    exact fp32) instead of dropping to the host loop."""
    import jax

    from opensearch_jvector_tpu.parallel import sharded

    n = 1200
    v = _vectors(n + 100, seed=41)
    cfg = _cfg(quantization_type="pq", num_pq_subspaces=8,
               min_batch_size_for_quantization=128)
    n_shards = 2
    mesh = sharded.make_mesh(jax.devices()[:n_shards])
    idx = ShardedVectorIndex(tmp_path, cfg, n_shards=n_shards, mesh=mesh)
    for i in range(n):
        idx.add(i, v[i])
    idx.flush()
    for i in range(n, n + 100):  # < min batch per shard -> fp32 segments
        idx.add(i, v[i])
    idx.flush()
    kinds = set()
    for shard in idx.shards:
        for name in shard._segments:
            kinds.add(shard._reader(name).seg.pqv is not None)
    assert kinds == {True, False}  # genuinely mixed on disk

    q = _vectors(12, seed=42)
    truth = ground_truth_topk(q, v[: n + 100], 10,
                              SimilarityFunction.EUCLIDEAN)
    sc = SearchConfig(k=10, ef_search=64)
    res_mesh = idx.search(q, sc)
    assert idx._mesh_state is not None, "mesh path did not serve the mix"
    assert idx._mesh_state.use_pq and not idx._mesh_state.approx_only
    assert idx._synth_pq_cache  # synthetic codes were built + cached
    rec_mesh = recall_at_k(res_mesh.doc_ids, truth, 10)

    idx_host = ShardedVectorIndex(tmp_path)  # no mesh: host loop
    res_host = idx_host.search(q, sc)
    rec_host = recall_at_k(res_host.doc_ids, truth, 10)
    assert rec_mesh >= 0.9, rec_mesh
    assert abs(rec_mesh - rec_host) <= 0.05, (rec_mesh, rec_host)

    # docs in the small fp32 segments are findable through the mesh
    res2 = idx.search(v[n + 5], SearchConfig(k=1, ef_search=64))
    assert int(res2.doc_ids[0, 0]) == n + 5

    # after a merge the mix disappears and the cache prunes itself
    idx.force_merge()
    idx.search(q, sc)
    assert not idx._synth_pq_cache


def test_mesh_on_disk_mixed_small_flush_stays_on_mesh(tmp_path):
    """An on_disk index with a small fresh flush (below the quantization
    min batch, so no codes of its own) still serves on the approx mesh
    path: the small segments' rows are paged once and encoded with donor
    codebooks at stack time."""
    import jax

    from opensearch_jvector_tpu.parallel import sharded

    n = 1200
    v = _vectors(n + 80, seed=51)
    cfg = _cfg(mode="on_disk", quantization_type="pq", num_pq_subspaces=8,
               min_batch_size_for_quantization=128)
    mesh = sharded.make_mesh(jax.devices()[:2])
    idx = ShardedVectorIndex(tmp_path, cfg, n_shards=2, mesh=mesh)
    for i in range(n):
        idx.add(i, v[i])
    idx.flush()
    for i in range(n, n + 80):  # < min batch per shard -> no codes
        idx.add(i, v[i])
    idx.flush()
    kinds = {shard._reader(name).seg.pqv is not None
             for shard in idx.shards for name in shard._segments}
    assert kinds == {True, False}  # genuinely mixed

    q = _vectors(8, seed=52)
    truth = ground_truth_topk(q, v[: n + 80], 10,
                              SimilarityFunction.EUCLIDEAN)
    res = idx.search(q, SearchConfig(k=10, ef_search=64))
    assert idx._mesh_state is not None and idx._mesh_state.approx_only
    assert idx._synth_pq_cache
    assert recall_at_k(res.doc_ids, truth, 10) >= 0.9

    # a doc in the small (synthetic-codes) segment is findable at k=1
    res2 = idx.search(v[n + 3], SearchConfig(k=1, ef_search=64))
    assert int(res2.doc_ids[0, 0]) == n + 3


def test_mesh_reject_reasons_and_auto_compaction(tmp_path):
    """Mesh-eligibility drift is observable and self-healing: a shard over
    MESH_MAX_SEGMENTS records a reject-reason counter AND schedules a
    background compaction, after which searches return to the mesh path
    (VERDICT r03 weak #6)."""
    import jax

    from opensearch_jvector_tpu.parallel import sharded

    from opensearch_jvector_tpu.index.scheduler import TieredMergePolicy

    n_shards = 2
    mesh = sharded.make_mesh(jax.devices()[:n_shards])
    idx = ShardedVectorIndex(tmp_path, _cfg(), n_shards=n_shards, mesh=mesh)
    for shard in idx.shards:
        # loose auto policy: models merges LAGGING ingest (the default
        # Tiered pressure would compact during setup); stays auto=True so
        # compact_to — the mechanism under test — is permitted to run
        lagging = TieredMergePolicy()
        lagging.max_segments = 99
        shard.merge_policy = lagging
    v = _vectors(360, seed=61)
    cap = ShardedVectorIndex.MESH_MAX_SEGMENTS
    n_flushes = cap + 2
    per = 360 // n_flushes
    for f in range(n_flushes):  # one segment per flush, over the mesh cap
        for i in range(f * per, (f + 1) * per):
            idx.add(i, v[i])
        idx.flush()
        for shard in idx.shards:  # pin timing: compaction is OURS to trigger
            shard.await_merges()
    over_cap = [s for s in idx.shards if len(s._segments) > cap]
    assert over_cap, "setup failed to exceed the mesh segment cap"

    q = _vectors(8, seed=62)
    truth = ground_truth_topk(q, v[: n_flushes * per], 10,
                              SimilarityFunction.EUCLIDEAN)
    sc = SearchConfig(k=10, ef_search=64)
    res = idx.search(q, sc)  # host fallback, still correct
    assert idx._mesh_state is None
    assert recall_at_k(res.doc_ids, truth, 10) >= 0.85
    stats = idx.stats()
    assert stats["knn_mesh_reject_segment_count"] >= 1
    assert stats["knn_mesh_reject_buffered_docs"] == 0

    # the rejected search scheduled compaction on every over-cap shard
    for shard in idx.shards:
        shard.await_merges()
    for shard in idx.shards:
        assert len(shard._segments) <= cap, shard._segments

    res2 = idx.search(q, sc)  # back on the mesh
    assert idx._mesh_state is not None, "index did not return to the mesh"
    assert recall_at_k(res2.doc_ids, truth, 10) >= 0.85
    assert idx.stats()["knn_mesh_reject_segment_count"] == stats[
        "knn_mesh_reject_segment_count"]

    # buffered-but-unflushed docs are a distinct visible reason
    idx.add(10_000, v[0])
    idx.search(q, sc)
    assert idx.stats()["knn_mesh_reject_buffered_docs"] == 1


def test_mesh_donor_codebook_recall_on_ood_flush_bounded(tmp_path):
    """Quantifies the synthetic-donor-codebook path (VERDICT r03 weak #8):
    a small flush of genuinely OUT-OF-DISTRIBUTION vectors (shifted
    cluster the donor codebooks never saw) is served on the mesh via
    donor-encoded codes. Recall on queries targeting that cluster must be
    within a bounded delta of the force-merged oracle (codebooks retrained
    over the union) — the exact-fp32 rerank bounds the damage coarse codes
    can do to final ordering."""
    import jax

    from opensearch_jvector_tpu.parallel import sharded

    n = 1200
    rng = np.random.default_rng(71)
    v_base = rng.standard_normal((n, DIM)).astype(np.float32)
    # OOD cluster: tight, far outside the donor codebooks' support
    v_ood = (rng.standard_normal((100, DIM)).astype(np.float32) * 0.3
             + 4.0)
    v_all = np.concatenate([v_base, v_ood])
    cfg = _cfg(quantization_type="pq", num_pq_subspaces=8,
               min_batch_size_for_quantization=128)
    n_shards = 2
    mesh = sharded.make_mesh(jax.devices()[:n_shards])
    idx = ShardedVectorIndex(tmp_path, cfg, n_shards=n_shards, mesh=mesh)
    for i in range(n):
        idx.add(i, v_base[i])
    idx.flush()
    for i in range(100):  # < min batch per shard -> fp32 donor segments
        idx.add(n + i, v_ood[i])
    idx.flush()

    # queries in the OOD cluster: ground truth is dominated by OOD docs,
    # so recall here MEASURES donor-code beam routing quality
    q = (rng.standard_normal((16, DIM)).astype(np.float32) * 0.3 + 4.0)
    truth = ground_truth_topk(q, v_all, 10, SimilarityFunction.EUCLIDEAN)
    assert (truth >= n).mean() > 0.95  # sanity: truth lives in the cluster

    sc = SearchConfig(k=10, ef_search=64)
    res_donor = idx.search(q, sc)
    assert idx._mesh_state is not None and idx._synth_pq_cache
    rec_donor = recall_at_k(res_donor.doc_ids, truth, 10)

    idx.force_merge()  # oracle: one segment, codebooks retrained on union
    res_oracle = idx.search(q, sc)
    assert idx._mesh_state is not None and not idx._synth_pq_cache
    rec_oracle = recall_at_k(res_oracle.doc_ids, truth, 10)

    assert rec_oracle >= 0.9, rec_oracle
    assert rec_donor >= rec_oracle - 0.10, (rec_donor, rec_oracle)
