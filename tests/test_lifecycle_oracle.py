"""Randomized index-lifecycle oracle test.

A deterministic-seed random walk of add / delete / flush / force-merge /
search steps, checked after every search against a numpy brute-force
oracle of the live document set. This is the property the whole segment
lifecycle must preserve (the reference exercises it across
JVectorIndexTests / merge + delete ITs): no deleted or never-added doc is
ever returned, counts match, and recall vs the oracle's exact top-k stays
high through arbitrary flush/merge interleavings.
"""

import numpy as np
import pytest

from opensearch_jvector_tpu.api.config import DiskAnnConfig, SearchConfig
from opensearch_jvector_tpu.index.index import VectorIndex
from opensearch_jvector_tpu.index.scheduler import ForceMergesOnlyMergePolicy
from opensearch_jvector_tpu.ops.distances import SimilarityFunction

DIM = 16
K = 10


def _oracle_topk(live: dict[int, np.ndarray], queries: np.ndarray, k: int):
    """Exact euclidean top-k doc ids over the live set, per query."""
    ids = np.fromiter(live.keys(), np.int64)
    mat = np.stack([live[i] for i in ids])  # [n, d]
    d2 = ((queries[:, None, :] - mat[None, :, :]) ** 2).sum(-1)  # [q, n]
    order = np.argsort(d2, axis=1)[:, :k]
    return [set(ids[row].tolist()) for row in order]


@pytest.mark.parametrize("index_type", ["vamana", "flat"])
def test_random_lifecycle_matches_oracle(tmp_path, index_type):
    rng = np.random.default_rng(1234)
    cfg = DiskAnnConfig(
        dim=DIM, similarity=SimilarityFunction.EUCLIDEAN,
        m=8, ef_construction=48, quantization_type="none",
        index_type=index_type,
    )
    idx = VectorIndex(tmp_path / index_type, cfg,
                      merge_policy=ForceMergesOnlyMergePolicy())
    live: dict[int, np.ndarray] = {}
    next_id = 0
    min_recall = 1.0

    # graph builds dominate CPU wall-clock; the flat walk is cheap so it
    # covers the longer sequence
    steps = 14 if index_type == "vamana" else 24
    for step in range(steps):
        op = rng.choice(["add", "add", "add", "delete", "update", "flush",
                         "merge"])
        if op == "add" or not live:
            n = int(rng.integers(5, 40))
            vecs = rng.standard_normal((n, DIM)).astype(np.float32)
            ids = np.arange(next_id, next_id + n)
            next_id += n
            idx.add_batch(ids, vecs)
            for i, v in zip(ids, vecs):
                live[int(i)] = v
        elif op == "update":
            # re-index existing ids with fresh vectors (updateDocument
            # semantics: the new copy must fully supersede the old one)
            take = rng.choice(list(live.keys()),
                              size=min(len(live), int(rng.integers(1, 8))),
                              replace=False)
            vecs = rng.standard_normal((take.size, DIM)).astype(np.float32)
            idx.add_batch(take, vecs)
            for i, v in zip(take, vecs):
                live[int(i)] = v
        elif op == "delete":
            take = rng.choice(list(live.keys()),
                              size=min(len(live), int(rng.integers(1, 10))),
                              replace=False)
            idx.delete(take)
            for i in take:
                live.pop(int(i))
        elif op == "flush":
            idx.flush()
        elif op == "merge" and len(idx.segment_names) > 1:
            idx.force_merge()

        if not live:
            continue
        # flush pending adds so searches see everything (the oracle has no
        # notion of an unflushed buffer; VectorIndex searches only segments)
        idx.flush()

        assert idx.doc_count() == len(live), (
            f"step {step}: doc_count {idx.doc_count()} != oracle {len(live)}"
        )

        queries = rng.standard_normal((4, DIM)).astype(np.float32)
        k = min(K, len(live))
        res = idx.search(queries, SearchConfig(k=k, ef_search=64,
                                               overquery_factor=5))
        truth = _oracle_topk(live, queries, k)
        for qi in range(queries.shape[0]):
            got = [int(d) for d in res.doc_ids[qi] if d >= 0]
            # every returned doc must be live (never deleted / phantom)
            for d in got:
                assert d in live, f"step {step}: dead/phantom doc {d}"
            assert len(set(got)) == len(got), f"step {step}: dupes {got}"
            if got:
                rec = len(set(got) & truth[qi]) / max(len(truth[qi]), 1)
                min_recall = min(min_recall, rec)

    assert min_recall >= 0.85, f"lifecycle min recall {min_recall:.3f}"


def test_lifecycle_filtered_subset(tmp_path):
    """Accept-filtered searches return ONLY filtered live docs at every
    lifecycle stage (filter ∩ tombstones ∩ segment boundaries)."""
    rng = np.random.default_rng(7)
    cfg = DiskAnnConfig(dim=DIM, similarity=SimilarityFunction.EUCLIDEAN,
                        m=8, ef_construction=48, quantization_type="none")
    idx = VectorIndex(tmp_path, cfg,
                      merge_policy=ForceMergesOnlyMergePolicy())
    ids = np.arange(120)
    vecs = rng.standard_normal((120, DIM)).astype(np.float32)
    idx.add_batch(ids[:60], vecs[:60])
    idx.flush()
    idx.add_batch(ids[60:], vecs[60:])
    idx.flush()
    idx.delete(np.arange(0, 120, 3))  # every third doc
    accept = np.arange(0, 120, 2)  # even docs only
    allowed = set(accept.tolist()) - set(range(0, 120, 3))

    q = rng.standard_normal((3, DIM)).astype(np.float32)
    res = idx.search(q, SearchConfig(k=8, ef_search=64, overquery_factor=5),
                     accept_docs=accept)
    for row in res.doc_ids:
        for d in row:
            if d >= 0:
                assert int(d) in allowed

    idx.force_merge()  # folds tombstones; filter semantics must not change
    res2 = idx.search(q, SearchConfig(k=8, ef_search=64, overquery_factor=5),
                      accept_docs=accept)
    for row in res2.doc_ids:
        for d in row:
            if d >= 0:
                assert int(d) in allowed


@pytest.mark.slow  # combination stress (25s/cell): lifecycle machinery is
# fast-covered by the single-index oracle, mesh serving by the per-mode
# agreement cells, churn by the restack cells
@pytest.mark.parametrize("mode", ["in_memory", "on_disk"])
def test_sharded_random_lifecycle_matches_oracle(tmp_path, mode):
    """The oracle walk over a mesh-attached ShardedVectorIndex: routing,
    per-shard segment lifecycles, broadcast deletes, single-shard merges
    (partial restacks) and the mesh/host path switch must all preserve the
    live-set property. The on_disk variant walks the approx-beam +
    paged-rerank mesh path (PQ segments, rows in the host store)."""
    import jax

    from opensearch_jvector_tpu.parallel import sharded
    from opensearch_jvector_tpu.parallel.distributed import (
        ShardedVectorIndex,
    )

    rng = np.random.default_rng(99)
    if mode == "on_disk":  # approx-only mesh path needs the PQ beam
        cfg = DiskAnnConfig(dim=DIM, similarity=SimilarityFunction.EUCLIDEAN,
                            m=8, ef_construction=48, mode="on_disk",
                            quantization_type="pq", num_pq_subspaces=8,
                            min_batch_size_for_quantization=1)
    else:
        cfg = DiskAnnConfig(dim=DIM, similarity=SimilarityFunction.EUCLIDEAN,
                            m=8, ef_construction=48, quantization_type="none")
    mesh = sharded.make_mesh(jax.devices()[:2])
    idx = ShardedVectorIndex(tmp_path, cfg, n_shards=2, mesh=mesh)
    live: dict[int, np.ndarray] = {}
    next_id = 0
    min_recall = 1.0
    mesh_served = 0

    for step in range(10):
        op = rng.choice(["add", "add", "delete", "update", "merge_one"])
        if op == "add" or not live:
            n = int(rng.integers(10, 50))
            vecs = rng.standard_normal((n, DIM)).astype(np.float32)
            ids = np.arange(next_id, next_id + n)
            next_id += n
            idx.add_batch(ids, vecs)
            for i, v in zip(ids, vecs):
                live[int(i)] = v
        elif op == "update":
            take = rng.choice(list(live.keys()),
                              size=min(len(live), int(rng.integers(1, 6))),
                              replace=False)
            vecs = rng.standard_normal((take.size, DIM)).astype(np.float32)
            idx.add_batch(take, vecs)
            for i, v in zip(take, vecs):
                live[int(i)] = v
        elif op == "delete":
            take = rng.choice(list(live.keys()),
                              size=min(len(live), int(rng.integers(1, 8))),
                              replace=False)
            idx.delete(take)
            for i in take:
                live.pop(int(i))
        elif op == "merge_one":  # single-shard merge -> partial restack
            s = int(rng.integers(0, idx.n_shards))
            if len(idx.shards[s].segment_names) > 1:
                idx.shards[s].force_merge()

        idx.flush()
        if not live:
            continue
        assert idx.doc_count() == len(live), f"step {step}"

        queries = rng.standard_normal((3, DIM)).astype(np.float32)
        k = min(K, len(live))
        res = idx.search(queries, SearchConfig(k=k, ef_search=64,
                                               overquery_factor=5))
        if idx._mesh_state is not None:
            mesh_served += 1
            assert idx._mesh_state.approx_only == (mode == "on_disk")
        truth = _oracle_topk(live, queries, k)
        for qi in range(queries.shape[0]):
            got = [int(d) for d in res.doc_ids[qi] if d >= 0]
            for d in got:
                assert d in live, f"step {step}: dead/phantom doc {d}"
            assert len(set(got)) == len(got), f"step {step}: dupes {got}"
            if got:
                rec = len(set(got) & truth[qi]) / max(len(truth[qi]), 1)
                min_recall = min(min_recall, rec)

    assert min_recall >= 0.85, f"sharded lifecycle min recall {min_recall}"
    assert mesh_served > 0, "mesh path never served during the walk"
