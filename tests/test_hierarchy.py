"""Hierarchy layer (hierarchy_enabled): coarse descent + persistence."""

import numpy as np
import jax.numpy as jnp
import pytest

from opensearch_jvector_tpu.api.config import DiskAnnConfig, SearchConfig
from opensearch_jvector_tpu.index.index import VectorIndex
from opensearch_jvector_tpu.index.segment import read_segment
from opensearch_jvector_tpu.models.builder import GraphIndexBuilder
from opensearch_jvector_tpu.models import searcher
from opensearch_jvector_tpu.models.searcher import SearchParams
from opensearch_jvector_tpu.ops.distances import SimilarityFunction
from opensearch_jvector_tpu.utils.ground_truth import ground_truth_topk, recall_at_k

# dim 16 = the shared small-test family (test_index/test_nested/...): XLA
# programs are per-shape, so aligning dims lets this file reuse their traces
DIM = 16


def _clustered(n, qn, seed=0):
    """Tight equidistant clusters: the navigation stress case where the
    coarse layer matters."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((32, DIM)).astype(np.float32)
    v = centers[rng.integers(0, 32, n)] + 0.25 * rng.standard_normal(
        (n, DIM)).astype(np.float32)
    q = centers[rng.integers(0, 32, qn)] + 0.25 * rng.standard_normal(
        (qn, DIM)).astype(np.float32)
    return v, q


@pytest.mark.slow  # statistical quality comparison (2 full builds) — the
# nightly tier; hierarchy correctness still gates every run below
def test_upper_layer_built_and_improves_clustered_recall():
    n, qn, k = 1000, 32, 10
    v_np, q_np = _clustered(n, qn)
    v, q = jnp.asarray(v_np), jnp.asarray(q_np)
    simf = SimilarityFunction.EUCLIDEAN
    truth = ground_truth_topk(q, v, k, simf)

    recalls = {}
    for hier in (False, True):
        b = GraphIndexBuilder(dim=DIM, max_degree=16, beam_width=48,
                              batch_size=512, hierarchy_enabled=hier)
        g = b.build(v, simf)
        assert (g.upper_adjacency is not None) == hier
        res = searcher.search(
            g.adjacency, g.live, g.entry, q,
            SearchParams(k=k, ef_search=64), simf, vectors=v,
            has_tombstones=False, upper_adjacency=g.upper_adjacency,
        )
        recalls[hier] = recall_at_k(np.asarray(res.ids), truth, k)
        if hier:
            base = np.asarray(res.expanded_base_count)
            total = np.asarray(res.expanded_count)
            assert (total >= base).all() and (total > base).any()
    # the coarse layer must not hurt, and on clustered data should help
    assert recalls[True] >= recalls[False] - 0.02, recalls


def test_hierarchy_persists_through_segment(tmp_path):
    cfg = DiskAnnConfig(dim=DIM, m=8, ef_construction=32,
                        quantization_type="none", hierarchy_enabled=True)
    idx = VectorIndex(tmp_path, cfg)
    v_np, q_np = _clustered(400, 4, seed=1)
    for i in range(400):
        idx.add(i, v_np[i])
    name = idx.flush()
    seg = read_segment(tmp_path / name)
    assert seg.graph.upper_adjacency is not None
    up = np.asarray(seg.graph.upper_adjacency)
    members = np.unique(up[up >= 0])
    assert members.size > 0 and members.max() < 400
    res = idx.search(q_np, SearchConfig(k=5, ef_search=48))
    assert (res.doc_ids >= 0).all()
