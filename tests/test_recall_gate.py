"""Reference-scale recall gate (RecallTestsIT.java:54-80 parity):
10k docs, dim 16, k=100, 100 queries vs exact ground truth, per space type.
"""

import numpy as np
import pytest

from opensearch_jvector_tpu.api.config import DiskAnnConfig, SearchConfig
from opensearch_jvector_tpu.index.reader import SegmentReader
from opensearch_jvector_tpu.index.segment import Segment
from opensearch_jvector_tpu.index.docmap import DocMap
from opensearch_jvector_tpu.index.writer import IndexWriter
from opensearch_jvector_tpu.ops.distances import SimilarityFunction
from opensearch_jvector_tpu.utils.ground_truth import ground_truth_topk, recall_at_k

N_DOCS = 10_000
DIM = 16
K = 100
N_QUERIES = 100

# per-space floors, mirroring the reference's empirical per-config
# thresholds (theirs: 0.95/0.98 region on the same corpus shape)
FLOORS = {
    "l2": (SimilarityFunction.EUCLIDEAN, 0.95),
    "cosinesimil": (SimilarityFunction.COSINE, 0.95),
    "innerproduct": (SimilarityFunction.DOT_PRODUCT, 0.90),
}

# The 10k-doc gates are the RUN_SLOW tier — each is a fresh 10k-vector
# build, ~40s/space on the single-core CI host. Space-type recall parity
# still gates EVERY run at unit scale in test_graph_build_search.
_PARAMS = [
    pytest.param("l2", marks=pytest.mark.slow),
    pytest.param("cosinesimil", marks=pytest.mark.slow),
    pytest.param("innerproduct", marks=pytest.mark.slow),
]


@pytest.mark.parametrize("space", _PARAMS)
def test_recall_gate_10k_k100(space, tmp_path):
    simf, floor = FLOORS[space]
    rng = np.random.default_rng(7)
    v = rng.standard_normal((N_DOCS, DIM)).astype(np.float32)
    q = rng.standard_normal((N_QUERIES, DIM)).astype(np.float32)

    writer = IndexWriter(
        tmp_path,
        DiskAnnConfig(dim=DIM, similarity=simf, m=16, ef_construction=64,
                      quantization_type="none"),
        build_batch_size=2048,
    )
    for i in range(N_DOCS):
        writer.add_document(i, v[i])
    path = writer.flush()

    from opensearch_jvector_tpu.index.segment import read_segment

    reader = SegmentReader(read_segment(path))
    res = reader.search(q, SearchConfig(k=K, ef_search=200))
    truth = ground_truth_topk(q, v, K, simf)
    rec = recall_at_k(res.doc_ids, truth, K)
    assert rec >= floor, f"{space}: recall@{K}={rec:.4f} < {floor}"


@pytest.mark.slow  # fresh 4-shard 10k build (~1 min on the CI host)
def test_sharded_recall_gate_10k_k100(tmp_path):
    """The distributed gate: the same 10k/k=100 corpus sharded 4 ways and
    served over the mesh must hold the single-index floor (scatter-gather
    + doc-level top-k merge lose nothing)."""
    import jax

    from opensearch_jvector_tpu.parallel import sharded
    from opensearch_jvector_tpu.parallel.distributed import (
        ShardedVectorIndex,
    )

    simf, floor = FLOORS["l2"]
    rng = np.random.default_rng(7)
    v = rng.standard_normal((N_DOCS, DIM)).astype(np.float32)
    q = rng.standard_normal((N_QUERIES, DIM)).astype(np.float32)

    mesh = sharded.make_mesh(jax.devices()[:4])
    idx = ShardedVectorIndex(
        tmp_path,
        DiskAnnConfig(dim=DIM, similarity=simf, m=16, ef_construction=64,
                      quantization_type="none"),
        n_shards=4, mesh=mesh,
    )
    idx.add_batch(np.arange(N_DOCS), v)
    idx.flush()

    res = idx.search(q, SearchConfig(k=K, ef_search=200))
    assert idx._mesh_state is not None, "mesh path did not run"
    truth = ground_truth_topk(q, v, K, simf)
    rec = recall_at_k(res.doc_ids, truth, K)
    assert rec >= floor, f"sharded: recall@{K}={rec:.4f} < {floor}"


@pytest.mark.slow  # fresh 4-shard on_disk 10k build (~1 min on the CI host)
def test_sharded_on_disk_recall_gate_10k_k100(tmp_path):
    """The BASELINE config-5 shape at gate scale: on_disk shards served
    over the mesh (beam on-device, rows host-paged, batched rerank) must
    hold the same 10k/k=100 floor as the in-memory gates."""
    import jax

    from opensearch_jvector_tpu.parallel import sharded
    from opensearch_jvector_tpu.parallel.distributed import (
        ShardedVectorIndex,
    )

    simf, floor = FLOORS["l2"]
    rng = np.random.default_rng(11)
    v = rng.standard_normal((N_DOCS, DIM)).astype(np.float32)
    q = rng.standard_normal((N_QUERIES, DIM)).astype(np.float32)

    mesh = sharded.make_mesh(jax.devices()[:4])
    idx = ShardedVectorIndex(
        tmp_path,
        DiskAnnConfig(dim=DIM, similarity=simf, m=16, ef_construction=64,
                      mode="on_disk", quantization_type="pq",
                      num_pq_subspaces=8,
                      min_batch_size_for_quantization=64),
        n_shards=4, mesh=mesh,
    )
    idx.add_batch(np.arange(N_DOCS), v)
    idx.flush()

    res = idx.search(q, SearchConfig(k=K, ef_search=200,
                                     overquery_factor=5))
    assert idx._mesh_state is not None and idx._mesh_state.approx_only
    truth = ground_truth_topk(q, v, K, simf)
    rec = recall_at_k(res.doc_ids, truth, K)
    assert rec >= floor, f"on_disk sharded: recall@{K}={rec:.4f} < {floor}"
