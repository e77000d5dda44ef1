"""Larger-than-memory (tiered) search: HBM graph/codes + host-tier vectors.

The BigANN-scale configuration (BASELINE.json config 5; SURVEY.md §5
"long-context" analog): device HBM holds the adjacency + PQ codes (the
traversal working set), while full-precision rows live in the native paged
store (host DRAM page cache / disk — native/vector_store.cpp). The
approximate phase runs entirely on device; the rerank phase gathers ONLY the
`k * overquery_factor` candidate rows through the native store (parallel
memcpy + madvise prefetch) and uploads a [Q, R, d] block for one exact
scoring matmul.

HBM cost per vector = M bytes (codes) + max_degree*4 (adjacency) — e.g. 64B
+ 128B for PQ64/M32 — vs dim*4 (512B at d=128) for a fully resident segment.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from opensearch_jvector_tpu.api.config import SearchConfig
from opensearch_jvector_tpu.index.docmap import DocMap
from opensearch_jvector_tpu.index.reader import QueryResult
from opensearch_jvector_tpu.models import searcher as searcher_mod
from opensearch_jvector_tpu.models.graph import VamanaGraph
from opensearch_jvector_tpu.models.pq import PQVectors
from opensearch_jvector_tpu.models.searcher import SearchParams
from opensearch_jvector_tpu.ops.distances import (
    SimilarityFunction,
    batched_candidate_scores,
)
from opensearch_jvector_tpu.utils.native_store import (
    PagedVectorStore,
    write_row_file,
)


@dataclasses.dataclass
class TieredSegment:
    graph: VamanaGraph  # device
    pqv: PQVectors  # device (approximate phase storage)
    docmap: DocMap
    store: PagedVectorStore  # host tier (fp32 rows by ordinal)
    similarity: SimilarityFunction


def build_tiered(
    root: str | Path,
    graph: VamanaGraph,
    pqv: PQVectors,
    docmap: DocMap,
    vectors: np.ndarray,
    similarity: SimilarityFunction,
) -> TieredSegment:
    """Persist fp32 rows to the host tier and assemble a tiered segment."""
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    row_file = root / "rows.f32"
    write_row_file(row_file, vectors)
    store = PagedVectorStore(row_file, dim=vectors.shape[1])
    return TieredSegment(
        graph=graph, pqv=pqv, docmap=docmap, store=store,
        similarity=similarity,
    )


def tiered_search(
    seg: TieredSegment,
    queries: np.ndarray,  # [Q, d]
    sc: SearchConfig,
) -> QueryResult:
    """Two-phase search with host-tier rerank."""
    queries_dev = jnp.asarray(np.atleast_2d(queries), jnp.float32)
    params = SearchParams(
        k=sc.k,
        ef_search=sc.resolved_ef(),
        overquery_factor=sc.overquery_factor,
        threshold=sc.threshold,
        rerank_floor=sc.rerank_floor,
    )
    # Approximate phase only (rerank_src="none"): top-R by ADC.
    res = searcher_mod.search(
        seg.graph.adjacency,
        seg.graph.live,
        seg.graph.entry,
        queries_dev,
        dataclasses.replace(params, k=max(sc.k * sc.overquery_factor, sc.k)),
        seg.similarity,
        pq_codes=seg.pqv.codes,
        pq_codebooks=seg.pqv.pq.codebooks,
        pq_center=seg.pqv.pq.center,
        has_tombstones=False,
    )
    cand_ids = np.asarray(res.ids)  # [Q, R]
    qn, r = cand_ids.shape

    # Host-tier gather: prefetch then parallel row copy; upload one block.
    flat = cand_ids.reshape(-1)
    seg.store.prefetch(flat)
    rows = seg.store.gather(flat).reshape(qn, r, -1)  # [Q, R, d]
    exact = batched_candidate_scores(
        queries_dev, jnp.asarray(rows), seg.similarity
    )
    exact = jnp.where(jnp.asarray(cand_ids) >= 0, exact, -jnp.inf)
    top_s, idx = jax.lax.top_k(exact, sc.k)
    top_i = jnp.take_along_axis(jnp.asarray(cand_ids), idx, axis=1)
    top_s_np, top_i_np = np.asarray(top_s), np.asarray(top_i)
    top_i_np = np.where(top_s_np > -np.inf, top_i_np, -1)

    doc_ids = seg.docmap.lookup_docs(top_i_np)
    scores = np.where(doc_ids >= 0, top_s_np, -np.inf)
    reranked = int((cand_ids >= 0).sum())
    return QueryResult(
        doc_ids=doc_ids, scores=scores,
        visited=int(np.asarray(res.visited_count).sum()),
        expanded=int(np.asarray(res.expanded_count).sum()),
        reranked=reranked,
    )
