"""KNN query execution: ANN / exact-fallback / radial / rescore dispatch.

Mirrors `KNNQueryBuilder.doToQuery` + Lucene's filtered-search policy
(KNNQueryBuilder.java:376-611; exact fallback when the filter is more
selective than the ANN budget — the reference inherits Lucene's
AbstractKnnVectorQuery fallback and adds the
`index.knn.advanced.filtered_exact_search_threshold` setting).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from opensearch_jvector_tpu.api.config import SearchConfig
from opensearch_jvector_tpu.api.settings import GLOBAL_SETTINGS, SettingsRegistry
from opensearch_jvector_tpu.api.stats import STATS, Counter, StatsRegistry
from opensearch_jvector_tpu.index.index import VectorIndex
from opensearch_jvector_tpu.index.reader import QueryResult
from opensearch_jvector_tpu.index.segment import read_segment
from opensearch_jvector_tpu.ops.distances import pairwise_scores
from opensearch_jvector_tpu.query import exact as exact_mod
from opensearch_jvector_tpu.query.builder import KnnQuery

import jax.numpy as jnp


def _filter_count(filter_docs) -> int | None:
    if filter_docs is None:
        return None
    f = np.asarray(filter_docs)
    return int(f.sum()) if f.dtype == bool else int(f.size)


def execute_knn_query(
    index: VectorIndex,
    query: KnnQuery,
    settings: SettingsRegistry = GLOBAL_SETTINGS,
    stats: StatsRegistry = STATS,
) -> QueryResult:
    """Run a validated knn query against a VectorIndex."""
    if query.is_radial:
        return _radial(index, query)

    k = query.k
    oq = query.overquery_factor
    fcount = _filter_count(query.filter_docs)

    # exact fallback: filter more selective than the ANN budget
    threshold = settings.get("index.knn.advanced.filtered_exact_search_threshold")
    if threshold == -1:
        threshold = k * oq
    if fcount is not None and fcount <= threshold:
        return _exact_over_segments(index, query, k)

    nested = index.has_nested() and not query.expand_nested_docs
    fetch_k = k
    if query.rescore is not None:
        fetch_k = min(int(np.ceil(k * query.rescore.oversample_factor)),
                      10_000)
    if nested:
        # oversample children so k distinct parents survive the collapse
        fetch_k = min(fetch_k * 3, 10_000)
    sc = SearchConfig(
        k=fetch_k,
        ef_search=query.ef_search,
        overquery_factor=oq,
        threshold=query.threshold,
        rerank_floor=query.rerank_floor,
        use_pruning=query.use_pruning,
    )
    res = index.search(query.vector, sc, accept_docs=query.filter_docs)

    if query.rescore is not None:
        res = _rescore(index, query, res, k if not nested else fetch_k)
    if nested:
        res = _collapse_nested(index, res, k)
    return res


def _collapse_nested(index: VectorIndex, res: QueryResult,
                     k: int) -> QueryResult:
    """Aggregate child hits to parents (max child score per parent).

    Lucene nested-knn semantics: the parent joins its best-scoring child
    (lucenelib nested queries); expand_nested_docs=True skips this.
    """
    ids = res.doc_ids
    parents = index.parents_of(ids)
    # docs without a parent represent themselves
    group = np.where(parents >= 0, parents, ids)
    out_ids = np.full((ids.shape[0], k), -1, np.int64)
    out_scores = np.full((ids.shape[0], k), -np.inf, np.float32)
    for qi in range(ids.shape[0]):
        seen: dict[int, float] = {}
        order = []
        for d, g, s in zip(ids[qi], group[qi], res.scores[qi]):
            if d < 0 or not np.isfinite(s):
                continue
            if int(g) not in seen:  # hits arrive score-desc: first is max
                seen[int(g)] = float(s)
                order.append(int(g))
            if len(order) >= k:
                break
        for j, g in enumerate(order):
            out_ids[qi, j] = g
            out_scores[qi, j] = seen[g]
    return dataclasses.replace(res, doc_ids=out_ids, scores=out_scores)


def execute_script_score(
    index: VectorIndex,
    space: str,
    query_value,
    k: int = 10,
    accept_docs=None,
) -> QueryResult:
    """Exact script scoring over the whole index (painless knn_score parity).

    The reference's `knn_score` painless script
    (plugin/script/KNNScoringScriptEngine + KNNScoringSpaceFactory) scores
    every candidate doc with a space function; here it is one batched scan
    per segment (KNNScoringUtil.java:100-253 space semantics via
    query/exact.script_score).
    """
    from opensearch_jvector_tpu.api.stats import Counter
    from opensearch_jvector_tpu.query.exact import (
        SCRIPT_SPACES,
        _segment_fp32,
        script_score,
    )

    reg = getattr(index, "stats_registry", None) or index.stats
    if space not in SCRIPT_SPACES:
        # counted separately so operators can spot misconfigured scripts
        # (KNNCounter.SCRIPT_QUERY_ERRORS parity)
        reg.increment(Counter.SCRIPT_QUERY_REQUESTS)
        reg.increment(Counter.SCRIPT_QUERY_ERRORS)
        raise ValueError(f"unknown space {space}; one of {SCRIPT_SPACES}")
    q = np.asarray(query_value, np.float32)
    best_ids = np.full((1, k), -1, np.int64)
    best_scores = np.full((1, k), -np.inf, np.float32)
    for name in index.segment_names:
        seg = index._reader(name).seg
        rows = np.asarray(_segment_fp32(seg))
        scores = script_score(q, rows, space)
        docs = seg.docmap.ord_to_doc
        if docs.shape[0] < rows.shape[0]:  # capacity-bucket padding rows
            docs = np.pad(docs, (0, rows.shape[0] - docs.shape[0]),
                          constant_values=-1)
        live = np.asarray(seg.graph.live)[: rows.shape[0]]
        ok = live & (docs >= 0)
        if accept_docs is not None:
            ok = ok & _accept_ords(seg, accept_docs)[: ok.shape[0]]
        dead = index.deleted_docs_for(name)
        if dead:
            ok = ok & ~np.isin(docs, np.fromiter(dead, np.int64))
        scores = np.where(ok, scores, -np.inf)
        kk = min(k, scores.shape[0])
        idx_top = np.argpartition(-scores, kk - 1)[:kk]
        idx_top = idx_top[np.argsort(-scores[idx_top], kind="stable")]
        seg_ids = np.where(scores[idx_top] > -np.inf, docs[idx_top], -1)
        best_ids = np.concatenate([best_ids, seg_ids[None, :]], axis=1)
        best_scores = np.concatenate(
            [best_scores, scores[idx_top][None, :]], axis=1
        )
    order = np.argsort(-best_scores, axis=1, kind="stable")[:, :k]
    ids = np.take_along_axis(best_ids, order, axis=1)
    scores = np.take_along_axis(best_scores, order, axis=1)
    if ids.shape[1] < k:
        pad = k - ids.shape[1]
        ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        scores = np.pad(scores, ((0, 0), (0, pad)), constant_values=-np.inf)
    from opensearch_jvector_tpu.api.stats import Counter

    # sharded indexes expose a coordinator registry (their `.stats` is the
    # cluster-level aggregation method)
    reg = getattr(index, "stats_registry", None) or index.stats
    reg.increment(Counter.SCRIPT_QUERY_REQUESTS)
    return QueryResult(doc_ids=ids, scores=scores,
                       visited=0, expanded=0, reranked=0)


def _exact_over_segments(index: VectorIndex, query: KnnQuery,
                         k: int) -> QueryResult:
    """Brute-force scan of every segment (restrictive-filter path)."""
    q = np.atleast_2d(query.vector)
    qn = q.shape[0]
    all_ids = np.full((qn, 0), -1, np.int64)
    all_scores = np.zeros((qn, 0), np.float32)
    for name in index.segment_names:
        seg = index._reader(name).seg
        accept = None
        if query.filter_docs is not None:
            accept = _accept_ords(seg, query.filter_docs)
        ids, scores = exact_mod.exact_search_segment(
            seg, q, k, accept_ords=accept
        )
        dead = index.deleted_docs_for(name)
        if dead and ids.size:  # deletes scoped to THIS segment's copies
            dd = np.isin(ids, np.fromiter(dead, np.int64))
            scores = np.where(dd, -np.inf, scores)
            ids = np.where(dd, -1, ids)
        all_ids = np.concatenate([all_ids, ids], axis=1)
        all_scores = np.concatenate([all_scores, scores], axis=1)
    order = np.argsort(-all_scores, axis=1, kind="stable")[:, :k]
    ids = np.take_along_axis(all_ids, order, axis=1)
    scores = np.take_along_axis(all_scores, order, axis=1)
    if ids.shape[1] < k:
        pad = k - ids.shape[1]
        ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        scores = np.pad(scores, ((0, 0), (0, pad)), constant_values=-np.inf)
    return QueryResult(doc_ids=ids, scores=scores,
                       visited=0, expanded=0, reranked=0)


def _accept_ords(seg, filter_docs) -> np.ndarray:
    """Doc filter -> ordinal mask over the FULL graph capacity (one
    implementation: reader.ordinal_accept_mask handles bool masks, id
    arrays, and the capacity-bucket padding)."""
    from opensearch_jvector_tpu.index.reader import ordinal_accept_mask

    return ordinal_accept_mask(seg, filter_docs)


def _rescore(index: VectorIndex, query: KnnQuery, res: QueryResult,
             k: int) -> QueryResult:
    """Exact re-scoring of the oversampled candidates (RescoreContext).

    Batched: candidate vectors for ALL queries are fetched in one bulk
    read-back (per-segment doc->ordinal inverse) and rescored in one
    batched device call.
    """
    q = jnp.asarray(np.atleast_2d(query.vector), jnp.float32)  # [Q, d]
    cand_ids = res.doc_ids  # [Q, fetch_k]
    qn, fk = cand_ids.shape
    vecs, found = index.get_vectors(cand_ids.reshape(-1))
    vecs = vecs.reshape(qn, fk, -1)
    found = found.reshape(qn, fk)
    simf = index.config.similarity
    from opensearch_jvector_tpu.ops.distances import batched_candidate_scores

    s = np.asarray(batched_candidate_scores(q, jnp.asarray(vecs), simf))
    s = np.where(found & (cand_ids >= 0), s, -np.inf)
    order = np.argsort(-s, axis=1, kind="stable")[:, :k]
    ids = np.take_along_axis(cand_ids, order, axis=1)
    scores = np.take_along_axis(s, order, axis=1)
    ids = np.where(scores > -np.inf, ids, -1)
    return dataclasses.replace(res, doc_ids=ids, scores=scores)


def _radial(index: VectorIndex, query: KnnQuery) -> QueryResult:
    """Radial search: all docs within a distance / above a score."""
    from opensearch_jvector_tpu.ops.distances import SimilarityFunction

    simf = index.config.similarity
    if query.min_score is not None:
        # translate the user's score (reference score space, per space
        # type) into the engine's score convention. EUCLIDEAN and COSINE
        # reference scores coincide with the engine's (1/(1+d^2) and
        # (1+cos)/2); INNER_PRODUCT is piecewise in the reference
        # (dot>=0 -> 1+dot, dot<0 -> 1/(1-dot), JVector.java:44-49) while
        # the engine scores (1+dot)/2.
        s = float(query.min_score)
        if simf is SimilarityFunction.DOT_PRODUCT:
            dot = (s - 1.0) if s >= 1.0 else (1.0 - 1.0 / max(s, 1e-30))
            floor = (1.0 + dot) / 2.0
        else:
            floor = s
    else:
        # translate max_distance -> engine score floor per space:
        # EUCLIDEAN distance is squared-L2 (score 1/(1+d)), COSINE distance
        # is 1-cos (score (2-d)/2), INNER_PRODUCT distance is -dot
        # (score (1-d)/2) — SpaceType semantics, see ADVICE round 1.
        d = float(query.max_distance)
        if simf is SimilarityFunction.EUCLIDEAN:
            floor = 1.0 / (1.0 + d)
        elif simf is SimilarityFunction.DOT_PRODUCT:
            floor = (1.0 - d) / 2.0
        else:
            floor = (2.0 - d) / 2.0  # cosine
    q = np.atleast_2d(query.vector)
    qn = q.shape[0]
    all_ids = np.full((qn, 0), -1, np.int64)
    all_scores = np.zeros((qn, 0), np.float32)
    for name in index.segment_names:
        seg = index._reader(name).seg
        accept = None
        if query.filter_docs is not None:
            accept = _accept_ords(seg, query.filter_docs)
        ids, scores = exact_mod.radial_search_segment(
            seg, q, floor, accept_ords=accept
        )
        dead = index.deleted_docs_for(name)
        if dead and ids.size:  # deletes scoped to THIS segment's copies
            dd = np.isin(ids, np.fromiter(dead, np.int64))
            scores = np.where(dd, -np.inf, scores)
            ids = np.where(dd, -1, ids)
        all_ids = np.concatenate([all_ids, ids], axis=1)
        all_scores = np.concatenate([all_scores, scores], axis=1)
    order = np.argsort(-all_scores, axis=1, kind="stable")
    ids = np.take_along_axis(all_ids, order, axis=1)
    scores = np.take_along_axis(all_scores, order, axis=1)
    keep = scores > -np.inf
    width = int(keep.sum(axis=1).max(initial=0))
    return QueryResult(
        doc_ids=ids[:, :width], scores=scores[:, :width],
        visited=0, expanded=0, reranked=0,
    )
