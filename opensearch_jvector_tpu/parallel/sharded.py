"""Mesh-sharded distributed search (corpus data-parallelism over devices).

TPU-native replacement for OpenSearch's shard-level scatter-gather (SURVEY.md
§2.5: the reference delegates multi-node search fan-out + top-k merge to
OpenSearch core over the transport layer). Here each mesh device owns one
corpus shard (its own sub-graph + vectors/codes); queries are replicated;
every device runs the same beam-search program on its shard; the per-shard
top-k lists ride ICI via `all_gather` and a replicated global top-k merge.

Layout convention: shard-stacked arrays with a leading `shard` axis —
  adjacency [D, n, M], live [D, n], entries [D], vectors [D, n, d], ...
Global ordinals are `shard_idx * n + local_ordinal`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from opensearch_jvector_tpu.models import searcher as searcher_mod
from opensearch_jvector_tpu.models.searcher import SearchParams
from opensearch_jvector_tpu.ops.distances import (
    SimilarityFunction,
    batched_candidate_scores,
)
from opensearch_jvector_tpu.ops.topk import topk_scores

AXIS = "shard"


def make_mesh(devices=None) -> Mesh:
    """1-D corpus-sharding mesh over all (or given) devices."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices).reshape(-1), (AXIS,))


def _local_search(adjacency, live, entry, vectors, queries, accept,
                  params: SearchParams, simf: SimilarityFunction):
    """Per-shard two-phase search (runs inside shard_map, one device)."""
    res_ids, res_scores, _, _ = searcher_mod.beam_search(
        adjacency,
        live,
        entry,
        queries,
        {"vectors": vectors},
        accept,
        searcher_mod.make_exact_provider(simf.value),
        L=max(params.ef_search, params.k * params.overquery_factor),
        E=params.expansions_per_iter,
        R=max(params.k * params.overquery_factor, params.k),
        max_iters=params.max_iters
        or max(8, -(-max(params.ef_search, params.k) // params.expansions_per_iter)),
        vma_axis=AXIS,
    )
    top_s, top_i = topk_scores(res_scores, res_ids, params.k)
    return top_i, top_s


def sharded_search(
    mesh: Mesh,
    adjacency: jax.Array,  # [D, n, M]
    live: jax.Array,  # [D, n]
    entries: jax.Array,  # [D]
    vectors: jax.Array,  # [D, n, d]
    queries: jax.Array,  # [Q, d] (replicated)
    params: SearchParams,
    simf: SimilarityFunction,
    accept: jax.Array | None = None,  # [D, n]
):
    """Scatter-gather search across the mesh -> global (ids [Q,k], scores).

    Per-shard beam search runs fully parallel; only the [Q, k]-sized result
    lists cross ICI (one all_gather), then every device computes the same
    global top-k merge (replicated, no further comms).
    """
    d_shards, n_local = adjacency.shape[0], adjacency.shape[1]
    if accept is None:
        accept = jnp.ones((d_shards, n_local), bool)
    run = _make_sharded_fn(mesh, params, simf, n_local)
    return run(adjacency, live, entries, vectors, accept, queries)


@functools.lru_cache(maxsize=None)
def _make_sharded_fn(mesh: Mesh, params: SearchParams,
                     simf: SimilarityFunction, n_local: int):
    """Cached jitted program for sharded_search (stable identity per
    (mesh, params, simf) so repeated calls don't retrace)."""

    def shard_fn(adj, liv, ent, vec, acc, q):
        adj, liv, vec, acc = adj[0], liv[0], vec[0], acc[0]
        ids, scores = _local_search(adj, liv, ent[0], vec, q, acc, params, simf)
        shard_idx = jax.lax.axis_index(AXIS)
        gids = jnp.where(ids >= 0, shard_idx * n_local + ids, -1)
        return gids[None], scores[None]  # [1, Q, k] per shard

    # The per-shard top-k lists come back sharded over the mesh ([D, Q, k]);
    # the global top-k merge below runs under the same jit, so XLA inserts
    # the all-gather (ICI) for the tiny [Q, k] lists automatically.
    # (NOT check_vma=False + manual all_gather: with VMA checking off this
    # JAX version treats every value as unvarying and all_gather silently
    # returns only the local shard — 7 of 8 shards would be dropped.)
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(P(AXIS), P(AXIS)),
    )

    @jax.jit
    def run(adjacency, live, entries, vectors, accept, queries):
        all_ids, all_scores = fn(
            adjacency, live, entries, vectors, accept, queries
        )  # [D, Q, k]
        qn = queries.shape[0]
        flat_ids = jnp.transpose(all_ids, (1, 0, 2)).reshape(qn, -1)
        flat_scores = jnp.transpose(all_scores, (1, 0, 2)).reshape(qn, -1)
        top_s, top_i = topk_scores(flat_scores, flat_ids, params.k)
        return top_i, top_s

    return run


# ---------------------------------------------------------------------------
# Full-engine sharded search: each mesh device runs the COMPLETE two-phase
# segment search (PQ/ADC approximate phase + exact rerank + accept/tombstone
# masking + ordinal->doc mapping) over its shard's segment — the per-shard
# search is the full search, exactly like OpenSearch's shard scatter-gather
# where every shard is a whole index (SURVEY.md §2.5,
# KNNStatsTransportAction.java:28). Only the [Q, k] doc-id/score lists and
# the per-shard counters cross ICI (one all_gather each).
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedEngineState:
    """Shard-stacked device arrays for the full-engine mesh search.

    All arrays carry a leading shard axis D. Shards are padded to a common
    capacity `n` with live=False / doc=-1 rows. `pq_*` are None for
    fp32-exact shards; doc ids are shard-global (no rebasing needed).
    """

    adjacency: jax.Array  # [D, n, M] int32
    live: jax.Array  # [D, n] bool
    entries: jax.Array  # [D] int32
    ord_to_doc: jax.Array  # [D, n] int32 (-1 = hole/deleted)
    vectors: jax.Array  # [D, n, d] f32 (rerank + exact source)
    pq_codes: jax.Array | None = None  # [D, n, Msub] int32
    pq_codebooks: jax.Array | None = None  # [D, Msub, K, dsub] f32
    pq_center: jax.Array | None = None  # [D, d] f32

    @property
    def n_shards(self) -> int:
        return self.adjacency.shape[0]

    @property
    def n_local(self) -> int:
        return self.adjacency.shape[1]

    @property
    def use_pq(self) -> bool:
        return self.pq_codes is not None


def stack_engine_state(segments) -> ShardedEngineState:
    """Stack one segment per shard into mesh-ready arrays.

    Requirements (caller falls back to the host scatter-gather otherwise):
    every segment has device-resident fp32 rows (no on_disk row store, no
    NVQ), and either all or none carry PQ codes with identical codebook
    shapes. Doc ids must fit int32 (device-side mapping).
    """
    caps = [s.capacity() for s in segments]
    n = max(caps)
    use_pq = segments[0].pqv is not None
    adjs, lives, ents, o2ds, vecs = [], [], [], [], []
    codes, books, centers = [], [], []
    for s in segments:
        if s.vectors is None or s.row_store is not None or s.nvq is not None:
            raise ValueError("mesh path requires device-resident fp32 rows")
        if (s.pqv is not None) != use_pq:
            raise ValueError("mesh path requires uniform quantization")
        cap = s.capacity()
        pad = n - cap
        adj = np.asarray(s.graph.adjacency)
        adjs.append(np.pad(adj, ((0, pad), (0, 0))) if pad else adj)
        live = np.asarray(s.graph.live)
        lives.append(np.pad(live, (0, pad)) if pad else live)
        ents.append(int(s.graph.entry))
        o2d = np.asarray(s.docmap.ord_to_doc)
        if o2d.size and o2d.max(initial=-1) > np.iinfo(np.int32).max:
            raise ValueError("doc ids exceed int32 (mesh path)")
        o2d = o2d.astype(np.int32)
        # the docmap covers used ordinals only (< capacity bucket): pad from
        # its OWN length to the common width
        dpad = n - o2d.shape[0]
        o2ds.append(
            np.pad(o2d, (0, dpad), constant_values=-1) if dpad else o2d
        )
        v = np.asarray(s.vectors, np.float32)
        vecs.append(np.pad(v, ((0, pad), (0, 0))) if pad else v)
        if use_pq:
            c = np.asarray(s.pqv.codes, np.int32)
            codes.append(np.pad(c, ((0, pad), (0, 0))) if pad else c)
            books.append(np.asarray(s.pqv.pq.codebooks, np.float32))
            centers.append(np.asarray(s.pqv.pq.center, np.float32))
    if use_pq and len({b.shape for b in books}) != 1:
        raise ValueError("mesh path requires identical codebook shapes")
    return ShardedEngineState(
        adjacency=jnp.asarray(np.stack(adjs)),
        live=jnp.asarray(np.stack(lives)),
        entries=jnp.asarray(np.asarray(ents, np.int32)),
        ord_to_doc=jnp.asarray(np.stack(o2ds)),
        vectors=jnp.asarray(np.stack(vecs)),
        pq_codes=jnp.asarray(np.stack(codes)) if use_pq else None,
        pq_codebooks=jnp.asarray(np.stack(books)) if use_pq else None,
        pq_center=jnp.asarray(np.stack(centers)) if use_pq else None,
    )


def _full_local_search(adj, live, entry, o2d, accept, queries,
                       vectors, codes, codebooks, center,
                       params: SearchParams, simf: SimilarityFunction,
                       use_pq: bool):
    """Complete two-phase search on ONE shard (inside shard_map).

    Mirrors models/searcher._make_search_fn (LUT build -> beam -> rerank ->
    threshold) but maps graph ordinals to doc ids at the end so the mesh
    merge operates directly in doc-id space.
    """
    qn = queries.shape[0]
    if use_pq:
        centered = queries - center[None, :]
        if simf is SimilarityFunction.COSINE:
            centered = centered * jax.lax.rsqrt(
                jnp.sum(centered * centered, -1, keepdims=True) + 1e-30
            )
        qstate = centered
        ctx = {"codes": codes, "codebooks": codebooks}
        provider = searcher_mod.make_pq_provider(simf.value)
    else:
        qstate, ctx = queries, {"vectors": vectors}
        provider = searcher_mod.make_exact_provider(simf.value)

    r = max(params.k * params.overquery_factor, params.k)
    ef = max(params.ef_search, r)
    e = params.expansions_per_iter
    iters = params.max_iters or max(8, -(-ef // e))
    res_ids, res_scores, visited, expanded = searcher_mod.beam_search(
        adj, live, entry, qstate, ctx, accept, provider,
        L=ef, E=e, R=r, max_iters=iters, vma_axis=AXIS,
    )

    if use_pq:  # exact rerank of the overqueried ADC survivors
        qualify = res_ids >= 0
        if params.rerank_floor > 0.0:
            qualify &= res_scores >= params.rerank_floor
        cand = vectors[jnp.clip(res_ids, 0)]
        exact = batched_candidate_scores(queries, cand, simf)
        exact = jnp.where(qualify, exact, -jnp.inf)
        reranked = jnp.sum(qualify, axis=1).astype(jnp.int32)
        scores, ids = topk_scores(exact, res_ids, params.k)
    else:
        reranked = jnp.zeros((qn,), jnp.int32)
        scores, ids = topk_scores(res_scores, res_ids, params.k)

    keep = scores > -jnp.inf
    if params.threshold > 0.0:
        keep &= scores >= params.threshold
    docs = o2d[jnp.clip(ids, 0)]
    keep &= (ids >= 0) & (docs >= 0)
    docs = jnp.where(keep, docs, -1)
    scores = jnp.where(keep, scores, -jnp.inf)
    return docs, scores, visited, expanded, reranked


def sharded_engine_search(
    mesh: Mesh,
    state: ShardedEngineState,
    queries: jax.Array,  # [Q, d] (replicated)
    params: SearchParams,
    simf: SimilarityFunction,
    accept: jax.Array | None = None,  # [D, n] ordinal accept masks
):
    """Full-engine scatter-gather over the mesh.

    Returns (doc_ids [Q, k] int32, scores [Q, k] f32,
             counters [D, 3] int32 = per-shard [visited, expanded, reranked]).
    """
    if accept is None:
        accept = state.live
    use_pq = state.use_pq
    # dummy PQ operands keep one code path; XLA drops unused inputs
    d_sh = state.n_shards
    cod = state.pq_codes if use_pq else jnp.zeros((d_sh, 1, 1), jnp.int32)
    cb = (state.pq_codebooks if use_pq
          else jnp.zeros((d_sh, 1, 1, 1), jnp.float32))
    ctr = (state.pq_center if use_pq
           else jnp.zeros((d_sh, 1), jnp.float32))
    run = _make_engine_fn(mesh, params, simf, use_pq)
    return run(state.adjacency, state.live, state.entries, state.ord_to_doc,
               state.vectors, accept, cod, cb, ctr, queries)


@functools.lru_cache(maxsize=None)
def _make_engine_fn(mesh: Mesh, params: SearchParams,
                    simf: SimilarityFunction, use_pq: bool):
    """Cached jitted program for sharded_engine_search."""

    def shard_fn(adj, liv, ent, o2d, vec, acc, cod, cb, ctr, q):
        adj, liv, o2d, vec, acc = adj[0], liv[0], o2d[0], vec[0], acc[0]
        cod2 = cod[0] if use_pq else None
        cb2 = cb[0] if use_pq else None
        ctr2 = ctr[0] if use_pq else None
        docs, scores, visited, expanded, reranked = _full_local_search(
            adj, liv, ent[0], o2d, acc, q, vec, cod2, cb2, ctr2,
            params, simf, use_pq,
        )
        counters = jnp.stack(
            [jnp.sum(visited), jnp.sum(expanded), jnp.sum(reranked)]
        ).astype(jnp.int32)
        return docs[None], scores[None], counters[None]  # [1, Q, k]/[1, 3]

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                  P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(P(AXIS), P(AXIS), P(AXIS)),
    )

    # Global merge under the same jit: the per-shard [Q, k] doc/score lists
    # stay device-resident and XLA inserts the gather collective (ICI) for
    # the final top-k (see sharded_search for why not manual all_gather).
    @jax.jit
    def run(adjacency, live, entries, o2d, vectors, accept, cod, cb, ctr,
            queries):
        all_docs, all_scores, counters = fn(
            adjacency, live, entries, o2d, vectors, accept, cod, cb, ctr,
            queries,
        )  # [D, Q, k], [D, Q, k], [D, 3]
        qn = queries.shape[0]
        flat_docs = jnp.transpose(all_docs, (1, 0, 2)).reshape(qn, -1)
        flat_scores = jnp.transpose(all_scores, (1, 0, 2)).reshape(qn, -1)
        top_s, top_d = topk_scores(flat_scores, flat_docs, params.k)
        top_d = jnp.where(top_s > -jnp.inf, top_d, -1)
        return top_d, top_s, counters

    return run


def dryrun_engine(mesh: Mesh, n_devices: int) -> None:
    """Tiny end-to-end exercise of the full-engine mesh path (driver dryrun):
    synthetic PQ shards, ADC beam + rerank + docmap + all_gather merge."""
    rng = np.random.default_rng(1)
    d_sh, n, m, dim, nsub, kq = n_devices, 128, 8, 32, 8, 5
    dsub = dim // nsub
    vec = rng.standard_normal((d_sh, n, dim)).astype(np.float32)
    state = ShardedEngineState(
        adjacency=jnp.asarray(
            rng.integers(0, n, size=(d_sh, n, m)).astype(np.int32)),
        live=jnp.ones((d_sh, n), bool),
        entries=jnp.zeros((d_sh,), jnp.int32),
        ord_to_doc=jnp.asarray(
            (np.arange(d_sh * n, dtype=np.int32)).reshape(d_sh, n)),
        vectors=jnp.asarray(vec),
        pq_codes=jnp.asarray(
            rng.integers(0, 16, size=(d_sh, n, nsub)).astype(np.int32)),
        pq_codebooks=jnp.asarray(
            rng.standard_normal((d_sh, nsub, 16, dsub)).astype(np.float32)),
        pq_center=jnp.asarray(np.zeros((d_sh, dim), np.float32)),
    )
    queries = jnp.asarray(rng.standard_normal((4, dim)).astype(np.float32))
    docs, scores, counters = sharded_engine_search(
        mesh, state, queries, SearchParams(k=kq, ef_search=32),
        SimilarityFunction.EUCLIDEAN,
    )
    jax.block_until_ready(docs)
    assert docs.shape == (4, kq) and counters.shape == (n_devices, 3)
    assert int(jnp.max(docs)) < d_sh * n


def build_sharded(
    vectors_np,  # [N, d] host array
    n_shards: int,
    builder_factory,
    simf: SimilarityFunction,
):
    """Partition a corpus round-robin into shards and build per-shard graphs.

    Returns shard-stacked (adjacency, live, entries, vectors, global_ids).
    Round-robin keeps shard sizes equal (pad the tail by repeating row 0 with
    live=False).
    """
    import numpy as np

    n = vectors_np.shape[0]
    n_local = -(-n // n_shards)
    adjs, lives, entries, vecs, gids = [], [], [], [], []
    for s in range(n_shards):
        idx = np.arange(s, n, n_shards)
        pad = n_local - idx.size
        sl = np.concatenate([idx, np.zeros(pad, idx.dtype)]) if pad else idx
        v = vectors_np[sl]
        builder = builder_factory()
        g = builder.build(jnp.asarray(v), simf)
        live = np.asarray(g.live)
        if pad:
            live[n_local - pad:] = False
        adjs.append(np.asarray(g.adjacency))
        lives.append(live)
        entries.append(int(g.entry))
        vecs.append(v)
        gids.append(sl)
    return (
        jnp.asarray(np.stack(adjs)),
        jnp.asarray(np.stack(lives)),
        jnp.asarray(np.asarray(entries, np.int32)),
        jnp.asarray(np.stack(vecs)),
        np.stack(gids),
    )
