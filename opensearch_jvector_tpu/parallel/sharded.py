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

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from opensearch_jvector_tpu.models import searcher as searcher_mod
from opensearch_jvector_tpu.models.searcher import SearchParams
from opensearch_jvector_tpu.ops.distances import (
    SimilarityFunction,
    batched_candidate_scores,
)

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
    )
    top_s, idx = jax.lax.top_k(res_scores, params.k)
    top_i = jnp.take_along_axis(res_ids, idx, axis=1)
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

    def shard_fn(adj, liv, ent, vec, acc, q):
        adj, liv, vec, acc = adj[0], liv[0], vec[0], acc[0]
        ids, scores = _local_search(adj, liv, ent[0], vec, q, acc, params, simf)
        shard_idx = jax.lax.axis_index(AXIS)
        gids = jnp.where(ids >= 0, shard_idx * n_local + ids, -1)
        # gather every shard's top-k, merge on all devices (replicated out)
        all_ids = jax.lax.all_gather(gids, AXIS)  # [D, Q, k]
        all_scores = jax.lax.all_gather(scores, AXIS)
        qn = q.shape[0]
        flat_ids = jnp.transpose(all_ids, (1, 0, 2)).reshape(qn, -1)
        flat_scores = jnp.transpose(all_scores, (1, 0, 2)).reshape(qn, -1)
        top_s, idx = jax.lax.top_k(flat_scores, params.k)
        top_i = jnp.take_along_axis(flat_ids, idx, axis=1)
        # the merged result is bitwise identical on every shard -> replicated
        return top_i, top_s

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(P(), P()),
        # the merge step makes outputs bitwise-replicated; skip the static
        # varying-manual-axes check (constant-initialized loop carries would
        # otherwise need pcast plumbing through every jitted helper)
        check_vma=False,
    )
    return fn(adjacency, live, entries, vectors, accept, queries)


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
