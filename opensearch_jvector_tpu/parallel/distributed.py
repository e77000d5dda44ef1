"""Distributed (multi-shard) index: scatter-gather across a device mesh.

The engine-level analog of OpenSearch's shard-level data parallelism
(SURVEY.md §2.4/§2.5): the corpus is split round-robin across S shards;
each shard is an independent VectorIndex whose segments live on one mesh
device; queries fan out to all shards and the per-shard top-k merge rides
`all_gather` over ICI (parallel/sharded.py) when every shard is a single
clean segment, else a host-side merge (the transport-layer analog).

Stats aggregate across shards like the reference's TransportNodesAction
broadcast (KNNStatsTransportAction.java:28,87-97).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from opensearch_jvector_tpu.api.config import DiskAnnConfig, SearchConfig
from opensearch_jvector_tpu.api.stats import StatsRegistry
from opensearch_jvector_tpu.index.index import VectorIndex
from opensearch_jvector_tpu.index.reader import QueryResult


class ShardedVectorIndex:
    """S independent shards + scatter-gather search."""

    def __init__(self, root: str | Path, config: DiskAnnConfig | None = None,
                 n_shards: int = 2):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        meta_path = self.root / "shards.json"
        if meta_path.exists():
            state = json.loads(meta_path.read_text())
            n_shards = state["n_shards"]
            config = None  # restored per shard
        else:
            if config is None:
                raise ValueError("new sharded index requires a config")
            meta_path.write_text(json.dumps({"n_shards": n_shards}))
        self.n_shards = n_shards
        # per-shard stats registries: the "node-level" stats of each shard
        self.shard_stats = [StatsRegistry() for _ in range(n_shards)]
        self.shards = [
            VectorIndex(self.root / f"shard_{s}", config,
                        stats=self.shard_stats[s])
            for s in range(n_shards)
        ]

    def _route(self, doc_id: int) -> int:
        return int(doc_id) % self.n_shards  # deterministic routing

    @property
    def config(self) -> DiskAnnConfig:
        return self.shards[0].config

    def add(self, doc_id: int, vector) -> None:
        self.shards[self._route(doc_id)].add(doc_id, vector)

    def delete(self, doc_ids) -> None:
        for d in np.atleast_1d(np.asarray(doc_ids, np.int64)):
            self.shards[self._route(int(d))].delete(int(d))

    def flush(self) -> list[str | None]:
        return [s.flush() for s in self.shards]

    def force_merge(self) -> list[str]:
        return [s.force_merge() for s in self.shards]

    def doc_count(self) -> int:
        return sum(s.doc_count() for s in self.shards)

    def search(self, queries, sc: SearchConfig,
               accept_docs=None) -> QueryResult:
        """Scatter to every shard, merge top-k on the host.

        Each shard's search is itself one device program; the merge over
        S * k results is negligible host work. (When shards live on
        separate mesh devices, parallel/sharded.py runs the same fan-out
        with an all_gather merge instead.)
        """
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        qn = queries.shape[0]
        all_ids = np.full((qn, 0), -1, np.int64)
        all_scores = np.zeros((qn, 0), np.float32)
        visited = expanded = reranked = 0
        for shard in self.shards:
            res = shard.search(queries, sc, accept_docs=accept_docs)
            all_ids = np.concatenate([all_ids, res.doc_ids], axis=1)
            all_scores = np.concatenate([all_scores, res.scores], axis=1)
            visited += res.visited
            expanded += res.expanded
            reranked += res.reranked
        order = np.argsort(-all_scores, axis=1, kind="stable")[:, : sc.k]
        return QueryResult(
            doc_ids=np.take_along_axis(all_ids, order, axis=1),
            scores=np.take_along_axis(all_scores, order, axis=1),
            visited=visited, expanded=expanded, reranked=reranked,
        )

    def stats(self) -> dict:
        """Cluster-level stats = sum over shard registries (broadcast analog)."""
        return StatsRegistry.aggregate(self.shard_stats)
