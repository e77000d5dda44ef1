"""VectorIndex: the multi-segment index facade (one "shard").

Plays the role the Lucene IndexWriter/IndexSearcher pair plays for the
reference plugin: buffered ingest, flush-to-segment, deletes as tombstones,
cross-segment search with global top-k merge, and background-style merges
(callable explicitly; `ForceMergesOnlyMergePolicy`-like determinism for
tests — codec/jvector/ForceMergesOnlyMergePolicy.java:20-23).

Commit model parity: segments are immutable once written; `commits.json`
lists the live segment set (the segments_N analog), so a crash between
flushes rolls back to the last committed set.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from opensearch_jvector_tpu.api.config import DiskAnnConfig, SearchConfig
from opensearch_jvector_tpu.api.stats import STATS, StatsRegistry
from opensearch_jvector_tpu.index.merge import merge_segments
from opensearch_jvector_tpu.index.reader import QueryResult, SegmentReader
from opensearch_jvector_tpu.index.segment import read_segment
from opensearch_jvector_tpu.index.writer import IndexWriter


class VectorIndex:
    def __init__(
        self,
        root: str | Path,
        config: DiskAnnConfig | None = None,
        stats: StatsRegistry = STATS,
    ):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.stats = stats
        commits = self.root / "commits.json"
        if commits.exists():
            state = json.loads(commits.read_text())
            self.config = DiskAnnConfig.from_meta(state["config"])
            self._segments = list(state["segments"])
            self._deleted_docs = set(state.get("deleted_docs", []))
        else:
            if config is None:
                raise ValueError("new index requires a config")
            self.config = config
            self._segments = []
            self._deleted_docs = set()
        self.writer = IndexWriter(self.root, self.config, stats)
        self._readers: dict[str, SegmentReader] = {}

    # -- commit model --------------------------------------------------------

    def _commit(self) -> None:
        tmp = self.root / "commits.json.tmp"
        tmp.write_text(
            json.dumps(
                {
                    "config": self.config.to_meta(),
                    "segments": self._segments,
                    "deleted_docs": sorted(self._deleted_docs),
                }
            )
        )
        tmp.rename(self.root / "commits.json")

    @property
    def segment_names(self) -> list[str]:
        return list(self._segments)

    # -- ingest --------------------------------------------------------------

    def add(self, doc_id: int, vector, parent_id: int | None = None) -> None:
        """Add a document vector; `parent_id` marks a nested child vector."""
        self.writer.add_document(doc_id, vector, parent_id=parent_id)

    def delete(self, doc_ids) -> None:
        """Tombstone docs; folded into graphs at the next merge."""
        for d in np.atleast_1d(np.asarray(doc_ids, np.int64)):
            self._deleted_docs.add(int(d))
        self._commit()

    def flush(self) -> str | None:
        path = self.writer.flush()
        if path is None:
            return None
        self._segments.append(path.name)
        self._commit()
        return path.name

    # -- readers ------------------------------------------------------------

    def _reader(self, name: str) -> SegmentReader:
        if name not in self._readers:
            self._readers[name] = SegmentReader.open(
                self.root / name, stats=self.stats
            )
        return self._readers[name]

    def doc_count(self) -> int:
        total = 0
        dead = (
            np.fromiter(self._deleted_docs, np.int64)
            if self._deleted_docs else None
        )
        for name in self._segments:
            r = self._reader(name)
            docs = r.seg.docmap.ord_to_doc
            live = np.asarray(r.seg.graph.live)
            ok = live & (docs >= 0)
            if dead is not None:
                ok &= ~np.isin(docs, dead)
            total += int(ok.sum())
        return total

    def has_nested(self) -> bool:
        """True when any segment carries nested (parent-tagged) vectors."""
        return any(
            self._reader(n).seg.docmap.ord_to_parent is not None
            for n in self._segments
        )

    def parents_of(self, doc_ids: np.ndarray) -> np.ndarray:
        """child doc ids -> parent ids (-1 for root docs), across segments."""
        out = np.full_like(np.asarray(doc_ids, np.int64), -1)
        for name in self._segments:
            dm = self._reader(name).seg.docmap
            if dm.ord_to_parent is None:
                continue
            p = dm.lookup_parents(doc_ids)
            out = np.where(out < 0, p, out)
        return out

    def get_vector(self, doc_id: int) -> np.ndarray | None:
        """Fetch a document's vector from index storage (derived source).

        The reference strips vectors from _source and re-injects them from
        the vector index at read time (codec/derivedsource/, default-on for
        knn indices — JVectorKNNPlugin.java:217-228). Here vectors are only
        ever stored once, in the segment, and this is the read-back hook.
        """
        if int(doc_id) in self._deleted_docs:
            return None
        for name in self._segments:
            seg = self._reader(name).seg
            hit = np.nonzero(seg.docmap.ord_to_doc == int(doc_id))[0]
            if hit.size:
                ordn = int(hit[0])
                if not bool(np.asarray(seg.graph.live)[ordn]):
                    continue
                from opensearch_jvector_tpu.query.exact import _segment_fp32

                return np.asarray(_segment_fp32(seg)[ordn])
        return None

    # -- search ---------------------------------------------------------------

    def search(
        self, queries, sc: SearchConfig, accept_docs=None
    ) -> QueryResult:
        """Scatter-gather over segments + global top-k merge."""
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        qn = queries.shape[0]
        all_ids = np.full((qn, 0), -1, np.int64)
        all_scores = np.zeros((qn, 0), np.float32)
        visited = expanded = reranked = 0
        for name in self._segments:
            r = self._reader(name)
            # tombstones ride the accept mask INTO the search (liveDocs
            # parity) so dead docs never consume the k result slots
            res = r.search(queries, sc, accept_docs=accept_docs,
                           deleted_docs=self._deleted_docs)
            all_ids = np.concatenate([all_ids, res.doc_ids], axis=1)
            all_scores = np.concatenate([all_scores, res.scores], axis=1)
            visited += res.visited
            expanded += res.expanded
            reranked += res.reranked

        if all_ids.shape[1] == 0:
            return QueryResult(
                doc_ids=np.full((qn, sc.k), -1, np.int64),
                scores=np.full((qn, sc.k), -np.inf, np.float32),
                visited=0, expanded=0, reranked=0,
            )
        order = np.argsort(-all_scores, axis=1, kind="stable")[:, : sc.k]
        top_ids = np.take_along_axis(all_ids, order, axis=1)
        top_scores = np.take_along_axis(all_scores, order, axis=1)
        if top_ids.shape[1] < sc.k:
            pad = sc.k - top_ids.shape[1]
            top_ids = np.pad(top_ids, ((0, 0), (0, pad)), constant_values=-1)
            top_scores = np.pad(
                top_scores, ((0, 0), (0, pad)), constant_values=-np.inf
            )
        return QueryResult(
            doc_ids=top_ids, scores=top_scores,
            visited=visited, expanded=expanded, reranked=reranked,
        )

    # -- merge ----------------------------------------------------------------

    def force_merge(self, out_name: str | None = None) -> str:
        """Merge ALL segments into one (deterministic, test-friendly)."""
        assert self._segments, "nothing to merge"
        out_name = out_name or f"merged_{len(self._segments)}segs"
        segs = []
        for name in self._segments:
            seg = read_segment(self.root / name)
            # fold doc-level tombstones into the segment's live mask
            if self._deleted_docs:
                dead_ords = seg.docmap.mark_deleted_docs(
                    np.fromiter(self._deleted_docs, np.int64)
                )
                if dead_ords.size:
                    live = np.asarray(seg.graph.live).copy()
                    live[dead_ords] = False
                    import jax.numpy as jnp
                    import dataclasses as _dc

                    seg = _dc.replace(
                        seg,
                        graph=_dc.replace(seg.graph, live=jnp.asarray(live)),
                    )
                    docs = seg.docmap.ord_to_doc.copy()
                    docs[dead_ords] = -1
                    # preserve the nested-parent map across the rebuild
                    # (dropping it silently un-nests the index: children
                    # would be returned raw instead of collapsed to parents)
                    parents = seg.docmap.ord_to_parent
                    if parents is not None:
                        parents = parents.copy()
                        parents[dead_ords] = -1
                    seg = _dc.replace(
                        seg, docmap=type(seg.docmap)(docs, parents)
                    )
            segs.append(seg)
        path = merge_segments(self.root, segs, out_name, stats=self.stats)
        self._segments = [path.name]
        self._deleted_docs.clear()
        self._readers.clear()
        self._commit()
        return path.name
