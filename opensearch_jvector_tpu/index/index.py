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
import threading
from pathlib import Path

import numpy as np

from opensearch_jvector_tpu.api.config import DiskAnnConfig, SearchConfig
from opensearch_jvector_tpu.api.stats import STATS, StatsRegistry
from opensearch_jvector_tpu.index.merge import merge_segments
from opensearch_jvector_tpu.index.reader import QueryResult, SegmentReader
from opensearch_jvector_tpu.index.scheduler import (
    MergePolicy,
    MergeScheduler,
    TieredMergePolicy,
)
from opensearch_jvector_tpu.index.segment import read_segment
from opensearch_jvector_tpu.index.writer import IndexWriter


class VectorIndex:
    def __init__(
        self,
        root: str | Path,
        config: DiskAnnConfig | None = None,
        stats: StatsRegistry = STATS,
        merge_policy: MergePolicy | None = None,
    ):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.stats = stats
        commits = self.root / "commits.json"
        if commits.exists():
            state = json.loads(commits.read_text())
            self.config = DiskAnnConfig.from_meta(state["config"])
            self._segments = list(state["segments"])
            # deletes are SCOPED to the segments that existed when delete()
            # was called (Lucene liveDocs semantics): a later re-add of the
            # same doc id lands in a new segment and is NOT masked.
            self._segment_deletes: dict[str, set[int]] = {
                name: set(docs)
                for name, docs in state.get("segment_deletes", {}).items()
            }
            # legacy (pre-scoping) commits stored one global doc set: apply
            # it to every then-existing segment
            for d in state.get("deleted_docs", []):
                for name in self._segments:
                    self._segment_deletes.setdefault(name, set()).add(int(d))
        else:
            if config is None:
                raise ValueError("new index requires a config")
            self.config = config
            self._segments = []
            self._segment_deletes = {}
        self.writer = IndexWriter(self.root, self.config, stats)
        self._readers: dict[str, SegmentReader] = {}
        # TieredMergePolicy is the production default (the reference rides
        # Lucene's tiered scheduler by default; ForceMergesOnlyMergePolicy
        # is explicitly the test/bench override —
        # codec/jvector/ForceMergesOnlyMergePolicy.java:20-23).
        self.merge_policy = merge_policy or TieredMergePolicy()
        self.merge_scheduler = MergeScheduler()
        self._lock = threading.RLock()  # guards _segments/_segment_deletes
        self._merging: set[str] = set()  # segments owned by in-flight merges
        # deletes arriving while a flush has already snapshotted the buffer
        # (set by flush(), consumed at its commit)
        self._flush_pending: set[int] | None = None
        self._flush_serial = threading.Lock()  # one flush at a time
        self._docmap_cache: dict[str, np.ndarray] = {}  # name -> ord_to_doc
        # merge output names must be unique across SESSIONS: a reopened
        # index that reuses a committed merge name would overwrite that
        # segment's files in place (data loss)
        counter = 0
        for p in self.root.glob("merged_*"):
            tail = p.name.rsplit("_m", 1)
            if len(tail) == 2 and tail[1].isdigit():
                counter = max(counter, int(tail[1]))
        self._merge_counter = counter
        self._closed = False

    def close(self) -> None:
        """Quiesce the index: refuse new flushes/merges, join in-flight work.

        Deletion paths MUST call this before removing storage — an
        in-flight background merge or flush would otherwise recreate the
        removed directory (segment mkdir parents=True + commits.json), and
        a later index of the same name would resurrect the stale state.
        """
        self._closed = True
        with self._flush_serial:  # barrier: an in-flight flush completes
            pass
        self.merge_scheduler.await_all()

    # -- commit model --------------------------------------------------------

    def _commit(self) -> None:
        tmp = self.root / "commits.json.tmp"
        tmp.write_text(
            json.dumps(
                {
                    "config": self.config.to_meta(),
                    "segments": self._segments,
                    "segment_deletes": {
                        name: sorted(docs)
                        for name, docs in self._segment_deletes.items()
                        if docs
                    },
                }
            )
        )
        tmp.rename(self.root / "commits.json")

    @property
    def segment_names(self) -> list[str]:
        with self._lock:
            return list(self._segments)

    # -- ingest --------------------------------------------------------------

    def add(self, doc_id: int, vector, parent_id: int | None = None) -> None:
        """Add a document vector; `parent_id` marks a nested child vector."""
        self.writer.add_document(doc_id, vector, parent_id=parent_id)

    def add_batch(self, doc_ids, vectors, parent_ids=None) -> int:
        """Bulk ingest: buffer a whole block of (doc_id, vector) rows in one
        call (_bulk parity; the fast path for big corpora)."""
        return self.writer.add_batch(doc_ids, vectors,
                                     parent_ids=parent_ids)

    def delete(self, doc_ids) -> None:
        """Tombstone docs in the segments that currently contain them
        (Lucene deleteDocuments semantics: buffered copies are dropped, a
        LATER re-add of the same doc id is a fresh live doc). Folded into
        graphs at the next merge."""
        arr = np.atleast_1d(np.asarray(doc_ids, np.int64))
        with self._lock:
            self.writer.delete_buffered(arr)
            if self._flush_pending is not None:
                # an in-flight flush already snapshotted the buffer: its
                # segment must mask these docs once it commits
                self._flush_pending.update(int(d) for d in arr)
            for name in self._segments:
                present = arr[np.isin(arr, self._segment_docs(name))]
                if present.size:
                    self._segment_deletes.setdefault(name, set()).update(
                        int(d) for d in present
                    )
            self._commit()

    def _segment_docs(self, name: str) -> np.ndarray:
        """ord_to_doc for a segment WITHOUT loading its device arrays
        (delete-time membership and merge sizing only need the docmap).
        Cached per name — segments are immutable until a merge drops them."""
        r = self._readers.get(name)
        if r is not None:
            return r.seg.docmap.ord_to_doc
        cached = self._docmap_cache.get(name)
        if cached is not None:
            return cached
        from opensearch_jvector_tpu.index import store

        _, darr = store.read_container(
            self.root / name / "docmap.jvtpu", verify=False
        )
        self._docmap_cache[name] = darr["ord_to_doc"]
        return self._docmap_cache[name]

    def deleted_docs_for(self, name: str) -> set[int]:
        """Tombstoned doc ids scoped to segment `name` (a snapshot copy —
        readers iterate it without the lock while delete() mutates)."""
        with self._lock:
            return set(self._segment_deletes.get(name, ()))

    @property
    def has_deletes(self) -> bool:
        with self._lock:
            return any(self._segment_deletes.values())

    def flush(self, sort_map=None, device_rows=None) -> str | None:
        """`device_rows(lo, hi)`: optional device-resident source for the
        buffered rows (see IndexWriter.flush) — skips the corpus upload
        when the vectors already live on device."""
        if self._closed:
            raise RuntimeError("index is closed")
        # one flush at a time: a second concurrent flush would replace
        # _flush_pending and lose deletes raced against the first
        with self._flush_serial:
            with self._lock:
                pending: set[int] = set()
                self._flush_pending = pending
            try:
                path = self.writer.flush(sort_map=sort_map,
                                         device_rows=device_rows)
            except BaseException:
                with self._lock:
                    self._flush_pending = None
                raise
            # _flush_pending stays armed until the SAME lock block that
            # appends the segment: a delete() in between either lands in
            # `pending` (resolved below) or sees the committed segment —
            # never the unprotected gap
            with self._lock:
                self._flush_pending = None
                if path is None:
                    return None
                self._segments.append(path.name)
                if pending:
                    # deletes that raced this flush AFTER its buffer
                    # snapshot: scope them to the new segment
                    arr = np.fromiter(pending, np.int64)
                    if sort_map is not None:
                        # callers delete by PRE-sort id; the new segment's
                        # docmap holds post-sort ids — translate before the
                        # presence check (ids beyond the map can't be in
                        # this flush)
                        smap = np.asarray(sort_map)
                        inb = (arr >= 0) & (arr < smap.shape[0])
                        arr = smap[arr[inb]]
                    present = arr[
                        np.isin(arr, self._segment_docs(path.name))
                    ]
                    if present.size:
                        self._segment_deletes.setdefault(
                            path.name, set()
                        ).update(int(d) for d in present)
                # update semantics ACROSS segments (Lucene updateDocument:
                # the flushed copy supersedes committed copies): tombstone
                # the new segment's doc ids wherever a PRIOR segment still
                # holds them live. Folded into graphs at the next merge.
                new_docs = self._segment_docs(path.name)
                new_docs = new_docs[new_docs >= 0]
                for prior in self._segments[:-1]:
                    stale = new_docs[
                        np.isin(new_docs, self._segment_docs(prior))
                    ]
                    if stale.size:
                        self._segment_deletes.setdefault(
                            prior, set()
                        ).update(int(d) for d in stale)
                self._commit()
        self.maybe_merge()
        return path.name

    # -- background merge ------------------------------------------------------

    def maybe_merge(self):
        """Consult the merge policy; schedule a background merge if it
        selects segments. Returns the Future or None. Runs on the niced
        merge pool, concurrent with further ingest (scheduler parity)."""
        if self._closed:
            return None
        if not getattr(self.merge_policy, "auto", True):
            return None  # ForceMergesOnly: skip segment sizing entirely
        with self._lock:
            free = [n for n in self._segments if n not in self._merging]
            # size from the docmap (cheap, cached) — NOT the full reader:
            # sizing must not upload every segment to HBM under the lock.
            # LIVE doc sizing (reference parity): folded docs are -1 in the
            # docmap; un-folded tombstones are subtracted per segment.
            sizes = [
                (
                    n,
                    max(
                        0,
                        int((self._segment_docs(n) >= 0).sum())
                        - len(self._segment_deletes.get(n, ())),
                    ),
                )
                for n in free
            ]
            pick = self.merge_policy.select(sizes)
            if not pick:
                return None
            self._merging.update(pick)  # one owner per segment
        return self.merge_scheduler.submit(self._merge_owned, pick)

    def compact_to(self, max_segments: int):
        """Schedule a background merge of the smallest segments so the
        committed set shrinks to <= max_segments.

        Used by the sharded mesh path: a shard whose segment count exceeds
        the mesh stacking cap would otherwise silently pin the whole index
        on the host fallback forever (TieredMergePolicy only fires on
        same-size-tier runs, which steady trickle ingest never forms).
        Respects ForceMergesOnlyMergePolicy (`auto=False`): tests and
        benchmarks that pin merge timing stay deterministic. Returns the
        Future or None."""
        if self._closed or max_segments < 1:
            return None
        if not getattr(self.merge_policy, "auto", True):
            return None
        with self._lock:
            if len(self._segments) <= max_segments:
                return None
            free = [n for n in self._segments if n not in self._merging]
            if len(free) < 2:
                return None  # a merge already in flight will shrink the set
            excess = len(self._segments) - max_segments
            sizes = sorted(
                ((n, int((self._segment_docs(n) >= 0).sum())) for n in free),
                key=lambda t: t[1],
            )
            # merging (excess + 1) segments into one nets -excess
            pick = [n for n, _ in sizes[: excess + 1]]
            if len(pick) < 2:
                return None
            self._merging.update(pick)
        return self.merge_scheduler.submit(self._merge_owned, pick)

    def _merge_owned(self, names: list[str]) -> str:
        try:
            return self._merge_now(names)
        finally:
            with self._lock:
                self._merging.difference_update(names)

    def await_merges(self) -> None:
        """Join in-flight background merges (deterministic test hook)."""
        self.merge_scheduler.await_all()

    # -- readers ------------------------------------------------------------

    def _reader(self, name: str) -> SegmentReader:
        if name not in self._readers:
            self._readers[name] = SegmentReader.open(
                self.root / name, stats=self.stats
            )
        return self._readers[name]

    def doc_count(self) -> int:
        """Live doc count served from the cached docmaps + tombstone sets —
        never uploads segment device arrays (the REST `_count` route must
        not trigger a segment load). Folded docs are -1 in the docmap and
        written with live=False, so `docs >= 0` is the stored live set."""
        total = 0
        for name in self.segment_names:
            docs = self._segment_docs(name)
            ok = docs >= 0
            dead = self.deleted_docs_for(name)
            if dead:
                ok &= ~np.isin(docs, np.fromiter(dead, np.int64))
            total += int(ok.sum())
        return total

    def live_doc_ids(self) -> np.ndarray:
        """Live doc ids from the cached docmaps + tombstone sets (no device
        upload — same source as doc_count). Used by multi-field indexes to
        count the doc-id UNION across per-field sub-indexes."""
        out = []
        for name in self.segment_names:
            docs = self._segment_docs(name)
            ok = docs >= 0
            dead = self.deleted_docs_for(name)
            if dead:
                ok &= ~np.isin(docs, np.fromiter(dead, np.int64))
            out.append(docs[ok])
        if not out:
            return np.empty(0, np.int64)
        return np.unique(np.concatenate(out))

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

    def get_vectors(self, doc_ids) -> tuple[np.ndarray, np.ndarray]:
        """Bulk vector read-back from index storage (derived source).

        The reference strips vectors from _source and re-injects them from
        the vector index at read time (codec/derivedsource/, default-on for
        knn indices — JVectorKNNPlugin.java:217-228). Vectors are stored
        once, in the segment; lookups ride the per-segment doc->ordinal
        inverse (O(hits log N), Segment.ords_for_docs).

        Returns (vectors [n, dim] f32, found [n] bool).
        """
        doc_ids = np.asarray(doc_ids, np.int64).reshape(-1)
        out = np.zeros((doc_ids.shape[0], self.config.dim), np.float32)
        found = np.zeros(doc_ids.shape[0], bool)
        for name in self.segment_names:
            want = ~found & (doc_ids >= 0)
            dead = self.deleted_docs_for(name)
            if dead:  # deletes scoped to THIS segment's copies
                want &= ~np.isin(doc_ids, np.fromiter(dead, np.int64))
            if not want.any():
                continue
            seg = self._reader(name).seg
            ords = seg.ords_for_docs(doc_ids)
            live = np.asarray(seg.graph.live)
            hit = want & (ords >= 0)
            hit[hit] = live[ords[hit]]
            if not hit.any():
                continue
            if seg.row_store is not None:  # on_disk: page just these rows
                rows = seg.row_store.gather(ords[hit])
            else:
                from opensearch_jvector_tpu.query.exact import _segment_fp32

                rows = np.asarray(_segment_fp32(seg))[ords[hit]]
            out[hit] = rows
            found |= hit
        return out, found

    def get_vector(self, doc_id: int) -> np.ndarray | None:
        """Single-doc read-back (see get_vectors)."""
        vecs, found = self.get_vectors([int(doc_id)])
        return vecs[0] if found[0] else None

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
        names = self.segment_names  # snapshot: merges swap underneath

        def _one(name: str) -> QueryResult:
            r = self._reader(name)
            # tombstones ride the accept mask INTO the search (liveDocs
            # parity) so dead docs never consume the k result slots
            return r.search(queries, sc, accept_docs=accept_docs,
                            deleted_docs=self.deleted_docs_for(name))

        if len(names) > 1:
            # per-segment searches fan out on the flush pool: host-side prep
            # (accept-mask builds, fetch staging) overlaps while the device
            # stream serializes the compiled programs — a multi-segment
            # index no longer pays a strictly sequential host loop
            from opensearch_jvector_tpu.parallel.pools import ComputePools

            pool = ComputePools.instance()
            results = list(pool.flush_pool.map(_one, names))
        else:
            results = [_one(n) for n in names]
        for res in results:
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

    @staticmethod
    def _fold_tombstones(seg, deleted: np.ndarray):
        """Apply doc tombstones to a loaded segment's live mask + docmap.

        Returns (segment, folded_doc_ids). The nested-parent map is
        preserved (dropping it silently un-nests the index: children would
        be returned raw instead of collapsed to parents).
        """
        dead_ords = seg.docmap.mark_deleted_docs(deleted)
        if not dead_ords.size:
            return seg, np.empty(0, np.int64)
        import dataclasses as _dc

        import jax.numpy as jnp

        folded = seg.docmap.ord_to_doc[dead_ords].copy()
        live = np.asarray(seg.graph.live).copy()
        live[dead_ords] = False
        seg = _dc.replace(
            seg, graph=_dc.replace(seg.graph, live=jnp.asarray(live))
        )
        docs = seg.docmap.ord_to_doc.copy()
        docs[dead_ords] = -1
        parents = seg.docmap.ord_to_parent
        if parents is not None:
            parents = parents.copy()
            parents[dead_ords] = -1
        return _dc.replace(seg, docmap=type(seg.docmap)(docs, parents)), folded

    def _merge_now(self, names: list[str], out_name: str | None = None) -> str:
        """Merge `names` into one segment (runs on caller OR merge pool).

        Works on a snapshot: searches keep serving the old segment set
        until the atomic swap at the end. Tombstones for docs inside the
        merged segments are folded into the output and cleared; deletes
        arriving mid-merge stay tombstoned (they keep masking via accept
        bits until the next merge).
        """
        with self._lock:
            per_seg = {
                n: np.fromiter(self._segment_deletes.get(n, ()), np.int64)
                for n in names
            }
        if out_name is None:
            with self._lock:
                self._merge_counter += 1
                out_name = f"merged_{len(names)}segs_m{self._merge_counter}"
        if (self.root / out_name).exists():
            # never write a merge into ANY existing directory: in-place
            # container writes would corrupt a committed segment (including
            # a merge input) if the merge crashes midway
            raise ValueError(
                f"merge output name {out_name!r} collides with an existing "
                "segment directory"
            )
        segs = []
        for name in names:
            seg = read_segment(self.root / name)
            deleted = per_seg.get(name, np.empty(0, np.int64))
            if deleted.size:
                seg, _ = self._fold_tombstones(seg, deleted)
            segs.append(seg)
        path = merge_segments(self.root, segs, out_name, stats=self.stats)
        with self._lock:
            idx = self._segments.index(names[0])
            kept = [n for n in self._segments if n not in names]
            kept.insert(min(idx, len(kept)), path.name)
            self._segments = kept
            # the snapshot's deletes are folded into the output; deletes that
            # arrived MID-merge for the merged segments migrate onto the new
            # segment so they keep masking until the next merge
            leftover: set[int] = set()
            for n in names:
                remaining = self._segment_deletes.pop(n, set())
                snap = set(int(d) for d in per_seg.get(n, ()))
                leftover |= remaining - snap
            if leftover:
                self._segment_deletes.setdefault(path.name, set()).update(
                    leftover
                )
            for n in names:
                self._readers.pop(n, None)
                self._docmap_cache.pop(n, None)
            self._commit()
        return path.name

    def force_merge(self, out_name: str | None = None) -> str:
        """Merge ALL segments into one (deterministic, test-friendly).

        Owns its segments via `_merging` like background merges do, so a
        flush-triggered merge cannot concurrently grab the same set. The
        default output name is counter-unique (a fixed name would be reused
        across successive force_merges and overwrite a committed segment's
        files in place)."""
        if self._closed:
            raise RuntimeError("index is closed")
        self.await_merges()
        with self._lock:
            names = [n for n in self._segments if n not in self._merging]
            assert names, "nothing to merge"
            self._merging.update(names)
        try:
            return self._merge_now(names, out_name)
        finally:
            with self._lock:
                self._merging.difference_update(names)
