"""Crash/recovery semantics of the commit model.

The Lucene commit model is the reference's checkpoint system (SURVEY §5:
immutable segments + segments_N); commits.json plays segments_N here. These
tests cover the crash windows: mid-flush (segment dir written, commit not),
mid-commit (tmp file left behind), and corrupted segment files surfacing as
clean errors instead of wrong results.
"""

import json

import numpy as np
import pytest

from opensearch_jvector_tpu.api.config import DiskAnnConfig, SearchConfig
from opensearch_jvector_tpu.index import store
from opensearch_jvector_tpu.index.index import VectorIndex
from opensearch_jvector_tpu.ops.distances import SimilarityFunction

DIM = 16


def _cfg():
    return DiskAnnConfig(dim=DIM, similarity=SimilarityFunction.EUCLIDEAN,
                         m=8, ef_construction=32, quantization_type="none")


def _vectors(n, seed=0):
    return np.random.default_rng(seed).standard_normal((n, DIM)).astype(
        np.float32)


def test_uncommitted_segment_ignored_on_reopen(tmp_path):
    """Crash between segment write and commit: the orphan directory is not
    in commits.json and must not resurface."""
    idx = VectorIndex(tmp_path, _cfg())
    v = _vectors(120)
    for i in range(60):
        idx.add(i, v[i])
    idx.flush()
    # simulate a crash mid-flush: write a segment but don't commit it
    for i in range(60, 120):
        idx.writer.add_document(i, v[i])
    idx.writer.flush(name="seg_orphan_crash")
    assert (tmp_path / "seg_orphan_crash").exists()
    del idx

    idx2 = VectorIndex(tmp_path)
    assert idx2.segment_names == ["seg_000000_60"]
    assert idx2.doc_count() == 60
    res = idx2.search(v[70], SearchConfig(k=3, ef_search=32))
    assert not np.isin(res.doc_ids, np.arange(60, 120)).any()


def test_commit_tmp_leftover_is_harmless(tmp_path):
    """Crash between tmp write and rename: the last full commit wins."""
    idx = VectorIndex(tmp_path, _cfg())
    v = _vectors(50)
    for i in range(50):
        idx.add(i, v[i])
    idx.flush()
    committed = (tmp_path / "commits.json").read_text()
    (tmp_path / "commits.json.tmp").write_text('{"half": "written')
    del idx

    idx2 = VectorIndex(tmp_path)
    assert idx2.doc_count() == 50
    assert (tmp_path / "commits.json").read_text() == committed


def test_corrupt_segment_raises_cleanly(tmp_path):
    idx = VectorIndex(tmp_path, _cfg())
    v = _vectors(64, seed=1)
    for i in range(64):
        idx.add(i, v[i])
    name = idx.flush()
    gpath = tmp_path / name / "graph.jvtpu"
    raw = bytearray(gpath.read_bytes())
    raw[len(raw) // 2] ^= 0xFF  # flip a payload bit
    gpath.write_bytes(bytes(raw))
    del idx

    idx2 = VectorIndex(tmp_path)
    with pytest.raises(store.CorruptSegmentError):
        idx2.search(v[0], SearchConfig(k=3, ef_search=32))


def test_reopen_preserves_scoped_deletes_across_merge(tmp_path):
    """Tombstones committed per segment survive reopen and fold correctly
    even when the merge happens only after a second reopen."""
    idx = VectorIndex(tmp_path, _cfg())
    v = _vectors(100, seed=2)
    for i in range(100):
        idx.add(i, v[i])
    idx.flush()
    idx.delete([10, 11])
    del idx

    mid = VectorIndex(tmp_path)
    assert mid.doc_count() == 98
    del mid

    idx3 = VectorIndex(tmp_path)
    idx3.force_merge()
    assert idx3.doc_count() == 98
    state = json.loads((tmp_path / "commits.json").read_text())
    assert state.get("segment_deletes", {}) == {}  # folded away
    res = idx3.search(v[10], SearchConfig(k=5, ef_search=32))
    assert not np.isin(res.doc_ids, [10, 11]).any()
