"""Backward compatibility: committed old-format segments stay readable.

Models the reference's backward_codecs/ readers + qa/restart-upgrade intent
(qa/build.gradle:36-39): a v1-format segment binary is committed under
tests/fixtures and every HEAD must open and search it correctly. The
newer-version rejection gate lives in test_distributed_concurrent.py.
"""

import struct
from pathlib import Path

import numpy as np

from opensearch_jvector_tpu.api.config import SearchConfig
from opensearch_jvector_tpu.api.version import (
    FORMAT_VERSION,
    MIN_SUPPORTED_FORMAT_VERSION,
)
from opensearch_jvector_tpu.index import store
from opensearch_jvector_tpu.index.reader import SegmentReader
from opensearch_jvector_tpu.index.segment import check_integrity, read_segment

FIXTURE = Path(__file__).parent / "fixtures" / "bwc_v1_segment_root" / "v1seg"
VECTORS = Path(__file__).parent / "fixtures" / "bwc_v1_vectors.npy"


def test_version_constants_sane():
    assert MIN_SUPPORTED_FORMAT_VERSION <= FORMAT_VERSION
    # the fixture proves the old-reader path only while HEAD is newer
    assert FORMAT_VERSION >= 2


def test_v1_fixture_is_really_v1():
    raw = (FIXTURE / "meta.jvtpu").read_bytes()
    version = struct.unpack("<I", raw[len(store.MAGIC):len(store.MAGIC) + 4])[0]
    assert version == 1
    assert version < FORMAT_VERSION


def test_v1_segment_opens_and_searches():
    """The committed v1 segment loads (checksums verified) and returns
    correct nearest neighbors under the current code."""
    check_integrity(FIXTURE)
    seg = read_segment(FIXTURE, verify=True)
    # device arrays pad to the pow2 capacity bucket; 50 real ordinals
    assert seg.docmap.num_ordinals == 50 and seg.capacity() >= 50
    assert seg.config.dim == 8
    v = np.load(VECTORS)
    reader = SegmentReader(seg)
    res = reader.search(v[:4], SearchConfig(k=3, ef_search=32))
    assert (res.doc_ids[np.arange(4), 0] == np.arange(4)).all()
    np.testing.assert_array_equal(
        np.asarray(seg.vectors)[:50], v
    )


def test_mixed_version_index_serves_and_upgrades(tmp_path):
    """Rolling-upgrade analog (qa/rolling-upgrade intent): ONE VectorIndex
    serving a committed v1 segment alongside a fresh FORMAT_VERSION
    segment — searches span both generations, deletes hit the v1 docs, and
    a force_merge rewrites everything at the current version."""
    import shutil

    from opensearch_jvector_tpu.index.index import VectorIndex
    from opensearch_jvector_tpu.index.scheduler import (
        ForceMergesOnlyMergePolicy,
    )

    shutil.copytree(FIXTURE, tmp_path / "v1seg")
    v1_cfg = read_segment(FIXTURE).config
    idx = VectorIndex(tmp_path, v1_cfg,
                      merge_policy=ForceMergesOnlyMergePolicy())
    with idx._lock:
        idx._segments.append("v1seg")
        idx._commit()

    v_old = np.load(VECTORS)  # 50 x 8, doc ids 0..49
    rng = np.random.default_rng(99)
    v_new = rng.standard_normal((50, 8)).astype(np.float32)
    for i in range(50):
        idx.add(100 + i, v_new[i])
    idx.flush()
    assert len(idx.segment_names) == 2
    assert idx.doc_count() == 100

    sc = SearchConfig(k=3, ef_search=32)
    res_old = idx.search(v_old[:4], sc)  # v1-resident docs
    assert (res_old.doc_ids[np.arange(4), 0] == np.arange(4)).all()
    res_new = idx.search(v_new[:4], sc)  # v2-resident docs
    assert (res_new.doc_ids[np.arange(4), 0] == 100 + np.arange(4)).all()

    idx.delete([2])  # tombstone inside the v1 segment
    res = idx.search(v_old[2], sc)
    assert 2 not in res.doc_ids[0].tolist()

    out_name = idx.force_merge()
    raw = (tmp_path / out_name / "meta.jvtpu").read_bytes()
    version = struct.unpack(
        "<I", raw[len(store.MAGIC):len(store.MAGIC) + 4])[0]
    assert version == FORMAT_VERSION
    assert idx.doc_count() == 99
    res = idx.search(v_old[:4], sc)
    assert int(res.doc_ids[0, 0]) == 0 and 2 not in res.doc_ids[2].tolist()
    res = idx.search(v_new[:4], sc)
    assert (res.doc_ids[np.arange(4), 0] == 100 + np.arange(4)).all()


def test_v1_segment_merges_into_current_format(tmp_path):
    """Upgrade path: merging a v1 segment rewrites it at FORMAT_VERSION."""
    from opensearch_jvector_tpu.index.merge import merge_segments

    seg = read_segment(FIXTURE)
    out = merge_segments(tmp_path, [seg], "upgraded")
    raw = (out / "meta.jvtpu").read_bytes()
    version = struct.unpack("<I", raw[len(store.MAGIC):len(store.MAGIC) + 4])[0]
    assert version == FORMAT_VERSION
    seg2 = read_segment(out)
    assert seg2.live_count() == 50
