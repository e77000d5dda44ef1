"""Backward compatibility: committed old-format segments stay readable.

Models the reference's backward_codecs/ readers + qa/restart-upgrade intent
(qa/build.gradle:36-39): a v1-format segment binary is committed under
tests/fixtures and every HEAD must open and search it correctly. The
newer-version rejection gate lives in test_distributed_concurrent.py.
"""

import re
import struct
from pathlib import Path

import numpy as np
import pytest

from opensearch_jvector_tpu.api.config import SearchConfig
from opensearch_jvector_tpu.api.version import (
    FORMAT_VERSION,
    MIN_SUPPORTED_FORMAT_VERSION,
)
from opensearch_jvector_tpu.index import store
from opensearch_jvector_tpu.index.reader import SegmentReader
from opensearch_jvector_tpu.index.segment import check_integrity, read_segment

FIXTURES = Path(__file__).parent / "fixtures"
FIXTURE = FIXTURES / "bwc_v1_segment_root" / "v1seg"
VECTORS = FIXTURES / "bwc_v1_vectors.npy"

# every committed format generation (frozen by fixtures/make_bwc_fixture.py
# at each FORMAT_VERSION bump); discovering them here means a future v3
# ships with v1->v3 AND v2->v3 coverage from day one (two-hop scaffold,
# qa/build.gradle:36-39 intent)
GENERATIONS = sorted(
    int(re.fullmatch(r"bwc_v(\d+)_segment_root", p.name).group(1))
    for p in FIXTURES.glob("bwc_v*_segment_root")
)


def _gen_paths(version: int):
    return (FIXTURES / f"bwc_v{version}_segment_root" / f"v{version}seg",
            FIXTURES / f"bwc_v{version}_vectors.npy")


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


def test_every_supported_generation_is_frozen():
    """A fixture exists for EVERY format version HEAD claims to read —
    bumping FORMAT_VERSION without freezing the outgoing generation
    (fixtures/make_bwc_fixture.py) fails here, not at the next release."""
    assert GENERATIONS, "no committed BWC fixtures found"
    expected = list(range(MIN_SUPPORTED_FORMAT_VERSION, FORMAT_VERSION + 1))
    assert GENERATIONS == expected, (GENERATIONS, expected)


@pytest.mark.parametrize("version", GENERATIONS)
def test_generation_opens_searches_and_upgrades(version, tmp_path):
    """Every committed generation: integrity passes, stated version byte
    matches, search returns the right neighbors, and a merge rewrites the
    segment at the current FORMAT_VERSION (the upgrade hop)."""
    from opensearch_jvector_tpu.index.merge import merge_segments

    seg_dir, vec_path = _gen_paths(version)
    raw = (seg_dir / "meta.jvtpu").read_bytes()
    stated = struct.unpack(
        "<I", raw[len(store.MAGIC):len(store.MAGIC) + 4])[0]
    assert stated == version

    check_integrity(seg_dir)
    seg = read_segment(seg_dir, verify=True)
    v = np.load(vec_path)
    assert seg.docmap.num_ordinals == v.shape[0]
    reader = SegmentReader(seg)
    res = reader.search(v[:4], SearchConfig(k=3, ef_search=32))
    assert (res.doc_ids[np.arange(4), 0] == np.arange(4)).all()

    out = merge_segments(tmp_path, [seg], "upgraded")
    raw = (out / "meta.jvtpu").read_bytes()
    upgraded = struct.unpack(
        "<I", raw[len(store.MAGIC):len(store.MAGIC) + 4])[0]
    assert upgraded == FORMAT_VERSION
    assert read_segment(out).live_count() == v.shape[0]


def test_v2_fixture_exercises_scalar_container():
    """The v2 generation's version-specific surface: the scalar state file
    exists and the decoded segment carries 1-bit codes + trained state."""
    seg_dir, vec_path = _gen_paths(2)
    assert (seg_dir / "scalar.jvtpu").exists()
    seg = read_segment(seg_dir, verify=True)
    assert seg.scalar_state is not None and seg.scalar_codes is not None
    v = np.load(vec_path)
    reader = SegmentReader(seg)
    res = reader.search(v[:8], SearchConfig(k=1, ef_search=32))
    assert (res.doc_ids[:, 0] == np.arange(8)).all()


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
