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
