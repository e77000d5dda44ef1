"""ground_truth_topk blocked/streamed paths agree with the one-shot scan.

The bench's 10M section feeds ground_truth_topk_stream from a generator
that synthesizes each corpus block lazily; its running top-k merge (and
the depth-1 backpressure pipeline) must return exactly the one-shot
result, including at ragged final blocks and k > block edge shapes.
"""

import numpy as np
import pytest

from opensearch_jvector_tpu.ops.distances import SimilarityFunction
from opensearch_jvector_tpu.utils.ground_truth import (
    ground_truth_topk,
    ground_truth_topk_stream,
)


@pytest.mark.parametrize("n,block", [(300, 64), (256, 64), (300, 300),
                                     (300, 299)])
def test_stream_matches_oneshot(n, block):
    rng = np.random.default_rng(0)
    v = rng.standard_normal((n, 24)).astype(np.float32)
    q = rng.standard_normal((9, 24)).astype(np.float32)
    simf = SimilarityFunction.EUCLIDEAN
    want = ground_truth_topk(q, v, 10, simf)
    got = ground_truth_topk_stream(
        q, ((s, v[s: s + block]) for s in range(0, n, block)), 10, simf
    )
    np.testing.assert_array_equal(got, want)


def test_blocked_oneshot_agree_via_block_param():
    rng = np.random.default_rng(1)
    v = rng.standard_normal((500, 16)).astype(np.float32)
    q = rng.standard_normal((7, 16)).astype(np.float32)
    simf = SimilarityFunction.DOT_PRODUCT
    want = ground_truth_topk(q, v, 5, simf)  # one-shot (500 <= default)
    got = ground_truth_topk(q, v, 5, simf, block=128)  # forced blocked path
    np.testing.assert_array_equal(got, want)


def test_stream_producer_is_lazy():
    """The producer must be pulled one block at a time (the bench relies on
    generation overlapping the device pass, not being pre-materialized)."""
    rng = np.random.default_rng(2)
    v = rng.standard_normal((200, 16)).astype(np.float32)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    pulled = []

    def produce():
        for s in range(0, 200, 50):
            pulled.append(s)
            yield s, v[s: s + 50]

    got = ground_truth_topk_stream(
        q, produce(), 8, SimilarityFunction.EUCLIDEAN
    )
    assert pulled == [0, 50, 100, 150]
    want = ground_truth_topk(q, v, 8, SimilarityFunction.EUCLIDEAN)
    np.testing.assert_array_equal(got, want)
