"""gRPC proto converter tests (KNNQueryGrpcIT analog, converter-level)."""

import numpy as np
import pytest

from opensearch_jvector_tpu.api.config import ValidationError
from opensearch_jvector_tpu.grpc import knn_query_pb2 as pb
from opensearch_jvector_tpu.grpc.converter import (
    knn_query_from_proto,
    response_to_proto,
)


def test_proto_roundtrip_full():
    c = pb.QueryContainer(knn=pb.KnnQuery(
        field="vec",
        vector=[0.1, 0.2, 0.3],
        k=7,
        method_parameters=pb.MethodParameters(
            ef_search=64, overquery_factor=3, threshold=0.1,
            rerank_floor=0.05, use_pruning=False,
        ),
        rescore=pb.Rescore(oversample_factor=2.5),
        filter_ids=[1, 2, 3],
    ))
    field, q = knn_query_from_proto(c)
    assert field == "vec"
    assert q.k == 7 and q.ef_search == 64 and q.overquery_factor == 3
    assert q.rescore.oversample_factor == 2.5
    np.testing.assert_array_equal(q.filter_docs, [1, 2, 3])
    np.testing.assert_allclose(q.vector, [0.1, 0.2, 0.3], rtol=1e-6)


def test_proto_radial_and_defaults():
    c = pb.QueryContainer(knn=pb.KnnQuery(
        field="vec", vector=[0.0] * 4, min_score=0.9,
    ))
    _, q = knn_query_from_proto(c)
    assert q.is_radial and q.min_score == pytest.approx(0.9)
    assert q.overquery_factor == 5  # defaults applied

    # validation flows through the shared builder
    bad = pb.QueryContainer(knn=pb.KnnQuery(
        field="vec", vector=[0.0] * 4, k=5, max_distance=1.0,
    ))
    with pytest.raises(ValidationError):
        knn_query_from_proto(bad)
    with pytest.raises(ValidationError):
        knn_query_from_proto(pb.QueryContainer())  # no knn set


def test_response_to_proto():
    resp = response_to_proto(
        np.asarray([[3, 9, -1]]), np.asarray([[0.9, 0.5, -np.inf]]),
        visited=10, expanded=4, reranked=2,
    )
    assert [h.id for h in resp.hits] == [3, 9]
    assert resp.visited == 10 and resp.reranked == 2
