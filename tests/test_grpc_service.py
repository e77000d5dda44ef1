"""End-to-end gRPC query service tests (KNNQueryGrpcIT parity).

The reference drives KNN queries over OpenSearch's gRPC transport
(KNNQueryGrpcIT.java: index over REST, query over gRPC, same hits).
Here: ingest through the IndexManager, query over a real grpcio channel,
and assert the gRPC hits agree with the in-process query path.
"""

import grpc
import numpy as np
import pytest

from opensearch_jvector_tpu.grpc import knn_query_pb2 as pb
from opensearch_jvector_tpu.grpc.server import KnnGrpcService, search_stub
from opensearch_jvector_tpu.query import knn as knn_mod
from opensearch_jvector_tpu.query.builder import KnnQuery
from opensearch_jvector_tpu.service.http import IndexManager

DIM = 16
N = 300


@pytest.fixture(scope="module")
def grpc_env(tmp_path_factory):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((N, DIM)).astype(np.float32)
    mgr = IndexManager(tmp_path_factory.mktemp("grpcsvc"))
    mgr.create("gidx", {"properties": {"vec": {
        "type": "knn_vector", "dimension": DIM, "space_type": "l2",
        "method": {"name": "disk_ann", "engine": "jvector",
                   "parameters": {"m": 8, "ef_construction": 32}},
    }}})
    idx = mgr.get("gidx")["vec"]
    for i in range(N):
        idx.add(i, vecs[i])
    idx.flush()
    svc = KnnGrpcService(mgr)
    svc.start()
    channel = grpc.insecure_channel(f"127.0.0.1:{svc.port}")
    yield mgr, vecs, search_stub(channel)
    channel.close()
    svc.stop()


def _request(index, field, vector, k=None, size=None, **knn_kwargs):
    q = pb.KnnQuery(field=field, vector=[float(x) for x in vector],
                    **knn_kwargs)
    if k is not None:
        q.k = k
    req = pb.SearchRequest(index=index,
                           query=pb.QueryContainer(knn=q))
    if size is not None:
        req.size = size
    return req


def test_grpc_search_matches_inprocess_path(grpc_env):
    mgr, vecs, search = grpc_env
    resp = search(_request("gidx", "vec", vecs[42], k=5))
    assert [h.id for h in resp.hits][0] == 42
    assert resp.visited > 0
    # same hits as the in-process query pipeline (one execution path)
    res = knn_mod.execute_knn_query(
        mgr.get("gidx")["vec"], KnnQuery(vector=vecs[42], k=5))
    want = [int(d) for d in res.doc_ids[0] if d >= 0][:5]
    assert [h.id for h in resp.hits] == want
    # scores are descending and finite
    scores = [h.score for h in resp.hits]
    assert scores == sorted(scores, reverse=True)
    assert all(np.isfinite(scores))


def test_grpc_method_parameters_and_size(grpc_env):
    _, vecs, search = grpc_env
    resp = search(_request(
        "gidx", "vec", vecs[7], k=10, size=3,
        method_parameters=pb.MethodParameters(ef_search=64),
    ))
    assert len(resp.hits) == 3
    assert resp.hits[0].id == 7


def test_grpc_filter_ids(grpc_env):
    _, vecs, search = grpc_env
    allowed = [3, 9, 27, 81]
    resp = search(_request("gidx", "vec", vecs[3], k=4,
                           filter_ids=allowed))
    got = [h.id for h in resp.hits]
    assert set(got) <= set(allowed)
    assert got[0] == 3


def test_grpc_radial_min_score(grpc_env):
    _, vecs, search = grpc_env
    q = pb.KnnQuery(field="vec", vector=[float(x) for x in vecs[0]])
    q.min_score = 0.999  # l2 score 1/(1+d^2): only the exact doc survives
    resp = search(pb.SearchRequest(
        index="gidx", query=pb.QueryContainer(knn=q)))
    assert [h.id for h in resp.hits] == [0]


def test_grpc_batched_query_vectors(grpc_env):
    """Batched surface: Q query vectors in one RPC -> one HitGroup per
    row, each agreeing with the in-process batched path (ONE device
    dispatch server-side)."""
    mgr, vecs, search = grpc_env
    rows = [4, 17, 99, 250]
    q = pb.KnnQuery(field="vec", k=5)
    for r in rows:
        q.query_vectors.add(values=[float(x) for x in vecs[r]])
    resp = search(pb.SearchRequest(index="gidx",
                                   query=pb.QueryContainer(knn=q)))
    assert len(resp.responses) == len(rows)
    res = knn_mod.execute_knn_query(
        mgr.get("gidx")["vec"],
        KnnQuery(vector=vecs[rows], k=5))
    for qi, group in enumerate(resp.responses):
        want = [int(d) for d in res.doc_ids[qi] if d >= 0][:5]
        assert [h.id for h in group.hits] == want
        assert group.hits[0].id == rows[qi]
    # single-query clients keep reading `hits` (row 0)
    assert [h.id for h in resp.hits] == [h.id for h in resp.responses[0].hits]


def test_grpc_batched_validation(grpc_env):
    _, vecs, search = grpc_env
    # ragged rows
    q = pb.KnnQuery(field="vec", k=3)
    q.query_vectors.add(values=[1.0] * DIM)
    q.query_vectors.add(values=[1.0] * (DIM - 1))
    with pytest.raises(grpc.RpcError) as e:
        search(pb.SearchRequest(index="gidx",
                                query=pb.QueryContainer(knn=q)))
    assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT

    # vector and query_vectors are mutually exclusive
    q = pb.KnnQuery(field="vec", k=3,
                    vector=[float(x) for x in vecs[0]])
    q.query_vectors.add(values=[float(x) for x in vecs[1]])
    with pytest.raises(grpc.RpcError) as e:
        search(pb.SearchRequest(index="gidx",
                                query=pb.QueryContainer(knn=q)))
    assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT


def test_grpc_over_sharded_mesh_index(tmp_path):
    """Transport x distribution composition: a 2-shard mesh-attached index
    served over a real gRPC channel — single and batched requests agree
    with the in-process scatter-gather path, and the mesh program really
    serves (not the host fallback)."""
    import jax

    from opensearch_jvector_tpu.parallel import sharded

    rng = np.random.default_rng(29)
    vecs = rng.standard_normal((240, DIM)).astype(np.float32)
    mesh = sharded.make_mesh(jax.devices()[:2])
    mgr = IndexManager(tmp_path, mesh=mesh)
    mgr.create("gmesh", {
        "properties": {"vec": {
            "type": "knn_vector", "dimension": DIM, "space_type": "l2",
            "method": {"name": "disk_ann", "engine": "jvector",
                       "parameters": {"m": 8, "ef_construction": 32}},
        }}}, settings={"index": {"number_of_shards": 2}})
    idx = mgr.get("gmesh")["vec"]
    for i in range(240):
        idx.add(i, vecs[i])
    idx.flush()
    svc = KnnGrpcService(mgr)
    svc.start()
    channel = grpc.insecure_channel(f"127.0.0.1:{svc.port}")
    try:
        search = search_stub(channel)
        resp = search(_request("gmesh", "vec", vecs[11], k=5))
        assert resp.hits[0].id == 11
        assert idx._mesh_state is not None  # mesh program served

        rows = [5, 60, 180]
        q = pb.KnnQuery(field="vec", k=4)
        for r in rows:
            q.query_vectors.add(values=[float(x) for x in vecs[r]])
        bresp = search(pb.SearchRequest(
            index="gmesh", query=pb.QueryContainer(knn=q)))
        res = knn_mod.execute_knn_query(idx, KnnQuery(vector=vecs[rows], k=4))
        assert len(bresp.responses) == len(rows)
        for qi, group in enumerate(bresp.responses):
            want = [int(d) for d in res.doc_ids[qi] if d >= 0][:4]
            assert [h.id for h in group.hits] == want
            assert group.hits[0].id == rows[qi]
    finally:
        channel.close()
        svc.stop()


def test_grpc_error_statuses(grpc_env):
    _, vecs, search = grpc_env
    with pytest.raises(grpc.RpcError) as e:
        search(_request("nope", "vec", vecs[0], k=3))
    assert e.value.code() == grpc.StatusCode.NOT_FOUND

    with pytest.raises(grpc.RpcError) as e:
        search(_request("gidx", "missing_field", vecs[0], k=3))
    assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT

    # k and max_distance are mutually exclusive (radial exclusivity)
    q = pb.KnnQuery(field="vec", vector=[float(x) for x in vecs[0]])
    q.k = 3
    q.max_distance = 1.0
    with pytest.raises(grpc.RpcError) as e:
        search(pb.SearchRequest(index="gidx",
                                query=pb.QueryContainer(knn=q)))
    assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT

    # empty container (no knn oneof)
    with pytest.raises(grpc.RpcError) as e:
        search(pb.SearchRequest(index="gidx", query=pb.QueryContainer()))
    assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT


def test_grpc_wrong_dim_and_empty_rows_are_invalid_argument(grpc_env):
    """Wrong-dimension and zero-length query vectors surface as
    INVALID_ARGUMENT, not an engine shape error (UNKNOWN)."""
    _, vecs, search = grpc_env
    # single vector, wrong dim
    with pytest.raises(grpc.RpcError) as e:
        search(_request("gidx", "vec", vecs[0][: DIM // 2], k=5))
    assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT
    assert "dimension" in e.value.details()
    # batched rows, wrong dim
    q = pb.KnnQuery(field="vec", k=5)
    for row in vecs[:2, : DIM // 2]:
        q.query_vectors.add(values=[float(x) for x in row])
    with pytest.raises(grpc.RpcError) as e:
        search(pb.SearchRequest(index="gidx",
                                query=pb.QueryContainer(knn=q)))
    assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT
    # batched zero-length rows
    q = pb.KnnQuery(field="vec", k=5)
    q.query_vectors.add(values=[])
    q.query_vectors.add(values=[])
    with pytest.raises(grpc.RpcError) as e:
        search(pb.SearchRequest(index="gidx",
                                query=pb.QueryContainer(knn=q)))
    assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT
    assert "non-empty" in e.value.details()
