"""PQ / NVQ / ADC kernel tests (numpy reference checks + recall gates).

Models the reference's quantizer math tests and quantized-search codec tests
(KNNJVectorTests quantized flush/rerank cases, JVectorNVQTests).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opensearch_jvector_tpu.models import pq as pq_mod
from opensearch_jvector_tpu.models import nvq as nvq_mod
from opensearch_jvector_tpu.ops import adc as adc_ops
from opensearch_jvector_tpu.ops import nvq as nvq_ops
from opensearch_jvector_tpu.ops.distances import SimilarityFunction
from opensearch_jvector_tpu.utils.ground_truth import ground_truth_topk, recall_at_k


def test_default_num_subspaces_schedule():
    # reference schedule (JVectorIndexQuantization.java:428-446), snapped to
    # divisors of dim
    assert pq_mod.default_num_subspaces(16) == 16
    assert pq_mod.default_num_subspaces(32) == 32
    assert pq_mod.default_num_subspaces(64) == 32
    assert pq_mod.default_num_subspaces(128) == 64
    # dim 256 -> schedule says 100, snapped down to a divisor of 256 -> 64
    assert pq_mod.default_num_subspaces(256) == 64
    assert pq_mod.default_num_subspaces(768) == 192
    assert pq_mod.default_num_subspaces(1536) == 192


def test_pq_train_encode_decode_error():
    rng = np.random.default_rng(0)
    n, d = 2048, 32
    v = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    pq = pq_mod.train_pq(v, SimilarityFunction.EUCLIDEAN, num_subspaces=8,
                         num_clusters=64, iters=4)
    codes = pq_mod.encode(pq, v, SimilarityFunction.EUCLIDEAN)
    assert codes.shape == (n, 8)
    assert codes.dtype == jnp.uint8
    pqv = pq_mod.PQVectors(pq=pq, codes=codes)
    rec = pqv.decode()
    # quantization must beat the trivial all-mean reconstruction by a lot
    base = jnp.mean((v - jnp.mean(v, 0)) ** 2)
    err = jnp.mean((rec - v) ** 2)
    assert float(err) < 0.5 * float(base)


def test_adc_lut_matches_explicit_distances():
    rng = np.random.default_rng(1)
    n, d, m, k, q = 256, 16, 4, 32, 8
    v = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    qs = jnp.asarray(rng.standard_normal((q, d)).astype(np.float32))
    pq = pq_mod.train_pq(v, SimilarityFunction.EUCLIDEAN, num_subspaces=m,
                         num_clusters=k, iters=4)
    codes = pq_mod.encode(pq, v, SimilarityFunction.EUCLIDEAN)
    pqv = pq_mod.PQVectors(pq=pq, codes=codes)
    # ADC scan score must equal the exact distance to the DECODED vectors
    scan = pqv.score_scan(qs, SimilarityFunction.EUCLIDEAN)
    dec = pqv.decode()
    d2 = (
        jnp.sum((qs[:, None, :] - dec[None, :, :]) ** 2, -1)
    )
    expected = 1.0 / (1.0 + d2)
    np.testing.assert_allclose(np.asarray(scan), np.asarray(expected),
                               rtol=2e-2, atol=2e-3)
    # candidate-gather path agrees with the scan path
    ids = jnp.asarray(rng.integers(0, n, size=(q, 10)).astype(np.int32))
    qsub = (qs - pq.center[None, :]).reshape(q, m, d // m)
    luts = adc_ops.build_luts(qsub, pq.codebooks, True)
    cand_vals = adc_ops.lookup_candidates(luts, codes[ids].astype(jnp.int32))
    cand_scores = adc_ops.adc_value_to_score(cand_vals, SimilarityFunction.EUCLIDEAN)
    picked = jnp.take_along_axis(scan, ids, axis=1)
    # gather path and one-hot-matmul path accumulate in different orders
    np.testing.assert_allclose(np.asarray(cand_scores), np.asarray(picked),
                               rtol=5e-3, atol=5e-4)


def test_pq_full_scan_recall():
    """ADC full scan + exact rerank reaches high recall (fused-ADC parity)."""
    rng = np.random.default_rng(2)
    n, d, qn, k = 4096, 64, 16, 10
    v = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    qs = jnp.asarray(rng.standard_normal((qn, d)).astype(np.float32))
    simf = SimilarityFunction.EUCLIDEAN
    pq = pq_mod.train_pq(v, simf, num_subspaces=16, iters=6)
    pqv = pq_mod.PQVectors(pq=pq, codes=pq_mod.encode(pq, v, simf))
    scan = pqv.score_scan(qs, simf)
    _, cand = jax.lax.top_k(scan, 5 * k)  # overquery
    # exact rerank
    cv = v[cand]
    d2 = jnp.sum((qs[:, None, :] - cv) ** 2, -1)
    _, sub = jax.lax.top_k(-d2, k)
    res = np.asarray(jnp.take_along_axis(cand, sub, axis=1))
    truth = ground_truth_topk(qs, v, k, simf)
    rec = recall_at_k(res, truth, k)
    assert rec >= 0.9, rec


def test_refine_improves_or_matches():
    rng = np.random.default_rng(3)
    n, d = 2048, 32
    v1 = rng.standard_normal((n, d)).astype(np.float32)
    v2 = rng.standard_normal((n, d)).astype(np.float32) + 1.0  # shifted dist
    simf = SimilarityFunction.EUCLIDEAN
    pq = pq_mod.train_pq(jnp.asarray(v1), simf, num_subspaces=8, iters=6)
    merged = jnp.asarray(np.concatenate([v1, v2]))
    # reuse-as-is error vs refined error on the merged distribution
    pqv_reuse = pq_mod.PQVectors(pq=pq, codes=pq_mod.encode(pq, merged, simf))
    err_reuse = float(jnp.mean((pqv_reuse.decode() - merged) ** 2))
    pq_ref = pq_mod.refine_pq(pq, merged, simf, iters=3)
    pqv_ref = pq_mod.PQVectors(pq=pq_ref, codes=pq_mod.encode(pq_ref, merged, simf))
    err_ref = float(jnp.mean((pqv_ref.decode() - merged) ** 2))
    assert err_ref <= err_reuse * 1.01


def test_nvq_bit_exact_roundtrip_properties():
    # logisticNQT is monotone and bounded in (0, 1); logitNQT inverts it
    x = jnp.linspace(-4.0, 4.0, 257)
    y = nvq_ops.logistic_nqt(x, 1.7, 0.3)
    assert float(jnp.min(y)) > 0.0 and float(jnp.max(y)) < 1.0
    assert bool(jnp.all(jnp.diff(y) >= 0))
    x_back = nvq_ops.logit_nqt(y, 1.0 / 1.7, 0.3)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x),
                               rtol=0.1, atol=0.15)  # fast approx, not exact


def test_nvq_encode_decode_quality():
    rng = np.random.default_rng(4)
    n, d = 512, 32
    v = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    nv = nvq_mod.train_nvq(v, num_subvectors=2)
    assert nv.bytes_.shape == (n, d)
    assert nv.params.shape == (n, 2, 4)
    mse = float(nvq_mod.reconstruction_mse(nv, v))
    # ~8-bit nonlinear quantization of unit-variance data: tiny error
    assert mse < 1e-3, mse
    # gathered decode matches full decode
    ids = jnp.asarray([3, 77, 200])
    np.testing.assert_allclose(
        np.asarray(nv.decode_rows(ids)), np.asarray(nv.decode()[ids]),
        rtol=1e-6,
    )


def test_scalar_quantization_end_to_end(tmp_path):
    """1/2/4-bit scalar quantization is config-reachable: Hamming
    approximate phase over bit-packed codes + exact fp32 rerank, surviving
    flush -> read -> search -> merge (recompute policy)."""
    from opensearch_jvector_tpu.api.config import DiskAnnConfig, SearchConfig
    from opensearch_jvector_tpu.api.mapping import parse_knn_vector_mapping
    from opensearch_jvector_tpu.index.index import VectorIndex

    dim, n, qn, k = 64, 700, 8, 10
    rng = np.random.default_rng(5)
    v = rng.standard_normal((n, dim)).astype(np.float32)
    q = rng.standard_normal((qn, dim)).astype(np.float32)
    truth = ground_truth_topk(q, v, k, SimilarityFunction.EUCLIDEAN)

    # reachable from the mapping layer
    cfg, _ = parse_knn_vector_mapping({
        "type": "knn_vector", "dimension": dim,
        "method": {"name": "disk_ann", "parameters": {
            "m": 8, "ef_construction": 32,
            "advanced.quantization_type": "4bit",
            "advanced.min_batch_size_for_quantization": 256,
        }},
    })
    assert cfg.quantization_type == "4bit"

    # 1-bit carries only d bits of signal: like the reference's binary
    # quantization it depends on oversampling + exact rerank. ef/oq stay in
    # the default compiled-shape family (ef=100/R=50..100) — CPU compiles of
    # bespoke beam shapes dominate suite wall-clock otherwise.
    for qt, oq, floor in (("1bit", 10, 0.55), ("4bit", 5, 0.82)):
        import dataclasses

        c = dataclasses.replace(cfg, quantization_type=qt)
        idx = VectorIndex(tmp_path / qt, c)
        for i in range(n):
            idx.add(i, v[i])
        idx.flush()
        seg = idx._reader(idx.segment_names[0]).seg
        assert seg.scalar_state is not None
        assert seg.quantization_type == qt
        expected_bytes = {"1bit": dim // 8, "4bit": dim * 15 // 8}[qt]
        assert seg.scalar_codes.shape[1] == expected_bytes
        assert seg.docmap.num_ordinals == n

        res = idx.search(q, SearchConfig(k=k, ef_search=100,
                                         overquery_factor=oq))
        rec = recall_at_k(res.doc_ids, truth, k)
        assert rec >= floor, (qt, rec)
        assert res.reranked > 0  # fp32 rerank actually ran

        if qt == "4bit":  # merge recomputes thresholds + codes (NVQ-style)
            idx.delete([0])
            idx.force_merge()
            seg2 = idx._reader(idx.segment_names[0]).seg
            assert seg2.scalar_state is not None
            res2 = idx.search(q, SearchConfig(k=k, ef_search=100,
                                              overquery_factor=oq))
            assert recall_at_k(res2.doc_ids, truth, k) >= floor - 0.1


def test_scalar_rejected_for_on_disk():
    from opensearch_jvector_tpu.api.config import (
        DiskAnnConfig,
        ValidationError,
    )

    with pytest.raises(ValidationError):
        DiskAnnConfig(dim=32, quantization_type="1bit", mode="on_disk")


@pytest.mark.slow  # stress-tier: churn torture; scalar retrain-on-merge is guarded fast
# by test_scalar_quantization_end_to_end
def test_scalar_churn_delete_merge_retrain(tmp_path):
    """Scalar-quantized index under churn: interleaved deletes + second
    flush + force_merge retrains thresholds over the merged live set and
    keeps recall (the reference's state-cache invalidation contract)."""
    from opensearch_jvector_tpu.api.config import DiskAnnConfig, SearchConfig
    from opensearch_jvector_tpu.index.index import VectorIndex
    from opensearch_jvector_tpu.index.scheduler import (
        ForceMergesOnlyMergePolicy,
    )

    dim, n, qn, k = 32, 600, 8, 10
    rng = np.random.default_rng(9)
    v = rng.standard_normal((n, dim)).astype(np.float32)
    q = rng.standard_normal((qn, dim)).astype(np.float32)
    cfg = DiskAnnConfig(dim=dim, m=8, ef_construction=32,
                        quantization_type="2bit",
                        min_batch_size_for_quantization=128)
    idx = VectorIndex(tmp_path, cfg,
                      merge_policy=ForceMergesOnlyMergePolicy())
    idx.add_batch(np.arange(400), v[:400])
    idx.flush()
    idx.delete(np.arange(0, 400, 5))
    idx.add_batch(np.arange(400, 600), v[400:])
    idx.flush()
    idx.force_merge()
    assert len(idx.segment_names) == 1

    live = sorted(set(range(600)) - set(range(0, 400, 5)))
    live_v = v[live]
    truth_local = np.argsort(
        ((q[:, None, :] - live_v[None]) ** 2).sum(-1), axis=1
    )[:, :k]
    truth = np.asarray(live, np.int64)[truth_local]
    res = idx.search(q, SearchConfig(k=k, ef_search=64, overquery_factor=5))
    hits = 0
    for i in range(qn):
        got = {int(d) for d in res.doc_ids[i] if d >= 0}
        assert not (got & set(range(0, 400, 5))), "deleted doc returned"
        hits += len(got & set(truth[i].tolist()))
    assert hits / (qn * k) >= 0.7, f"churn recall {hits/(qn*k):.3f}"


@pytest.mark.slow  # slow-tier: statistical A/B at corpus scale; anisotropic config and
# roundtrip are guarded fast by test_anisotropic_pq_config_and_roundtrip
def test_anisotropic_pq_beats_plain_on_mip(tmp_path):
    """Score-aware (anisotropic) PQ training: better inner-product ranking
    from the approximate phase at equal bytes/vector (BASELINE config 4
    names anisotropic-PQ; ScaNN-style parallel-residual weighting)."""
    import jax.numpy as jnp

    from opensearch_jvector_tpu.models import pq as pq_mod
    from opensearch_jvector_tpu.ops.distances import SimilarityFunction

    rng = np.random.default_rng(0)
    n, d, qn = 8000, 64, 96
    basis = rng.standard_normal((8, d)).astype(np.float32)
    v = (rng.standard_normal((n, 8)).astype(np.float32) @ basis
         + 0.1 * rng.standard_normal((n, d))).astype(np.float32)
    qv = (rng.standard_normal((qn, 8)).astype(np.float32) @ basis
          + 0.1 * rng.standard_normal((qn, d))).astype(np.float32)
    simf = SimilarityFunction.DOT_PRODUCT
    truth = np.argsort(-(qv @ v.T), axis=1)[:, :10]

    def adc_recall(pq):
        codes = pq_mod.encode(pq, jnp.asarray(v), simf)
        pqv = pq_mod.PQVectors(pq=pq, codes=codes)
        scores = np.asarray(pqv.score_scan(jnp.asarray(qv), simf))
        top = np.argsort(-scores, axis=1)[:, :10]
        return sum(
            len(set(top[i]) & set(truth[i])) for i in range(qn)
        ) / (qn * 10)

    plain = pq_mod.train_pq(jnp.asarray(v), simf, num_subspaces=16)
    eta = pq_mod.eta_for_threshold(0.3, d)
    aniso = pq_mod.train_pq(jnp.asarray(v), simf, num_subspaces=16,
                            anisotropic_eta=eta)
    r_plain, r_aniso = adc_recall(plain), adc_recall(aniso)
    assert r_aniso >= r_plain + 0.02, (r_plain, r_aniso)

    # refine preserves the anisotropic metric
    refined = pq_mod.refine_pq(aniso, jnp.asarray(v), simf, iters=1)
    assert refined.aniso_eta is not None


def test_anisotropic_pq_config_and_roundtrip(tmp_path):
    """pq_anisotropic_threshold plumbs mapping -> config -> flush; the
    trained eta survives the segment roundtrip (merge re-encode must use
    the same assignment metric)."""
    from opensearch_jvector_tpu.api.config import DiskAnnConfig, SearchConfig
    from opensearch_jvector_tpu.api.mapping import parse_knn_vector_mapping
    from opensearch_jvector_tpu.index.index import VectorIndex
    from opensearch_jvector_tpu.ops.distances import SimilarityFunction

    cfg, _ = parse_knn_vector_mapping({
        "type": "knn_vector", "dimension": 32, "space_type": "innerproduct",
        "method": {"name": "disk_ann", "engine": "jvector", "parameters": {
            "m": 8, "ef_construction": 32,
            "advanced.num_pq_subspaces": 8,
            "advanced.min_batch_size_for_quantization": 64,
            "advanced.pq_anisotropic_threshold": 0.25,
        }},
    })
    assert cfg.pq_anisotropic_threshold == 0.25

    rng = np.random.default_rng(1)
    v = rng.standard_normal((300, 32)).astype(np.float32)
    idx = VectorIndex(tmp_path, cfg)
    for i in range(300):
        idx.add(i, v[i])
    idx.flush()
    seg = idx._reader(idx.segment_names[0]).seg
    assert seg.pqv is not None and seg.pqv.pq.aniso_eta is not None

    # reopen: eta restored from the container
    idx2 = VectorIndex(tmp_path)
    seg2 = idx2._reader(idx2.segment_names[0]).seg
    assert seg2.pqv.pq.aniso_eta is not None
    assert float(seg2.pqv.pq.aniso_eta) == pytest.approx(
        float(seg.pqv.pq.aniso_eta))

    res = idx2.search(v[7], SearchConfig(k=5))
    assert res.doc_ids[0][0] == 7

    # bad threshold rejected
    with pytest.raises(Exception):
        DiskAnnConfig(dim=32, pq_anisotropic_threshold=1.5)
