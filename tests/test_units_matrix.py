"""Pure-host unit matrices (no jit, millisecond-fast).

Mirrors the reference's mock-level unit tests: query parse/validate
(KNNQueryBuilderTests.java 480 LoC + KNNQueryBuilderParserTests 595),
mapper validation (KNNVectorFieldMapperTests 1,037), ordinal<->doc map
(GraphNodeIdToDocMapTests), settings registry (KNNSettingsTests), stats
(KNNStatsTests), method-parameter trees (MethodComponentContextTests).
"""

import numpy as np
import pytest

from opensearch_jvector_tpu.api.config import (
    DiskAnnConfig,
    SearchConfig,
    ValidationError,
)
from opensearch_jvector_tpu.api.mapping import parse_knn_vector_mapping
from opensearch_jvector_tpu.api.settings import SettingsRegistry
from opensearch_jvector_tpu.api.stats import Counter, StatsRegistry
from opensearch_jvector_tpu.index.docmap import DocMap
from opensearch_jvector_tpu.ops.distances import SimilarityFunction
from opensearch_jvector_tpu.query.builder import (
    KnnQuery,
    Rescore,
    parse_knn_query,
)


# ---------------------------------------------------------------------------
# knn query DSL (KNNQueryBuilderTests / parser tests)
# ---------------------------------------------------------------------------


class TestKnnQueryParse:
    def test_minimal(self):
        q = parse_knn_query({"vector": [1.0, 2.0], "k": 5})
        assert q.k == 5 and not q.is_radial
        assert q.vector.dtype == np.float32

    @pytest.mark.parametrize("k", [0, -1, 10_001])
    def test_k_bounds(self, k):
        with pytest.raises(ValidationError):
            parse_knn_query({"vector": [1.0], "k": k})

    def test_k_boundary_values_ok(self):
        assert parse_knn_query({"vector": [1.0], "k": 1}).k == 1
        assert parse_knn_query({"vector": [1.0], "k": 10_000}).k == 10_000

    def test_missing_vector(self):
        with pytest.raises(ValidationError, match="vector"):
            parse_knn_query({"k": 5})

    def test_no_mode_given(self):
        with pytest.raises(ValidationError, match="required"):
            parse_knn_query({"vector": [1.0]})

    @pytest.mark.parametrize(
        "extra",
        [
            {"k": 3, "max_distance": 0.5},
            {"k": 3, "min_score": 0.5},
            {"max_distance": 1.0, "min_score": 0.5},
        ],
    )
    def test_radial_exclusivity(self, extra):
        # radial limits are mutually exclusive with k and with each other
        # (KNNQueryBuilder.java radial validation)
        with pytest.raises(ValidationError, match="exclusive"):
            parse_knn_query({"vector": [1.0], **extra})

    def test_unknown_top_level_field(self):
        with pytest.raises(ValidationError, match="unknown"):
            parse_knn_query({"vector": [1.0], "k": 3, "boost_factor": 2})

    def test_unknown_method_parameter(self):
        with pytest.raises(ValidationError, match="method_parameters"):
            parse_knn_query(
                {"vector": [1.0], "k": 3,
                 "method_parameters": {"ef": 10}}
            )

    def test_method_parameters_resolved(self):
        q = parse_knn_query(
            {"vector": [1.0], "k": 3,
             "method_parameters": {
                 "ef_search": 64, "overquery_factor": 7,
                 "advanced.threshold": 0.25,
                 "advanced.rerank_floor": 0.1,
                 "advanced.use_pruning": True,
             }}
        )
        assert (q.ef_search, q.overquery_factor) == (64, 7)
        assert (q.threshold, q.rerank_floor, q.use_pruning) == (
            0.25, 0.1, True)

    def test_defaults(self):
        q = parse_knn_query({"vector": [1.0], "k": 3})
        # KNNConstants.java:90-93 defaults
        assert q.overquery_factor == 5
        assert q.threshold == 0.0 and q.rerank_floor == 0.0
        assert q.use_pruning is False
        assert q.rescore is None and q.ignore_unmapped is False

    def test_rescore_forms(self):
        assert parse_knn_query(
            {"vector": [1.0], "k": 3, "rescore": True}
        ).rescore.oversample_factor == 2.0
        assert parse_knn_query(
            {"vector": [1.0], "k": 3,
             "rescore": {"oversample_factor": 4.5}}
        ).rescore.oversample_factor == 4.5
        assert parse_knn_query(
            {"vector": [1.0], "k": 3, "rescore": False}
        ).rescore is None
        with pytest.raises(ValidationError):
            parse_knn_query({"vector": [1.0], "k": 3, "rescore": "yes"})

    @pytest.mark.parametrize("ov", [0.5, 100.5])
    def test_rescore_oversample_bounds(self, ov):
        # RescoreContext bounds: oversample in [1, 100]
        with pytest.raises(ValidationError):
            Rescore(oversample_factor=ov)

    def test_batched_vector_accepted(self):
        q = parse_knn_query({"vector": [[1.0, 2.0], [3.0, 4.0]], "k": 2})
        assert q.vector.shape == (2, 2)

    def test_3d_vector_rejected(self):
        with pytest.raises(ValidationError):
            KnnQuery(vector=np.zeros((2, 2, 2)), k=1)

    def test_overquery_and_ef_lower_bounds(self):
        with pytest.raises(ValidationError):
            KnnQuery(vector=np.zeros(4), k=1, overquery_factor=0)
        with pytest.raises(ValidationError):
            KnnQuery(vector=np.zeros(4), k=1, ef_search=0)

    def test_radial_parse(self):
        q = parse_knn_query({"vector": [1.0], "max_distance": 2.5})
        assert q.is_radial and q.max_distance == 2.5
        q = parse_knn_query({"vector": [1.0], "min_score": 0.8})
        assert q.is_radial and q.min_score == 0.8

    def test_ignore_unmapped_flag(self):
        q = parse_knn_query(
            {"vector": [1.0], "k": 1, "ignore_unmapped": True}
        )
        assert q.ignore_unmapped is True


# ---------------------------------------------------------------------------
# knn_vector mapping (KNNVectorFieldMapperTests)
# ---------------------------------------------------------------------------


class TestMapping:
    def test_minimal_defaults(self):
        cfg, extras = parse_knn_vector_mapping(
            {"type": "knn_vector", "dimension": 8}
        )
        # reference defaults: m=32, ef_construction=100, alpha=1.2,
        # overflow=1.2, quantization=pq, minBatch=1024, hierarchy off
        assert (cfg.dim, cfg.m, cfg.ef_construction) == (8, 32, 100)
        assert (cfg.alpha, cfg.neighbor_overflow) == (1.2, 1.2)
        assert cfg.quantization_type == "pq"
        assert cfg.min_batch_size_for_quantization == 1024
        assert cfg.hierarchy_enabled is False
        assert cfg.similarity is SimilarityFunction.EUCLIDEAN
        assert extras["mode"] == "in_memory"

    def test_wrong_type(self):
        with pytest.raises(ValidationError):
            parse_knn_vector_mapping({"type": "dense_vector", "dimension": 4})

    def test_data_type_float_accepted(self):
        cfg, _ = parse_knn_vector_mapping(
            {"type": "knn_vector", "dimension": 8, "data_type": "float"}
        )
        assert cfg.dim == 8

    @pytest.mark.parametrize("dt", ["byte", "binary", "BYTE"])
    def test_data_type_byte_binary_rejected(self, dt):
        """jVector engine is float-only (VectorDataType.java:28; byte
        vectors throw in the codec — testJVectorKnnIndex_simpleCase_
        withBinaryVector)."""
        with pytest.raises(ValidationError, match="not supported"):
            parse_knn_vector_mapping(
                {"type": "knn_vector", "dimension": 8, "data_type": dt}
            )

    def test_data_type_unknown_rejected(self):
        with pytest.raises(ValidationError, match="unknown data_type"):
            parse_knn_vector_mapping(
                {"type": "knn_vector", "dimension": 8, "data_type": "int4"}
            )

    def test_missing_dimension(self):
        with pytest.raises(ValidationError, match="dimension"):
            parse_knn_vector_mapping({"type": "knn_vector"})

    @pytest.mark.parametrize(
        "space,simf",
        [("l2", SimilarityFunction.EUCLIDEAN),
         ("cosinesimil", SimilarityFunction.COSINE),
         ("innerproduct", SimilarityFunction.DOT_PRODUCT),
         ("undefined", SimilarityFunction.EUCLIDEAN)],
    )
    def test_space_types(self, space, simf):
        cfg, _ = parse_knn_vector_mapping(
            {"type": "knn_vector", "dimension": 4, "space_type": space}
        )
        assert cfg.similarity is simf

    @pytest.mark.parametrize("space", ["l1", "linf", "hamming"])
    def test_script_only_spaces_rejected_for_engine(self, space):
        # the engine rejects them at build time exactly like the reference
        # (JVectorWriter.java:667-675 throws); they stay script-scoring-only
        with pytest.raises(ValidationError, match="exact-scoring"):
            parse_knn_vector_mapping(
                {"type": "knn_vector", "dimension": 4, "space_type": space}
            )

    def test_unknown_space(self):
        with pytest.raises(ValidationError):
            parse_knn_vector_mapping(
                {"type": "knn_vector", "dimension": 4, "space_type": "lp"}
            )

    def test_unknown_method_param_rejected(self):
        with pytest.raises(ValidationError, match="unknown method param"):
            parse_knn_vector_mapping(
                {"type": "knn_vector", "dimension": 4,
                 "method": {"name": "disk_ann",
                            "parameters": {"ef_runtime": 10}}}
            )

    def test_full_param_tree(self):
        cfg, _ = parse_knn_vector_mapping(
            {"type": "knn_vector", "dimension": 16,
             "method": {"name": "disk_ann", "parameters": {
                 "m": 24, "ef_construction": 77,
                 "advanced.alpha": 1.5,
                 "advanced.neighbor_overflow": 1.3,
                 "advanced.hierarchy_enabled": True,
                 "advanced.min_batch_size_for_quantization": 512,
                 "advanced.num_pq_subspaces": 4,
                 "advanced.quantization_type": "nvq+pq",
                 "advanced.nvq.num_subvectors": 3,
                 "advanced.leading_segment_merge_disabled": True,
             }}}
        )
        assert (cfg.m, cfg.ef_construction, cfg.alpha) == (24, 77, 1.5)
        assert cfg.neighbor_overflow == 1.3
        assert cfg.hierarchy_enabled and cfg.leading_segment_merge_disabled
        assert cfg.min_batch_size_for_quantization == 512
        assert (cfg.num_pq_subspaces, cfg.nvq_num_subvectors) == (4, 3)
        assert cfg.quantization_type == "nvq+pq"

    @pytest.mark.parametrize(
        "level,subspaces,oversample",
        [("x8", 16, 2.0), ("x16", 8, 3.0), ("x32", 4, 3.0), ("x64", 2, 5.0)],
    )
    def test_compression_levels(self, level, subspaces, oversample):
        # CompressionLevel.java:49-61: bytes ratio + default rescore context
        cfg, extras = parse_knn_vector_mapping(
            {"type": "knn_vector", "dimension": 32,
             "compression_level": level}
        )
        assert cfg.num_pq_subspaces == subspaces
        assert extras["default_rescore_oversample"] == oversample

    def test_compression_x2_rejected(self):
        with pytest.raises(ValidationError, match="x2"):
            parse_knn_vector_mapping(
                {"type": "knn_vector", "dimension": 32,
                 "compression_level": "x2"}
            )

    def test_compression_x1_is_uncompressed(self):
        cfg, extras = parse_knn_vector_mapping(
            {"type": "knn_vector", "dimension": 32, "compression_level": "x1"}
        )
        assert cfg.num_pq_subspaces is None
        assert "default_rescore_oversample" not in extras

    def test_bad_compression_level(self):
        with pytest.raises(ValidationError):
            parse_knn_vector_mapping(
                {"type": "knn_vector", "dimension": 32,
                 "compression_level": "x7"}
            )

    def test_unknown_engine_and_method(self):
        with pytest.raises(ValidationError):
            parse_knn_vector_mapping(
                {"type": "knn_vector", "dimension": 4,
                 "method": {"name": "ivf"}}
            )
        with pytest.raises(ValidationError):
            parse_knn_vector_mapping(
                {"type": "knn_vector", "dimension": 4,
                 "method": {"name": "disk_ann", "engine": "faiss"}}
            )

    def test_mode_on_disk(self):
        cfg, extras = parse_knn_vector_mapping(
            {"type": "knn_vector", "dimension": 8, "mode": "on_disk"}
        )
        assert cfg.mode == "on_disk" and extras["mode"] == "on_disk"
        with pytest.raises(ValidationError):
            parse_knn_vector_mapping(
                {"type": "knn_vector", "dimension": 8, "mode": "paged"}
            )


# ---------------------------------------------------------------------------
# DiskAnnConfig / SearchConfig validation (Parameter DSL bounds)
# ---------------------------------------------------------------------------


class TestConfigValidation:
    @pytest.mark.parametrize(
        "kwargs",
        [
            dict(dim=0), dict(dim=-3), dict(dim=16_001),
            dict(dim=8, m=0), dict(dim=8, m=513),
            dict(dim=8, ef_construction=0),
            dict(dim=8, ef_construction=10_001),
            dict(dim=8, alpha=0.99),
            dict(dim=8, neighbor_overflow=0.5),
            dict(dim=8, quantization_type="opq"),
            dict(dim=8, nvq_num_subvectors=0),
            dict(dim=8, min_batch_size_for_quantization=0),
            dict(dim=8, mode="mmap"),
            dict(dim=8, mode="on_disk", quantization_type="none"),
            dict(dim=8, mode="on_disk", quantization_type="1bit"),
        ],
    )
    def test_rejects(self, kwargs):
        with pytest.raises(ValidationError):
            DiskAnnConfig(**kwargs)

    def test_meta_roundtrip(self):
        cfg = DiskAnnConfig(dim=24, similarity=SimilarityFunction.COSINE,
                            m=20, quantization_type="nvq+pq")
        again = DiskAnnConfig.from_meta(cfg.to_meta())
        assert again == cfg

    def test_search_config_bounds_and_ef_resolution(self):
        with pytest.raises(ValidationError):
            SearchConfig(k=0)
        with pytest.raises(ValidationError):
            SearchConfig(k=10_001)
        with pytest.raises(ValidationError):
            SearchConfig(k=5, overquery_factor=0)
        assert SearchConfig(k=10).resolved_ef() == 100
        assert SearchConfig(k=50, overquery_factor=5).resolved_ef() == 250
        assert SearchConfig(k=10, ef_search=33).resolved_ef() == 33


# ---------------------------------------------------------------------------
# DocMap (GraphNodeIdToDocMapTests)
# ---------------------------------------------------------------------------


class TestDocMap:
    def test_lookup_and_inverse(self):
        dm = DocMap(np.asarray([10, 30, -1, 20], np.int64))
        np.testing.assert_array_equal(
            dm.lookup_docs(np.asarray([0, 1, 2, 3, -1])),
            [10, 30, -1, 20, -1],
        )
        inv = dm.doc_to_ord()
        assert inv.shape[0] == 31
        assert inv[10] == 0 and inv[30] == 1 and inv[20] == 3
        assert inv[11] == -1

    def test_apply_sort(self):
        # docs 0..3 resorted: old->new = [2, 0, 3, 1]
        dm = DocMap(np.asarray([0, 1, 2, 3], np.int64),
                    np.asarray([-1, 0, -1, 2], np.int64))
        s = dm.apply_sort(np.asarray([2, 0, 3, 1], np.int64))
        np.testing.assert_array_equal(s.ord_to_doc, [2, 0, 3, 1])
        # parent ids are remapped through the same sort map
        np.testing.assert_array_equal(s.ord_to_parent, [-1, 2, -1, 3])

    def test_mark_deleted_docs_scopes_to_segment(self):
        dm = DocMap(np.asarray([5, 7, 9], np.int64))
        # 7 is ours; 100 belongs to another segment; -3 is junk
        ords = dm.mark_deleted_docs(np.asarray([7, 100, -3], np.int64))
        np.testing.assert_array_equal(ords, [1])

    def test_concat_rebases_docs_and_parents(self):
        a = DocMap(np.asarray([0, 1], np.int64),
                   np.asarray([-1, 0], np.int64))
        b = DocMap(np.asarray([0, -1, 2], np.int64))
        m = DocMap.concat([a, b], [0, 2])
        np.testing.assert_array_equal(m.ord_to_doc, [0, 1, 2, -1, 4])
        np.testing.assert_array_equal(m.ord_to_parent, [-1, 0, -1, -1, -1])

    def test_concat_drops_parent_map_when_all_root(self):
        a = DocMap(np.asarray([0], np.int64))
        b = DocMap(np.asarray([0], np.int64))
        assert DocMap.concat([a, b], [0, 1]).ord_to_parent is None

    def test_lookup_parents(self):
        dm = DocMap(np.asarray([3, 4, 6], np.int64),
                    np.asarray([-1, 3, 3], np.int64))
        np.testing.assert_array_equal(
            dm.lookup_parents(np.asarray([4, 6, 3, 99])), [3, 3, -1, -1]
        )


# ---------------------------------------------------------------------------
# Settings registry (KNNSettingsTests)
# ---------------------------------------------------------------------------


class TestSettings:
    def test_defaults_and_put(self):
        reg = SettingsRegistry()
        assert reg.get("knn.memory.circuit_breaker.limit") == 50.0
        reg.put("knn.memory.circuit_breaker.limit", 75.0)
        assert reg.get("knn.memory.circuit_breaker.limit") == 75.0

    def test_unknown_setting(self):
        reg = SettingsRegistry()
        with pytest.raises(KeyError):
            reg.get("knn.bogus")
        with pytest.raises(KeyError):
            reg.put("knn.bogus", 1)

    def test_validator_rejects(self):
        reg = SettingsRegistry()
        with pytest.raises(ValueError):
            reg.put("knn.memory.circuit_breaker.limit", 150.0)
        with pytest.raises(ValueError):
            reg.put("knn.algo_param.index_thread_qty", 0)
        with pytest.raises(ValueError):
            reg.put("knn.quantization.cache.size.limit", 11.0)  # cap 10%

    def test_non_dynamic_rejects_second_write(self):
        reg = SettingsRegistry()
        reg.put("index.knn", False)
        with pytest.raises(ValueError, match="not dynamic"):
            reg.put("index.knn", True)

    def test_consumers_fire(self):
        reg = SettingsRegistry()
        seen = []
        reg.on_change("knn.memory.circuit_breaker.enabled", seen.append)
        reg.put("knn.memory.circuit_breaker.enabled", False)
        assert seen == [False]

    def test_snapshot_covers_all(self):
        snap = SettingsRegistry().snapshot()
        assert "index.knn.derived_source.enabled" in snap
        assert "knn.feature.cache.force_evict.enabled" in snap


# ---------------------------------------------------------------------------
# Stats (KNNStatsTests + transport aggregation)
# ---------------------------------------------------------------------------


class TestStats:
    def test_increment_and_snapshot(self):
        r = StatsRegistry()
        r.increment(Counter.KNN_QUERY_COUNT)
        r.increment(Counter.KNN_QUERY_VISITED_NODES, 17)
        snap = r.snapshot()
        assert snap["knn_query_count"] == 1
        assert snap["knn_query_visited_nodes"] == 17

    def test_all_seven_jvector_counters_present(self):
        # KNNCounter.java:30-37
        snap = StatsRegistry().snapshot()
        for key in ("knn_query_visited_nodes", "knn_query_reranked_count",
                    "knn_query_expanded_nodes",
                    "knn_query_expanded_base_layer_nodes",
                    "knn_graph_search_time",
                    "knn_quantization_training_time",
                    "knn_graph_merge_time"):
            assert key in snap

    def test_aggregate_sums_nodes(self):
        a, b = StatsRegistry(), StatsRegistry()
        a.increment(Counter.KNN_QUERY_COUNT, 2)
        b.increment(Counter.KNN_QUERY_COUNT, 3)
        agg = StatsRegistry.aggregate([a, b])
        assert agg["knn_query_count"] == 5

    def test_timed_counter(self):
        r = StatsRegistry()
        with r.timed(Counter.KNN_GRAPH_SEARCH_TIME):
            pass
        assert r.get(Counter.KNN_GRAPH_SEARCH_TIME) >= 0

    def test_reset(self):
        r = StatsRegistry()
        r.increment(Counter.KNN_MERGE_COUNT, 9)
        r.reset()
        assert r.get(Counter.KNN_MERGE_COUNT) == 0


class TestHostCandidateScores:
    """The on_disk tier's host-side rerank scorer must agree with the
    device scorer bit-for-practical-purposes (same formulas, fp32)."""

    @pytest.mark.parametrize("simf", [
        SimilarityFunction.EUCLIDEAN,
        SimilarityFunction.DOT_PRODUCT,
        SimilarityFunction.COSINE,
    ])
    def test_matches_device_scorer(self, simf):
        import jax.numpy as jnp

        from opensearch_jvector_tpu.ops.distances import (
            batched_candidate_scores,
            host_candidate_scores,
        )

        rng = np.random.default_rng(3)
        q = rng.normal(0, 1, (5, 16)).astype(np.float32)
        c = rng.normal(0, 1, (5, 7, 16)).astype(np.float32)
        dev = np.asarray(
            batched_candidate_scores(jnp.asarray(q), jnp.asarray(c), simf)
        )
        host = host_candidate_scores(q, c, simf)
        np.testing.assert_allclose(host, dev, rtol=1e-5, atol=1e-6)
