"""Duplicate-resolution semantics over embedding candidate pairs: the
documented ONE-HOP contract of embedding_cosine_dedup vs the
chain-resolving fixpoint variant."""

from pyspark.sql import functions as F

import waimak_spark.functions.similarity as S


def _ids(spark, n):
    return spark.createDataFrame([(i,) for i in range(1, n + 1)], "id int")


def _pairs(spark, edges):
    return spark.createDataFrame(list(edges), "id_a int, id_b int")


class TestFixpointResolution:
    def test_chain_of_three_collapses_to_component_min(self, spark):
        # chain 1~2, 2~3 (1 and 3 NOT direct pairs) + isolated pair 4~5
        out = S.resolve_duplicates_fixpoint(
            _ids(spark, 6), _pairs(spark, [(1, 2), (2, 3), (4, 5)]))
        got = {r["id"]: r["canonical_id"] for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}

    def test_long_chain_and_iteration_bound(self, spark):
        # a 6-node path needs several propagation rounds; max_iters caps it
        edges = [(i, i + 1) for i in range(1, 6)]
        out = S.resolve_duplicates_fixpoint(_ids(spark, 6),
                                            _pairs(spark, edges))
        assert {r["canonical_id"] for r in out.collect()} == {1}
        # with max_iters=1 the far end cannot have converged to 1
        partial = S.resolve_duplicates_fixpoint(
            _ids(spark, 6), _pairs(spark, edges), max_iters=1)
        got = {r["id"]: r["canonical_id"] for r in partial.collect()}
        assert got[2] == 1 and got[6] != 1

    def test_no_edges_is_identity(self, spark):
        out = S.resolve_duplicates_fixpoint(
            _ids(spark, 3), _pairs(spark, []))
        got = {r["id"]: r["canonical_id"] for r in out.collect()}
        assert got == {1: 1, 2: 2, 3: 3}


class TestOneHopContract:
    def test_one_hop_keeps_chain_middle_as_canonical(self, spark,
                                                     monkeypatch):
        """embedding_cosine_dedup documents min-over-DIRECT-neighbors:
        in the chain 1~2, 2~3, id 3 maps to 2 (its only neighbor), not 1.
        Locks the documented contract so a silent semantic change fails."""
        pairs = _pairs(spark, [(1, 2), (2, 3)]).withColumn(
            "cosine_sim", F.lit(0.9))
        monkeypatch.setattr(S, "lsh_ann_pairs", lambda *a, **k: pairs)
        emb = spark.createDataFrame([(i, [0.0]) for i in range(1, 4)],
                                    "vec_id int, embedding array<float>")
        out = S.embedding_cosine_dedup(emb)
        got = {r["vec_id"]: r["canonical_id"] for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 2}

    def test_fixpoint_variant_resolves_same_chain_fully(self, spark,
                                                        monkeypatch):
        pairs = _pairs(spark, [(1, 2), (2, 3)])
        monkeypatch.setattr(S, "lsh_ann_pairs", lambda *a, **k: pairs)
        emb = spark.createDataFrame([(i, [0.0]) for i in range(1, 4)],
                                    "vec_id int, embedding array<float>")
        out = S.embedding_cosine_dedup_fixpoint(emb)
        got = {r["vec_id"]: r["canonical_id"] for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 1}
