"""Stored BM25 inverted index — build-once/probe-many lexical
retrieval (the stored-IVF posture applied to BM25).  The probe must be
BIT-IDENTICAL to the inline `bm25_topk`, which is why the entry lives
in the extras registry's permanent output-identity-sibling class
(`bm25_search` holds the family's official driver row)."""

import duckdb
import pytest

from waimak_spark.functions.retrieval import (
    BM25_QUERIES,
    BM25_TOPK,
    bm25_topk,
)


@pytest.fixture(scope="module")
def stored(spark):
    import os

    from waimak_spark.catalog.text import (
        _bm25_index_table,
        drop_bm25_index,
    )

    sf = os.environ.get("SPARK_GRAFT_SF_DIR_TEST",
                        "/root/testdata/sf0.001")
    drop_bm25_index(spark, sf)
    name = _bm25_index_table(spark, sf)
    yield sf, name


class TestBm25Stored:
    def test_probe_identical_to_inline(self, stored, spark):
        """The whole contract: stored probe == inline BM25, row for
        row (same rounded scores, same ranks)."""
        from waimak_spark.catalog.text import bm25_probe_stored

        sf, _name = stored
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        got = [tuple(r) for r in bm25_probe_stored(spark, sf).collect()]
        want = [tuple(r) for r in bm25_topk(docs).collect()]
        assert got == want
        assert len(got) == len(BM25_QUERIES) * BM25_TOPK

    def test_catalog_fn_matches_duckdb(self, stored, spark):
        from waimak_spark.catalog.text import (
            _bm25_probe_stored_oracle,
            bm25_probe_stored,
        )

        sf, _name = stored
        got = [tuple(r) for r in bm25_probe_stored(spark, sf).collect()]
        con = duckdb.connect()
        con.execute(f"create view documents as "
                    f"select * from '{sf}/documents.parquet'")
        want = [tuple(r) for r in con.execute(
            _bm25_probe_stored_oracle()).fetchall()]
        assert got == want

    def test_probe_prunes_buckets_no_python(self, stored, spark):
        """The probe's postings scan must bucket-prune on the query
        vocabulary (SelectedBucketsCount < total) and stay fully JVM."""
        from waimak_spark.catalog.text import bm25_probe_stored

        sf, _name = stored
        plan = (bm25_probe_stored(spark, sf)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Bucketed: true" in plan
        assert "SelectedBucketsCount" in plan, "bucket pruning lost"
        sel = plan.split("SelectedBucketsCount: ")[1]
        probed, total = sel.split("\n")[0].split(" out of ")
        assert int(probed) < int(total.strip().rstrip(")")), \
            "probe scanned every bucket"
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_build_happens_once(self, stored, spark, monkeypatch):
        """A warm probe must not re-tokenize the corpus — the one-time
        build is the operator's entire point."""
        import waimak_spark.catalog.text as ct

        sf, _name = stored

        def boom(*a, **k):
            raise AssertionError("postings rebuilt on a warm index")

        import waimak_spark.functions.retrieval as R

        monkeypatch.setattr(R, "bm25_postings_frame", boom)
        assert ct.bm25_probe_stored(spark, sf).count() > 0

    def test_crash_leftover_without_props_rebuilds(self, stored, spark):
        """A table missing the stats properties is a build that crashed
        between write and stamp — it must be dropped and rebuilt, and
        the rebuilt probe still equals inline."""
        from waimak_spark.catalog.text import (
            _BM25_N_PROP,
            _bm25_index_table,
            bm25_probe_stored,
        )

        sf, name = stored
        spark.sql(f"alter table {name} unset tblproperties"
                  f" ('{_BM25_N_PROP}')")
        rebuilt = _bm25_index_table(spark, sf)
        assert rebuilt == name
        props = {r["key"]: r["value"] for r in spark.sql(
            f"show tblproperties {name}").collect()}
        assert _BM25_N_PROP in props
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        assert [tuple(r) for r in
                bm25_probe_stored(spark, sf).collect()] == \
            [tuple(r) for r in bm25_topk(docs).collect()]

    def test_stats_props_round_trip_exactly(self, stored, spark):
        """repr -> string property -> float must reproduce the build's
        avgdl double bit-for-bit (the identity guarantee rests on it)."""
        from waimak_spark.catalog.text import (
            _BM25_AVGDL_PROP,
            _BM25_N_PROP,
        )
        from waimak_spark.functions.retrieval import bm25_corpus_stats

        sf, name = stored
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        n_docs, avgdl = bm25_corpus_stats(docs)
        props = {r["key"]: r["value"] for r in spark.sql(
            f"show tblproperties {name}").collect()}
        assert int(props[_BM25_N_PROP]) == n_docs
        assert float(props[_BM25_AVGDL_PROP]) == avgdl
