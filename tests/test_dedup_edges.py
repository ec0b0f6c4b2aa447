"""Degenerate-input edges for the dedup/text operators: empty corpus,
single document, NULL and empty-string text. At 100 TB every one of these
occurs as some partition's reality; none may raise or fabricate pairs."""

import pytest
from pyspark.sql import functions as F

from waimak_spark.functions import dedup as D
from waimak_spark.functions.cache_registry import release_tracked


@pytest.fixture(autouse=True)
def _release_caches():
    yield
    release_tracked()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


EDGE_CORPORA = {
    "empty": [],
    "single": [(1, "one tiny document with a few words")],
    "null_text": [(1, None), (2, "real words here for the test")],
    "empty_text": [(1, ""), (2, "   "), (3, "real words here again ok")],
    "short_docs": [(1, "one two"), (2, "a b")],  # < shingle width
}


@pytest.mark.parametrize("case", sorted(EDGE_CORPORA))
class TestDedupEdges:
    def test_exact_dedup(self, spark, case):
        docs = _docs(spark, EDGE_CORPORA[case])
        out = D.exact_dedup(docs)
        assert out.count() <= max(len(EDGE_CORPORA[case]), 0)

    def test_minhash_signature(self, spark, case):
        docs = _docs(spark, EDGE_CORPORA[case])
        out = D.minhash_signature(docs)
        assert out.count() == len(EDGE_CORPORA[case])

    def test_lsh_candidate_pairs(self, spark, case):
        docs = _docs(spark, EDGE_CORPORA[case])
        pairs = D.lsh_candidate_pairs(D.minhash_signature(docs)).collect()
        # no corpus here contains a duplicate pair
        assert pairs == []

    def test_simhash_near_dups(self, spark, case):
        docs = _docs(spark, EDGE_CORPORA[case])
        out = D.simhash_near_dups(D.simhash(docs)).collect()
        ids = {i for r in out for i in (r.doc_a, r.doc_b)}
        # only real-word docs may pair; NULL/empty texts must not
        assert all(isinstance(i, int) for i in ids)

    def test_ngram_jaccard_pairs(self, spark, case):
        docs = _docs(spark, EDGE_CORPORA[case])
        out = D.ngram_jaccard_pairs(docs, min_jaccard=0.1).collect()
        assert out == []


class TestStopShinglePrune:
    def test_boilerplate_shingles_never_pair(self, spark):
        """The DF prune (now a groupBy + join-back) must drop shingles in
        > max(MIN_DF_FLOOR, 1% of docs) documents: docs sharing ONLY the
        boilerplate footer never pair, while a genuine near-dup pair
        sharing rare shingles still does."""
        footer = "all rights reserved contact us at example dot com today"
        rows = [(i, f"unique body {i} alpha{i} beta{i} gamma{i} " + footer)
                for i in range(1, 9)]  # footer in 8 docs > MIN_DF_FLOOR=5
        dup = "the quick brown fox jumps over the lazy sleeping dog"
        rows += [(100, dup), (101, dup + " extra")]
        docs = _docs(spark, rows)
        pairs = {(r.doc_a, r.doc_b)
                 for r in D.ngram_jaccard_pairs(docs, min_jaccard=0.1)
                 .collect()}
        assert (100, 101) in pairs
        assert all(a >= 100 and b >= 100 for a, b in pairs), pairs

    def test_prune_matches_oracle_on_boilerplate_corpus(self, spark):
        """DuckDB lockstep on a corpus engineered to trip the prune — the
        oracle implements the identical threshold arithmetic."""
        import duckdb

        footer = "standard legal disclaimer text that repeats everywhere"
        rows = [(i, f"doc {i} words vary here item{i} thing{i} " + footer)
                for i in range(1, 10)]
        rows += [(50, "a genuinely distinct document about fishing boats"),
                 (51, "a genuinely distinct document about fishing boats")]
        docs = _docs(spark, rows)
        got = sorted(tuple(r) for r in
                     D.ngram_jaccard_pairs(docs, min_jaccard=0.1).collect())
        con = duckdb.connect()
        con.register("documents_py", docs.toPandas())
        con.execute("create view documents as select * from documents_py")
        want = sorted(tuple(r) for r in con.execute(
            D.ngram_jaccard_pairs_sql(min_jaccard=0.1)).fetchall())
        assert got == want
