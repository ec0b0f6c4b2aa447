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
