"""Exact set-similarity join with lossless prefix filtering (Bayardo,
Ma & Srikant 2007, WWW) — the provably-complete counterpart to the
heuristic LSH/df-cap candidate generators.  The reference (waimak) has
no similarity surface; this is the training-data-pipeline extension
family (round-19 catalog admission candidate per PARITY's rotation
ledger), so the oracle lockstep lives here until a slot opens."""

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from waimak_spark.functions.dedup import (
    PPJOIN_TAU,
    jaccard_prefix_join,
    jaccard_prefix_join_sql,
)


def _py_shingles(text: str, n: int = 3) -> list[str]:
    toks = [t for t in text.lower().split() if t]
    return list(dict.fromkeys(
        " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)))


def _py_all_pairs(texts: dict[int, str], tau: float = PPJOIN_TAU,
                  n: int = 3):
    """Brute-force reference: EVERY pair's exact Jaccard, no pruning —
    the completeness yardstick the prefix filter must reproduce."""
    sets = {i: set(_py_shingles(t, n)) for i, t in texts.items()
            if t is not None}
    out = {}
    for a in sorted(sets):
        for b in sorted(sets):
            if a >= b or not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and round(inter / union, 4) >= tau:
                out[(a, b)] = (inter, round(inter / union, 4))
    return out


class TestPrefixJoinOracle:
    def test_catalog_fn_matches_duckdb(self, spark, sf_dir):
        from waimak_spark.catalog.text import (
            _jaccard_prefix_oracle,
            dedup_jaccard_prefix,
        )

        got = [tuple(r) for r in
               dedup_jaccard_prefix(spark, sf_dir).collect()]
        con = duckdb.connect()
        con.execute(f"create view documents as "
                    f"select * from '{sf_dir}/documents.parquet'")
        want = [tuple(r) for r in
                con.execute(_jaccard_prefix_oracle()).fetchall()]
        assert len(got) == len(want) > 0
        assert got == want

    def test_complete_vs_brute_force_on_testdata(self, spark, sf_dir):
        """The lossless claim, on the real corpus: the prefix-filtered
        join emits EXACTLY the pairs a no-pruning all-pairs scan finds
        at the same threshold."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        texts = {r.doc_id: r.text for r in
                 docs.select("doc_id", "text").collect()}
        want = _py_all_pairs(texts)
        got = {(r.doc_a, r.doc_b): (r.shared, r.jaccard)
               for r in jaccard_prefix_join(docs).collect()}
        assert got == want
        assert len(got) > 0

    def test_matches_brute_force_at_other_taus(self, spark):
        texts = {0: "a b c d e f g h", 1: "a b c d e f g x",
                 2: "a b c d e f y z", 3: "p q r s t u v w",
                 4: "p q r s t u v w", 5: None, 6: "one two"}
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in texts.items()])
        for tau in (0.3, 0.5, 0.8):
            want = _py_all_pairs(texts, tau)
            got = {(r.doc_a, r.doc_b): (r.shared, r.jaccard)
                   for r in jaccard_prefix_join(df, tau=tau).collect()}
            assert got == want, tau

    @settings(max_examples=20, deadline=None)
    @given(st.lists(st.lists(st.sampled_from("abcdef"), min_size=3,
                             max_size=10), min_size=2, max_size=8),
           st.sampled_from([0.25, 0.5, 0.75]))
    def test_property_prefix_filter_is_complete(self, docs, tau):
        """Pure-Python completeness property: for random tiny corpora
        and thresholds, the prefix-filtered candidate set covers every
        qualifying pair (the theorem the operator rests on)."""
        texts = {i: " ".join(ws) for i, ws in enumerate(docs)}
        import math

        sets = {i: _py_shingles(t) for i, t in texts.items()}
        dfreq: dict[str, int] = {}
        for s in sets.values():
            for sh in s:
                dfreq[sh] = dfreq.get(sh, 0) + 1
        import hashlib

        def prefix(s):
            ordered = sorted(s, key=lambda sh: (
                dfreq[sh], hashlib.md5(sh.encode()).hexdigest()))
            keep = len(s) - math.ceil(len(s) * tau) + 1
            return set(ordered[:keep])

        for (a, b) in _py_all_pairs(texts, tau):
            assert prefix(sets[a]) & prefix(sets[b]), (
                f"qualifying pair ({a},{b}) missed by prefix filter")

    def test_short_and_null_docs_excluded(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=0, text="one two"),     # < n tokens: empty set
             Row(doc_id=1, text=None),
             Row(doc_id=2, text="x y z w"), Row(doc_id=3, text="x y z w")])
        got = [tuple(r) for r in jaccard_prefix_join(df).collect()]
        assert got == [(2, 3, 2, 1.0)]


class TestPrefixJoinPlan:
    def test_no_python_no_cartesian_partial_aggs(self, spark, sf_dir):
        """All JVM: the df/sizes aggregates partial-aggregate map-side,
        the prefix rank is a per-document window (no hot global key),
        and the candidate join is an equi-join on the prefix shingle —
        no Python stages, no cross joins."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = (jaccard_prefix_join(docs)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "partial_count" in plan
