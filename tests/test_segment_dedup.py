"""Repeated-segment (boilerplate) removal — the C4/CCNet line-dedup
family (functions/dedup.py::repeated_segment_removal).  Reference has no
text surface; this is the training-data-pipeline extension family.
Strategy: DuckDB lockstep on testdata, a pure-Python reference on
crafted corpora (threshold boundary, all-boilerplate doc, order
preservation), a hypothesis property, and plan locks."""

import duckdb
import pytest
from pyspark.sql import Row
from hypothesis import given, settings
from hypothesis import strategies as st

from waimak_spark.functions.dedup import (
    SEG_K,
    SEG_MIN_DF,
    repeated_segment_removal,
    repeated_segment_removal_sql,
    segment_stream,
)


def _py_segments(text: str, k: int = SEG_K) -> list[str]:
    toks = [t for t in text.lower().split() if t]
    return [" ".join(toks[i * k:i * k + k])
            for i in range((len(toks) + k - 1) // k)]


def _py_removal(texts: dict, k: int = SEG_K, min_df: int = SEG_MIN_DF):
    """doc_id -> (clean_text, n_kept, n_removed), pure Python."""
    from collections import Counter

    segs = {d: _py_segments(t, k) for d, t in texts.items()
            if t is not None}
    df = Counter()
    for ss in segs.values():
        for s in set(ss):
            df[s] += 1
    freq = {s for s, c in df.items() if c >= min_df}
    return {d: (" ".join([s for s in ss if s not in freq]),
                sum(s not in freq for s in ss),
                sum(s in freq for s in ss))
            for d, ss in segs.items()}


def _docs_df(spark, texts: dict):
    return spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in sorted(texts.items())])


class TestSegmentRemovalOracle:
    def test_catalog_fn_matches_duckdb(self, spark, sf_dir):
        from waimak_spark.catalog.text import (
            _repeated_segments_oracle,
            dedup_repeated_segments,
        )

        got = [tuple(r) for r in
               dedup_repeated_segments(spark, sf_dir).collect()]
        con = duckdb.connect()
        con.execute(f"create view documents as "
                    f"select * from '{sf_dir}/documents.parquet'")
        want = [tuple(r) for r in
                con.execute(_repeated_segments_oracle()).fetchall()]
        assert len(got) == len(want) > 0
        assert got == want
        # the testdata corpus genuinely contains boilerplate at the
        # defaults — the operator must do real work here, not no-op
        assert sum(r[3] for r in got) > 0

    def test_matches_pure_python_on_crafted_corpus(self, spark):
        boiler = "click here now"
        texts = {1: f"alpha beta gamma {boiler} delta one two",
                 2: f"{boiler} epsilon zeta eta",
                 3: f"theta iota kappa {boiler}",
                 4: "unique words only here today"}
        want = _py_removal(texts)
        got = {r.doc_id: (r.clean_text, r.n_kept, r.n_removed)
               for r in repeated_segment_removal(
                   _docs_df(spark, texts)).collect()}
        assert got == want
        # the boilerplate segment is gone from every doc, including the
        # first occurrence (the C4 rule), and only where it was a
        # whole aligned window
        for d in (1, 2, 3):
            assert boiler not in got[d][0] or boiler in want[d][0]

    def test_threshold_boundary(self, spark):
        """df = min_df - 1 keeps the segment; df = min_df removes it."""
        seg = "aa bb cc"
        below = {i: f"{seg} x{i} y{i} z{i}" for i in range(SEG_MIN_DF - 1)}
        below[99] = "filler words here"
        got = {r.doc_id: r.n_removed for r in repeated_segment_removal(
            _docs_df(spark, below)).collect()}
        assert all(v == 0 for v in got.values())
        at = {i: f"{seg} x{i} y{i} z{i}" for i in range(SEG_MIN_DF)}
        got = {r.doc_id: r.n_removed for r in repeated_segment_removal(
            _docs_df(spark, at)).collect()}
        assert all(got[i] == 1 for i in range(SEG_MIN_DF))

    def test_all_boilerplate_doc_survives_empty(self, spark):
        """A document made entirely of frequent segments stays in the
        output with clean_text='' — dropping docs is a later filter's
        decision, not this operator's."""
        seg = "pp qq rr"
        texts = {i: seg for i in range(SEG_MIN_DF)}
        rows = {r.doc_id: r for r in repeated_segment_removal(
            _docs_df(spark, texts)).collect()}
        assert len(rows) == SEG_MIN_DF
        for r in rows.values():
            assert r.clean_text == ""
            assert r.n_kept == 0 and r.n_removed == 1

    def test_rebuild_preserves_order(self, spark):
        """Kept segments reassemble in original document order even
        though the rebuild goes through an unordered aggregation."""
        boiler = "b1 b2 b3"
        body = " ".join(f"w{i}" for i in range(30))  # 10 segments
        texts = {1: f"{body} {boiler}",
                 2: f"{boiler} other words here",
                 3: f"{boiler} more filler text"}
        [r] = [x for x in repeated_segment_removal(
            _docs_df(spark, texts)).collect() if x.doc_id == 1]
        assert r.clean_text == body
        assert r.n_removed == 1

    def test_multiplicity_within_one_doc_counts_once(self, spark):
        """DF is DISTINCT-document frequency: a segment repeated many
        times inside ONE doc is not boilerplate."""
        seg = "mm nn oo"
        texts = {1: f"{seg} {seg} {seg} {seg}",
                 2: "completely different words"}
        got = {r.doc_id: r.n_removed for r in repeated_segment_removal(
            _docs_df(spark, texts)).collect()}
        assert got == {1: 0, 2: 0}

    @settings(max_examples=15, deadline=None)
    @given(st.lists(
        st.lists(st.sampled_from("aa bb cc dd ee ff".split()),
                 min_size=0, max_size=12),
        min_size=1, max_size=8))
    def test_property_matches_reference(self, tok_lists):
        spark = _session()
        texts = {i: " ".join(ts) if ts else None
                 for i, ts in enumerate(tok_lists)}
        df = spark.createDataFrame(
            [Row(doc_id=d, text=t) for d, t in texts.items()],
            schema="doc_id long, text string")
        got = {r.doc_id: (r.clean_text, r.n_kept, r.n_removed)
               for r in repeated_segment_removal(df).collect()}
        want = _py_removal({d: t for d, t in texts.items()
                            if t is not None and t.strip()})
        # docs with null/empty token streams vanish from `seg`/`tot`
        want = {d: v for d, v in want.items() if v[1] + v[2] > 0}
        assert got == want


def _session():
    from pyspark.sql import SparkSession

    return SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()


class TestSegmentRemovalPlan:
    def test_plan_no_python_no_cartesian_single_tokenize(self, spark,
                                                         sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = (repeated_segment_removal(docs)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # the persisted segment stream is the single tokenize pass all
        # three consumers share
        assert "InMemoryTableScan" in plan

    def test_segment_stream_shape(self, spark):
        texts = {1: "a b c d e f g"}  # 7 tokens -> 3 segments at k=3
        rows = sorted(
            (r.pos, r.seg)
            for r in segment_stream(_docs_df(spark, texts)).collect())
        assert rows == [(0, "a b c"), (1, "d e f"), (2, "g")]

    def test_sql_matches_spark_on_crafted_corpus(self, spark):
        texts = {1: "aa bb cc dd ee ff", 2: "aa bb cc xx yy zz",
                 3: "aa bb cc qq rr ss", 4: None, 5: "   "}
        got = [tuple(r) for r in repeated_segment_removal(
            _docs_df(spark, texts)
            if all(t is not None for t in texts.values())
            else spark.createDataFrame(
                [Row(doc_id=d, text=t) for d, t in sorted(texts.items())],
                schema="doc_id long, text string")).collect()]
        con = duckdb.connect()
        con.execute("create table documents(doc_id bigint, text varchar)")
        con.executemany("insert into documents values (?, ?)",
                        sorted(texts.items()))
        want = [tuple(r) for r in
                con.execute(repeated_segment_removal_sql()).fetchall()]
        assert got == want
        # the shared 'aa bb cc' window hit df=3 and was removed
        assert all(r[3] == 1 for r in got if r[0] in (1, 2, 3))
