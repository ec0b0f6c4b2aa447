"""Bottom-k set-similarity between groups (Cohen & Kaplan 2007; Broder
1997) — pairwise Jaccard between LARGE sets from k-row-per-group element
sketches, with the exact Jaccard as the run-once certification side.
The testdata corpus shares one vocabulary across languages (every pair
exactly 1.0 — a degenerate but valid lockstep case), so the estimator's
real behavior is pinned on crafted corpora with partial overlaps."""

import hashlib

import duckdb
import pytest
from pyspark.sql import Row

from waimak_spark.functions.sketch import (
    KMVJ_K,
    KMVJ_SEED,
    kmv_group_jaccard,
    kmv_group_jaccard_sql,
)


def _h(tok: str, seed: int = KMVJ_SEED) -> int:
    return int(hashlib.md5(f"{seed}:{tok}".encode()).hexdigest()[:8], 16)


def _py_est(A: set, B: set, k: int = KMVJ_K) -> float:
    """The bottom-k union-sample estimator, pure Python."""
    sa = set(sorted(((_h(t), t) for t in A))[:k])
    sb = set(sorted(((_h(t), t) for t in B))[:k])
    union = sorted(sa | sb)[:k]
    return sum(1 for x in union if x in sa and x in sb) / len(union)


def _corpus(spark, groups: dict):
    """groups: name -> iterable of tokens; one doc per 50 tokens."""
    rows = []
    i = 0
    for g, toks in sorted(groups.items()):
        toks = list(toks)
        for j in range(0, len(toks), 50):
            rows.append(Row(doc_id=i, text=" ".join(toks[j:j + 50]),
                            lang=g))
            i += 1
    return spark.createDataFrame(rows)


class TestKmvJaccardOracle:
    def test_catalog_fn_matches_duckdb(self, spark, sf_dir):
        from waimak_spark.catalog.text import (
            _kmv_jaccard_oracle,
            vocab_jaccard_kmv,
        )

        got = [tuple(r) for r in vocab_jaccard_kmv(spark, sf_dir).collect()]
        con = duckdb.connect()
        con.execute(f"create view documents as "
                    f"select * from '{sf_dir}/documents.parquet'")
        want = [tuple(r) for r in
                con.execute(_kmv_jaccard_oracle()).fetchall()]
        assert len(got) == len(want) > 0
        for g, w in zip(got, want):
            assert g[:4] == w[:4]
            assert g[4] == pytest.approx(w[4], abs=1e-9)
            assert g[5] == pytest.approx(w[5], abs=1e-9)
            assert g[6] == w[6]
        assert all(g[6] == 1 for g in got)  # estimates within tolerance


class TestKmvJaccardSemantics:
    def test_partial_overlap_estimate_within_tol(self, spark):
        """Sets far larger than k with a known overlap: the estimate
        must land within the 2/sqrt(k) tolerance of the exact Jaccard,
        agree with the pure-Python estimator EXACTLY, and differ from
        the exact value (the sampling is real, not a pass-through)."""
        A = {f"common{i}" for i in range(300)} | {
            f"a{i}" for i in range(700)}
        B = {f"common{i}" for i in range(300)} | {
            f"b{i}" for i in range(700)}
        out = {(r.group_a, r.group_b): r for r in kmv_group_jaccard(
            _corpus(spark, {"ga": A, "gb": B})).collect()}
        r = out[("ga", "gb")]
        exact = 300 / 1700
        assert r.exact_j == pytest.approx(exact, abs=1e-4)
        assert r.est_j == pytest.approx(
            round(_py_est(A, B), 4), abs=1e-9)
        assert abs(r.est_j - r.exact_j) <= 2.0 / (KMVJ_K ** 0.5)
        assert r.within_tol == 1
        assert r.est_j != r.exact_j  # genuine sampling at |union| >> k
        assert (r.n_a, r.n_b) == (1000, 1000)

    def test_small_union_is_exact(self, spark):
        """|A ∪ B| <= k: the sketch IS the set, so the estimate equals
        the exact Jaccard exactly — the estimator degrades gracefully
        to the exact computation on small sets."""
        A = {f"t{i}" for i in range(100)}
        B = {f"t{i}" for i in range(50, 150)}
        out = {(r.group_a, r.group_b): r for r in kmv_group_jaccard(
            _corpus(spark, {"x": A, "y": B})).collect()}
        r = out[("x", "y")]
        assert r.est_j == r.exact_j == pytest.approx(
            round(50 / 150, 4), abs=1e-9)

    def test_disjoint_and_identical(self, spark):
        A = {f"p{i}" for i in range(40)}
        B = {f"q{i}" for i in range(40)}
        out = {(r.group_a, r.group_b): r for r in kmv_group_jaccard(
            _corpus(spark, {"a": A, "b": B, "c": set(A)})).collect()}
        assert out[("a", "b")].exact_j == 0.0
        assert out[("a", "b")].est_j == 0.0
        assert out[("a", "c")].exact_j == 1.0
        assert out[("a", "c")].est_j == 1.0
        # pair list covers all unordered pairs once
        assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}

    def test_matches_duckdb_on_crafted_corpus(self, spark):
        A = {f"common{i}" for i in range(200)} | {
            f"a{i}" for i in range(400)}
        B = {f"common{i}" for i in range(200)} | {
            f"b{i}" for i in range(400)}
        df = _corpus(spark, {"ga": A, "gb": B})
        got = [tuple(r) for r in kmv_group_jaccard(df).collect()]
        con = duckdb.connect()
        con.execute("create table documents(doc_id bigint, text varchar,"
                    " lang varchar)")
        con.executemany("insert into documents values (?, ?, ?)",
                        [(r.doc_id, r.text, r.lang)
                         for r in df.collect()])
        want = [tuple(r) for r in
                con.execute(kmv_group_jaccard_sql()).fetchall()]
        assert got == want


class TestKmvJaccardPlan:
    def test_plan_stays_jvm_no_cartesian(self, spark, sf_dir):
        """The group-pair cross join is over the tiny per-group count
        frame (groups x groups, broadcastable) — it must never become a
        corpus-sized nested loop, and the family runs zero Python."""
        from waimak_spark.catalog.text import vocab_jaccard_kmv

        plan = (vocab_jaccard_kmv(spark, sf_dir)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        # the deliberate pairs cross join is broadcast over the k-row
        # group frame; no shuffled cartesian may appear
        assert "CartesianProduct" not in plan
