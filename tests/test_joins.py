"""as-of join / range join / top-k unit semantics."""

import pytest
from pyspark.sql import functions as F

from waimak_spark.functions.joins import as_of_join, range_join, top_k

TRADES = [(1, 100, "t1"), (1, 200, "t2"), (2, 50, "t3")]
QUOTES = [(1, 90, 1.0), (1, 100, 2.0), (1, 150, 3.0), (2, 60, 4.0)]


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(TRADES, "key int, ts long, trade string")


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(QUOTES, "key int, ts long, quote double")


class TestAsOfJoin:
    def test_backward_inclusive(self, trades, quotes):
        out = as_of_join(trades, quotes, ["key"], "ts", "ts", ["quote"])
        got = {r["trade"]: r["quote"] for r in out.collect()}
        # t1@100 matches quote@100 (inclusive), t2@200 matches quote@150,
        # t3@50 has no quote at-or-before → NULL
        assert got == {"t1": 2.0, "t2": 3.0, "t3": None}

    def test_forward(self, trades, quotes):
        out = as_of_join(trades, quotes, ["key"], "ts", "ts", ["quote"],
                         direction="forward")
        got = {r["trade"]: r["quote"] for r in out.collect()}
        # t1@100 → quote@100; t2@200 → none after; t3@50 → quote@60
        assert got == {"t1": 2.0, "t2": None, "t3": 4.0}

    def test_tolerance(self, trades, quotes):
        out = as_of_join(trades, quotes, ["key"], "ts", "ts", ["quote"],
                         tolerance=10)
        got = {r["trade"]: r["quote"] for r in out.collect()}
        # t2@200's nearest backward quote is @150 — 50 away → dropped
        assert got == {"t1": 2.0, "t2": None, "t3": None}

    def test_no_cross_product_in_plan(self, trades, quotes):
        out = as_of_join(trades, quotes, ["key"], "ts", "ts", ["quote"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestRangeJoin:
    def test_point_in_interval(self, spark):
        pts = spark.createDataFrame([(1, 5), (2, 15), (3, 100)],
                                    "pid int, p long")
        ivl = spark.createDataFrame([(10, 0, 10), (20, 10, 20)],
                                    "iid int, s long, e long")
        out = range_join(pts, ivl, "p", "s", "e", bucket_width=4)
        got = sorted((r["pid"], r["iid"]) for r in out.collect())
        assert got == [(1, 10), (2, 20)]

    def test_boundary_inclusive(self, spark):
        pts = spark.createDataFrame([(1, 10)], "pid int, p long")
        ivl = spark.createDataFrame([(10, 0, 10), (20, 10, 20)],
                                    "iid int, s long, e long")
        out = range_join(pts, ivl, "p", "s", "e", bucket_width=7)
        assert {r["iid"] for r in out.collect()} == {10, 20}

    def test_keyed(self, spark):
        pts = spark.createDataFrame([("a", 1, 5), ("b", 2, 5)],
                                    "k string, pid int, p long")
        ivl = spark.createDataFrame([("a", 10, 0, 10)],
                                    "k string, iid int, s long, e long")
        out = range_join(pts, ivl, "p", "s", "e", on=["k"], bucket_width=4)
        assert [(r["pid"], r["iid"]) for r in out.collect()] == [(1, 10)]


class TestTopK:
    def test_top_k_per_group(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("a", 3), ("a", 2), ("b", 9)], "g string, v int")
        out = top_k(df, ["g"], [F.desc("v")], 2)
        got = sorted((r["g"], r["v"], r["rank"]) for r in out.collect())
        assert got == [("a", 3, 1), ("a", 2, 2), ("b", 9, 1)] or \
            got == sorted([("a", 3, 1), ("a", 2, 2), ("b", 9, 1)])
