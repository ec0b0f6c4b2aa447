"""Skew-helper semantics: salted join must equal the plain join exactly;
spread distinct must equal countDistinct; the salt must be part of the
physical join key (that's the whole point)."""

from pyspark.sql import functions as F

from waimak_spark.functions.skew import (SALT_COL, salted_join,
                                         spread_count_distinct)


def _skewed(spark):
    # hot key: 'a' carries 90% of rows
    rows = [(i, "a" if i % 10 else "b", float(i)) for i in range(1000)]
    return spark.createDataFrame(rows, "id bigint, k string, v double")


def _dim(spark):
    return spark.createDataFrame(
        [("a", "alpha"), ("b", "beta"), ("c", "gamma")], "k string, tag string")


class TestSaltedJoin:
    def test_equals_plain_inner_join(self, spark):
        big, dim = _skewed(spark), _dim(spark)
        plain = sorted(map(tuple, big.join(dim, "k").collect()))
        salted = sorted(map(tuple, salted_join(big, dim, "k").collect()))
        assert salted == plain

    def test_left_join_preserves_unmatched(self, spark):
        big = spark.createDataFrame(
            [(1, "a"), (2, "zz")], "id bigint, k string")
        out = salted_join(big, _dim(spark), "k", how="left").collect()
        assert len(out) == 2
        assert {r.tag for r in out} == {"alpha", None}

    def test_salt_in_physical_join_key(self, spark):
        big, dim = _skewed(spark), _dim(spark)
        plan = (salted_join(big, dim, "k", n_salts=4)
                ._jdf.queryExecution().executedPlan().toString())
        assert SALT_COL in plan

    def test_no_duplicate_rows_from_replication(self, spark):
        big, dim = _skewed(spark), _dim(spark)
        assert salted_join(big, dim, "k", n_salts=16).count() == \
            big.join(dim, "k").count()


class TestSpreadCountDistinct:
    def test_equals_count_distinct(self, spark):
        df = _skewed(spark)
        got = {r.k: r.n_distinct_v for r in
               spread_count_distinct(df, ["k"], "v").collect()}
        want = {r.k: r.n for r in
                df.groupBy("k").agg(
                    F.countDistinct("v").alias("n")).collect()}
        assert got == want

    def test_no_expand_no_single_buffer(self, spark):
        # the spread form must be two plain HashAggregates — no Expand
        # (the single-stage distinct-agg rewrite) in the plan
        df = _skewed(spark)
        plan = (spread_count_distinct(df, ["k"], "v")
                ._jdf.queryExecution().executedPlan().toString())
        assert "Expand" not in plan

    def test_outer_join_modes_rejected(self, spark):
        import pytest as _pt

        big, dim = _skewed(spark), _dim(spark)
        with _pt.raises(ValueError, match="inner/left"):
            salted_join(big, dim, "k", how="right")
        with _pt.raises(ValueError, match="inner/left"):
            salted_join(big, dim, "k", how="full")

    def test_null_values_excluded(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", None), ("a", 2.0), ("b", None)],
            "k string, v double")
        got = {r.k: r.n_distinct_v for r in
               spread_count_distinct(df, ["k"], "v").collect()}
        # matches count(distinct v) exactly: NULLs never counted, and an
        # all-NULL key still appears with count 0
        assert got == {"a": 2, "b": 0}

    def test_salt_column_collision_rejected(self, spark):
        import pytest as _pt

        big = spark.createDataFrame([(1, "a", 0)],
                                    f"id bigint, k string, {SALT_COL} int")
        dim = _dim(spark)
        with _pt.raises(ValueError, match="reserves"):
            salted_join(big, dim, "k")


from hypothesis import HealthCheck, given, settings, strategies as st


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(-3, 3)),
                min_size=0, max_size=40),
       st.lists(st.integers(0, 5), min_size=0, max_size=6),
       st.integers(1, 5))
def test_salted_join_property_equals_plain(spark, big_rows, dim_keys, n_salts):
    big = spark.createDataFrame(
        [(k, v) for k, v in big_rows] or [(None, None)],
        "k int, v int").where(F.col("k").isNotNull())
    dim = spark.createDataFrame(
        [(k, f"t{k}") for k in set(dim_keys)] or [(None, None)],
        "k int, tag string").where(F.col("k").isNotNull())
    plain = sorted(map(tuple, big.join(dim, "k").collect()))
    salted = sorted(map(tuple,
                        salted_join(big, dim, "k", n_salts=n_salts).collect()))
    assert salted == plain
