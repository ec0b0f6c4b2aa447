"""Unit tests for the event-time normalization layer: epoch_nanos_expr
must produce identical epoch nanoseconds for every physical flavor the
testdata generator has shipped (bigint nanos, timestamp[us]/TIMESTAMP_NTZ,
plain TIMESTAMP) — and must be independent of the session timezone, since
the correctness driver owns its own SparkSession."""

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StructField, StructType,
                               TimestampNTZType, TimestampType)

from waimak_spark.catalog.events import epoch_nanos_expr

# 2024-01-01 00:00:10.5 UTC
WALL = datetime(2024, 1, 1, 0, 0, 10, 500000)
EXPECTED_NS = 1_704_067_210_500_000_000


def _eval(df):
    expr = epoch_nanos_expr(dict(df.dtypes)["ts"])
    return df.select(F.expr(expr).cast("bigint").alias("ns")).head()[0]


def test_bigint_passthrough(spark):
    df = spark.createDataFrame(
        [(EXPECTED_NS,)], StructType([StructField("ts", LongType())]))
    assert epoch_nanos_expr("bigint") == "ts"
    assert _eval(df) == EXPECTED_NS


def test_timestamp_ntz(spark):
    df = spark.createDataFrame(
        [(WALL,)], StructType([StructField("ts", TimestampNTZType())]))
    assert _eval(df) == EXPECTED_NS


def test_ntz_is_timezone_independent(spark):
    df = spark.createDataFrame(
        [(WALL,)], StructType([StructField("ts", TimestampNTZType())]))
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("America/New_York", "Asia/Tokyo", "UTC"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            assert _eval(df) == EXPECTED_NS, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_plain_timestamp_in_utc_session(spark):
    # TIMESTAMP (ltz) normalizes via unix_micros (instant -> epoch); the
    # harness pins UTC, under which the wall clock IS the epoch clock
    df = spark.createDataFrame(
        [(WALL,)], StructType([StructField("ts", TimestampType())]))
    assert _eval(df) == EXPECTED_NS


def test_plain_timestamp_is_timezone_independent(spark):
    # ADVICE r3: the LTZ flavor must not consult the session timezone at
    # QUERY time.  The instant is fixed at creation (naive datetime read
    # under the session tz in force then — UTC here); evaluating the epoch
    # expression under other session timezones must not move it.
    df = spark.createDataFrame(
        [(WALL,)], StructType([StructField("ts", TimestampType())]))
    df = df.cache()
    df.count()  # materialize the instant under UTC before flipping tz
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("America/New_York", "Asia/Tokyo", "UTC"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            assert _eval(df) == EXPECTED_NS, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
        df.unpersist()
