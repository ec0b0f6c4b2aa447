"""Streaming catalog entries: Structured Streaming pipelines whose final
answer is deterministic, so they get a REAL DuckDB oracle (the same SQL as
the batch equivalent) instead of a rows-only check.

The entry runs the whole ``events`` table through a file stream with
``availableNow`` (bounded backfill — the production pattern for replaying
history through the same code that serves the live stream), a watermarked
tumbling-window aggregation, and a memory sink in complete mode, then
returns the sink table.

Scale notes (100 TB posture): the streaming plan is identical to the batch
window agg — partial aggregation per micro-batch, state bounded by the
watermark. The memory sink is for the correctness gate only (results are
window counts, ~thousands of rows); a production run writes the same query
to parquet/kafka with a checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.ops import watermarked_window_agg

NANOS = 1_000_000_000


def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming replica of the batch ``tumbling_window_counts`` query —
    the oracle is the SAME SQL, proving the incremental path computes the
    identical answer.

    ``ts`` is stored as epoch nanos (long); integer-div to seconds before
    the timestamp cast so bucket assignment is exact (floor(ns/300e9) ==
    floor((ns div 1e9)/300) — truncation composes)."""
    from .events import _events

    # _events sets the nanos-as-long parquet conf before reading
    schema = _events(spark, sf_dir).schema
    # the file-stream source wants a directory: stream the sf dir filtered
    # down to the events file
    src = (spark.readStream.schema(schema)
           .option("pathGlobFilter", "events.parquet")
           .parquet(sf_dir))
    with_ts = src.withColumn(
        "ts_ev", F.expr(f"timestamp_seconds(ts div {NANOS})"))
    windowed = watermarked_window_agg(
        with_ts, "ts_ev", "5 minutes", "10 minutes",
        aggs=[F.count("*").alias("n"),
              F.round(F.sum("value"), 4).alias("sum_value")],
        group_cols=["event_type"],
    )
    out = windowed.select(
        F.col("window_start").cast("long").alias("window_start"),
        "event_type", "n", "sum_value")

    # FIXED sink name, dropped before each run: a per-invocation uuid name
    # would leak one registered memory-sink table per call into the session
    # (same hygiene class as an unpersisted cache) — with a fixed name the
    # session holds at most one, and the previous run's query is already
    # stopped (awaitTermination + stop below) so the name is free to reuse
    name = "stream_tumbling_counts_sink"
    spark.catalog.dropTempView(name)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    q.stop()
    return spark.table(name)


STREAMING_TUMBLING_ORACLE = """
    select (epoch_ns(ts) // 300000000000) * 300 as window_start,
           event_type,
           count(*) as n,
           round(sum(value), 4) as sum_value
    from events
    group by 1, 2
"""


ENTRIES = {
    "streaming_tumbling_counts": {
        "fn": streaming_tumbling_counts,
        "oracle": STREAMING_TUMBLING_ORACLE,
    },
}
