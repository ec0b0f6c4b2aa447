"""Streaming operator idioms: watermarked windows, session windows, and an
``applyInPandasWithState`` custom stateful kernel.

All three work identically on batch frames (windows/session_window are
plain expressions; the stateful op needs a streaming frame), so batch
tests assert exact semantics and the streaming tests assert the
end-to-end incremental path.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    DoubleType,
    StructField,
    StructType,
)


#: state-partition sizing rule targets (see state_partitions_for_backfill)
STATE_TARGET_BYTES_PER_PARTITION = 32 << 20
STATE_MIN_PARTITIONS = 4
STATE_MAX_PARTITIONS = 2048


def state_partitions_for_backfill(
        input_bytes: int,
        target_bytes_per_partition: int = STATE_TARGET_BYTES_PER_PARTITION,
        min_partitions: int = STATE_MIN_PARTITIONS,
        max_partitions: int = STATE_MAX_PARTITIONS) -> int:
    """Shuffle/state-store partition count for a BOUNDED streaming
    backfill, as a function of input volume.

    Why volume and not a constant: every stateful operator creates one
    state store PER shuffle partition (per side for stream-stream joins),
    and every micro-batch commits a delta file to each — so per-batch
    overhead scales with the partition count while per-partition memory
    scales inversely.  The rule targets ~32 MiB of input per partition:

    * small backfill (the correctness gate's MBs) → the floor (4): store
      commits stay cheap, results identical at any count;
    * 100 TB backfill → input_bytes/32 MiB, capped at 2048: each
      partition's state fits executor memory, and the cap bounds
      per-batch store-commit fan-out (beyond ~2048 the commit overhead
      again dominates — raise the cap only with a commensurate increase
      in executors).

    Key-cardinality is the better driver when known (state rows ∝ keys,
    not volume); input volume is the observable proxy a generic backfill
    has before reading anything."""
    import math

    parts = math.ceil(max(0, input_bytes) / target_bytes_per_partition)
    return max(min_partitions, min(max_partitions, parts))


def watermarked_window_agg(df: DataFrame, ts_col: str,
                           window_duration: str, watermark: str,
                           aggs: Sequence[Column],
                           group_cols: Sequence[str] = (),
                           slide: str | None = None) -> DataFrame:
    """Tumbling (or sliding) event-time window aggregation with late-data
    tolerance: the watermark bounds state kept for out-of-order events —
    the canonical streaming-agg shape that also runs unchanged on batch
    frames."""
    wm = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    window = (F.window(F.col(ts_col), window_duration, slide)
              if slide else F.window(F.col(ts_col), window_duration))
    out = wm.groupBy(window.alias("w"),
                     *[F.col(c) for c in group_cols]).agg(*aggs)
    agg_names = [c for c in out.columns
                 if c != "w" and c not in set(group_cols)]
    return out.select(F.col("w.start").alias("window_start"),
                      F.col("w.end").alias("window_end"),
                      *group_cols, *agg_names)


def sessionize_stream(df: DataFrame, ts_col: str, gap: str,
                      group_cols: Sequence[str],
                      watermark: str | None = None) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into one
    session per key (F.session_window — state bounded by the watermark on
    streams)."""
    src = (df.withWatermark(ts_col, watermark)
           if watermark and df.isStreaming else df)
    return (src.groupBy(F.session_window(F.col(ts_col), gap).alias("s"),
                        *[F.col(c) for c in group_cols])
            .agg(F.count("*").alias("n_events"))
            .select(*group_cols,
                    F.col("s.start").alias("session_start"),
                    F.col("s.end").alias("session_end"),
                    "n_events"))


def stream_stream_interval_join(left: DataFrame, right: DataFrame,
                                key_cols: Sequence[str],
                                left_ts: str, right_ts: str,
                                lower: str, upper: str,
                                watermark: str | None) -> DataFrame:
    """Stream-stream INNER join on equality keys plus an event-time
    interval: right rows within ``[left_ts - lower, left_ts + upper]``.

    ``watermark`` picks the state/completeness trade-off:

    * a delay string ('10 minutes') — production mode: both sides carry
      the watermark, which with the time-range condition bounds each
      side's join state to the interval width + delay. CAVEAT: once the
      global watermark advances past a row's event time minus the delay,
      that row is dropped as late BEFORE joining — if a backfill splits
      into multiple micro-batches whose event times overlap (several
      files, maxFilesPerTrigger, out-of-order file arrival), pairs
      straddling a batch boundary can be lost, and the output is no
      longer the exact batch join.
    * ``None`` — backfill-exact mode: no watermark, no late-row
      filtering; the emitted pair set equals the batch join however the
      backfill is batched (inner joins emit on match; the watermark's
      only role is eviction). State grows with the inputs, which is the
      honest cost of exactness over an unbounded replay — use only for
      BOUNDED backfills (the catalog's oracle-checked entry does this).

    ``lower``/``upper`` are SQL interval strings ('5 minutes'). Works on
    batch frames too (watermark is a no-op there), keeping one code path
    for replay and live."""
    overlap = (set(left.columns) - set(key_cols)) & set(right.columns)
    if overlap:
        raise ValueError(
            f"non-key columns shared by both sides: {sorted(overlap)} — "
            "rename before joining")
    l = (left.withWatermark(left_ts, watermark)
         if watermark and left.isStreaming else left)
    r = (right.withWatermark(right_ts, watermark)
         if watermark and right.isStreaming else right)
    key_eq = [l[c] == r[c] for c in key_cols]
    cond = key_eq + [
        r[right_ts] >= l[left_ts] - F.expr(f"INTERVAL {lower}"),
        r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {upper}"),
    ]
    joined = l.join(r, cond, "inner")
    # project the left side's key columns once (both sides carry them)
    dup = set(key_cols)
    return joined.select(*[l[c] for c in key_cols],
                         *[l[c] for c in left.columns if c not in dup],
                         *[r[c] for c in right.columns if c not in dup])


RUNNING_TOTALS_OUTPUT = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

RUNNING_TOTALS_STATE = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])


def stateful_running_totals(df: DataFrame, key_col: str = "user_id",
                            value_col: str = "value") -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-key running (count, sum) carried across micro-batches in explicit
    state — the escape hatch for semantics window functions can't express
    incrementally. Emits the updated totals for every key seen in each
    batch."""
    import pandas as pd

    def update(key, pdfs: Iterator["pd.DataFrame"], state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [total]})

    return (df.groupBy(F.col(key_col))
            .applyInPandasWithState(
                update, RUNNING_TOTALS_OUTPUT, RUNNING_TOTALS_STATE,
                "update", "NoTimeout"))
