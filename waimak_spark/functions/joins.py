"""Join helpers the reference lacks (SURVEY §2.10 — filled Spark-first):
as-of joins, range (point-in-interval) joins, per-group top-k.

Scale notes (100 TB posture):

* ``as_of_join`` is the union-window formulation: tag both sides, union,
  one shuffle on the join key, then ``last(..., ignorenulls)`` over an
  ordered window carries the most recent right-side row onto each left
  row. No non-equi join, no broadcast nested loop — the plan is a single
  hash exchange + sort, which survives any skewless scale-up (skewed keys
  salt like any window).
* ``range_join`` avoids the O(n·m) inequality join by bucketing: each
  interval explodes into the coarse buckets it covers, points join their
  bucket (equi-join!), and the exact containment predicate filters the
  shortlist. Bucket width trades explode factor against shortlist size.
* ``top_k`` is the window row_number idiom — hash shuffle on the group
  key, no global sort.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def as_of_join(left: DataFrame, right: DataFrame, on: Sequence[str],
               left_ts: str, right_ts: str,
               right_value_cols: Sequence[str],
               direction: str = "backward",
               tolerance: Optional[int] = None) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (backward, inclusive) or smallest
    ``right_ts >= left_ts`` (forward) per key.

    ``tolerance`` (same units as the ts columns) drops matches further
    than that from the left timestamp. Output = all left columns +
    ``right_value_cols`` (NULL when no match).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    on = list(on)
    vals = list(right_value_cols)
    lcols = left.columns
    # union both sides with aligned schemas; _side orders right rows
    # before (backward) / after (forward) left rows at equal timestamps
    # so inclusive semantics hold
    l_tagged = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols if c not in on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in vals],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in on],
        *[F.col(c).alias(f"_r_{c}") for c in vals],
        F.col(right_ts).alias("_rts"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    if direction == "backward":
        w = (W.partitionBy(*on).orderBy(F.asc("_ts"), F.asc("_side"))
             .rowsBetween(W.unboundedPreceding, 0))
        pick = F.last
    else:
        w = (W.partitionBy(*on).orderBy(F.desc("_ts"), F.asc("_side"))
             .rowsBetween(W.unboundedPreceding, 0))
        pick = F.last
    carried = unioned.select(
        "*",
        *[pick(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
          for c in vals],
        pick("_rts", ignorenulls=True).over(w).alias("_mts"),
    )
    out = carried.where(F.col("_side") == 1)
    if tolerance is not None:
        gap = (F.col("_ts") - F.col("_mts") if direction == "backward"
               else F.col("_mts") - F.col("_ts"))
        within = F.col("_mts").isNotNull() & (gap <= tolerance)
        out = out.select(
            *on, "_ts",
            *[F.col(c) for c in lcols if c not in on and c != left_ts],
            *[F.when(within, F.col(f"_m_{c}")).alias(f"_m_{c}") for c in vals],
        )
    else:
        out = out.select(
            *on, "_ts",
            *[F.col(c) for c in lcols if c not in on and c != left_ts],
            *[F.col(f"_m_{c}") for c in vals],
        )
    renames = {"_ts": left_ts, **{f"_m_{c}": c for c in vals}}
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out


def range_join(points: DataFrame, intervals: DataFrame,
               point_col: str, start_col: str, end_col: str,
               on: Sequence[str] = (), bucket_width: int = 1,
               how: str = "inner") -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point <= end`` (optionally also equi-keyed on ``on``).

    Buckets turn the inequality join into an equi-join: intervals explode
    into ``floor(start/width) … floor(end/width)``, points compute one
    bucket, candidates meet on (bucket [+ keys]) and the exact containment
    filter prunes. Works for any orderable numeric/epoch column."""
    on = list(on)
    ivl_bucket = F.explode(F.sequence(
        F.floor(F.col(start_col) / bucket_width),
        F.floor(F.col(end_col) / bucket_width),
    )).alias("_bucket")
    ivl = intervals.select("*", ivl_bucket)
    pts = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / bucket_width))
    cond = [pts["_bucket"] == ivl["_bucket"]] + [
        pts[c] == ivl[c] for c in on]
    joined = (pts.join(ivl, cond, how)
              .where((pts[point_col] >= ivl[start_col])
                     & (pts[point_col] <= ivl[end_col])))
    drop_cols = [ivl["_bucket"], pts["_bucket"]] + [ivl[c] for c in on]
    return joined.drop(*drop_cols)


def top_k(df: DataFrame, partition_cols: Sequence[str],
          order_cols: Sequence[Column], k: int,
          rank_col: str = "rank") -> DataFrame:
    """Top-k rows per group: hash shuffle on the group key + in-partition
    sort — never a global sort."""
    w = W.partitionBy(*partition_cols).orderBy(*order_cols)
    return (df.withColumn(rank_col, F.row_number().over(w))
            .where(F.col(rank_col) <= k))
