"""Skew-mitigation operators: salted joins and shuffle-spread exact
distinct aggregation.

A skewed key (one user with 10% of all events, one event_type with half
the table) concentrates its entire shuffle partition on one task — at
100 TB that single task runs for hours while the rest of the cluster
idles, or OOMs outright.  AQE's skew-join splitting handles sort-merge
joins after the fact; these helpers restructure the plan so the hot key
never lands on one reducer in the first place, and they work for the
cases AQE does not cover (aggregation state, broadcast-ineligible dims
with replicated salting).

Results are EXACTLY the unsalted answer — salting only changes the
physical distribution, so every helper is oracle-checkable against plain
SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(big: DataFrame, small: DataFrame, on: str | list[str],
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join where the big side's hot keys are spread over ``n_salts``
    shuffle partitions and the small side is replicated ``n_salts`` times.

    Use when the small side is too big to broadcast but the join key is
    skewed: a plain shuffle join puts every row of the hot key on one
    task; salting bounds per-task fan-in at 1/n_salts of the hot key.
    The salt is random-free: a deterministic spread derived from the big
    side's whole row keeps retried tasks identical (same rule as the
    sampling operators — ``rand()`` re-rolls on task retry).
    """
    if how not in ("inner", "left", "leftouter", "left_outer",
                   "leftsemi", "left_semi", "leftanti", "left_anti"):
        # the small side is replicated n_salts times: any join mode that
        # can emit UNMATCHED small-side rows would emit them n_salts times
        raise ValueError(
            f"salted_join supports inner/left-flavored joins only, got {how}")
    keys = [on] if isinstance(on, str) else list(on)
    if SALT_COL in big.columns or SALT_COL in small.columns:
        # withColumn would silently REPLACE the user's column and the
        # final drop would remove it from the result
        raise ValueError(
            f"salted_join reserves the column name {SALT_COL!r}; rename it "
            "on the input first")
    # xxhash64 over all big-side columns spreads rows of the SAME join key
    # across salts; any distribution works for correctness, uniform-ish is
    # best for balance
    big_s = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*big.columns), F.lit(n_salts)))
    small_s = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = big_s.join(small_s, keys + [SALT_COL], how)
    return out.drop(SALT_COL)


def spread_count_distinct(df: DataFrame, keys: list[str], col: str,
                          alias: str | None = None) -> DataFrame:
    """Exact ``count(distinct col)`` per key, restructured as two stages:
    dedup on (keys, col) — the shuffle spreads over the FULL composite, so
    a hot key fans out across reducers — then a plain count per key.

    The single-stage ``countDistinct`` keeps the whole distinct set of a
    hot key in one aggregation buffer; at 100 TB a key with 10^9 distinct
    values is an OOM.  Here no task ever holds more than one partition of
    (key, value) pairs, and the second-stage counts are just longs.

    NULL semantics match ``count(distinct col)`` exactly: the second-stage
    ``count(col)`` skips the surviving (key, NULL) row — so NULLs never
    inflate a count, and a key whose values are ALL NULL still appears
    with a count of 0 (a pre-filter would drop the group entirely).
    """
    alias = alias or f"n_distinct_{col}"
    return (df.select(*keys, col).distinct()
            .groupBy(*keys).agg(F.count(col).alias(alias)))
