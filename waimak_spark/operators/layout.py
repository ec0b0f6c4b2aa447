"""Multi-column Z-order (Morton) clustering layout.

``write_clustered_parquet`` (dataflow/spark_flow.py) gives perfect
file-level data skipping on ONE key: lexicographic range partitioning
makes each file cover a narrow slice of the leading column — and the
whole range of every other column, so predicates on a second column
prune nothing.  Z-ordering (Morton 1966; the layout behind Delta Lake's
``OPTIMIZE ZORDER BY`` and Databricks' liquid clustering, both public
designs) interleaves the bits of per-column EQUI-DEPTH bucket indexes
into one scalar key; range-partitioning on that key gives every file a
narrow min/max band on EVERY z-ordered column simultaneously, so parquet
footer statistics prune files for predicates on any of them.  At 100 TB
this is the difference between touching a handful of files and a full
scan for the non-leading predicate columns.

Scale shape: one ``approxQuantile`` pass per layout job (a bounded
driver collect of ``(2^bits - 1) * n_cols`` doubles — the same
O(boundaries) collect ``repartitionByRange`` itself performs
internally), one range shuffle on the z-key, an in-partition sort, and
a projection that drops the key before the write.  No global sort, no
Python in the row path (the bucket/interleave expressions are pure JVM
bit arithmetic inside whole-stage codegen).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: equi-depth buckets per column = 2^ZORDER_BITS (256 — Delta's default
#: granularity class; more buckets sharpen skipping but lengthen the
#: boundary arrays each row is searched against)
ZORDER_BITS = 8


def equidepth_bucket(col: Column, boundaries: Sequence[float]) -> Column:
    """0-based equi-depth bucket index: the number of boundaries <= the
    value (a sorted-literal-array count — O(len(boundaries)) comparisons
    per row, JVM-side).  NULL compares to nothing and lands in bucket 0,
    so null rows cluster together at the curve's origin on both write
    and read (deterministic, documented)."""
    from ..functions.util import dvec_lit

    arr = dvec_lit(boundaries)
    return (F.size(F.filter(arr, lambda b: b <= col.cast("double")))
            .cast("long"))


def interleave_bits(buckets: Sequence[Column], bits: int) -> Column:
    """Morton interleave: bit ``j`` of bucket ``ci`` lands at z-bit
    ``j * n_cols + (n_cols - 1 - ci)``, so column order only decides
    tie-breaking inside a z-cell, not skipping quality."""
    m = len(buckets)
    z: Column = F.lit(0).cast("long")
    for j in range(bits):
        for ci, b in enumerate(buckets):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * m + (m - 1 - ci)))
    return z


def zorder_boundaries(df: DataFrame, cols: Sequence[str],
                      bits: int = ZORDER_BITS,
                      rel_err: float = 0.001) -> dict[str, list[float]]:
    """Per-column equi-depth boundary arrays via ``approxQuantile``
    (Greenwald-Khanna — the documented at-scale path; pass exact
    quantiles in to :func:`zorder_key` when a one-time exact layout job
    is worth the sort).  Bounded driver collect: ``(2^bits - 1) *
    len(cols)`` doubles by construction."""
    n = (1 << bits) - 1
    probs = [(i + 1) / (1 << bits) for i in range(n)]
    cast = df.select(*[F.col(c).cast("double").alias(c) for c in cols])
    got = cast.approxQuantile(list(cols), probs, rel_err)
    return dict(zip(cols, got))


def zorder_key(df: DataFrame, cols: Sequence[str],
               bits: int = ZORDER_BITS,
               boundaries: dict[str, list[float]] | None = None,
               rel_err: float = 0.001) -> Column:
    """The scalar z-key expression for ``cols`` over ``df`` — computes
    equi-depth boundaries first unless the caller passes them."""
    if not cols:
        raise ValueError("zorder_key needs >= 1 column")
    if bits < 1 or bits * len(cols) > 63:
        raise ValueError(
            f"bits={bits} x {len(cols)} cols must fit in a long "
            f"(bits * n_cols <= 63)")
    bnds = boundaries or zorder_boundaries(df, cols, bits, rel_err)
    missing = [c for c in cols if c not in bnds]
    if missing:
        raise ValueError(f"no boundaries for columns: {missing}")
    return interleave_bits(
        [equidepth_bucket(F.col(c), bnds[c]) for c in cols], bits)


def zorder_layout(df: DataFrame, cols: Sequence[str],
                  bits: int = ZORDER_BITS,
                  num_partitions: int | None = None,
                  rel_err: float = 0.001) -> DataFrame:
    """``df`` range-partitioned and sorted by its z-key, key dropped —
    ready for a parquet write whose every file carries narrow footer
    min/max bands on every z-ordered column.

    The range exchange SAMPLES its split points (seeded off the RDD
    id), so exactly where z-cells land across files can shift between
    sessions — immaterial at cluster scale (thousands of partitions
    average the jitter out), but a small ONE-OFF layout job that wants
    reproducible splits should raise
    ``spark.sql.execution.rangeExchange.sampleSizePerPartition`` above
    its per-partition row count for the write: the boundary computation
    is then effectively exact and the file layout deterministic
    (measured: the skipping A/B in tests/test_zorder.py is stable at
    any prior-RDD offset with the knob, and swung 0.32n-0.56n decoded
    without it)."""
    z = zorder_key(df, cols, bits, rel_err=rel_err)
    keyed = df.withColumn("_zkey", z)
    ranged = (keyed.repartitionByRange(num_partitions, "_zkey")
              if num_partitions is not None
              else keyed.repartitionByRange("_zkey"))
    return ranged.sortWithinPartitions("_zkey").drop("_zkey")
