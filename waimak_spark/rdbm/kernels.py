"""DataFrame kernels for RDBM ingestion — pure Spark, no database needed.

* ``lower_case_all`` — metadata normalisation
  (RDBMIngestionUtils.scala:14-18);
* ``snapshot_temporal_table_dataset`` — the delete-detecting temporal
  snapshot (RDBMIngestionUtils.scala:66-82): a plain
  ``AuditTable.snapshot`` cannot see deletes because a deleted PK simply
  stops appearing in the live table; the temporal history's validity
  interval can.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .sqlgen import SQLServerTemporalTableMetadata


def lower_case_all(df: DataFrame) -> DataFrame:
    """Lowercase every column's values, keeping column names."""
    return df.select(*[F.lower(F.col(f)).alias(f) for f in df.columns])


def snapshot_temporal_table_dataset(
        df: DataFrame, snapshot_ts,
        meta: SQLServerTemporalTableMetadata) -> DataFrame:
    """Per PK: order by start desc / end asc, keep row 1 IFF
    ``start <= ts < end`` — a PK whose latest validity interval closed
    before ``ts`` yields no row (the record was deleted).

    Rows with ``start == end`` are dropped first: colliding events would
    otherwise make a live record look deleted, and the reference resolves
    collisions toward existence (RDBMIngestionUtils.scala:74-80).
    """
    if not meta.is_temporal:
        raise ValueError("Cannot call this function with a non-temporal table")
    start, end = meta.start_col_name, meta.end_col_name
    w = (W.partitionBy(*[F.col(c) for c in meta.pk_cols])
         .orderBy(F.col(start).desc(), F.col(end).asc()))
    return (
        df.where(F.col(start) <= F.lit(snapshot_ts))
        .where(F.col(start) != F.col(end))
        .withColumn("_row_num", F.row_number().over(w))
        .where((F.col("_row_num") == 1)
               & (F.lit(snapshot_ts) >= F.col(start))
               & (F.lit(snapshot_ts) < F.col(end)))
        .drop("_row_num")
    )
