"""Storage-layer catalog entries: a REAL audit-table round trip whose
results are oracle-checkable in plain SQL.

The build appends two batches of the ``orders`` table (batch 2 simulates
updates: every third order re-arrives 1000 days later with status ``U`` and
a bumped price), compacts hot → cold, and then answers:

* ``storage_snapshot_dedup`` — latest state per primary key through
  ``AuditTable.snapshot`` (partition-pruned scan → window dedup);
* ``storage_all_between`` — the update events in a time range through
  ``AuditTable.all_between`` (partition-pruned scan + timestamp filter).

The oracle reproduces the appended union + window in ANSI SQL over the
same source parquet, so a hash match certifies the whole storage path:
staged region writes, layout, partition pruning, compaction merge, dedup.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..storage import AuditTableInfo, FileStorageOps
from ..storage.audit import AuditTableFile, create_table, open_tables

_BUILD_MARKER = "_BUILD_OK"
# bump when the audit layout or the batch construction changes: a marker
# from an older build (persisted /tmp across driver rounds) must not be
# trusted to match the current reader
_BUILD_VERSION = "v2"
UPDATE_EVERY = 3  # every third order gets an update in batch 2
UPDATE_DELAY_DAYS = 1000
CUTOFF = "2000-01-01 00:00:00"  # between batch-1 and batch-2 date ranges


def _base_dir(sf_dir: str) -> str:
    tag = sf_dir.strip("/").replace("/", "_")
    return f"/tmp/waimak_catalog_storage/{tag}"


def _batches(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    b1 = orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.col("o_orderdate").cast("timestamp").alias("last_updated"),
    )
    b2 = (
        orders.where(F.col("o_orderkey") % UPDATE_EVERY == 0)
        .select(
            "o_orderkey", "o_custkey",
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") + F.lit(1.0)).alias("o_totalprice"),
            (F.col("o_orderdate").cast("timestamp")
             + F.expr(f"interval {UPDATE_DELAY_DAYS} days")).alias("last_updated"),
        )
    )
    return b1, b2


def _audit_orders(spark: SparkSession, sf_dir: str) -> AuditTableFile:
    """Build (once per sf_dir) and open the audit table."""
    base = _base_dir(sf_dir)
    ops = FileStorageOps(spark, base)
    marker = f"{base}/{_BUILD_MARKER}"

    def _marker_current() -> bool:
        try:
            return (ops.fops.exists(marker)
                    and ops.fops.read_string(marker).strip() == _BUILD_VERSION)
        except Exception:
            return False

    if not _marker_current():
        shutil.rmtree(base, ignore_errors=True)
        b1, b2 = _batches(spark, sf_dir)
        info = AuditTableInfo("orders_audit", ["o_orderkey"], {}, True)
        t = create_table(ops, info)
        t, _ = t.append(b1, "last_updated")
        t, _ = t.append(b2, "last_updated")
        t.compact(small_region_row_threshold=10**9)
        ops.fops.write_string(marker, _BUILD_VERSION)
    tables, _ = open_tables(ops, ["orders_audit"])
    return tables["orders_audit"]


def storage_snapshot_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _audit_orders(spark, sf_dir)
    return t.snapshot().select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")


SNAPSHOT_ORACLE = f"""
    with appended as (
        select o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               cast(o_orderdate as timestamp) as last_updated
        from orders
        union all
        select o_orderkey, o_custkey, 'U' as o_orderstatus,
               o_totalprice + 1.0 as o_totalprice,
               cast(o_orderdate as timestamp)
                   + interval {UPDATE_DELAY_DAYS} day as last_updated
        from orders where o_orderkey % {UPDATE_EVERY} = 0
    )
    select o_orderkey, o_custkey, o_orderstatus, o_totalprice
    from (
        select *, row_number() over (partition by o_orderkey
                                     order by last_updated desc) as rn
        from appended
    ) where rn = 1
"""


def storage_all_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _audit_orders(spark, sf_dir)
    from datetime import datetime

    cutoff = datetime.fromisoformat(CUTOFF.replace(" ", "T"))
    return t.all_between(cutoff, None).select(
        "o_orderkey", "o_orderstatus",
        F.col("_de_last_updated").alias("last_updated"))


ALL_BETWEEN_ORACLE = f"""
    with appended as (
        select o_orderkey, o_orderstatus,
               cast(o_orderdate as timestamp) as last_updated
        from orders
        union all
        select o_orderkey, 'U' as o_orderstatus,
               cast(o_orderdate as timestamp)
                   + interval {UPDATE_DELAY_DAYS} day as last_updated
        from orders where o_orderkey % {UPDATE_EVERY} = 0
    )
    select o_orderkey, o_orderstatus, last_updated
    from appended
    where last_updated >= timestamp '{CUTOFF}'
"""


ENTRIES = {
    "storage_snapshot_dedup": {"fn": storage_snapshot_dedup,
                               "oracle": SNAPSHOT_ORACLE},
    "storage_all_between": {"fn": storage_all_between,
                            "oracle": ALL_BETWEEN_ORACLE},
}
