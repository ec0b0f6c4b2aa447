"""RDBM ingestion catalog entries — the DataFrame kernels that are
oracle-checkable without a database.

``rdbm_temporal_snapshot`` builds a synthetic SQL-Server-style temporal
history from ``orders`` (v1 at o_orderdate; every third order re-versioned
500 days later; every ninth deleted 800 days after creation) and snapshots
it with the delete-detecting kernel (RDBMIngestionUtils.scala:66-82). The
oracle replays the identical construction + window in ANSI SQL.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..rdbm import (
    SQLServerTemporalTableMetadata,
    lower_case_all,
    snapshot_temporal_table_dataset,
)

HI = "9999-12-31 23:59:59"
SNAPSHOT_TS = "1998-06-01 00:00:00"
REVISION_DAYS = 500
DELETE_DAYS = 800


def _temporal_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    od = F.col("o_orderdate").cast("timestamp")
    hi = F.lit(HI).cast("timestamp")
    v1 = orders.select(
        "o_orderkey", "o_custkey", F.lit(1).alias("ver"),
        od.alias("valid_from"),
        F.when(F.col("o_orderkey") % 3 == 0,
               od + F.expr(f"interval {REVISION_DAYS} days"))
        .otherwise(hi).alias("valid_to"),
    )
    v2 = orders.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_custkey", F.lit(2).alias("ver"),
        (od + F.expr(f"interval {REVISION_DAYS} days")).alias("valid_from"),
        F.when(F.col("o_orderkey") % 9 == 0,
               od + F.expr(f"interval {DELETE_DAYS} days"))
        .otherwise(hi).alias("valid_to"),
    )
    return v1.unionByName(v2)


def rdbm_temporal_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = SQLServerTemporalTableMetadata(
        "dbo", "orders", ["o_orderkey"], None, "dbo", "orders_history",
        "valid_from", "valid_to")
    ts = datetime.fromisoformat(SNAPSHOT_TS.replace(" ", "T"))
    snap = snapshot_temporal_table_dataset(
        _temporal_history(spark, sf_dir), ts, meta)
    return snap.select("o_orderkey", "o_custkey", "ver", "valid_from")


TEMPORAL_SNAPSHOT_ORACLE = f"""
    with v1 as (
        select o_orderkey, o_custkey, 1 as ver,
               cast(o_orderdate as timestamp) as valid_from,
               case when o_orderkey % 3 = 0
                    then cast(o_orderdate as timestamp)
                         + interval {REVISION_DAYS} day
                    else timestamp '{HI}' end as valid_to
        from orders
    ), v2 as (
        select o_orderkey, o_custkey, 2 as ver,
               cast(o_orderdate as timestamp)
                   + interval {REVISION_DAYS} day as valid_from,
               case when o_orderkey % 9 = 0
                    then cast(o_orderdate as timestamp)
                         + interval {DELETE_DAYS} day
                    else timestamp '{HI}' end as valid_to
        from orders
        where o_orderkey % 3 = 0
    ), hist as (
        select * from v1 union all select * from v2
    )
    select o_orderkey, o_custkey, ver, valid_from
    from (
        select *, row_number() over (partition by o_orderkey
                                     order by valid_from desc,
                                              valid_to asc) as rn
        from hist
        where valid_from <= timestamp '{SNAPSHOT_TS}'
          and valid_from != valid_to
    )
    where rn = 1
      and timestamp '{SNAPSHOT_TS}' >= valid_from
      and timestamp '{SNAPSHOT_TS}' < valid_to
"""


def rdbm_lowercase_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lowerCaseAll metadata normalisation over string-cast nation."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").cast("string").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("string").alias("n_regionkey"))
    return lower_case_all(nation)


LOWERCASE_ORACLE = """
    select lower(cast(n_nationkey as varchar)) as n_nationkey,
           lower(n_name) as n_name,
           lower(cast(n_regionkey as varchar)) as n_regionkey
    from nation
"""


ENTRIES = {
    "rdbm_temporal_snapshot": {"fn": rdbm_temporal_snapshot,
                               "oracle": TEMPORAL_SNAPSHOT_ORACLE},
    "rdbm_lowercase_all": {"fn": rdbm_lowercase_all,
                           "oracle": LOWERCASE_ORACLE},
}
