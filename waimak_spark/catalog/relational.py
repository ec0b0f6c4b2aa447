"""Relational coverage: the reference's transform/sql action surface carries
arbitrary Spark relational work (SURVEY.md §2.3 — joins, aggregations,
windows, set ops are the user-facing operator set). These queries exercise
that surface end-to-end through the flow machinery where cheap, and pin the
plans Catalyst should pick (broadcast joins for dims, partial aggregation).

Scale notes (100 TB posture):
* dimension tables (region/nation/supplier/part/customer) are broadcast —
  no shuffle on the fact side for those joins;
* aggregations go partial→final (map-side combine) automatically because we
  stay in built-in ``F`` functions;
* top-k per group uses a single window over a hash-partitioned shuffle on
  the group key, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..dataflow import Waimak


def _read(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names]


# --------------------------------------------------------------------------
# q1: TPC-H Q1-style pricing summary — run through the full flow machinery
# (open → sql → result), the reference's flagship usage pattern
# (waimak-core TestSparkDataFlow.scala:215-240 exercises sql the same way).
# --------------------------------------------------------------------------

Q1_SPARK_SQL = """
    select l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   as sum_qty,
           round(sum(l_extendedprice), 2)                              as sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           as sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) as sum_charge,
           round(avg(l_quantity), 4)                                   as avg_qty,
           round(avg(l_extendedprice), 4)                              as avg_price,
           round(avg(l_discount), 4)                                   as avg_disc,
           count(*)                                                    as count_order
    from lineitem
    where l_shipdate <= timestamp '1998-09-02 00:00:00'
    group by l_returnflag, l_linestatus
"""


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    flow = (
        Waimak.spark_flow(spark)
        .open_file_parquet(f"{sf_dir}/lineitem.parquet", "lineitem")
        .sql("lineitem", output="q1", query=Q1_SPARK_SQL)
    )
    _, final = flow.execute()
    return final.inputs.get("q1")


Q1_ORACLE = Q1_SPARK_SQL  # pure ANSI; DuckDB runs it verbatim


# --------------------------------------------------------------------------
# q3: shipping-priority style — 3-way join + group + deterministic top 10
# --------------------------------------------------------------------------

def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem = _read(spark, sf_dir, "customer", "orders", "lineitem")
    # The selective mktsegment filter shrinks orders ~5x BEFORE the big
    # lineitem shuffle join: broadcast the filtered customer keys into
    # orders first, then join the fact table against the reduced orders.
    # At 100 TB this cuts the orders-side shuffle write 5x and gives AQE a
    # chance to broadcast the reduced orders outright.
    cust = (customer.where(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    # no broadcast hint: customer SCALES with the fact tables (a forced
    # broadcast of a scaling side OOMs at 100 TB); AQE broadcasts the
    # filtered key set whenever its runtime size actually fits
    ords = (orders.join(cust, orders.o_custkey == cust.c_custkey)
            .select("o_orderkey", "o_orderdate", "o_orderpriority"))
    return (
        lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(ords, F.col("l_orderkey") == ords.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                "o_orderpriority", "revenue")
    )


Q3_ORACLE = """
    select l_orderkey, strftime(o_orderdate, '%Y-%m-%d') as o_orderdate,
           o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
    from lineitem
    join orders   on l_orderkey = o_orderkey
    join customer on o_custkey = c_custkey
    where c_mktsegment = 'BUILDING'
    group by l_orderkey, o_orderdate, o_orderpriority
    order by revenue desc, l_orderkey asc
    limit 10
"""


# --------------------------------------------------------------------------
# q5: region revenue — 6-way join with broadcast dims
# --------------------------------------------------------------------------

def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, nation, customer, supplier, orders, lineitem = _read(
        spark, sf_dir, "region", "nation", "customer", "supplier", "orders", "lineitem"
    )
    return (
        lineitem
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        # customer/supplier scale with the data — no forced broadcast
        # (AQE picks broadcast when the runtime size fits); nation/region
        # are CONSTANT-size (25/5 rows) so the hint is always safe
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier,
              (lineitem.l_suppkey == supplier.s_suppkey)
              & (customer.c_nationkey == supplier.s_nationkey))
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
             F.count("*").alias("n_items"))
    )


Q5_ORACLE = """
    select r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
           count(*) as n_items
    from lineitem
    join orders   on l_orderkey = o_orderkey
    join customer on o_custkey = c_custkey
    join supplier on l_suppkey = s_suppkey and c_nationkey = s_nationkey
    join nation   on c_nationkey = n_nationkey
    join region   on n_regionkey = r_regionkey
    group by r_name, n_name
"""


# --------------------------------------------------------------------------
# q6: forecast revenue change — pushdown-friendly filter + single agg
# --------------------------------------------------------------------------

def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _read(spark, sf_dir, "lineitem")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
             .alias("revenue"),
             F.count("*").alias("n_rows"))
    )


Q6_ORACLE = """
    select round(sum(l_extendedprice * l_discount), 2) as revenue,
           count(*) as n_rows
    from lineitem
    where l_shipdate >= timestamp '1995-01-01 00:00:00'
      and l_shipdate <  timestamp '1996-01-01 00:00:00'
      and l_discount between 0.05 and 0.07
      and l_quantity < 24
"""


# --------------------------------------------------------------------------
# top-k per group: window row_number (the canonical §2.6-dedup-style window)
# --------------------------------------------------------------------------

def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _read(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "rank",
                F.round("o_totalprice", 2).alias("total_price"))
    )


TOP3_ORACLE = """
    select o_custkey, o_orderkey, rank, round(o_totalprice, 2) as total_price
    from (
        select o_custkey, o_orderkey, o_totalprice,
               row_number() over (partition by o_custkey
                                  order by o_totalprice desc, o_orderkey asc) as rank
        from orders
    )
    where rank <= 3
"""


# --------------------------------------------------------------------------
# rollup: multi-level aggregation (grouping sets family)
# --------------------------------------------------------------------------

def rollup_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _read(spark, sf_dir, "lineitem")
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.count("*").alias("n"))
    )


ROLLUP_ORACLE = """
    select l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) as sum_qty, count(*) as n
    from lineitem
    group by rollup(l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# pivot: wide conditional aggregation
# --------------------------------------------------------------------------

def pivot_status_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _read(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .select("l_returnflag", F.col("O").alias("qty_o"), F.col("F").alias("qty_f"))
    )


PIVOT_ORACLE = """
    select l_returnflag,
           round(sum(case when l_linestatus = 'O' then l_quantity end), 2) as qty_o,
           round(sum(case when l_linestatus = 'F' then l_quantity end), 2) as qty_f
    from lineitem
    group by l_returnflag
"""


# --------------------------------------------------------------------------
# set ops + anti join: customers with no orders (NOT EXISTS via left_anti)
# --------------------------------------------------------------------------

def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = _read(spark, sf_dir, "customer", "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


ANTI_ORACLE = """
    select c_custkey, c_name
    from customer
    where not exists (select 1 from orders where o_custkey = c_custkey)
"""


# --------------------------------------------------------------------------
# scalar-function coverage: string/date/math built-ins through one projection
# --------------------------------------------------------------------------

def part_feature_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = _read(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.round(F.sqrt(F.col("p_retailprice")), 4).alias("price_sqrt"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


SCALAR_ORACLE = """
    select p_partkey,
           upper(p_brand)            as brand_u,
           length(p_name)            as name_len,
           substr(p_type, 1, 5)      as type_prefix,
           round(sqrt(p_retailprice), 4) as price_sqrt,
           p_size % 7                as size_mod,
           p_brand || '|' || p_type  as brand_type
    from part
"""


ENTRIES = {
    "q1_pricing_summary": {"fn": q1_pricing_summary, "oracle": Q1_ORACLE},
    "q3_top_revenue_orders": {"fn": q3_top_revenue_orders, "oracle": Q3_ORACLE},
    "q5_region_revenue": {"fn": q5_region_revenue, "oracle": Q5_ORACLE},
    "q6_revenue_delta": {"fn": q6_revenue_delta, "oracle": Q6_ORACLE},
    "top3_orders_per_customer": {"fn": top3_orders_per_customer, "oracle": TOP3_ORACLE},
    "rollup_quantity": {"fn": rollup_quantity, "oracle": ROLLUP_ORACLE},
    "pivot_status_quantity": {"fn": pivot_status_quantity, "oracle": PIVOT_ORACLE},
    "customers_without_orders": {"fn": customers_without_orders, "oracle": ANTI_ORACLE},
    "part_feature_projection": {"fn": part_feature_projection, "oracle": SCALAR_ORACLE},
}
