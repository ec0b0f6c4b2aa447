"""Extended relational coverage: the TPC-H query classes the base
``relational`` module doesn't touch — EXISTS/NOT-EXISTS (semi/anti with
non-equi residual conditions), correlated-aggregate subqueries, scalar
subqueries, multi-level aggregation, INTERSECT/EXCEPT, and wide multi-way
join pipelines. Adapted to the driver schema (no partsupp/comment/phone
columns), each with an exact DuckDB oracle.

Scale notes (100 TB posture):
* Semi/anti joins shuffle once on the key and never materialize the probe
  side's payload columns — the residual predicate rides the join.
* Correlated aggregates are rewritten as an aggregate + equi-join (the
  per-key aggregate output is keys-sized, so AQE can broadcast it), never
  a per-row subquery.
* Scalar subqueries become 1-row broadcast cross joins — in-plan, no
  driver collect.
* Every limit-k query carries a total tiebreak order so results are
  deterministic across engines and partitionings.
* Broadcast hints only on provably-bounded sides (nation: 25 rows; 1-row
  scalar aggregates). customer/supplier/part SCALE with the data — a
  forced broadcast OOMs at 100 TB, so those joins are left to AQE, which
  broadcasts them whenever the runtime size actually fits (it does at
  every test SF, keeping the plans identical here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import _read


# --------------------------------------------------------------------------
# q4-style: order-priority count where EXISTS a lineitem shipped after the
# order date — left_semi with an equi key + non-equi residual condition
# --------------------------------------------------------------------------

def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = _read(spark, sf_dir, "orders", "lineitem")
    shipped_late = (
        orders.join(
            lineitem,
            (orders.o_orderkey == lineitem.l_orderkey)
            & (lineitem.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
    )
    return (shipped_late.groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count")))


Q4_ORACLE = """
    select o_orderpriority, count(*) as order_count
    from orders
    where exists (
        select 1 from lineitem
        where l_orderkey = o_orderkey and l_shipdate > o_orderdate
    )
    group by o_orderpriority
"""


# --------------------------------------------------------------------------
# q7-style: shipping volume between two nations by year — the classic
# two-role dimension join (nation joined twice under different keys)
# --------------------------------------------------------------------------

_Q7_NATIONS = ("NATION_1", "NATION_2")


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation, customer, supplier, orders, lineitem = _read(
        spark, sf_dir, "nation", "customer", "supplier", "orders", "lineitem")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_name").alias("cust_nation"))
    return (
        lineitem
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(F.col("supp_nation").isin(*_Q7_NATIONS)
               & F.col("cust_nation").isin(*_Q7_NATIONS)
               & (F.col("supp_nation") != F.col("cust_nation")))
        .groupBy("supp_nation", "cust_nation",
                 F.year("o_orderdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2).alias("revenue"),
             F.count("*").alias("n_items"))
    )


Q7_ORACLE = f"""
    select n1.n_name as supp_nation, n2.n_name as cust_nation,
           year(o_orderdate) as l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
           count(*) as n_items
    from lineitem
    join orders   on l_orderkey = o_orderkey
    join customer on o_custkey = c_custkey
    join supplier on l_suppkey = s_suppkey
    join nation n1 on s_nationkey = n1.n_nationkey
    join nation n2 on c_nationkey = n2.n_nationkey
    where n1.n_name in ('{_Q7_NATIONS[0]}', '{_Q7_NATIONS[1]}')
      and n2.n_name in ('{_Q7_NATIONS[0]}', '{_Q7_NATIONS[1]}')
      and n1.n_name <> n2.n_name
    group by 1, 2, 3
"""


# --------------------------------------------------------------------------
# q9-style: profit by supplier nation and year, with a synthetic unit cost
# (schema has no partsupp; cost := 10% of part retail price per unit)
# --------------------------------------------------------------------------

def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation, supplier, part, lineitem = _read(
        spark, sf_dir, "nation", "supplier", "part", "lineitem")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.col("p_retailprice") * 0.1 * F.col("l_quantity"))
    return (
        lineitem
        .join(part.where(F.col("p_size") < 30)
              .select("p_partkey", "p_retailprice"),
              lineitem.l_partkey == F.col("p_partkey"))
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"),
             F.count("*").alias("n_items"))
    )


Q9_ORACLE = """
    select n_name as nation,
           round(sum(l_extendedprice * (1 - l_discount)
                     - p_retailprice * 0.1 * l_quantity), 2) as sum_profit,
           count(*) as n_items
    from lineitem
    join part     on l_partkey = p_partkey
    join supplier on l_suppkey = s_suppkey
    join nation   on s_nationkey = n_nationkey
    where p_size < 30
    group by n_name
"""


# --------------------------------------------------------------------------
# q10-style: top 20 customers by returned-item revenue (deterministic
# tiebreak on custkey)
# --------------------------------------------------------------------------

def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem = _read(
        spark, sf_dir, "customer", "orders", "lineitem")
    return (
        lineitem.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .join(customer.select("c_custkey", "c_name",
                              F.round("c_acctbal", 2).alias("acctbal")),
              F.col("o_custkey") == F.col("c_custkey"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "acctbal")
    )


Q10_ORACLE = """
    select c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
           round(c_acctbal, 2) as acctbal
    from lineitem
    join orders   on l_orderkey = o_orderkey
    join customer on o_custkey = c_custkey
    where l_returnflag = 'R'
    group by c_custkey, c_name, c_acctbal
    order by revenue desc, c_custkey asc
    limit 20
"""


# --------------------------------------------------------------------------
# q13-style: customer order-count distribution — outer join feeding a
# second-level aggregation
# --------------------------------------------------------------------------

def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = _read(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.select("c_custkey")
        .join(orders.select("o_custkey", "o_orderkey"),
              F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q13_ORACLE = """
    select c_count, count(*) as custdist
    from (
        select c_custkey, count(o_orderkey) as c_count
        from customer left join orders on c_custkey = o_custkey
        group by c_custkey
    )
    group by c_count
"""


# --------------------------------------------------------------------------
# q14-style: promo revenue share in one month — conditional aggregation
# over a pushdown-pruned scan; the ratio is computed from the two ROUNDED
# sums so both engines divide identical doubles
# --------------------------------------------------------------------------

def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, lineitem = _read(spark, sf_dir, "part", "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    sums = (
        lineitem.where((F.col("l_shipdate") >= "1996-01-01")
                       & (F.col("l_shipdate") < "1996-04-01"))
        .join(part.select("p_partkey", "p_type"),
              F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(F.sum(F.when(F.col("p_type").startswith("PROMO"), rev)
                           .otherwise(F.lit(0.0))), 2).alias("promo_rev"),
             F.round(F.sum(rev), 2).alias("total_rev"))
    )
    return sums.select(
        "promo_rev", "total_rev",
        F.round(F.col("promo_rev") * 100.0 / F.col("total_rev"), 4)
        .alias("promo_pct"))


Q14_ORACLE = """
    with sums as (
        select round(sum(case when p_type like 'PROMO%'
                              then l_extendedprice * (1 - l_discount)
                              else 0.0 end), 2) as promo_rev,
               round(sum(l_extendedprice * (1 - l_discount)), 2) as total_rev
        from lineitem
        join part on l_partkey = p_partkey
        where l_shipdate >= timestamp '1996-01-01 00:00:00'
          and l_shipdate <  timestamp '1996-04-01 00:00:00'
    )
    select promo_rev, total_rev,
           round(promo_rev * 100.0 / total_rev, 4) as promo_pct
    from sums
"""


# --------------------------------------------------------------------------
# q17-style: revenue from small-quantity lines, threshold = 20% of the
# part's average quantity — correlated aggregate rewritten as agg + join
# --------------------------------------------------------------------------

def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _read(spark, sf_dir, "lineitem")
    li = lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
    # per-part threshold is parts-sized (~2% of lineitem): one shuffle to
    # build, then AQE broadcasts it back onto the fact scan
    limits = (li.groupBy("l_partkey")
              .agg((F.avg("l_quantity") * 0.2).alias("qty_lim")))
    return (
        li.join(limits, "l_partkey")
        .where(F.col("l_quantity") < F.col("qty_lim"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
             F.count("*").alias("n_lines"))
    )


Q17_ORACLE = """
    with limits as (
        select l_partkey, 0.2 * avg(l_quantity) as qty_lim
        from lineitem group by l_partkey
    )
    select round(sum(l_extendedprice) / 7.0, 2) as avg_yearly,
           count(*) as n_lines
    from lineitem join limits using (l_partkey)
    where l_quantity < qty_lim
"""


# --------------------------------------------------------------------------
# q18-style: large-volume orders (HAVING over a fact aggregate, then
# dimension enrichment of the tiny surviving set)
# --------------------------------------------------------------------------

_Q18_QTY = 300


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem = _read(
        spark, sf_dir, "customer", "orders", "lineitem")
    big = (lineitem.groupBy("l_orderkey")
           .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
           .where(F.col("total_qty") > _Q18_QTY))
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer.select("c_custkey", "c_name"),
              F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "l_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                F.round("o_totalprice", 2).alias("total_price"), "total_qty")
    )


Q18_ORACLE = f"""
    select c_custkey, c_name, l_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') as o_orderdate,
           round(o_totalprice, 2) as total_price,
           total_qty
    from (
        select l_orderkey, round(sum(l_quantity), 2) as total_qty
        from lineitem group by l_orderkey
        having round(sum(l_quantity), 2) > {_Q18_QTY}
    )
    join orders   on l_orderkey = o_orderkey
    join customer on o_custkey = c_custkey
"""


# --------------------------------------------------------------------------
# q22-style: wealthy inactive customers — scalar subquery (global average)
# + NOT EXISTS with a residual date condition
# --------------------------------------------------------------------------

_Q22_CUTOFF = "2000-01-01"


def q22_wealthy_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = _read(spark, sf_dir, "customer", "orders")
    # scalar subquery as a 1-row broadcast cross join (in-plan, no collect)
    avg_bal = (customer.where(F.col("c_acctbal") > 0)
               .agg(F.avg("c_acctbal").alias("avg_bal")))
    recent = orders.where(F.col("o_orderdate") >= _Q22_CUTOFF)
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .agg(F.count("*").alias("n_cust"),
             F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
    )


Q22_ORACLE = f"""
    select count(*) as n_cust, round(sum(c_acctbal), 2) as total_bal
    from customer
    where c_acctbal > (select avg(c_acctbal) from customer where c_acctbal > 0)
      and not exists (
          select 1 from orders
          where o_custkey = c_custkey
            and o_orderdate >= timestamp '{_Q22_CUTOFF} 00:00:00'
      )
"""


# --------------------------------------------------------------------------
# set operations: INTERSECT + EXCEPT + UNION ALL in one deterministic result
# --------------------------------------------------------------------------

def status_custkey_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _read(spark, sf_dir, "orders")
    by_status = {
        s: orders.where(F.col("o_orderstatus") == s).select("o_custkey")
        for s in ("O", "F", "P")
    }
    both_of = by_status["O"].intersect(by_status["F"]).withColumn(
        "tag", F.lit("both_O_F"))
    p_not_f = by_status["P"].exceptAll(by_status["F"]).distinct().withColumn(
        "tag", F.lit("P_not_F"))
    return both_of.unionAll(p_not_f)


SETOPS_ORACLE = """
    select o_custkey, 'both_O_F' as tag from (
        select o_custkey from orders where o_orderstatus = 'O'
        intersect
        select o_custkey from orders where o_orderstatus = 'F'
    )
    union all
    select o_custkey, 'P_not_F' as tag from (
        select distinct o_custkey from (
            select o_custkey from orders where o_orderstatus = 'P'
            except all
            select o_custkey from orders where o_orderstatus = 'F'
        )
    )
"""


# --------------------------------------------------------------------------
# analytic-window breadth: lag delta, ntile, percent_rank, cume_dist in one
# pass — all over a UNIQUE total order (tiebreak on o_orderkey) so every
# rank-family value is deterministic across engines and partitionings
# --------------------------------------------------------------------------

def order_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    (orders,) = _read(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_custkey", "o_orderkey",
        F.round(F.col("o_totalprice")
                - F.lag("o_totalprice").over(w), 2).alias("price_delta"),
        F.ntile(4).over(wp).alias("price_quartile"),
        F.round(F.percent_rank().over(wp), 6).alias("price_pct_rank"),
        F.round(F.cume_dist().over(wp), 6).alias("price_cume_dist"),
    )


WINDOW_STATS_ORACLE = """
    select o_custkey, o_orderkey,
           round(o_totalprice - lag(o_totalprice) over w, 2) as price_delta,
           ntile(4) over wp as price_quartile,
           round(percent_rank() over wp, 6) as price_pct_rank,
           round(cume_dist() over wp, 6) as price_cume_dist
    from orders
    window w  as (partition by o_custkey order by o_orderdate, o_orderkey),
           wp as (partition by o_custkey order by o_totalprice, o_orderkey)
"""


ENTRIES = {
    "q4_priority_exists": {"fn": q4_priority_exists, "oracle": Q4_ORACLE},
    "q7_nation_volume": {"fn": q7_nation_volume, "oracle": Q7_ORACLE},
    "q9_profit_by_nation": {"fn": q9_profit_by_nation, "oracle": Q9_ORACLE},
    "q10_returned_revenue": {"fn": q10_returned_revenue, "oracle": Q10_ORACLE},
    "q13_order_distribution": {"fn": q13_order_distribution,
                               "oracle": Q13_ORACLE},
    "q14_promo_share": {"fn": q14_promo_share, "oracle": Q14_ORACLE},
    "q17_small_quantity": {"fn": q17_small_quantity, "oracle": Q17_ORACLE},
    "q18_large_volume": {"fn": q18_large_volume, "oracle": Q18_ORACLE},
    "q22_wealthy_inactive": {"fn": q22_wealthy_inactive,
                             "oracle": Q22_ORACLE},
    "status_custkey_setops": {"fn": status_custkey_setops,
                              "oracle": SETOPS_ORACLE},
    "order_window_stats": {"fn": order_window_stats,
                           "oracle": WINDOW_STATS_ORACLE},
}
