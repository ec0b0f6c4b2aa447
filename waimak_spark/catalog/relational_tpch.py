"""The remaining TPC-H query classes (q2/q8/q11/q12/q15/q16/q19/q20/q21),
adapted to the driver schema — with `relational.py` and
`relational_ext.py` this completes all 22 TPC-H query shapes.

Schema adaptations (the driver's tables have no partsupp and fewer
columns — see TESTDATA.md):

* the SUPPLY relation (partsupp's role) is the distinct
  ``(l_suppkey, l_partkey)`` pairs from lineitem — "suppliers that have
  shipped the part";
* q2's supply COST is a deterministic function of the pair,
  ``p_retailprice × (5 + (s_suppkey·31 + p_partkey) mod 11) / 100`` —
  integer arithmetic, bit-identical on both engines;
* "late" (q12/q21's receipt-vs-commit) is
  ``l_shipdate > o_orderdate + N days`` since only those two dates exist.

Scale notes (100 TB posture) — same rules as relational_ext.py:
nation/region and 1-row scalar aggregates broadcast; customer / supplier
/ part joins are left to AQE (they scale with the data); semi/anti joins
carry the non-equi residual on the join; every aggregate is partial
(map-side combine) before its one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import _read


def _supply(lineitem: DataFrame) -> DataFrame:
    """The partsupp stand-in: distinct (supplier, part) shipped pairs."""
    return lineitem.select("l_suppkey", "l_partkey").distinct()


# --------------------------------------------------------------------------
# q2: min-cost supplier per part — correlated MIN subquery as agg + join
# --------------------------------------------------------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, supplier, nation, lineitem = _read(
        spark, sf_dir, "part", "supplier", "nation", "lineitem")
    cost = F.round(
        F.col("p_retailprice")
        * (5 + (F.col("l_suppkey") * 31 + F.col("l_partkey")) % 11) / 100.0,
        2)
    offers = (part.where(F.col("p_type") == "LARGE")
              .join(_supply(lineitem),
                    F.col("p_partkey") == F.col("l_partkey"))
              .withColumn("cost", cost))
    # groupBy + join-back kept over the window-min form: Spark reuses
    # the offers exchange across both branches, so the self-join is
    # nearly free — a round-8 A/B of min-over-Window(p_partkey)
    # measured 1.195 vs 1.17 s isolated min-of-6 (noise), rejected as
    # a plan change with no measured gain
    min_cost = offers.groupBy("p_partkey").agg(
        F.min("cost").alias("min_cost"))
    return (offers.join(min_cost, "p_partkey")
            .where(F.col("cost") == F.col("min_cost"))
            .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("p_partkey", "p_name", "s_name",
                    F.col("n_name").alias("nation"), "s_acctbal", "cost"))


Q2_ORACLE = """
    with offers as (
        select p_partkey, p_name,
               l_suppkey,
               round(p_retailprice
                     * (5 + (l_suppkey * 31 + l_partkey) % 11) / 100.0,
                     2) as cost
        from part
        join (select distinct l_suppkey, l_partkey from lineitem) s
          on p_partkey = l_partkey
        where p_type = 'LARGE'
    ), mc as (
        select p_partkey, min(cost) as min_cost from offers group by 1
    )
    select o.p_partkey, o.p_name, s_name, n_name as nation, s_acctbal,
           o.cost
    from offers o
    join mc on o.p_partkey = mc.p_partkey and o.cost = mc.min_cost
    join supplier on l_suppkey = s_suppkey
    join nation on s_nationkey = n_nationkey
"""


# --------------------------------------------------------------------------
# q8: national market share by year — conditional-share aggregation over a
# six-way join with a two-role nation dimension
# --------------------------------------------------------------------------

_Q8_NATION = "NATION_3"
_Q8_REGION = "ASIA"
_Q8_TYPE = "ECONOMY"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, supplier, nation, region, part = _read(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier",
        "nation", "region", "part")
    cn = nation.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_regionkey").alias("c_rk"))
    sn = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region.where(F.col("r_name") == _Q8_REGION)),
              F.col("c_rk") == F.col("r_regionkey"))
        .join(part.where(F.col("p_type") == _Q8_TYPE),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(
            F.sum(F.when(F.col("supp_nation") == _Q8_NATION, vol)
                  .otherwise(F.lit(0.0)))
            / F.sum(vol), 4).alias("mkt_share")))


Q8_ORACLE = f"""
    select year(o_orderdate) as o_year,
           round(sum(case when sn.n_name = '{_Q8_NATION}'
                          then l_extendedprice * (1 - l_discount)
                          else 0 end)
                 / sum(l_extendedprice * (1 - l_discount)), 4) as mkt_share
    from lineitem
    join orders on l_orderkey = o_orderkey
    join customer on o_custkey = c_custkey
    join nation cn on c_nationkey = cn.n_nationkey
    join region on cn.n_regionkey = r_regionkey
    join part on l_partkey = p_partkey
    join supplier on l_suppkey = s_suppkey
    join nation sn on s_nationkey = sn.n_nationkey
    where r_name = '{_Q8_REGION}' and p_type = '{_Q8_TYPE}'
    group by 1
"""


# --------------------------------------------------------------------------
# q11: important parts — per-part value vs a global scalar threshold
# (the HAVING-against-global-aggregate class; 1-row broadcast, no collect)
# --------------------------------------------------------------------------
#
# TPC-H's fraction-of-total threshold is scale-DEPENDENT (each part's
# share shrinks as the part count grows — at sf0.1 a fixed fraction
# returns nothing); a multiple-of-average threshold keeps a stable
# selectivity at every SF while exercising the identical query class.

_Q11_FACTOR = 1.5


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, supplier = _read(spark, sf_dir, "lineitem", "supplier")
    value = (lineitem
             .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
             .where(F.col("s_nationkey") % 2 == 1)
             .groupBy("l_partkey")
             .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                  .alias("raw_value")))
    total = value.agg(F.avg("raw_value").alias("avg_value"))
    # engine-parity recipe: the threshold comparison runs on ROUNDED
    # values on both engines — partial-agg accumulation order differs
    # between Spark and DuckDB, so an unrounded `raw > 1.5*avg` could
    # flip for a part landing within a few ulp of the threshold
    return (value.join(F.broadcast(total))
            .where(F.round("raw_value", 2)
                   > F.round(_Q11_FACTOR * F.col("avg_value"), 2))
            .select("l_partkey",
                    F.round("raw_value", 2).alias("value")))


Q11_ORACLE = f"""
    with v as (
        select l_partkey,
               sum(l_extendedprice * l_quantity) as raw_value
        from lineitem join supplier on l_suppkey = s_suppkey
        where s_nationkey % 2 = 1
        group by 1
    ), t as (select avg(raw_value) as avg_value from v)
    select l_partkey, round(raw_value, 2) as value
    from v cross join t
    where round(raw_value, 2) > round({_Q11_FACTOR} * avg_value, 2)
"""


# --------------------------------------------------------------------------
# q12: late-shipment priority histogram — conditional counts per class
# --------------------------------------------------------------------------

_Q12_LATE_DAYS = 60


def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders = _read(spark, sf_dir, "lineitem", "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate")
               > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q12_LATE_DAYS} DAYS"))
        .groupBy("l_returnflag")
        .agg(F.count(F.when(high, 1)).alias("high_line_count"),
             F.count(F.when(~high, 1)).alias("low_line_count")))


Q12_ORACLE = f"""
    select l_returnflag,
           count(case when o_orderpriority in ('1-URGENT', '2-HIGH')
                      then 1 end) as high_line_count,
           count(case when o_orderpriority not in ('1-URGENT', '2-HIGH')
                      then 1 end) as low_line_count
    from lineitem join orders on l_orderkey = o_orderkey
    where l_shipdate > o_orderdate + interval {_Q12_LATE_DAYS} day
    group by 1
"""


# --------------------------------------------------------------------------
# q15: top supplier — revenue view + scalar MAX subquery as 1-row broadcast
# --------------------------------------------------------------------------

_Q15_FROM = "1996-01-01"
_Q15_TO = "1996-07-01"


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, supplier = _read(spark, sf_dir, "lineitem", "supplier")
    rev = (lineitem
           .where((F.col("l_shipdate") >= F.lit(_Q15_FROM))
                  & (F.col("l_shipdate") < F.lit(_Q15_TO)))
           .groupBy("l_suppkey")
           .agg(F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 2)
                .alias("total_revenue")))
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (rev.join(F.broadcast(top))
            .where(F.col("total_revenue") == F.col("max_revenue"))
            .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
            .select(F.col("s_suppkey"), F.col("s_name"), "total_revenue"))


Q15_ORACLE = f"""
    with rev as (
        select l_suppkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                   as total_revenue
        from lineitem
        where l_shipdate >= '{_Q15_FROM}' and l_shipdate < '{_Q15_TO}'
        group by 1
    )
    select s_suppkey, s_name, total_revenue
    from rev join supplier on l_suppkey = s_suppkey
    where total_revenue = (select max(total_revenue) from rev)
"""


# --------------------------------------------------------------------------
# q16: supplier count per part group, excluding a NOT-IN supplier set
# --------------------------------------------------------------------------

_Q16_SIZES = (1, 4, 9, 14, 19, 23, 36, 45)


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, supplier, lineitem = _read(
        spark, sf_dir, "part", "supplier", "lineitem")
    bad = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    # raw (suppkey, partkey) pairs, NOT the _supply distinct: the final
    # countDistinct dedups anyway (its first aggregation phase groups on
    # (brand, type, size, suppkey), collapsing duplicate pairs map-side),
    # so the _supply form paid a full extra exchange to dedup rows the
    # aggregate would dedup for free (round-8 A/B, isolated min-of-6 at
    # sf0.1: 0.99 -> 0.746 s, output-identical).  q2 KEEPS _supply — its
    # per-pair cost rows would duplicate without it.
    return (
        lineitem.select("l_suppkey", "l_partkey")
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(part.where((F.col("p_brand") != "Brand#1")
                         & F.col("p_size").isin(*_Q16_SIZES)),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


Q16_ORACLE = f"""
    select p_brand, p_type, p_size,
           count(distinct l_suppkey) as supplier_cnt
    from (select distinct l_suppkey, l_partkey from lineitem) s
    join part on l_partkey = p_partkey
    where p_brand <> 'Brand#1'
      and p_size in ({', '.join(str(s) for s in _Q16_SIZES)})
      and l_suppkey not in (
          select s_suppkey from supplier where s_acctbal < 0)
    group by 1, 2, 3
"""


# --------------------------------------------------------------------------
# q19: disjunctive join predicates (OR of brand/size/quantity conjuncts) —
# the whole disjunction must ride the equi-join as a residual filter, not
# degenerate into a cartesian
# --------------------------------------------------------------------------

_Q19_ARMS = (("Brand#2", 1, 15, 1, 20),
             ("Brand#13", 10, 30, 10, 40),
             ("Brand#20", 20, 50, 20, 50))


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _read(spark, sf_dir, "lineitem", "part")
    # the disjunctive arms parse as ONE SQL string (round-12
    # construction-tax pass): the Column loop paid ~15 py4j round-trips
    # per arm; the predicate text is shared with the DuckDB oracle
    # below (valid in both dialects), so the two sides cannot drift
    return (lineitem
            .join(part, F.col("l_partkey") == F.col("p_partkey"))
            .where(F.expr(_Q19_SQL_ARMS))
            .agg(F.count("*").alias("n_items"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue")))


_Q19_SQL_ARMS = " or ".join(
    f"(p_brand = '{b}' and p_size between {slo} and {shi} "
    f"and l_quantity between {qlo} and {qhi})"
    for b, slo, shi, qlo, qhi in _Q19_ARMS)

Q19_ORACLE = f"""
    select count(*) as n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
    from lineitem join part on l_partkey = p_partkey
    where {_Q19_SQL_ARMS}
"""


# --------------------------------------------------------------------------
# q20: suppliers dominating a part's supply — nested correlated aggregate
# (per-pair quantity vs a per-part total) resolved as agg + join + semi
# --------------------------------------------------------------------------

_Q20_BRAND = "Brand#2"
_Q20_SHARE = 0.15


def q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part, supplier = _read(
        spark, sf_dir, "lineitem", "part", "supplier")
    sp = (lineitem
          .join(part.where(F.col("p_brand") == _Q20_BRAND),
                F.col("l_partkey") == F.col("p_partkey"))
          .groupBy("l_suppkey", "l_partkey")
          .agg(F.sum("l_quantity").alias("q")))
    pt = sp.groupBy("l_partkey").agg(F.sum("q").alias("tot"))
    heavy = (sp.join(pt, "l_partkey")
             .where(F.col("q") > _Q20_SHARE * F.col("tot"))
             .select("l_suppkey").distinct())
    return (supplier.join(heavy,
                          F.col("s_suppkey") == F.col("l_suppkey"),
                          "left_semi")
            .select("s_suppkey", "s_name"))


Q20_ORACLE = f"""
    with sp as (
        select l_suppkey, l_partkey, sum(l_quantity) as q
        from lineitem join part on l_partkey = p_partkey
        where p_brand = '{_Q20_BRAND}'
        group by 1, 2
    ), pt as (select l_partkey, sum(q) as tot from sp group by 1)
    select s_suppkey, s_name from supplier
    where s_suppkey in (
        select l_suppkey from sp join pt using (l_partkey)
        where q > {_Q20_SHARE} * tot)
"""


# --------------------------------------------------------------------------
# q21: suppliers who kept orders waiting — EXISTS(other supplier) AND
# NOT EXISTS(other LATE supplier).  The correlated <>-EXISTS pair is
# rewritten as per-order DISTINCT-supplier counts: for a late pair
# (o, s), "another supplier exists" is n_all(o) >= 2 and "no other late
# supplier" is n_late(o) == 1 (s itself is late) — all three frames key
# on l_orderkey so the aggregations reuse one exchange instead of
# running two join stages with inequality residuals (semi/anti joins
# keep the equi-key but evaluate the <> residual per matched row; at
# skewed orders that is per-pair work, the counts are per-order).
# Measured isolated min-of-6 at sf0.1: 1.60 -> 1.12 s, output-identical
# (ADVICE r7 alignment; round-8 re-measure confirms at 1.11 s).
# --------------------------------------------------------------------------

_Q21_LATE_DAYS = 1400


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, supplier = _read(
        spark, sf_dir, "lineitem", "orders", "supplier")

    all_pairs = lineitem.select("l_orderkey", "l_suppkey").distinct()
    # `late` feeds multiple consumers, but the round-11 persist of the
    # distinct late-pair frame was REVERTED in round 12 (VERDICT r11
    # #3 re-adjudication): fresh-JVM interleaved min-of-4 ABAB read
    # no-persist 1.08/1.30/1.26 s vs persist 1.63/1.52/1.55 s at sf0.1
    # (3/3 pairs) and parity at a 10x lineitem replica (2.38/2.81 vs
    # 2.75/2.33) — the cache materialization costs more than the
    # duplicated subplan saves at both scales; the driver's r11 lap
    # (1.6 -> 2.0) and iso row (1.718) said the same
    late = (
        lineitem
        .join(orders.where(F.col("o_orderstatus") == "F"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate")
               + F.expr(f"INTERVAL {_Q21_LATE_DAYS} DAYS"))
        .select("l_orderkey", "l_suppkey").distinct())
    all_cnt = all_pairs.groupBy("l_orderkey").agg(
        F.count("*").alias("n_all"))
    late_cnt = late.groupBy("l_orderkey").agg(
        F.count("*").alias("n_late"))
    waiting = (late.join(all_cnt, "l_orderkey")
               .join(late_cnt, "l_orderkey")
               .where((F.col("n_all") >= 2) & (F.col("n_late") == 1)))
    return (waiting.groupBy("l_suppkey")
            .agg(F.count("*").alias("numwait"))
            .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_name", "numwait"))


Q21_ORACLE = f"""
    with l2 as (select distinct l_orderkey, l_suppkey from lineitem),
    l1 as (
        select distinct l.l_orderkey, l.l_suppkey
        from lineitem l join orders o on l.l_orderkey = o.o_orderkey
        where o.o_orderstatus = 'F'
          and l.l_shipdate > o.o_orderdate + interval {_Q21_LATE_DAYS} day
    )
    select s_name, count(*) as numwait
    from l1
    join supplier on l1.l_suppkey = s_suppkey
    where exists (
        select 1 from l2
        where l2.l_orderkey = l1.l_orderkey
          and l2.l_suppkey <> l1.l_suppkey)
      and not exists (
        select 1 from l1 x
        where x.l_orderkey = l1.l_orderkey
          and x.l_suppkey <> l1.l_suppkey)
    group by 1
"""


ENTRIES = {
    "q2_min_cost_supplier": {"fn": q2_min_cost_supplier,
                             "oracle": Q2_ORACLE},
    "q8_market_share": {"fn": q8_market_share, "oracle": Q8_ORACLE},
    "q11_important_parts": {"fn": q11_important_parts,
                            "oracle": Q11_ORACLE},
    "q12_late_priority": {"fn": q12_late_priority, "oracle": Q12_ORACLE},
    "q15_top_supplier": {"fn": q15_top_supplier, "oracle": Q15_ORACLE},
    "q16_supplier_count": {"fn": q16_supplier_count,
                           "oracle": Q16_ORACLE},
    "q19_disjunctive_revenue": {"fn": q19_disjunctive_revenue,
                                "oracle": Q19_ORACLE},
    "q20_heavy_suppliers": {"fn": q20_heavy_suppliers,
                            "oracle": Q20_ORACLE},
    "q21_waiting_suppliers": {"fn": q21_waiting_suppliers,
                              "oracle": Q21_ORACLE},
}
