"""Count-min sketch over corpus n-grams (Cormode & Muthukrishnan 2005,
J. Algorithms 55(1)) — bounded-memory approximate frequency counting,
the counting sibling of the Bloom membership filter in
:mod:`waimak_spark.functions.dedup`.

The reference (waimak) has no sketch surface; this is the
training-data-pipeline extension family (round-14 catalog admission
candidate per PARITY's rotation ledger).  The 100 TB story: a full gram
``groupBy`` keyed on the gram string shuffles one row per DISTINCT gram
— unbounded state that grows with the corpus; the sketch's state is
``CMS_DEPTH × CMS_WIDTH`` cells REGARDLESS of corpus size (65 536 longs
at the defaults — broadcastable), map-side partial aggregation collapses
hot grams on the mappers, and any gram's frequency ESTIMATE is d seeded
hashes + a broadcast join.  Estimates never undercount (each of a gram's
d cells counts every occurrence of the gram, plus colliding strangers;
the min over d is still ≥ the true count); overshoot is bounded by the
classic εN with ε = e/width at depth ln(1/δ).  Every position comes from
the same seeded md5 the Bloom filter uses, so sketch content — including
which grams collide — is bit-reproducible on any engine, which is what
licenses an exact DuckDB oracle for an "approximate" operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import spread_for_compute
from .text import (
    TOKENS_SQL,
    seeded_hash,
    seeded_hash_sql,
    shingles,
    shingles_sql,
    tokens,
)

#: depth d: independent seeded hash rows (error probability δ = e^-d)
CMS_DEPTH = 4
#: width w: cells per row (overshoot ε = e/w of total gram mass)
CMS_WIDTH = 1 << 14
#: seed base — disjoint from the Bloom (7001+), IVF (1000+), k-means
#: (2000+), and PQ (3000+) ranges so no two operators share a hash stream
CMS_SEED_BASE = 8000
#: word-gram order for the corpus boilerplate entry
CMS_NGRAM = 3
#: heavy hitters reported by the catalog entry
CMS_TOPK = 20


def cms_gram_stream(df: DataFrame, text_col: str = "text",
                    n: int = CMS_NGRAM) -> DataFrame:
    """One ``gram`` row per word-``n``-gram position (overlapping,
    position-counted — frequency semantics, not the distinct-set
    semantics of the Jaccard family).  Null/short texts contribute
    nothing, which both engines agree on (explode of an empty array)."""
    return (spread_for_compute(df)
            .where(F.col(text_col).isNotNull())
            .select(tokens(F.col(text_col)).alias("_t"))
            .select(F.explode(shingles(F.col("_t"), n)).alias("gram")))


def _cms_cell(gram: Column, j: int, width: int) -> Column:
    return (seeded_hash(gram, CMS_SEED_BASE + j) % width).cast("int")


def cms_sketch(df: DataFrame, text_col: str = "text", n: int = CMS_NGRAM,
               depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """The sketch itself: ``(j, cell, c)`` — row j's cell counters, at
    most ``depth × width`` rows by construction.  ONE pass over the gram
    stream: each gram explodes into its d (row, cell) probes and a keyed
    count aggregates them; map-side partial aggregation collapses hot
    grams (boilerplate repeated millions of times) on the mappers, so
    the shuffle carries at most d × width rows per mapper, not the gram
    stream."""
    probes = F.array(*[
        F.struct(F.lit(j).alias("j"),
                 _cms_cell(F.col("gram"), j, width).alias("cell"))
        for j in range(depth)])
    return (cms_gram_stream(df, text_col, n)
            .select(F.explode(probes).alias("p"))
            .select("p.j", "p.cell")
            .groupBy("j", "cell")
            .agg(F.count("*").cast("bigint").alias("c")))


def cms_estimate(sketch: DataFrame, grams: DataFrame,
                 gram_col: str = "gram", depth: int = CMS_DEPTH,
                 width: int = CMS_WIDTH) -> DataFrame:
    """Point-estimate each input gram's corpus frequency: min over the
    gram's d cells, 0 when a cell is empty.  The sketch side carries an
    explicit broadcast hint — its row count is bounded by d × width BY
    CONSTRUCTION, but Catalyst's size estimate derives from the
    (unbounded) corpus child, so without the hint the planner would
    shuffle the probe stream at scale (the Bloom position-set
    argument)."""
    probes = F.array(*[
        F.struct(F.lit(j).alias("j"),
                 _cms_cell(F.col(gram_col), j, width).alias("cell"))
        for j in range(depth)])
    p = (grams.select(F.col(gram_col).alias("gram"))
         .select("gram", F.explode(probes).alias("p"))
         .select("gram", "p.j", "p.cell"))
    return (p.join(F.broadcast(sketch), ["j", "cell"], "left")
            .groupBy("gram")
            .agg(F.min(F.coalesce(F.col("c"), F.lit(0)))
                 .cast("bigint").alias("c_est")))


def cms_heavy_hitters(df: DataFrame, text_col: str = "text",
                      k: int = CMS_TOPK, n: int = CMS_NGRAM,
                      depth: int = CMS_DEPTH,
                      width: int = CMS_WIDTH) -> DataFrame:
    """``(gram, c_exact, c_est, over)`` for the k most frequent word
    n-grams: the exact top-k (count desc, gram asc — deterministic at
    the rank-k boundary) is the VERIFICATION GATE for the sketch (the
    ann_ivf_recall pattern): ``c_est`` must never undercount
    (``over = 1`` on every row), and for true heavy hitters the
    estimate is tight.  At 100 TB the exact side is the expensive path
    you run once to certify; the sketch is what the pipeline keeps."""
    g = cms_gram_stream(df, text_col, n)
    exact = (g.groupBy("gram").agg(F.count("*").cast("bigint")
                                   .alias("c_exact"))
             .orderBy(F.desc("c_exact"), F.asc("gram")).limit(k))
    est = cms_estimate(cms_sketch(df, text_col, n, depth, width),
                       exact.select("gram"), depth=depth, width=width)
    return (exact.join(est, "gram")
            .select("gram", "c_exact", "c_est",
                    (F.col("c_est") >= F.col("c_exact")).cast("int")
                    .alias("over"))
            .orderBy(F.desc("c_exact"), F.asc("gram")))


def _cms_cells_sql(expr: str, depth: int, width: int) -> str:
    """Parallel-unnest lists: DuckDB zips equal-length unnests in one
    SELECT, giving the same (j, cell) probe rows as the Spark explode."""
    js = ", ".join(str(j) for j in range(depth))
    cells = ", ".join(
        f"({seeded_hash_sql(expr, CMS_SEED_BASE + j)} % {width})::INT"
        for j in range(depth))
    return f"unnest([{js}]) as j, unnest([{cells}]) as cell"


def cms_heavy_hitters_sql(k: int = CMS_TOPK, n: int = CMS_NGRAM,
                          depth: int = CMS_DEPTH,
                          width: int = CMS_WIDTH,
                          table: str = "documents",
                          text: str = "text") -> str:
    """DuckDB oracle for :func:`cms_heavy_hitters` over ``table``."""
    return f"""
        with tok as (
            select {TOKENS_SQL.format(col=text)} as t
            from {table} where {text} is not null
        ), g as (
            select unnest({shingles_sql('t', n)}) as gram from tok
        ), sk as (
            select j, cell, count(*)::BIGINT as c
            from (select {_cms_cells_sql('gram', depth, width)} from g)
            group by j, cell
        ), exact as (
            select gram, count(*)::BIGINT as c_exact
            from g group by gram
            order by c_exact desc, gram limit {k}
        ), probe as (
            select gram, {_cms_cells_sql('gram', depth, width)} from exact
        ), est as (
            select probe.gram,
                   min(coalesce(sk.c, 0))::BIGINT as c_est
            from probe left join sk using (j, cell)
            group by probe.gram
        )
        select e.gram, e.c_exact, est.c_est,
               case when est.c_est >= e.c_exact then 1 else 0 end as over
        from exact e join est using (gram)
        order by e.c_exact desc, e.gram
    """
