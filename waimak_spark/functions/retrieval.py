"""BM25 ranked retrieval over the document corpus (Robertson &
Zaragoza 2009, Foundations and Trends in IR 3(4); idf in the
always-positive Lucene form ``ln(1 + (N - df + 0.5)/(df + 0.5))``).

The reference (waimak) has no retrieval surface; this is the
training-data-pipeline extension family (round-16 catalog admission
candidate per PARITY's rotation ledger) — the standard tool for
query-targeted corpus curation (pulling the documents most relevant to
a benchmark/topic before a finer importance weighting like DSIR).

The 100 TB story, stage by stage:

* the token stream is filtered to the QUERY VOCABULARY (a handful of
  literal strings) before the only corpus-sized shuffle, so the
  ``(doc_id, term)`` tf aggregation shuffles a stream bounded by
  corpus occurrences OF QUERY TERMS, not the corpus token stream;
* document frequencies reuse the tf frame (one extra ≤|vocab|-row agg)
  and come back as a broadcast hash join; the corpus-level constants
  (N, avgdl) are a 1-row in-plan broadcast cross (the tfidf_top_terms
  pattern — no driver collect);
* per-document scores sum ≤|query| term contributions after a keyed
  groupBy with map-side partial agg;
* top-k per query is TWO-PHASE: a first row_number inside
  ``(qid, doc_id % BM25_SALT)`` salt buckets prunes to ≤ k·SALT rows
  per query, then the final row_number ranks those — the single-
  partition-per-query window that a naive top-k implies never sees
  more than k·SALT rows, so one hot query cannot pin a full corpus
  partition on one executor.

Cross-engine float lockstep: every constant is emitted as the same
Python-computed double literal on both engines (DuckDB numeric
literals otherwise parse as DECIMAL and change the arithmetic), the
score expression has identical operation order on both sides, and
scores are ROUNDED to 4dp before ranking — per-document sums run in
shuffle order, so the last ulp is the only engine-dependent bit and
the round absorbs it (the DSIR/tfidf precedent).  Ties at equal
rounded score break on ascending doc_id: the two-phase rank is then a
total order and equals the oracle's single-phase rank exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import spread_for_compute
from .text import TOKENS_SQL, tokens

#: BM25 shape parameters (the standard defaults)
BM25_K1 = 1.2
BM25_B = 0.75
#: documents reported per query by the catalog entry
BM25_TOPK = 5
#: salt buckets for the two-phase per-query top-k
BM25_SALT = 32
#: the catalog entry's fixed query set (terms from the corpus domain)
BM25_QUERIES = (
    ("q_join", "hash join merge order"),
    ("q_stream", "stream window batch"),
    ("q_scan", "spark table scan filter"),
)


def _sql_str(t: str) -> str:
    """Escape a term for interpolation as a SQL string literal —
    the fixed BM25_QUERIES are safe, but the function is parameterized
    on arbitrary query text and a single quote in a term would
    otherwise produce malformed oracle SQL."""
    return "'" + t.replace("'", "''") + "'"


def _qtokens(query: str) -> list[str]:
    """Query-side tokenizer — the same lowercase/whitespace semantics
    as the document tokenizer; duplicate terms dropped (first
    occurrence wins), so a repeated query term scores once."""
    return list(dict.fromkeys(t for t in query.lower().split() if t))


def bm25_topk(docs: DataFrame, queries=BM25_QUERIES,
              text_col: str = "text", id_col: str = "doc_id",
              k: int = BM25_TOPK, k1: float = BM25_K1,
              b: float = BM25_B) -> DataFrame:
    """``(qid, doc_id, score, rank)`` — the ``k`` highest-BM25
    documents per query, rank 1 best; ties at equal rounded score break
    on ascending doc_id."""
    k1f, bf = float(k1), float(b)
    vocab = sorted({t for _, q in queries for t in _qtokens(q)})
    # NOT persisted, on measurement: the token frame feeds both the tf
    # stream and the (N, avgdl) stats aggregate — the HLL/CMS
    # double-tokenize shape — but here the second consumer only
    # aggregates array sizes, and caching the WIDE token arrays costs
    # what the saved pass saves (back-to-back isolated A/B at sf0.1:
    # 1.96 s persisted vs 1.90 unpersisted; 10× one-shot 3.48 vs 3.51
    # — parity, so the persist write is pure overhead at 1×)
    base = (spread_for_compute(docs)
            .where(F.col(text_col).isNotNull())
            .select(F.col(id_col).alias("doc_id"),
                    tokens(F.col(text_col)).alias("_t")))
    # dl rides the explode so tf and length need one pass; the vocab
    # filter lands BEFORE the (doc_id, term) shuffle
    tf = (base.select("doc_id", F.size("_t").alias("dl"),
                      F.explode("_t").alias("term"))
          .where(F.col("term").isin(vocab))
          .groupBy("doc_id", "term")
          .agg(F.count("*").alias("tf"), F.max("dl").alias("dl")))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = base.select(F.count("*").alias("_n"),
                        F.avg(F.size("_t")).alias("_avgdl"))
    qterms = docs.sparkSession.createDataFrame(
        [(qid, t) for qid, q in queries for t in _qtokens(q)],
        "qid string, term string")
    idf = F.log(F.lit(1.0) + (F.col("_n") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    norm = F.lit(k1f) * (F.lit(1.0 - bf)
                         + F.lit(bf) * F.col("dl") / F.col("_avgdl"))
    contrib = (idf * (F.col("tf") * F.lit(k1f + 1.0))
               / (F.col("tf") + norm))
    per_doc = (tf.join(F.broadcast(qterms), "term")
               .join(F.broadcast(dfreq), "term")
               .crossJoin(F.broadcast(stats))
               .groupBy("qid", "doc_id")
               .agg(F.round(F.sum(contrib), 4).alias("score")))
    from pyspark.sql import Window as W

    w1 = (W.partitionBy("qid", F.pmod(F.col("doc_id"), F.lit(BM25_SALT)))
          .orderBy(F.desc("score"), F.asc("doc_id")))
    w2 = W.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (per_doc
            .withColumn("_pr", F.row_number().over(w1))
            .where(F.col("_pr") <= k)
            .withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", "score", "rank")
            .orderBy("qid", "rank"))


def bm25_topk_sql(queries=BM25_QUERIES, k: int = BM25_TOPK,
                  k1: float = BM25_K1, b: float = BM25_B,
                  table: str = "documents", text: str = "text",
                  id_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`bm25_topk` — identical constants
    (``::DOUBLE``-cast so DuckDB doesn't fall into DECIMAL arithmetic),
    identical operation order, rank over the same rounded score
    (single-phase: the salt pre-prune is exact, so the final rank is
    the same total order)."""
    k1f, bf = float(k1), float(b)
    vocab = sorted({t for _, q in queries for t in _qtokens(q)})
    vocab_sql = ", ".join(_sql_str(t) for t in vocab)
    qvals = ", ".join(f"({_sql_str(str(qid))}, {_sql_str(t)})"
                      for qid, q in queries for t in _qtokens(q))
    return f"""
        with q(qid, term) as (values {qvals}),
        base as (
            select {id_col} as doc_id,
                   {TOKENS_SQL.format(col=text)} as t
            from {table} where {text} is not null
        ), tf as (
            select doc_id, term, count(*)::BIGINT as tf,
                   max(dl)::BIGINT as dl
            from (select doc_id, len(t) as dl, unnest(t) as term
                  from base)
            where term in ({vocab_sql})
            group by doc_id, term
        ), dfreq as (
            select term, count(*)::BIGINT as df from tf group by term
        ), stats as (
            select count(*)::BIGINT as _n, avg(len(t)) as _avgdl
            from base
        ), per_doc as (
            select q.qid, tf.doc_id,
                   round(sum(
                       ln(1.0::DOUBLE + (stats._n - dfreq.df
                                         + 0.5::DOUBLE)
                          / (dfreq.df + 0.5::DOUBLE))
                       * (tf.tf * {k1f + 1.0!r}::DOUBLE)
                       / (tf.tf + {k1f!r}::DOUBLE
                          * ({1.0 - bf!r}::DOUBLE
                             + {bf!r}::DOUBLE * tf.dl / stats._avgdl))
                   ), 4) as score
            from tf join q using (term) join dfreq using (term)
            cross join stats
            group by q.qid, tf.doc_id
        )
        select qid, doc_id, score, rank from (
            select qid, doc_id, score,
                   row_number() over (
                       partition by qid
                       order by score desc, doc_id asc) as rank
            from per_doc
        ) where rank <= {k}
        order by qid, rank
    """
