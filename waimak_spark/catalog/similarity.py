"""Similarity-search catalog entries over the ``embeddings`` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import similarity as S

QUERY_IDS = list(range(10))


def ann_brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.brute_force_topk(emb, QUERY_IDS, k=5)


def ann_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.lsh_ann_pairs(emb, dims=64, min_cosine=0.0)


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.ivf_topk(emb, QUERY_IDS, k=5)


def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF index against exact brute force, per query —
    the 'measure, don't guess' gate for the approximate path: a plan
    change that silently wrecks IVF recall turns this entry red (both
    sides are deterministic, so recall is a stable value, and the oracle
    recomputes the identical comparison in SQL)."""
    from pyspark.sql import functions as F

    k = 5
    bf = ann_brute_force_topk(spark, sf_dir).select("query_id", "neighbor_id")
    ivf = ann_ivf_topk(spark, sf_dir).select("query_id", "neighbor_id")
    m = (bf.join(ivf, ["query_id", "neighbor_id"])
         .groupBy("query_id").agg(F.count("*").alias("n")))
    return (bf.select("query_id").distinct()
            .join(m, "query_id", "left")
            .select("query_id",
                    F.round(F.coalesce(F.col("n"), F.lit(0)) / k, 4)
                    .alias("recall_at_k")))


def _recall_oracle() -> str:
    k = 5
    return f"""
        with bf as ({S.brute_force_topk_sql(QUERY_IDS, k=k)}),
        ivf as ({S.ivf_topk_sql(QUERY_IDS, k=k)}),
        m as (
            select bf.query_id, count(*) as n
            from bf join ivf using (query_id, neighbor_id)
            group by bf.query_id
        )
        select q.query_id, round(coalesce(n, 0) / {k}.0, 4) as recall_at_k
        from (select distinct query_id from bf) q
        left join m using (query_id)
    """


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.embedding_cosine_dedup(emb, min_cosine=0.0)


def dedup_embedding_cosine_fixpoint(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.embedding_cosine_dedup_fixpoint(emb, min_cosine=0.0)


def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deterministic Lloyd rounds over the embeddings table — the
    clustering stage a diversity-sampling / cluster-balanced-mixture
    pipeline runs before quota sampling.  Oracle: the identical rounds
    unrolled in SQL (same seed centroids, rounded averages, tie-breaks,
    empty-cluster carry)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.kmeans_clusters(emb)


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization audit (scale + exact integer
    code checksums) — the 4x-compression storage path for a 100 TB
    embedding corpus, certified bit-level against the SQL oracle."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.quantize_int8(emb)


def ann_int8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of int8-quantized cosine top-k against exact float top-k,
    per query — measures what 4x compression costs in retrieval quality
    (scale cancels in cosine, so the quantized side is exact integer
    arithmetic; same measure-don't-guess gate as ann_ivf_recall)."""
    from pyspark.sql import functions as F

    k = 5
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bf = ann_brute_force_topk(spark, sf_dir).select("query_id", "neighbor_id")
    q8 = (S.int8_topk(emb, QUERY_IDS, k=k)
          .select("query_id", "neighbor_id"))
    m = (bf.join(q8, ["query_id", "neighbor_id"])
         .groupBy("query_id").agg(F.count("*").alias("n")))
    return (bf.select("query_id").distinct()
            .join(m, "query_id", "left")
            .select("query_id",
                    F.round(F.coalesce(F.col("n"), F.lit(0)) / k, 4)
                    .alias("recall_at_k")))


def _int8_recall_oracle() -> str:
    k = 5
    return f"""
        with bf as ({S.brute_force_topk_sql(QUERY_IDS, k=k)}),
        q8 as ({S.int8_topk_sql(QUERY_IDS, k=k)}),
        m as (
            select bf.query_id, count(*) as n
            from bf join q8 using (query_id, neighbor_id)
            group by bf.query_id
        )
        select q.query_id, round(coalesce(n, 0) / {k}.0, 4) as recall_at_k
        from (select distinct query_id from bf) q
        left join m using (query_id)
    """



def embedding_cluster_exemplars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster representative vectors (nearest-to-centroid top-3 after
    the k-means rounds) — the exemplar-selection step of a diversity
    curation pipeline."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.kmeans_exemplars(emb)


ENTRIES = {
    "embedding_kmeans": {
        "fn": embedding_kmeans,
        "oracle": S.kmeans_clusters_sql(),
    },
    "ann_brute_force_topk": {
        "fn": ann_brute_force_topk,
        "oracle": S.brute_force_topk_sql(QUERY_IDS, k=5),
    },
    "ann_lsh_pairs": {
        "fn": ann_lsh_pairs,
        "oracle": S.lsh_ann_pairs_sql(dims=64, min_cosine=0.0),
    },
    "ann_ivf_topk": {
        "fn": ann_ivf_topk,
        "oracle": S.ivf_topk_sql(QUERY_IDS, k=5),
    },
    "ann_ivf_recall": {
        "fn": ann_ivf_recall,
        "oracle": _recall_oracle(),
    },
    "embedding_cluster_exemplars": {
        "fn": embedding_cluster_exemplars,
        "oracle": S.kmeans_exemplars_sql(),
    },
    "embedding_quantize_int8": {
        "fn": embedding_quantize_int8,
        "oracle": S.quantize_int8_sql(),
    },
    "ann_int8_recall": {
        "fn": ann_int8_recall,
        "oracle": _int8_recall_oracle(),
    },
    "dedup_embedding_cosine": {
        "fn": dedup_embedding_cosine,
        "oracle": S.embedding_cosine_dedup_sql(min_cosine=0.0),
    },
    "dedup_embedding_cosine_fixpoint": {
        "fn": dedup_embedding_cosine_fixpoint,
        "oracle": S.embedding_cosine_dedup_fixpoint_sql(min_cosine=0.0),
    },
}
