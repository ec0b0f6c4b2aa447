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


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.embedding_cosine_dedup(emb, min_cosine=0.0)


def dedup_embedding_cosine_fixpoint(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.embedding_cosine_dedup_fixpoint(emb, min_cosine=0.0)


ENTRIES = {
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
    "dedup_embedding_cosine": {
        "fn": dedup_embedding_cosine,
        "oracle": S.embedding_cosine_dedup_sql(min_cosine=0.0),
    },
    "dedup_embedding_cosine_fixpoint": {
        "fn": dedup_embedding_cosine_fixpoint,
        "oracle": S.embedding_cosine_dedup_fixpoint_sql(min_cosine=0.0),
    },
}
