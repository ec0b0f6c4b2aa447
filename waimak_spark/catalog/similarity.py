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


ENTRIES = {
    "ann_brute_force_topk": {
        "fn": ann_brute_force_topk,
        "oracle": S.brute_force_topk_sql(QUERY_IDS, k=5),
    },
    "ann_lsh_pairs": {
        "fn": ann_lsh_pairs,
        "oracle": S.lsh_ann_pairs_sql(dims=64, min_cosine=0.0),
    },
}
