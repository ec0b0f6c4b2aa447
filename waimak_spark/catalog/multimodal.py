"""Multimodal catalog entries: binary payloads synthesized
deterministically from ``documents`` so the Arrow-batched decode /
feature pipelines are fully value-checkable against SQL.

* ``multimodal_byte_features`` — payload = utf-8 bytes of ``text``;
  features computed INSIDE mapInPandas batches; the oracle recomputes
  them character-wise in SQL (documents are pure ASCII, so code point ==
  byte). A hash match certifies the whole binary round trip:
  encode → Arrow transfer → pandas bytes → features.
* ``multimodal_image_decode`` — payload = FAKEIMG1 header (dimensions
  derived arithmetically from doc_id) + pixel bytes; Spark PARSES the
  header back out of the binary in mapInPandas while the oracle computes
  the same dimensions arithmetically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import multimodal as M


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.dedup import spread_for_compute

    df = spread_for_compute(_docs(spark, sf_dir)).select(
        "doc_id", F.encode("text", "utf-8").alias("data"))
    feats = M.byte_features(df, "data")
    return feats.select(
        "doc_id",
        F.col("features.n_bytes").alias("n_bytes"),
        F.col("features.first_byte").alias("first_byte"),
        F.col("features.last_byte").alias("last_byte"),
        F.col("features.byte_sum").alias("byte_sum"),
    )


BYTE_FEATURES_ORACLE = """
    select doc_id,
           octet_length(encode(text)) as n_bytes,
           ascii(substr(text, 1, 1)) as first_byte,
           ascii(substr(text, length(text), 1)) as last_byte,
           list_sum(list_transform(generate_series(1, length(text)),
                                   i -> ascii(substr(text, i, 1))))::BIGINT
               as byte_sum
    from documents
"""


def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.dedup import spread_for_compute

    width = (F.col("doc_id") % 56 + 8).cast("int")
    height = ((F.col("doc_id") * 7) % 56 + 8).cast("int")
    channels = (F.col("doc_id") % 3 + 1).cast("int")
    df = spread_for_compute(_docs(spark, sf_dir)).select(
        "doc_id",
        M.fake_image_payload(width, height, channels, F.col("text"))
        .alias("data"),
    )
    decoded = M.decode_image(df, "data")
    return decoded.select(
        "doc_id",
        F.col("image.width").alias("width"),
        F.col("image.height").alias("height"),
        F.col("image.channels").alias("channels"),
        F.col("image.n_pixel_bytes").alias("n_pixel_bytes"),
    )


IMAGE_DECODE_ORACLE = """
    select doc_id,
           (doc_id % 56 + 8)::INTEGER as width,
           ((doc_id * 7) % 56 + 8)::INTEGER as height,
           (doc_id % 3 + 1)::INTEGER as channels,
           octet_length(encode(text))::BIGINT as n_pixel_bytes
    from documents
"""


ENTRIES = {
    "multimodal_byte_features": {"fn": multimodal_byte_features,
                                 "oracle": BYTE_FEATURES_ORACLE},
    "multimodal_image_decode": {"fn": multimodal_image_decode,
                                "oracle": IMAGE_DECODE_ORACLE},
}
