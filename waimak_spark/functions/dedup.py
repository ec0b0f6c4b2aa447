"""Deduplication operators for large-scale corpus pipelines: exact,
MinHash+LSH, SimHash, and n-gram Jaccard — each as pure DataFrame
compositions (no UDFs), with matching DuckDB-oracle SQL builders.

Generalises the reference storage layer's only dedup kernel (latest-per-PK
window, waimak-storage/.../AuditTableFile.scala:72-82) to content dedup.

Scale notes (100 TB posture):
* exact dedup: one shuffle on the md5 content hash — the canonical
  hash-groupBy; never compares full text across the wire, only 32 hex chars;
* MinHash: per-row narrow array math; signatures are k bigints per doc;
* LSH: band keys turn all-pairs into an equi-join; candidates per bucket
  are bounded, and the band count tunes recall vs join fan-out;
* SimHash: one 16-bit value per doc; near-dup = self-join + bit_count,
  which AQE can broadcast when the doc count allows;
* n-gram Jaccard: exact similarity restricted to docs sharing ≥1 shingle
  hash (an equi-join), not the O(n²) cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .text import (
    TOKENS_SQL,
    md5_hash32_sql,
    seeded_hash,
    seeded_hash_sql,
    shingles,
    shingles_sql,
    tokens,
)

# ---------------------------------------------------------------------------
# exact dedup: hash-groupBy on full content
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content: canonical (min) id + duplicate count."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("canonical_id"),
             F.count("*").alias("n_dups"))
    )


EXACT_DEDUP_SQL = """
    select md5(text) as content_hash,
           min(doc_id) as canonical_id,
           count(*) as n_dups
    from documents
    group by md5(text)
"""


# ---------------------------------------------------------------------------
# MinHash signatures over n-word shingles
# ---------------------------------------------------------------------------

DEFAULT_SEEDS = list(range(8))
SHINGLE_N = 3


def minhash_signature(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      seeds: list[int] = DEFAULT_SEEDS,
                      n: int = SHINGLE_N) -> DataFrame:
    """doc_id + one min-hash column per seed (NULL when doc has <n tokens)."""
    sh = F.array_distinct(shingles(tokens(F.col(text_col)), n))

    def hasher(seed: int):
        # single-arg lambda only: 2-arg lambdas become (element, index)
        return lambda s: seeded_hash(s, seed)

    cols = [
        F.array_min(F.transform(sh, hasher(seed))).alias(f"mh{i}")
        for i, seed in enumerate(seeds)
    ]
    return df.select(F.col(id_col), *cols)


def minhash_signature_sql(seeds: list[int] = DEFAULT_SEEDS,
                          n: int = SHINGLE_N) -> str:
    mh = ",\n               ".join(
        f"list_min(list_transform(sh, s -> {seeded_hash_sql('s', seed)})) as mh{i}"
        for i, seed in enumerate(seeds)
    )
    return f"""
        with tok as (
            select doc_id, {TOKENS_SQL.format(col='text')} as t from documents
        ), shingled as (
            select doc_id, list_distinct({shingles_sql('t', n)}) as sh from tok
        )
        select doc_id,
               {mh}
        from shingled
    """


# ---------------------------------------------------------------------------
# LSH candidate pairs: docs sharing at least one band of the signature
# ---------------------------------------------------------------------------

BAND_SIZE = 4  # 8 minhashes → 2 bands of 4
MAX_BUCKET = 50  # frequent-bucket pruning: skip buckets larger than this


def lsh_candidate_pairs(sig: DataFrame, seeds: list[int] = DEFAULT_SEEDS,
                        band_size: int = BAND_SIZE,
                        max_bucket: int = MAX_BUCKET,
                        id_col: str = "doc_id") -> DataFrame:
    """Self-join on band keys; distinct (a < b) candidate pairs.

    Buckets with more than ``max_bucket`` members are dropped before the
    join (frequent-bucket pruning): a bucket shared by thousands of docs
    carries no near-dup signal but quadratic join cost — the standard LSH
    guard that bounds per-bucket fan-out to max_bucket² at any corpus size.
    """
    n_bands = len(seeds) // band_size
    band_cols = [
        F.md5(F.concat_ws(
            "_", *[F.col(f"mh{b * band_size + j}") for j in range(band_size)]
        )).alias("band_key")
        for b in range(n_bands)
    ]
    banded = None
    for b, bc in enumerate(band_cols):
        part = sig.select(F.col(id_col).alias("id"), F.lit(b).alias("band"), bc)
        banded = part if banded is None else banded.unionAll(part)
    from pyspark.sql import Window as W

    bucket_n = F.count("*").over(W.partitionBy("band", "band_key"))
    banded = banded.withColumn("bn", bucket_n).where(
        F.col("bn") <= max_bucket
    ).drop("bn")
    left = banded.select("band", "band_key", F.col("id").alias("doc_a"))
    right = banded.select("band", "band_key", F.col("id").alias("doc_b"))
    return (
        left.join(right, ["band", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def lsh_candidate_pairs_sql(seeds: list[int] = DEFAULT_SEEDS,
                            band_size: int = BAND_SIZE,
                            max_bucket: int = MAX_BUCKET,
                            n: int = SHINGLE_N) -> str:
    n_bands = len(seeds) // band_size
    band_selects = " union all ".join(
        "select doc_id as id, {b} as band, md5({key}) as band_key from sig".format(
            b=b,
            key=" || '_' || ".join(
                f"mh{b * band_size + j}" for j in range(band_size)
            ),
        )
        for b in range(n_bands)
    )
    return f"""
        with sig as ({minhash_signature_sql(seeds, n)}),
        banded_all as ({band_selects}),
        banded as (
            select * from (
                select *, count(*) over (partition by band, band_key) as bn
                from banded_all
            ) where bn <= {max_bucket}
        )
        select distinct a.id as doc_a, b.id as doc_b
        from banded a join banded b
          on a.band = b.band and a.band_key = b.band_key and a.id < b.id
    """


# ---------------------------------------------------------------------------
# SimHash (16-bit) + near-dup pairs by Hamming distance
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = SIMHASH_BITS) -> DataFrame:
    """16-bit simhash over the distinct-token set, computed bit-parallel:
    for each bit, sum +1/-1 over token hashes, then pack the signs."""
    tok = F.array_distinct(tokens(F.col(text_col)))
    hashes = F.transform(tok, lambda t: seeded_hash(t, 99))

    def bit_vote(k: int):
        # exactly-2-arg merge lambda; bind the bit index via closure
        return lambda acc, h: acc + F.when(
            F.shiftright(h, k).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    packed = F.lit(0).cast("long")
    for i in range(bits):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), bit_vote(i))
        packed = packed + F.when(vote > 0, F.lit(1 << i)).otherwise(0)
    return df.select(F.col(id_col), packed.alias("simhash"))


def simhash_sql(bits: int = SIMHASH_BITS) -> str:
    terms = []
    for i in range(bits):
        vote = (
            f"list_sum(list_transform(hs, h -> case when (h >> {i}) & 1 = 1 "
            f"then 1 else -1 end))"
        )
        terms.append(f"case when {vote} > 0 then {1 << i} else 0 end")
    packed = " + ".join(terms)
    return f"""
        with tok as (
            select doc_id, list_distinct({TOKENS_SQL.format(col='text')}) as t
            from documents
        ), hashed as (
            select doc_id,
                   list_transform(t, s -> {seeded_hash_sql('s', 99)}) as hs
            from tok
        )
        select doc_id, ({packed})::BIGINT as simhash
        from hashed
    """


# pigeonhole: with 16 bits in (max_hamming+1) segments, any pair within
# max_hamming Hamming distance agrees exactly on ≥1 segment → candidate
# generation is an equi-join on (segment_idx, segment_value), never O(n²)
_SEGMENTS = [(0, 6), (6, 6), (12, 4)]  # (shift, width) covering 16 bits


def simhash_near_dups(sig: DataFrame, max_hamming: int = 2,
                      id_col: str = "doc_id") -> DataFrame:
    parts = None
    for seg, (shift, width) in enumerate(_SEGMENTS):
        mask = (1 << width) - 1
        p = sig.select(
            F.col(id_col).alias("id"), F.col("simhash"),
            F.lit(seg).alias("seg"),
            F.shiftright("simhash", shift).bitwiseAND(F.lit(mask)).alias("segv"),
        )
        parts = p if parts is None else parts.unionAll(p)
    a = parts.select("seg", "segv", F.col("id").alias("doc_a"),
                     F.col("simhash").alias("sh_a"))
    b = parts.select("seg", "segv", F.col("id").alias("doc_b"),
                     F.col("simhash").alias("sh_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["seg", "segv"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_near_dups_sql(max_hamming: int = 2,
                          bits: int = SIMHASH_BITS) -> str:
    seg_selects = " union all ".join(
        f"select doc_id as id, simhash, {seg} as seg, "
        f"(simhash >> {shift}) & {(1 << width) - 1} as segv from sig"
        for seg, (shift, width) in enumerate(_SEGMENTS)
    )
    return f"""
        with sig as ({simhash_sql(bits)}),
        parts as ({seg_selects})
        select distinct a.id as doc_a, b.id as doc_b,
               bit_count(xor(a.simhash, b.simhash))::INTEGER as hamming
        from parts a join parts b
          on a.seg = b.seg and a.segv = b.segv and a.id < b.id
        where bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


# ---------------------------------------------------------------------------
# n-gram Jaccard: exact similarity on docs sharing ≥1 shingle hash
# ---------------------------------------------------------------------------


MAX_DF_FRACTION = 0.01  # stop-shingle pruning: drop shingles in >1% of docs
MIN_DF_FLOOR = 5


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = SHINGLE_N,
                        min_jaccard: float = 0.1) -> DataFrame:
    """Jaccard over n-word shingle sets, restricted to docs sharing ≥1
    *discriminative* shingle: shingles occurring in more than
    max(MIN_DF_FLOOR, 1% of docs) documents are dropped first (stop-shingle
    / IDF pruning). A shingle shared by half the corpus carries no
    similarity signal but makes the equi-join quadratic — pruning bounds
    join fan-out at any corpus size; Jaccard is computed over the pruned
    sets on both engines identically.
    """
    n_docs = df.count()
    max_df = max(MIN_DF_FLOOR, int(n_docs * MAX_DF_FRACTION))
    sh_all = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles(tokens(F.col(text_col)), n)))
        .alias("shingle"),
    ).select("id", F.md5("shingle").alias("sh"))
    from pyspark.sql import Window as W

    sh = (
        sh_all.withColumn("df", F.count("*").over(W.partitionBy("sh")))
        .where(F.col("df") <= max_df)
        .drop("df")
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    shared = (
        sh.alias("a")
        .join(sh.alias("b"),
              (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared
        .join(sizes.withColumnRenamed("id", "doc_a")
                   .withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("id", "doc_b")
                   .withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("shared")
                    / (F.col("n_a") + F.col("n_b") - F.col("shared")), 4),
        )
        .where(F.col("jaccard") >= min_jaccard)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs_sql(n: int = SHINGLE_N, min_jaccard: float = 0.1) -> str:
    return f"""
        with tok as (
            select doc_id, {TOKENS_SQL.format(col='text')} as t from documents
        ), sh_all as (
            select doc_id as id, md5(unnest(list_distinct({shingles_sql('t', n)}))) as sh
            from tok
        ), sh as (
            select id, sh from (
                select *, count(*) over (partition by sh) as df from sh_all
            )
            where df <= greatest({MIN_DF_FLOOR},
                                 floor((select count(*) from documents)
                                       * {MAX_DF_FRACTION})::BIGINT)
        ), sizes as (
            select id, count(*) as n_sh from sh group by id
        ), shared as (
            select a.id as doc_a, b.id as doc_b, count(*) as shared
            from sh a join sh b on a.sh = b.sh and a.id < b.id
            group by 1, 2
        )
        select doc_a, doc_b,
               round(shared::DOUBLE / (sa.n_sh + sb.n_sh - shared), 4) as jaccard
        from shared
        join sizes sa on sa.id = doc_a
        join sizes sb on sb.id = doc_b
        where round(shared::DOUBLE / (sa.n_sh + sb.n_sh - shared), 4) >= {min_jaccard}
    """
