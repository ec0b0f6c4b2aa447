"""Similarity search over embedding columns (``array<float>``):
brute-force cosine top-k as the exact baseline, LSH-bucketed (random
hyperplane / sign-bits) as the scale path.

All vector math is built-in ``F`` array expressions (``zip_with`` +
``aggregate``) — JVM-side, no Python serde per row.

Scale notes (100 TB posture): brute-force is a broadcast of the query set
against a scan of the corpus (no shuffle on the big side; O(Q×N) flops).
The LSH variant assigns each vector a sign-bit bucket from D deterministic
pseudo-random hyperplanes, so candidate generation is an equi-join on
bucket id — at 1000 executors the corpus-side stays partition-local until
one shuffle on the (small) bucket key space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two array<double> columns (matches
    DuckDB ``list_dot_product`` ulp-for-ulp on the same doubles)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def as_double(col: Column) -> Column:
    return col.cast("array<double>")


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_force_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbours for the given query ids (broadcast the
    query side; corpus side is a single scan)."""
    from pyspark.sql import Window as W

    v = as_double(F.col(vec_col))
    base = emb.select(F.col(id_col), v.alias("v"))
    queries = base.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv")
    )
    sim = F.round(cosine(F.col("qv"), F.col("v")), 4)
    scored = (
        base.crossJoin(F.broadcast(queries))
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"),
                sim.alias("cosine_sim"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def brute_force_topk_sql(query_ids: list[int], k: int = 5) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
        with base as (
            select vec_id, embedding::DOUBLE[] as v from embeddings
        ), queries as (
            select vec_id as query_id, v as qv from base
            where vec_id in ({ids})
        ), scored as (
            select query_id, vec_id as neighbor_id,
                   round(list_dot_product(qv, v)
                         / (sqrt(list_dot_product(qv, qv))
                            * sqrt(list_dot_product(v, v))), 4) as cosine_sim
            from base cross join queries
            where vec_id != query_id
        )
        select query_id, neighbor_id, rank, cosine_sim
        from (
            select *, row_number() over (partition by query_id
                                         order by cosine_sim desc,
                                                  neighbor_id asc) as rank
            from scored
        )
        where rank <= {k}
    """


# ---------------------------------------------------------------------------
# sign-bit LSH bucketing: deterministic pseudo-random hyperplanes from a
# seeded md5 hash of (plane, dim) — reproducible in ANSI SQL
# ---------------------------------------------------------------------------


def _plane_weight(plane: int, dim: int) -> float:
    """Deterministic weight in [-1, 1): derived from md5(plane:dim)."""
    import hashlib

    h = int(hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()[:8], 16)
    return (h / 2**31) - 1.0


def lsh_bucket(vec: Column, n_planes: int, dims: int) -> Column:
    """Pack sign bits of ``n_planes`` hyperplane projections into an int."""
    bucket = F.lit(0)
    for p in range(n_planes):
        proj = F.lit(0.0)
        for d in range(dims):
            proj = proj + F.element_at(vec, d + 1) * F.lit(_plane_weight(p, d))
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(0)
    return bucket


def lsh_ann_pairs(emb: DataFrame, n_planes: int = 8, dims: int = 64,
                  min_cosine: float = 0.5, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Near-neighbour pairs among vectors sharing an LSH bucket."""
    v = as_double(F.col(vec_col))
    base = emb.select(
        F.col(id_col), v.alias("v"),
        lsh_bucket(v, n_planes, dims).alias("bucket"),
    )
    a = base.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"), "bucket")
    b = base.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"), "bucket")
    sim = F.round(cosine(F.col("va"), F.col("vb")), 4)
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .where(F.col("cosine_sim") >= min_cosine)
    )


def lsh_ann_pairs_sql(n_planes: int = 8, dims: int = 64,
                      min_cosine: float = 0.5) -> str:
    def bucket_expr(vcol: str) -> str:
        terms = []
        for p in range(n_planes):
            proj = " + ".join(
                f"{vcol}[{d + 1}] * ({_plane_weight(p, d)!r})"
                for d in range(dims)
            )
            terms.append(f"case when ({proj}) > 0 then {1 << p} else 0 end")
        return " + ".join(terms)

    return f"""
        with base as (
            select vec_id, embedding::DOUBLE[] as v,
                   ({bucket_expr('(embedding::DOUBLE[])')}) as bucket
            from embeddings
        )
        select a.vec_id as id_a, b.vec_id as id_b,
               round(list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(b.v, b.v))), 4) as cosine_sim
        from base a join base b on a.bucket = b.bucket and a.vec_id < b.vec_id
        where round(list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v))
                       * sqrt(list_dot_product(b.v, b.v))), 4) >= {min_cosine}
    """
