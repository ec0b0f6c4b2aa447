"""k-means|| oversampling (Bahmani et al. 2012, VLDB — "Scalable
k-means++") — derandomized via the seeded-md5 A-ES priority keys the
priority/DSIR samplers use, so every engine/run selects the same
candidates.  The reference (waimak) has no clustering surface; this is
the training-data-pipeline extension family.  Strategy: DuckDB lockstep
on testdata, a pure-Python reference on crafted vectors, structural
invariants (candidate count, weight totals, no re-sampling of centers),
and determinism."""

import hashlib
import math
from collections import Counter

import duckdb
import pytest
from pyspark.sql import Row

from waimak_spark.functions.similarity import (
    KMEANSPAR_K,
    KMEANSPAR_OVERSAMPLE,
    KMEANSPAR_ROUNDS,
    KMEANSPAR_SEED,
    kmeanspar_oversample,
    kmeanspar_oversample_sql,
)


def _u(i, s):
    h = int(hashlib.md5(f"{s}:{i}".encode()).hexdigest()[:8], 16)
    return (h + 1) / 4294967297.0


def _dot(a, b):
    t = 0.0
    for x, y in zip(a, b):
        t += x * y
    return t


def _py_kmeanspar(vecs: dict, k=KMEANSPAR_K, rounds=KMEANSPAR_ROUNDS,
                  oversample=KMEANSPAR_OVERSAMPLE,
                  seed=KMEANSPAR_SEED) -> list[tuple]:
    unit = {}
    for i, v in vecs.items():
        if v is None or any(x is None or not math.isfinite(x) for x in v):
            continue
        n2 = _dot(v, v)
        if n2 <= 0:
            continue
        n = math.sqrt(n2)
        unit[i] = [x / n for x in v]
    if not unit:
        return []
    l = math.ceil(oversample * k)
    seed_id = min(unit)
    cands = [(seed_id, 0)]
    new = [seed_id]
    d2 = {}
    for r in range(1, rounds + 1):
        for i in unit:
            dn = min(round(2.0 - 2.0 * _dot(unit[i], unit[c]), 4)
                     for c in new)
            d2[i] = min(d2.get(i, float("inf")), dn)
        elig = [i for i in unit if d2[i] > 0]
        key = {i: round(math.log(_u(i, seed + r)) / d2[i], 6) + 0.0
               for i in elig}
        picked = sorted(elig, key=lambda i: (-key[i], i))[:l]
        if not picked:
            break
        new = picked
        cands += [(i, r) for i in picked]
    counts = Counter()
    for i in unit:
        best = min((cid for cid, _ in cands),
                   key=lambda c: (round(2.0 - 2.0
                                        * _dot(unit[i], unit[c]), 4), c))
        counts[best] += 1
    return sorted((cid, rr, counts.get(cid, 0)) for cid, rr in cands)


class TestKmeansParOracle:
    def test_catalog_fn_matches_duckdb(self, spark, sf_dir):
        from waimak_spark.catalog.similarity import (
            _kmeanspar_oracle,
            embedding_kmeanspar_init,
        )

        got = [tuple(r) for r in
               embedding_kmeanspar_init(spark, sf_dir).collect()]
        con = duckdb.connect()
        con.execute(f"create view embeddings as "
                    f"select * from '{sf_dir}/embeddings.parquet'")
        want = [tuple(r) for r in
                con.execute(kmeanspar_oversample_sql()).fetchall()]
        assert _kmeanspar_oracle() == kmeanspar_oversample_sql()
        assert got == want
        # full candidate set: seed + rounds*l, weights cover the corpus
        l = math.ceil(KMEANSPAR_OVERSAMPLE * KMEANSPAR_K)
        assert len(got) == 1 + KMEANSPAR_ROUNDS * l
        n_valid = con.execute(
            "select count(*) from embeddings where embedding is not null"
            " and len(embedding) = 64 and list_aggregate(list_transform("
            "embedding::DOUBLE[], x -> coalesce(isfinite(x), false)),"
            " 'bool_and') and list_dot_product(embedding::DOUBLE[],"
            " embedding::DOUBLE[]) > 0").fetchone()[0]
        assert sum(r[2] for r in got) == n_valid

    def test_deterministic_across_runs(self, spark, sf_dir):
        from waimak_spark.catalog.similarity import embedding_kmeanspar_init

        a = [tuple(r) for r in
             embedding_kmeanspar_init(spark, sf_dir).collect()]
        b = [tuple(r) for r in
             embedding_kmeanspar_init(spark, sf_dir).collect()]
        assert a == b


class TestKmeansParSemantics:
    VECS = {
        1: [1.0, 0.0, 0.0, 0.0],
        2: [0.0, 1.0, 0.0, 0.0],
        3: [0.0, 0.0, 1.0, 0.0],
        4: [0.0, 0.0, 0.0, 1.0],
        5: [0.6, 0.8, 0.0, 0.0],
        6: [-1.0, 0.0, 0.0, 0.0],
        7: None,                          # invalid: dropped
        8: [0.0, 0.0, 0.0, 0.0],          # zero norm: dropped
        9: [float("nan"), 1.0, 0.0, 0.0],  # non-finite: dropped
        10: [2.0, 0.0, 0.0, 0.0],         # same direction as the seed
    }

    def _df(self, spark):
        return spark.createDataFrame(
            [Row(vec_id=i, embedding=v) for i, v in self.VECS.items()])

    def test_matches_pure_python_reference(self, spark):
        got = [tuple(r) for r in
               kmeanspar_oversample(self._df(spark), k=2, rounds=2,
                                    oversample=1.0, dims=4).collect()]
        want = _py_kmeanspar(self.VECS, k=2, rounds=2, oversample=1.0)
        assert got == want
        # seed is the min valid id, tagged round 0
        assert got[0] == min(got) and any(
            cid == 1 and rr == 0 for cid, rr, _ in got)

    def test_centers_never_resampled(self, spark):
        """A sampled candidate's d2 drops to 0 the next round (distance
        to itself), so no (cand_id) appears twice — including the
        duplicate-direction row 10, which can never be sampled once the
        seed (same unit vector) is a center."""
        got = [tuple(r) for r in
               kmeanspar_oversample(self._df(spark), k=2, rounds=3,
                                    oversample=1.0, dims=4).collect()]
        ids = [cid for cid, _, _ in got]
        assert len(ids) == len(set(ids))
        assert 10 not in ids  # d2(10, seed) = 0 from round 1 on

    def test_weights_cover_all_valid_points(self, spark):
        got = kmeanspar_oversample(self._df(spark), k=2, rounds=2,
                                   oversample=1.0, dims=4).collect()
        # 7 valid vectors (1-6, 10)
        assert sum(r.n_assigned for r in got) == 7

    def test_duplicate_direction_assigns_to_lower_id(self, spark):
        """Row 10 ties the seed (distance 0 to it); the tie must break
        to the lower candidate id — the determinism rule."""
        got = {r.cand_id: r.n_assigned for r in
               kmeanspar_oversample(self._df(spark), k=2, rounds=2,
                                    oversample=1.0, dims=4).collect()}
        assert got.get(1, 0) >= 2  # seed holds itself + row 10

    def test_param_validation(self, spark):
        df = self._df(spark)
        with pytest.raises(ValueError, match="must be >= 1"):
            kmeanspar_oversample(df, k=0, dims=4)
        with pytest.raises(ValueError, match="must be >= 1"):
            kmeanspar_oversample(df, k=2, rounds=0, dims=4)
        with pytest.raises(ValueError, match="oversample"):
            kmeanspar_oversample(df, k=2, oversample=0.0, dims=4)

    def test_seed_sensitivity(self, spark, sf_dir):
        """Different uniform seeds select different candidate sets (the
        sampling is real, not an artifact of the tie-breaks)."""
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        a = {r.cand_id for r in kmeanspar_oversample(emb).collect()}
        b = {r.cand_id for r in
             kmeanspar_oversample(emb, seed=KMEANSPAR_SEED + 1000)
             .collect()}
        assert a != b
