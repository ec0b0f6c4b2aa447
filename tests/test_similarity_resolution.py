"""Duplicate-resolution semantics over embedding candidate pairs: the
documented ONE-HOP contract of embedding_cosine_dedup vs the
chain-resolving fixpoint variant."""

from pyspark.sql import functions as F

import waimak_spark.functions.similarity as S


def _ids(spark, n):
    return spark.createDataFrame([(i,) for i in range(1, n + 1)], "id int")


def _pairs(spark, edges):
    return spark.createDataFrame(list(edges), "id_a int, id_b int")


class TestFixpointResolution:
    def test_chain_of_three_collapses_to_component_min(self, spark):
        # chain 1~2, 2~3 (1 and 3 NOT direct pairs) + isolated pair 4~5
        out = S.resolve_duplicates_fixpoint(
            _ids(spark, 6), _pairs(spark, [(1, 2), (2, 3), (4, 5)]))
        got = {r["id"]: r["canonical_id"] for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}

    def test_long_chain_and_iteration_bound(self, spark):
        # a 6-node path needs several propagation rounds; max_iters caps
        # the DISTRIBUTED loop (forced here with local_max_edges=0 — the
        # sub-threshold local solve always fully converges)
        edges = [(i, i + 1) for i in range(1, 6)]
        out = S.resolve_duplicates_fixpoint(_ids(spark, 6),
                                            _pairs(spark, edges),
                                            local_max_edges=0)
        assert {r["canonical_id"] for r in out.collect()} == {1}
        # with max_iters=1 the far end cannot have converged to 1
        partial = S.resolve_duplicates_fixpoint(
            _ids(spark, 6), _pairs(spark, edges), max_iters=1,
            local_max_edges=0)
        got = {r["id"]: r["canonical_id"] for r in partial.collect()}
        assert got[2] == 1 and got[6] != 1
        # the default hybrid takes the local path on this tiny graph and
        # converges regardless of max_iters
        full = S.resolve_duplicates_fixpoint(
            _ids(spark, 6), _pairs(spark, edges), max_iters=1)
        assert {r["canonical_id"] for r in full.collect()} == {1}

    def test_no_edges_is_identity(self, spark):
        out = S.resolve_duplicates_fixpoint(
            _ids(spark, 3), _pairs(spark, []))
        got = {r["id"]: r["canonical_id"] for r in out.collect()}
        assert got == {1: 1, 2: 2, 3: 3}


class TestOneHopContract:
    def test_one_hop_keeps_chain_middle_as_canonical(self, spark,
                                                     monkeypatch):
        """embedding_cosine_dedup documents min-over-DIRECT-neighbors:
        in the chain 1~2, 2~3, id 3 maps to 2 (its only neighbor), not 1.
        Locks the documented contract so a silent semantic change fails."""
        pairs = _pairs(spark, [(1, 2), (2, 3)]).withColumn(
            "cosine_sim", F.lit(0.9))
        monkeypatch.setattr(S, "lsh_ann_pairs", lambda *a, **k: pairs)
        emb = spark.createDataFrame([(i, [0.0]) for i in range(1, 4)],
                                    "vec_id int, embedding array<float>")
        out = S.embedding_cosine_dedup(emb)
        got = {r["vec_id"]: r["canonical_id"] for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 2}

    def test_fixpoint_variant_resolves_same_chain_fully(self, spark,
                                                        monkeypatch):
        pairs = _pairs(spark, [(1, 2), (2, 3)])
        monkeypatch.setattr(S, "lsh_ann_pairs", lambda *a, **k: pairs)
        emb = spark.createDataFrame([(i, [0.0]) for i in range(1, 4)],
                                    "vec_id int, embedding array<float>")
        out = S.embedding_cosine_dedup_fixpoint(emb)
        got = {r["vec_id"]: r["canonical_id"] for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 1}


class TestInvalidEmbeddings:
    """NULL / ragged / non-finite vectors must be dropped at the operator
    boundary, never crash the Arrow kernels (np.array of a ragged list
    raises) and never propagate engine-dependent NaN ordering."""

    def _emb(self, spark):
        import math

        rows = [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0, 0.0]),
            (3, None),                        # NULL vector
            (4, [1.0, 2.0]),                  # ragged
            (5, [float("nan"), 0.0, 0.0, 0.0]),   # NaN component
            (6, [math.inf, 0.0, 0.0, 0.0]),   # Inf component
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_lsh_pairs_drop_invalid(self, spark):
        from waimak_spark.functions.similarity import lsh_ann_pairs

        out = lsh_ann_pairs(self._emb(spark), n_planes=4, dims=4,
                            min_cosine=0.5).collect()
        ids = {i for r in out for i in (r.id_a, r.id_b)}
        assert ids <= {1, 2}

    def test_ivf_topk_drop_invalid(self, spark):
        from waimak_spark.functions.similarity import ivf_topk

        out = ivf_topk(self._emb(spark), query_ids=[1], k=3,
                       n_centroids=2, nprobe=2, dims=4).collect()
        assert {r.neighbor_id for r in out} <= {2}

    def test_brute_force_drop_invalid(self, spark):
        from waimak_spark.functions.similarity import brute_force_topk

        out = brute_force_topk(self._emb(spark), query_ids=[1], k=5,
                               dims=4).collect()
        assert {r.neighbor_id for r in out} == {2}

    def test_fixpoint_keeps_invalid_ids_as_self(self, spark):
        from waimak_spark.functions.similarity import (
            embedding_cosine_dedup_fixpoint)

        out = {r.vec_id: r.canonical_id
               for r in embedding_cosine_dedup_fixpoint(
                   self._emb(spark), min_cosine=0.5, n_planes=4,
                   dims=4).collect()}
        # invalid vectors can never be duplicates — canonical = self
        for i in (3, 4, 5, 6):
            assert out[i] == i
        assert out[2] == 1  # the one real near-dup pair resolves

    def test_semantic_dedup_drops_invalid_keeps_valid(self, spark):
        """semantic_dedup routes through the same valid_embeddings choke
        point: NULL/ragged/non-finite vectors get NO verdict row (they
        can be neither kept nor a duplicate witness), and the two valid
        near-identical vectors collapse to one keep."""
        from waimak_spark.functions.similarity import semantic_dedup

        out = semantic_dedup(self._emb(spark), min_cosine=0.9, k=2,
                             dims=4).toPandas()
        assert set(out.vec_id) == {1, 2}
        assert out.keep.sum() == 1


class TestTextDedupResolve:
    """minhash/simhash end-to-end resolution: pair candidates -> one
    keep/drop row per doc (VERDICT r3 item 4)."""

    def _docs(self, spark):
        # 1 and 2 are identical (guaranteed LSH+simhash pair); 3 shares a
        # long prefix with 2 (near-dup chain in most configs); 4 is unique
        base = ("the quick brown fox jumps over the lazy dog while the "
                "cat naps in warm afternoon sunlight near the garden ")
        rows = [
            (1, base * 4),
            (2, base * 4),
            (3, base * 4 + "with one extra trailing clause appended"),
            (4, "completely different text about spark dataframes and "
                "partition pruning strategies for columnar storage"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_minhash_resolve_keep_semantics(self, spark):
        import waimak_spark.functions.dedup as D

        out = D.minhash_dedup_resolve(self._docs(spark)).collect()
        got = {r["doc_id"]: (r["canonical_id"], r["keep"]) for r in out}
        assert len(got) == 4                      # one row per doc
        assert got[1] == (1, True)                # component min kept
        assert got[2] == (1, False)               # exact dup dropped
        assert got[4] == (4, True)                # unique doc kept
        # canonical assignment is a function: every canonical is a kept id
        kept = {d for d, (c, k) in got.items() if k}
        assert all(c in kept for c, _k in got.values())

    def test_simhash_resolve_keep_semantics(self, spark):
        import waimak_spark.functions.dedup as D

        out = D.simhash_dedup_resolve(self._docs(spark)).collect()
        got = {r["doc_id"]: (r["canonical_id"], r["keep"]) for r in out}
        assert len(got) == 4
        assert got[1] == (1, True) and got[2] == (1, False)
        assert got[4][1] is True

    def test_resolve_row_count_is_linear_not_quadratic(self, spark):
        """20 identical docs -> 190 candidate PAIRS but exactly 20
        resolution rows (1 keep + 19 drops) — the scale reason the
        resolve entries exist."""
        import waimak_spark.functions.dedup as D

        rows = [(i, "same exact document text repeated for everyone here "
                    "with enough tokens to shingle properly " * 3)
                for i in range(1, 21)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = D.lsh_candidate_pairs(D.minhash_signature(df))
        out = D.minhash_dedup_resolve(df)
        assert pairs.count() == 190
        rows_out = out.collect()
        assert len(rows_out) == 20
        assert sum(1 for r in rows_out if r["keep"]) == 1
        assert all(r["canonical_id"] == 1 for r in rows_out)


class TestVerifiedPipeline:
    """LSH candidates -> exact-Jaccard verify -> resolve: the full
    production dedup pipeline."""

    def test_verification_filters_low_jaccard_candidates(self, spark):
        import waimak_spark.functions.dedup as D

        base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lambda mu nu xi omicron pi rho sigma tau upsilon ")
        rows = [
            (1, base * 3),
            (2, base * 3),                      # exact dup of 1: jaccard 1.0
            (3, base + "entirely different tail with many new words about "
                "storage layers and shuffle partitioning in the engine "
                "plus more unrelated filler tokens to dilute the overlap "
                "even further beyond the verification threshold for sure "
                "and additional sentences of novel vocabulary continuing "
                "to push the shared-shingle fraction well below one half"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        cand = D.lsh_candidate_pairs(D.minhash_signature(df))
        verified = D.minhash_verified_pairs(df, min_jaccard=0.9)
        vrows = verified.collect()
        assert {(r["doc_a"], r["doc_b"]) for r in vrows} == {(1, 2)}
        assert vrows[0]["jaccard"] == 1.0
        # every verified pair was a candidate (verification only filters)
        cset = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
        assert {(r["doc_a"], r["doc_b"]) for r in vrows} <= cset

    def test_verified_resolve_keeps_non_dups(self, spark):
        import waimak_spark.functions.dedup as D

        text = ("one two three four five six seven eight nine ten eleven "
                "twelve thirteen fourteen fifteen ") * 3
        rows = [(1, text), (2, text), (3, text + " sixteen")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: (r["canonical_id"], r["keep"])
               for r in D.minhash_verified_resolve(df, 0.99).collect()}
        assert out[1] == (1, True)
        assert out[2] == (1, False)
        assert out[3][1] is True        # 0.94 jaccard < 0.99: not a dup


class TestKMeans:
    def test_separated_blobs_cluster_together(self, spark):
        from waimak_spark.functions.similarity import kmeans_clusters

        dims = 4
        rows = []
        for i in range(10):  # blob A around +10, blob B around -10
            rows.append((i, [10.0 + 0.01 * i] * dims))
            rows.append((100 + i, [-10.0 - 0.01 * i] * dims))
        df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
        out = kmeans_clusters(df, k=2, n_iters=3, dims=dims).collect()
        a = {r["cluster"] for r in out if r["vec_id"] < 100}
        b = {r["cluster"] for r in out if r["vec_id"] >= 100}
        assert len(a) == 1 and len(b) == 1 and a != b

    def test_deterministic_across_runs(self, spark, sf_dir):
        from waimak_spark.functions.similarity import kmeans_clusters

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        r1 = sorted(map(tuple, kmeans_clusters(emb).collect()))
        r2 = sorted(map(tuple, kmeans_clusters(emb).collect()))
        assert r1 == r2

    def test_parquet_materializer_identical_output(self, spark, sf_dir,
                                                   tmp_path):
        """The 100 TB materialization strategy (cacheAsParquet-style
        plan-cut) must be a pure performance choice: identical clusters
        to the default persist path, and its files removed at
        release_tracked()."""
        import os

        from waimak_spark.functions.cache_registry import (
            parquet_materializer,
            release_tracked,
        )
        from waimak_spark.functions.similarity import kmeans_clusters

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        base = str(tmp_path / "kmeans_base")
        via_persist = sorted(map(tuple, kmeans_clusters(emb).collect()))
        via_parquet = sorted(map(tuple, kmeans_clusters(
            emb, materialize=parquet_materializer(base)).collect()))
        assert via_persist == via_parquet
        assert os.path.isdir(base)  # plan-cut actually wrote files
        release_tracked()
        assert not os.path.exists(base)

    def test_every_vector_labeled_once(self, spark, sf_dir):
        from waimak_spark.functions.similarity import kmeans_clusters

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        out = kmeans_clusters(emb)
        n = emb.count()
        assert out.count() == n
        assert out.select("vec_id").distinct().count() == n
        clusters = [r["cluster"] for r in
                    out.select("cluster").distinct().collect()]
        assert all(1 <= c <= 8 for c in clusters)


class TestInt8Quantization:
    def test_codes_bounded_and_scale_nonnegative(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from waimak_spark.functions.similarity import (
            quantized_int8, valid_embeddings)

        emb = valid_embeddings(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"), 64)
        scale, q = quantized_int8(F.col("embedding"))
        row = (emb.select(scale.alias("s"),
                          F.array_max(F.transform(q, F.abs)).alias("mx"))
               .agg(F.min("s").alias("smin"), F.max("mx").alias("qmax"))
               .collect()[0])
        assert row["smin"] >= 0
        assert row["qmax"] <= 127  # codes fit int8 by construction

    def test_zero_vector_quantizes_to_zero_codes(self, spark):
        from pyspark.sql import functions as F

        from waimak_spark.functions.similarity import quantized_int8

        df = spark.createDataFrame([(1, [0.0] * 4)],
                                   "vec_id int, embedding array<float>")
        scale, q = quantized_int8(F.col("embedding"))
        [r] = df.select(scale.alias("s"), q.alias("q")).collect()
        assert r["s"] == 0.0 and list(r["q"]) == [0, 0, 0, 0]

    def test_int8_topk_close_to_exact(self, spark, sf_dir):
        """int8 cosine ranking must stay close to exact float ranking —
        the catalog recall entry asserts the exact per-query values; here
        we bound the mean."""
        from waimak_spark.catalog.similarity import ann_int8_recall

        rows = ann_int8_recall(spark, sf_dir).collect()
        mean = sum(r["recall_at_k"] for r in rows) / len(rows)
        assert mean >= 0.8


class TestStoredIVFIndex:
    def test_stored_probe_matches_inline_topk(self, spark, sf_dir):
        """Build-once/probe-many must be a pure execution-strategy
        choice: probing the stored bucketed index returns exactly the
        inline ivf_topk answer (the index stores precisely
        ivf_index_frame), and a second probe reuses the table without
        rebuilding."""
        from waimak_spark.catalog.similarity import (
            _ivf_index_table,
            ann_ivf_probe_stored,
            ann_ivf_topk,
        )

        inline = sorted(map(tuple, ann_ivf_topk(spark, sf_dir).collect()))
        stored = sorted(map(tuple,
                            ann_ivf_probe_stored(spark, sf_dir).collect()))
        assert stored == inline
        # build-once: the second call resolves the same table name and
        # the table already exists
        name = _ivf_index_table(spark, sf_dir)
        assert spark.catalog.tableExists(name)
        stored2 = sorted(map(tuple,
                             ann_ivf_probe_stored(spark, sf_dir).collect()))
        assert stored2 == inline

    def test_drop_ivf_index_forces_rebuild(self, spark, sf_dir):
        """Round 7: drop_ivf_index (the scale-harness hook that isolates
        the one-time build from the warm probe) must actually drop the
        table, and the next probe must rebuild it and answer
        identically."""
        from waimak_spark.catalog.similarity import (
            _IVF_IDX_DB,
            _ivf_index_name,
            ann_ivf_probe_stored,
            drop_ivf_index,
        )

        before = sorted(map(tuple,
                            ann_ivf_probe_stored(spark, sf_dir).collect()))
        _, label = _ivf_index_name(sf_dir)
        name = f"{_IVF_IDX_DB}.{label}"
        assert spark.catalog.tableExists(name)
        drop_ivf_index(spark, sf_dir)
        assert not spark.catalog.tableExists(name)
        after = sorted(map(tuple,
                           ann_ivf_probe_stored(spark, sf_dir).collect()))
        assert spark.catalog.tableExists(name)
        assert after == before

    def test_index_invalidates_on_dataset_fingerprint_change(self, spark,
                                                             sf_dir,
                                                             tmp_path):
        """The stored index is keyed on a size+mtime fingerprint of the
        source dataset: regenerating the data in place must produce a
        NEW table name and drop the superseded build, never serve stale
        cells."""
        import os
        import shutil

        from waimak_spark.catalog.similarity import (
            _IVF_IDX_DB,
            _ivf_index_table,
        )

        alt = tmp_path / "sfcopy"
        alt.mkdir()
        shutil.copy(f"{sf_dir}/embeddings.parquet",
                    alt / "embeddings.parquet")
        first = _ivf_index_table(spark, str(alt))
        assert spark.catalog.tableExists(first)
        # "regenerate" the dataset in place: bump mtime only
        os.utime(alt / "embeddings.parquet", (1_700_000_000, 1_700_000_000))
        second = _ivf_index_table(spark, str(alt))
        assert second != first
        assert spark.catalog.tableExists(second)
        # the stale sibling build was dropped, not left to accumulate
        assert not spark.catalog.tableExists(first)
        spark.sql(f"drop table if exists {second}")

    def test_fingerprint_sensitive_to_subsecond_inplace_rewrite(
            self, tmp_path, sf_dir):
        """ADVICE r6: the old total-size + integer-second-mtime pair
        served a stale index when the dataset was regenerated within the
        same second with identical total bytes.  The fingerprint now
        hashes per-file (path, size, st_mtime_ns), so a same-second
        same-size rewrite and a file rename both change it, and an
        untouched dataset keeps a stable key."""
        import os
        import shutil

        from waimak_spark.catalog.similarity import _embeddings_fingerprint

        alt = tmp_path / "fp"
        alt.mkdir()
        p = alt / "embeddings.parquet"
        shutil.copy(f"{sf_dir}/embeddings.parquet", p)
        sec_ns = 1_700_000_000 * 1_000_000_000
        os.utime(p, ns=(sec_ns, sec_ns))
        first = _embeddings_fingerprint(str(alt))
        assert _embeddings_fingerprint(str(alt)) == first  # deterministic
        # same integer second, same bytes, later nanos → new key
        os.utime(p, ns=(sec_ns, sec_ns + 500))
        assert _embeddings_fingerprint(str(alt)) != first
        # directory dataset: renaming a part file (sizes/mtimes equal)
        # must also change the key
        d = tmp_path / "fpdir"
        (d / "embeddings.parquet").mkdir(parents=True)
        part = d / "embeddings.parquet" / "part-0.parquet"
        shutil.copy(p, part)
        os.utime(part, ns=(sec_ns, sec_ns))
        before = _embeddings_fingerprint(str(d))
        renamed = part.with_name("part-1.parquet")
        part.rename(renamed)
        os.utime(renamed, ns=(sec_ns, sec_ns))
        assert _embeddings_fingerprint(str(d)) != before

    def test_stale_location_cleanup_fails_loudly_off_local_fs(self, spark):
        """VERDICT r6: the stale-warehouse cleanup used shutil on a
        parsed local path, which silently no-ops on an object-store
        warehouse.  It now goes through the Hadoop-FS abstraction, where
        an unservable scheme raises instead of pretending to clean."""
        import pytest

        from waimak_spark.filesystem import FileOps

        with pytest.raises(Exception) as e:
            FileOps(spark).glob("s3a://no-such-bucket/ivf_cells_x_*")
        assert "s3a" in str(e.value).lower()


class TestSemanticDedup:
    """SemDeDup-style cluster-blocked dedup (functions/similarity.py
    semantic_dedup) — the catalog entry (static k) is oracle-checked by
    test_catalog_oracle; here: the AUTO-SCALED-k path against a
    dynamically built SQL oracle, the keep-rule invariants, and the
    auto-k arithmetic."""

    def test_scaled_k_matches_dynamic_oracle(self, spark, sf_dir):
        """k=None with a small target cluster size resolves to k > 8 —
        the 100 TB operating point — and must still match the unrolled
        SQL oracle built for that k."""
        import duckdb

        from waimak_spark.functions.similarity import (
            semantic_dedup,
            semantic_dedup_sql,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = emb.count()
        target = 50
        k = max(8, -(-n // target))
        assert k > 8  # the point of the test: NOT the static-oracle k
        got = sorted(
            map(tuple,
                semantic_dedup(emb, target_cluster_size=target).collect()))
        con = duckdb.connect()
        con.execute(f"create view embeddings as select * from "
                    f"'{sf_dir}/embeddings.parquet'")
        want = sorted(map(tuple,
                          con.execute(semantic_dedup_sql(k=k)).fetchall()))
        assert len(got) == len(want)
        for (gi, gc, gs, gk), (wi, wc, ws, wk) in zip(got, want):
            assert (gi, gc, gk) == (wi, wc, wk)
            assert round(gs, 4) == round(ws, 4)

    def test_rank_one_always_kept_and_identicals_collapse(self, spark):
        """Every cluster's most-diverse member survives, and a pile of
        identical vectors keeps exactly one."""
        from pyspark.sql import functions as F

        from waimak_spark.functions.similarity import semantic_dedup

        dims = 8
        rows = [(i, [1.0] * dims) for i in range(20)]  # identical docs
        rows += [(100 + i, [float(j == i) for j in range(dims)])
                 for i in range(dims)]  # orthogonal singletons
        df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
        out = semantic_dedup(df, k=4, dims=dims).toPandas()
        assert len(out) == len(rows)
        # identical vectors: cosine 1.0 >= tau, same cluster -> one kept
        ident = out[out.vec_id < 100]
        assert ident.keep.sum() == 1
        # the survivor is the rank-1 member: lowest (centroid_sim, id)
        grp = ident.sort_values(["centroid_sim", "vec_id"])
        assert grp.iloc[0]["keep"] == 1
        # orthogonal vectors: cosine 0 < tau, all kept
        assert (out[out.vec_id >= 100].keep == 1).all()

    def test_auto_k_arithmetic(self, spark, sf_dir):
        """At every gate scale the auto-k resolves to the static-oracle
        KMEANS_K — the invariant that keeps the catalog entry's fixed
        SQL string exact (PARITY rotation note)."""
        from waimak_spark.functions.similarity import (
            KMEANS_K,
            SEMDEDUP_TARGET_CLUSTER,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = emb.count()
        assert max(KMEANS_K, -(-n // SEMDEDUP_TARGET_CLUSTER)) == KMEANS_K

    def test_blocked_pair_scoring_matches_single_block(self, spark, sf_dir):
        """Round 7: the intra-cluster pair stage runs in rank-ordered row
        blocks with dead-column pruning.  Blocking must be a pure
        execution-strategy choice: tiny blocks (many boundaries, heavy
        pruning) and one giant block (the old full-matrix form) must emit
        bit-identical verdicts on real data, crossing several block
        boundaries within a cluster."""
        from waimak_spark.functions.similarity import semantic_dedup

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        # k=2 forces cluster populations of hundreds at sf0.001 (500
        # vectors) — dozens of 5-row blocks per cluster
        tiny = sorted(map(tuple,
                          semantic_dedup(emb, k=2, pair_block=5).collect()))
        one = sorted(map(tuple,
                         semantic_dedup(emb, k=2,
                                        pair_block=1 << 30).collect()))
        assert tiny == one
        assert any(r[3] == 0 for r in tiny)  # the rule actually fired

    def test_matches_pure_python_reference_on_random_inputs(self, spark):
        """Independent-implementation lockstep (beyond the DuckDB
        oracles): a naive NumPy re-implementation of the SemDeDup rule —
        same seed centroids, Lloyd rounds, rank order, and
        upper-triangular drop — must agree with the Spark operator on
        random inputs (hypothesis drives shapes and values; sequential
        dots on both sides keep the comparison exact)."""
        import numpy as np
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st
        from hypothesis.extra.numpy import arrays

        from waimak_spark.functions.similarity import (
            KMEANS_ROUND,
            _kmeans_init,
            semantic_dedup,
        )

        dims = 6

        def seq_dots(X, W):
            acc = np.zeros((X.shape[0], W.shape[0]))
            for d in range(W.shape[1]):
                acc += X[:, d, None] * W[:, d][None, :]
            return acc

        def reference(X, ids, k, n_iters, tau):
            W = np.array(_kmeans_init(k, dims))
            for _ in range(n_iters):
                scores = (seq_dots(W, W).diagonal()[None, :]
                          - 2 * seq_dots(X, W))
                a = np.argmin(scores, axis=1)
                for c in range(k):
                    if (a == c).any():
                        W[c] = np.round(X[a == c].mean(axis=0),
                                        KMEANS_ROUND)
            scores = (seq_dots(W, W).diagonal()[None, :]
                      - 2 * seq_dots(X, W))
            a = np.argmin(scores, axis=1)
            out = {}
            for c in range(k):
                m = np.where(a == c)[0]
                if len(m) == 0:
                    continue
                Xc = X[m]
                nr = np.sqrt(seq_dots(Xc, Xc).diagonal())
                # zero-norm vectors make 0/0 here: the NaN sims are the
                # agreed cross-engine value (DuckDB divides the same way),
                # so suppress only the RuntimeWarning, not the result
                with np.errstate(invalid="ignore", divide="ignore"):
                    cs = np.round(
                        seq_dots(Xc, W[c:c + 1])[:, 0]
                        / (nr * np.sqrt(seq_dots(W[c:c + 1],
                                                 W[c:c + 1])[0, 0])), 4)
                    order = np.lexsort((ids[m], cs))
                    S = np.round(seq_dots(Xc[order], Xc[order])
                                 / np.outer(nr[order], nr[order]), 4)
                dropped = np.triu(S >= tau, k=1).any(axis=0)
                for pos, keep in zip(order, ~dropped):
                    out[int(ids[m][pos])] = (int(c + 1), int(keep))
            return out

        @settings(max_examples=5, deadline=None,
                  suppress_health_check=[
                      HealthCheck.function_scoped_fixture,
                      HealthCheck.too_slow])
        @given(X=arrays(np.float64, st.tuples(
                            st.integers(min_value=2, max_value=24),
                            st.just(dims)),
                        elements=st.floats(min_value=-2, max_value=2,
                                           allow_nan=False)),
               tau=st.sampled_from([0.3, 0.8, 0.99]))
        def check(X, tau):
            ids = np.arange(len(X))
            df = spark.createDataFrame(
                [(int(i), [float(x) for x in row])
                 for i, row in zip(ids, X)],
                "vec_id long, embedding array<float>")
            # float32 storage: reference must see the same doubles Spark
            # casts from
            X32 = X.astype(np.float32).astype(np.float64)
            got = {int(r["vec_id"]): (int(r["cluster"]), int(r["keep"]))
                   for r in semantic_dedup(
                       df, min_cosine=tau, k=3, n_iters=2,
                       dims=dims).collect()}
            # rows whose vector is all-finite (all are, by construction)
            want = reference(X32, ids, k=3, n_iters=2, tau=tau)
            assert got == want

        check()
