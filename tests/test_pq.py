"""Product quantization (Jégou et al. 2011) — per-subspace deterministic
Lloyd codebooks, map-only encode, ADC top-k with Arrow-built per-query
LUTs and JVM scoring.
The reference (waimak) has no ANN surface; this is the training-data-
pipeline extension family (round-10 catalog candidate per PARITY's
rotation ledger), so the oracle lockstep lives here until a slot opens."""

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from waimak_spark.functions.similarity import (
    PQ_K,
    PQ_M,
    PQ_ROUND,
    PQ_SEED,
    _plane_weight,
    brute_force_topk,
    ivf_pq_topk,
    ivf_pq_topk_sql,
    pq_encode,
    pq_encode_sql,
    pq_fit,
    pq_topk,
    pq_topk_sql,
)


@pytest.fixture(scope="module")
def duck():
    import os

    sf = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    con = duckdb.connect()
    con.execute(
        f"create view embeddings as select * from '{sf}/embeddings.parquet'")
    return con


@pytest.fixture(scope="module")
def fitted(spark):
    import os

    sf = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    _, books = pq_fit(emb)
    return emb, books


class TestPqOracle:
    def test_encode_matches_duckdb(self, fitted, duck):
        emb, books = fitted
        got = {r.vec_id: list(r.codes)
               for r in pq_encode(emb, books).collect()}
        want = {r[0]: list(r[1])
                for r in duck.execute(pq_encode_sql(books)).fetchall()}
        assert got == want
        assert len(got) == emb.count()
        # codes are 1-based and bounded by the per-subspace k
        assert all(1 <= c <= PQ_K for cs in got.values() for c in cs)
        assert all(len(cs) == PQ_M for cs in got.values())

    def test_topk_matches_duckdb(self, fitted, duck):
        emb, books = fitted
        qids = list(range(1, 21))
        got = sorted(tuple(r)
                     for r in pq_topk(emb, books, qids, k=10).collect())
        want = sorted(
            tuple(r)
            for r in duck.execute(pq_topk_sql(books, qids, k=10)).fetchall())
        assert len(got) == len(want) == 200
        for a, b in zip(got, want):
            assert a[:3] == b[:3]
            assert a[3] == pytest.approx(b[3], abs=1e-9)

    def test_fit_is_deterministic(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        _, b1 = pq_fit(emb, m=8, k=8, n_iters=1)
        _, b2 = pq_fit(emb, m=8, k=8, n_iters=1)
        assert b1 == b2


class TestPqRecall:
    def test_recall_gate_vs_brute_force(self, fitted):
        """Measured gate (the ann_ivf_recall pattern): defaults swept to
        mean 0.62 / min 0.40 recall@10 on this corpus — fail if a change
        silently wrecks the approximate path. Floors sit under the
        measured values by a safety margin but far above the ~k/N noise
        baseline (0.02)."""
        emb, books = fitted
        qids = list(range(1, 21))
        pq = {}
        for r in pq_topk(emb, books, qids, k=10).collect():
            pq.setdefault(r.query_id, set()).add(r.neighbor_id)
        bf = {}
        for r in brute_force_topk(emb, qids, k=10).collect():
            bf.setdefault(r.query_id, set()).add(r.neighbor_id)
        recalls = [len(pq[q] & bf[q]) / 10 for q in bf]
        assert sum(recalls) / len(recalls) >= 0.5
        assert min(recalls) >= 0.3


class TestPqSemantics:
    def test_fit_matches_pure_python_reference(self, spark):
        """Independent NumPy-free reference: seeded init, sequential
        distances, mean update rounded to PQ_ROUND, empty codes keep the
        previous centroid — recomputed in plain Python on a small corpus
        and compared to the Spark fit per value."""
        m, k, iters, dims = 4, 3, 2, 8
        sub = dims // m
        vecs = [[math.sin(i * dims + d) for d in range(dims)]
                for i in range(30)]
        df = spark.createDataFrame(
            [Row(vec_id=i, embedding=v) for i, v in enumerate(vecs)])
        _, got = pq_fit(df, m=m, k=k, n_iters=iters, dims=dims)

        def norm(v):
            n = math.sqrt(sum(x * x for x in v))
            return [x / n for x in v]

        unit = [norm(v) for v in vecs]
        books = [[[_plane_weight(PQ_SEED + s * k + c, d)
                   for d in range(sub)] for c in range(k)]
                 for s in range(m)]
        for _ in range(iters):
            sums = {}
            for v in unit:
                for s in range(m):
                    xs = v[s * sub:(s + 1) * sub]
                    best, best_score = None, None
                    for c in range(k):
                        w = books[s][c]
                        cc = 0.0
                        for x in w:
                            cc += x * x
                        xc = 0.0
                        for d in range(sub):
                            xc += xs[d] * w[d]
                        score = cc - 2.0 * xc
                        if best_score is None or score < best_score:
                            best, best_score = c, score
                    key = (s, best)
                    acc = sums.setdefault(key, [0, [0.0] * sub])
                    acc[0] += 1
                    for d in range(sub):
                        acc[1][d] += xs[d]
            new = [[list(c) for c in b] for b in books]
            for (s, c), (n, tot) in sums.items():
                new[s][c] = [round(t / n, PQ_ROUND) for t in tot]
            books = new
        for s in range(m):
            for c in range(k):
                for d in range(sub):
                    assert got[s][c][d] == pytest.approx(
                        books[s][c][d], abs=2e-6), (s, c, d)

    def test_invalid_vectors_dropped(self, spark):
        df = spark.createDataFrame([
            Row(vec_id=1, embedding=[0.5] * 8),
            Row(vec_id=2, embedding=None),
            Row(vec_id=3, embedding=[0.5] * 7),        # ragged
            Row(vec_id=4, embedding=[float("nan")] * 8),
            Row(vec_id=5, embedding=[0.0] * 8),        # zero norm
        ])
        _, books = pq_fit(df, m=4, k=2, n_iters=1, dims=8)
        out = pq_encode(df, books, dims=8)
        assert [r.vec_id for r in out.collect()] == [1]

    def test_dims_not_divisible_raises(self, spark):
        df = spark.createDataFrame([Row(vec_id=1, embedding=[0.5] * 8)])
        with pytest.raises(ValueError, match="not divisible"):
            pq_fit(df, m=3, dims=8)

    def test_infinite_vector_lockstep_with_oracle(self, spark):
        """ADVICE r7: a vector carrying +/-Inf passes the oracle's dot>0
        guard under IEEE while Spark's valid_embeddings drops it — the
        oracle base CTEs now carry the same isfinite guard, so encode
        stays lockstep on corpora with non-finite rows."""
        rows = [Row(vec_id=i, embedding=[0.1 * ((i + j) % 7 + 1)
                                         for j in range(8)])
                for i in range(1, 7)]
        rows += [Row(vec_id=7, embedding=[float("inf")] + [0.5] * 7),
                 Row(vec_id=8, embedding=[float("-inf")] * 8),
                 Row(vec_id=9, embedding=[float("nan")] + [0.5] * 7)]
        df = spark.createDataFrame(rows)
        _, books = pq_fit(df, m=4, k=2, n_iters=2, dims=8)
        got = {r.vec_id: list(r.codes)
               for r in pq_encode(df, books, dims=8).collect()}
        assert set(got) == {1, 2, 3, 4, 5, 6}

        con = duckdb.connect()
        con.execute("create table embeddings(vec_id int, embedding double[])")
        con.executemany(
            "insert into embeddings values (?, ?)",
            [(r.vec_id, r.embedding) for r in rows])
        want = {r[0]: list(r[1])
                for r in con.execute(pq_encode_sql(books, dims=8)).fetchall()}
        assert got == want


class TestIvfPq:
    def test_matches_duckdb(self, fitted, duck):
        emb, books = fitted
        qids = list(range(1, 21))
        got = sorted(tuple(r)
                     for r in ivf_pq_topk(emb, books, qids, k=10).collect())
        want = sorted(tuple(r) for r in duck.execute(
            ivf_pq_topk_sql(books, qids, k=10)).fetchall())
        assert len(got) == len(want) == 200
        for a, b in zip(got, want):
            assert a[:3] == b[:3]
            assert a[3] == pytest.approx(b[3], abs=1e-9)

    def test_recall_gate_with_cell_pruning(self, fitted):
        """Probing 4/16 cells (25% of the corpus) measured recall@10
        0.59 mean / 0.40 min — within 0.03 of the full-scan PQ gate.
        Floors leave a safety margin."""
        emb, books = fitted
        qids = list(range(1, 21))
        pq = {}
        for r in ivf_pq_topk(emb, books, qids, k=10).collect():
            pq.setdefault(r.query_id, set()).add(r.neighbor_id)
        bf = {}
        for r in brute_force_topk(emb, qids, k=10).collect():
            bf.setdefault(r.query_id, set()).add(r.neighbor_id)
        recalls = [len(pq.get(q, set()) & bf[q]) / 10 for q in bf]
        assert sum(recalls) / len(recalls) >= 0.45
        assert min(recalls) >= 0.3

    def test_pruning_restricts_candidates(self, fitted):
        """Every returned neighbour's cell must be one of the query's
        probed cells — the prune is real, not a full scan re-ranked."""
        from pyspark.sql import functions as F

        from waimak_spark.functions.similarity import (
            IVF_CENTROIDS,
            IVF_NPROBE,
            _ivf_pq_features,
            _pq_unit_base,
            ivf_probe_cells,
        )

        emb, books = fitted
        base = _pq_unit_base(emb, 64, "vec_id", "embedding")
        cells = {r.vec_id: r.f.cell for r in base.select(
            "vec_id", _ivf_pq_features(books, IVF_CENTROIDS, 64)(
                F.col("v")).alias("f")).collect()}
        probes = {r.vec_id: list(r.p) for r in base.where(
            F.col("vec_id").isin([1, 7])).select(
            "vec_id", ivf_probe_cells(F.col("v")).alias("p")).collect()}
        for r in ivf_pq_topk(emb, books, [1, 7], k=10).collect():
            assert cells[r.neighbor_id] in probes[r.query_id]


class TestIvfPqStoredIndex:
    def test_stored_probe_equals_inline(self, fitted, spark, tmp_path):
        """Build-once/probe-many: persisting the (id, cell, codes) frame
        and probing the read-back copy returns exactly the inline result,
        and the probe plan runs NO Python on the corpus side (only the
        query probe/LUT kernels)."""
        from waimak_spark.functions.similarity import (
            ivf_pq_index_frame,
            ivf_pq_topk_from_index,
        )

        emb, books = fitted
        path = str(tmp_path / "pq_index")
        ivf_pq_index_frame(emb, books).write.parquet(path)
        stored = spark.read.parquet(path)
        qids = list(range(1, 11))
        probe = ivf_pq_topk_from_index(stored, emb, books, qids, k=5)
        inline = ivf_pq_topk(emb, books, qids, k=5)
        assert sorted(map(tuple, probe.collect())) == sorted(
            map(tuple, inline.collect()))
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        # query side only: one probe+LUT projection over the unit base
        assert plan.count("ArrowEvalPython") <= 2


def test_catalog_wrapper_matches_its_admission_oracle(spark, sf_dir):
    """The round-10 admission shape (catalog.similarity.
    ann_ivf_pq_probe_stored + _pq_probe_stored_oracle) must already be
    lockstep BEFORE the slot opens — admission day is then a one-line
    move from EXTRA_ENTRIES to ENTRIES (the round-9 DSIR pattern,
    VERDICT r8 #4).  The oracle is STATIC because the stored index uses
    seeded data-independent codebooks; this test is the proof that the
    static string and the stored tables can never drift apart."""
    import duckdb

    from waimak_spark.catalog.similarity import (
        _pq_probe_stored_oracle,
        ann_ivf_pq_probe_stored,
        drop_ivf_pq_index,
    )

    drop_ivf_pq_index(spark, sf_dir)
    try:
        got = sorted(tuple(r) for r in
                     ann_ivf_pq_probe_stored(spark, sf_dir).collect())
    finally:
        drop_ivf_pq_index(spark, sf_dir)
    con = duckdb.connect()
    con.execute(f"create view embeddings as "
                f"select * from '{sf_dir}/embeddings.parquet'")
    want = sorted(tuple(r) for r in
                  con.execute(_pq_probe_stored_oracle()).fetchall())
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g[:2] == w[:2]                      # (query_id, neighbor)
        for gv, wv in zip(g[2:], w[2:]):
            assert gv == pytest.approx(wv, abs=1e-9)


def test_round12_rotation_executed():
    """Test-lock the round-12 rotation as EXECUTED (VERDICT r11 #5: the
    rotation follows the committed PARITY ledger exactly): the five
    round-11 staged admissions front the window for their first official
    rows, the five r12 retirements left the catalog for RETIRED_ENTRIES
    (still DuckDB-lockstep-tested every run), their freed slots admitted
    the next five ledger stagings (new entries, staged to front round
    13), and every admitted entry left EXTRA_ENTRIES.  Window
    arithmetic: 5 fronted stagings + 45 surviving r10-latest entries =
    50, zero free slots, five fresh admissions staged."""
    from waimak_spark.catalog import (
        ALL_ENTRIES,
        EXTRA_ENTRIES,
        RETIRED_ENTRIES,
        STAGED_NEXT_ROUND,
    )

    names = list(ALL_ENTRIES)
    assert len(names) == 100
    window = set(names[:50])
    assert names[:5] == [
        "copurchase_pagerank", "corpus_heavy_hitters", "bpe_merges",
        "sample_mmr_diverse", "doc_winnow_fingerprints"], \
        "the round-11 staged admissions front first in round 12"
    assert STAGED_NEXT_ROUND == (
        "ivf_probe_appended", "embedding_kmeanspar_init",
        "dedup_repeated_segments", "corpus_distinct_hll",
        "streaming_running_totals_stateful")
    for s in STAGED_NEXT_ROUND:
        assert s in ALL_ENTRIES and s not in window, s
    # an admitted entry leaves EXTRA_ENTRIES the round it is admitted
    for gone in ("copurchase_pagerank", "corpus_heavy_hitters",
                 "bpe_merges", "sample_mmr_diverse",
                 "doc_winnow_fingerprints", "ivf_probe_appended",
                 "embedding_kmeanspar_init", "dedup_repeated_segments",
                 "corpus_distinct_hll",
                 "streaming_running_totals_stateful"):
        assert gone not in EXTRA_ENTRIES, gone
    assert "ann_int8_recall" not in ALL_ENTRIES
    assert "embedding_quantize_int8" in ALL_ENTRIES
    # retirement ledger: r11 freed the three fronted slots + the five
    # r12-staged slots; the r12 retirements freed the five r13 slots
    r11_freed = {"q12_late_priority", "q17_small_quantity",
                 "tumbling_window_counts", "dedup_simhash_near_dups",
                 "dedup_minhash_verified", "dedup_ngram_jaccard",
                 "dedup_against_corpus", "dedup_embedding_cosine"}
    r12_freed = {"q15_top_supplier", "q4_priority_exists",
                 "running_value_per_user", "sample_lang_balanced",
                 "embedding_centroids"}
    assert r11_freed | r12_freed == set(RETIRED_ENTRIES)
    assert not (r11_freed | r12_freed) & set(ALL_ENTRIES)


def test_round11_bloom_retirement_bookkeeping():
    """Round-11 Bloom admission EXECUTED (VERDICT r9 #5 prep → r10 #1):
    the entry is in the catalog window under its catalog name, out of the
    extras, its admission-shape lockstep still runs every pytest
    (tests/test_bloom_dedup.py::test_catalog_fn_matches_duckdb), the
    decided retirement target `dedup_simhash_near_dups` left the catalog
    WITH official green history, and the simhash machinery keeps official
    coverage through `dedup_simhash` and `dedup_simhash_resolve`."""
    import glob
    import json
    import os

    from waimak_spark.catalog import (
        ALL_ENTRIES,
        EXTRA_ENTRIES,
        RETIRED_ENTRIES,
    )

    assert "bloom_dedup_against_corpus" not in EXTRA_ENTRIES
    names = list(ALL_ENTRIES)
    # round 12: its first official row landed in CORRECTNESS_r11, so the
    # entry rotates out of the r12 window like any other r11-latest row —
    # catalog membership (full lockstep every pytest) is the invariant
    assert "dedup_bloom_against_corpus" in names
    retired = RETIRED_ENTRIES["dedup_simhash_near_dups"]
    assert retired["retired"] == "r11"
    for w in retired["witnesses"]:
        assert w in ALL_ENTRIES, w
    # every retired entry left with official green history — retirement
    # is a coverage decision, never a way to park a failing entry
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: set[str] = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            rows = json.load(fh)
        green |= {k for k, v in rows.items()
                  if isinstance(v, dict) and v.get("hash_match")}
    if green:  # driver files present
        never_green = [n for n in RETIRED_ENTRIES if n not in green]
        assert not never_green, (
            f"retired without any official green row: {never_green}")


class TestIvfPqStoredTable:
    """The cell-BUCKETED managed-table form (VERDICT r7 #3): codebooks +
    (id, cell, codes) persisted once per dataset fingerprint, probes
    bucket-pruned and re-featurize-free."""

    @pytest.fixture(scope="class")
    def stored(self, spark):
        import os

        from waimak_spark.catalog.similarity import (
            _ivf_pq_index_tables,
            drop_ivf_pq_index,
        )

        sf = os.environ.get("SPARK_GRAFT_SF_DIR_TEST",
                            "/root/testdata/sf0.001")
        drop_ivf_pq_index(spark, sf)
        cells_name, books_name = _ivf_pq_index_tables(spark, sf)
        yield sf, cells_name, books_name
        drop_ivf_pq_index(spark, sf)

    def test_books_round_trip_exactly(self, stored, spark):
        """The stored catalog index uses the SEEDED data-independent
        codebooks (pq_fit n_iters=0 → _pq_init; the round-9 oracle-design
        decision), so the exact stored content is predictable with no
        data in hand — and must round-trip bit-exactly."""
        from waimak_spark.catalog.similarity import _load_pq_books
        from waimak_spark.functions.similarity import (
            PQ_K,
            PQ_M,
            _pq_init,
        )

        _sf, _cells, books_name = stored
        assert _load_pq_books(spark, books_name) == _pq_init(
            PQ_M, PQ_K, 64 // PQ_M)

    def test_probe_matches_inline_and_prunes_buckets(self, stored, spark):
        from waimak_spark.catalog.similarity import (
            QUERY_IDS,
            ann_ivf_pq_probe_stored,
        )
        from waimak_spark.functions.similarity import pq_fit

        sf, _cells, _books = stored
        probe = ann_ivf_pq_probe_stored(spark, sf)
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        # inline comparison uses the same seeded books the stored
        # catalog index is built with (pq_fit n_iters=0)
        _, books = pq_fit(emb, n_iters=0)
        inline = ivf_pq_topk(emb, books, QUERY_IDS, k=5)
        assert sorted(map(tuple, probe.collect())) == sorted(
            map(tuple, inline.collect()))
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert "SelectedBucketsCount" in plan, "bucket pruning lost"
        n_sel = plan.split("SelectedBucketsCount: ")[1]
        probed, total = n_sel.split("\n")[0].split(" out of ")
        assert int(probed) < int(total.strip().rstrip(")")), \
            "probe scanned every bucket"
        # corpus side is a bare bucket-pruned scan: the only Arrow stages
        # are the tiny query-side probe/LUT kernels, nothing row-at-a-time
        assert "BatchEvalPython" not in plan
        assert plan.count("ArrowEvalPython") <= 2

    def test_partial_build_recovers(self, stored, spark):
        """A crash between the two table writes leaves one registered:
        the next build must drop and rebuild BOTH (a registered table
        whose files were cleared but whose registration survived would
        make errorifexists refuse forever)."""
        import os

        from waimak_spark.catalog.similarity import (
            _IVF_IDX_DB,
            _ivf_pq_index_names,
            _ivf_pq_index_tables,
        )

        sf, cells_name, books_name = stored
        _, _cl, books_label = _ivf_pq_index_names(sf)
        spark.sql(f"drop table if exists {_IVF_IDX_DB}.{books_label}")
        got_cells, got_books = _ivf_pq_index_tables(spark, sf)
        assert (got_cells, got_books) == (cells_name, books_name)
        assert spark.table(got_books).count() > 0
        assert spark.table(got_cells).count() > 0

    def test_build_happens_once(self, stored, spark, monkeypatch):
        """A second call with the tables present must not re-run the fit
        (the one-time build is the operator's entire point)."""
        import waimak_spark.catalog.similarity as cs

        sf, _cells, _books = stored

        def boom(*a, **k):
            raise AssertionError("pq_fit re-ran on a warm index")

        monkeypatch.setattr(cs.S, "pq_fit", boom)
        assert cs.ann_ivf_pq_probe_stored(spark, sf).count() > 0


class TestPqPlanShape:
    def test_scoring_path_stays_jvm(self, fitted):
        """Encode is the ONLY Python (Arrow) stage; ADC scoring and the
        per-query rank are whole-stage JVM with a broadcast query side."""
        emb, books = fitted
        plan = (pq_topk(emb, books, [1, 2], k=5)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan      # no row-at-a-time Python
        assert plan.count("ArrowEvalPython") <= 3  # encode + query LUT
        assert "BroadcastExchange" in plan         # query side broadcasts
