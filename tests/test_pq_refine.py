"""Two-stage IVF-PQ retrieval with exact refinement (the FAISS
RefineFlat pattern): ADC shortlist at k*refine_factor, exact cosine
re-rank of the shortlist only.  The family's recall gate pattern gets a
measured payoff here: on the testdata corpus the refine stage roughly
doubles recall@5 vs raw ADC ranking at the same candidate budget."""

import math

import duckdb
import pytest

from waimak_spark.functions import similarity as S
from waimak_spark.functions.similarity import (
    ivf_pq_refined_topk,
    ivf_pq_refined_topk_sql,
    ivf_pq_topk,
    ivf_pq_topk_from_index,
)

QIDS = list(range(10))


def _books():
    return S._pq_init(S.PQ_M, S.PQ_K, 64 // S.PQ_M)


class TestPqRefineOracle:
    def test_catalog_fn_matches_duckdb(self, spark, sf_dir):
        from waimak_spark.catalog.similarity import (
            _pq_refined_oracle,
            ann_ivf_pq_refined,
        )

        got = [tuple(r) for r in
               ann_ivf_pq_refined(spark, sf_dir).collect()]
        con = duckdb.connect()
        con.execute(f"create view embeddings as "
                    f"select * from '{sf_dir}/embeddings.parquet'")
        want = [tuple(r) for r in
                con.execute(_pq_refined_oracle()).fetchall()]
        assert len(got) == len(want) > 0
        for (gq, gn, gr, gs), (wq, wn, wr, ws) in zip(got, want):
            assert (gq, gn, gr) == (wq, wn, wr)
            assert gs == pytest.approx(ws, abs=1e-9)


class TestPqRefineSemantics:
    def test_refine_recovers_recall(self, spark, sf_dir):
        """The point of the stage: exact re-ranking of the ADC
        shortlist must beat raw ADC ranking on recall@5 vs brute force
        — measured 0.22 -> 0.52 on this corpus, asserted with margin."""
        from waimak_spark.catalog.similarity import ann_brute_force_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        bf = {(r.query_id, r.neighbor_id)
              for r in ann_brute_force_topk(spark, sf_dir).collect()}
        pq = {(r.query_id, r.neighbor_id)
              for r in ivf_pq_topk(emb, _books(), QIDS, k=5).collect()}
        rf = {(r.query_id, r.neighbor_id)
              for r in ivf_pq_refined_topk(emb, _books(), QIDS,
                                           k=5).collect()}
        pq_recall = len(pq & bf) / len(bf)
        rf_recall = len(rf & bf) / len(bf)
        assert rf_recall >= pq_recall + 0.1

    def test_stage2_is_exact_over_the_shortlist(self, spark, sf_dir):
        """The refined top-k must equal a pure-Python exact-cosine
        re-rank of the SAME shortlist — stage 2 adds no approximation."""
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        books = _books()
        short = ivf_pq_topk_from_index(
            S.ivf_pq_index_frame(emb, books), emb, books, QIDS,
            k=20).collect()
        vecs = {}
        for r in emb.collect():
            v = r["embedding"]
            if v is None or len(v) != 64:
                continue
            v = [float(x) if x is not None and math.isfinite(x) else 0.0
                 for x in v]
            n2 = sum(x * x for x in v)
            if n2 > 0:
                n = math.sqrt(n2)
                vecs[r["vec_id"]] = [x / n for x in v]

        def cos(a, b):
            t = 0.0
            for x, y in zip(vecs[a], vecs[b]):
                t += x * y
            return round(t, 4)

        want = {}
        by_q = {}
        for r in short:
            by_q.setdefault(r.query_id, []).append(r.neighbor_id)
        for q, ns in by_q.items():
            ranked = sorted(ns, key=lambda n: (-cos(q, n), n))[:5]
            want[q] = [(n, cos(q, n)) for n in ranked]
        got = {}
        for r in ivf_pq_refined_topk(emb, books, QIDS, k=5).collect():
            got.setdefault(r.query_id, []).append(
                (r.neighbor_id, r.score))
        assert set(got) == set(want)
        for q in got:
            assert [n for n, _ in got[q]] == [n for n, _ in want[q]]
            for (gn, gs), (wn, ws) in zip(got[q], want[q]):
                assert gs == pytest.approx(ws, abs=1e-9)

    def test_refine_factor_one_rescores_pq_topk(self, spark, sf_dir):
        """rf=1: the shortlist IS the PQ top-k — refinement may only
        reorder it (same id set per query, exact scores)."""
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        books = _books()
        pq = {}
        for r in ivf_pq_topk(emb, books, QIDS, k=5).collect():
            pq.setdefault(r.query_id, set()).add(r.neighbor_id)
        rf = {}
        for r in ivf_pq_refined_topk(emb, books, QIDS, k=5,
                                     refine_factor=1).collect():
            rf.setdefault(r.query_id, set()).add(r.neighbor_id)
        assert rf == pq

    def test_param_validation(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        with pytest.raises(ValueError, match="refine_factor"):
            ivf_pq_refined_topk(emb, _books(), QIDS, refine_factor=0)
