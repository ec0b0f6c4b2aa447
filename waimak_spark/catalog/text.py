"""Text-analysis + dedup catalog entries over the ``documents`` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dedup as D
from ..functions import text as T


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs(spark, sf_dir)
    cols = T.quality_columns(F.col("text"))
    return df.select("doc_id", *[c.alias(n) for n, c in cols.items()])


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs(spark, sf_dir)
    cols = T.lang_id_columns(F.col("text"))
    return df.select("doc_id", *[c.alias(n) for n, c in cols.items()])


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs(spark, sf_dir)
    return df.select(
        "doc_id",
        T.bpe_token_count(F.col("text")).cast("bigint").alias("n_bpe_tokens"),
        F.size(T.tokens(F.col("text"))).cast("bigint").alias("n_ws_tokens"),
    )


TOKEN_COUNTS_ORACLE = f"""
    select doc_id,
           {T.bpe_token_count_sql('text')}::BIGINT as n_bpe_tokens,
           len({T.TOKENS_SQL.format(col='text')})::BIGINT as n_ws_tokens
    from documents
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fingerprint: min/max shingle hash (winnowing-lite bounds).

    Staged projections (tokens → shingles → hashes) because interpreted
    higher-order expressions get no CSE: inlined, the tokenize pipeline
    would re-run per element_at reference and the md5 transform would run
    twice (once under array_min, once under array_max).  Each stage
    parses as ONE SQL string (round-12 construction-tax pass — the
    Column/lambda forms paid ~650 py4j round-trips per construction;
    identical trees, oracle-locked)."""
    df = _docs(spark, sf_dir)
    tk = df.selectExpr("doc_id", f"{T.tokens_sexpr('`text`')} as _t")
    shd = tk.selectExpr(
        "doc_id",
        f"array_distinct({T.shingles_sexpr('_t', D.SHINGLE_N)}) as _sh")
    hsh = shd.selectExpr(
        "doc_id",
        f"transform(_sh, s -> {T.md5_hash32_sexpr('s')}) as _h",
        "cast(size(_sh) as bigint) as n_shingles")
    return hsh.selectExpr(
        "doc_id", "array_min(_h) as fp_min", "array_max(_h) as fp_max",
        "n_shingles")


FINGERPRINT_ORACLE = f"""
    with tok as (
        select doc_id, {T.TOKENS_SQL.format(col='text')} as t from documents
    ), shingled as (
        select doc_id, list_distinct({T.shingles_sql('t', D.SHINGLE_N)}) as sh
        from tok
    )
    select doc_id,
           list_min(list_transform(sh, s -> {T.md5_hash32_sql('s')})) as fp_min,
           list_max(list_transform(sh, s -> {T.md5_hash32_sql('s')})) as fp_max,
           len(sh)::BIGINT as n_shingles
    from shingled
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(_docs(spark, sf_dir))


def dedup_substring_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document substring dedup (ExactSubstr-style, Lee et al. 2022):
    admitted round 8 per the PARITY rotation ledger, retiring the
    ``dedup_minhash_signature`` catalog entry (the ``minhash_signature``
    operator itself stays — ``dedup_lsh_candidates`` below consumes the
    same signatures, so the machinery keeps an official driver row)."""
    return D.substring_ngram_dedup(_docs(spark, sf_dir))


def dedup_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = D.minhash_signature(_docs(spark, sf_dir))
    return D.lsh_candidate_pairs(sig)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash(_docs(spark, sf_dir))


def dedup_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_near_dups(D.simhash(_docs(spark, sf_dir)))


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(_docs(spark, sf_dir), min_jaccard=0.1)


def dedup_minhash_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_dedup_resolve(_docs(spark, sf_dir))


def dedup_simhash_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_dedup_resolve(_docs(spark, sf_dir))


def dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_verified_pairs(_docs(spark, sf_dir))


def dedup_minhash_verified_resolve(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    # local_max_edges=0: this entry is the catalog's loop-covering
    # witness — it pins the DISTRIBUTED fixpoint so the official driver
    # gate keeps verifying that path, while the sibling resolve entries
    # exercise the sub-threshold local solve the hybrid picks at gate
    # scale (both paths are oracle-identical by construction).
    return D.minhash_verified_resolve(_docs(spark, sf_dir),
                                      local_max_edges=0)


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: per-doc mean -ln p(token) under the
    corpus's add-1-smoothed unigram distribution."""
    return T.unigram_logprob(_docs(spark, sf_dir))


def bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram/unigram perplexity proxy: per-doc mean
    -ln p(cur | prev) under a 0.5/0.5 add-1-smoothed mixture — catches
    word-order damage the unigram score cannot."""
    return T.bigram_logprob(_docs(spark, sf_dir))


def corpus_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters: the k most frequent word trigrams
    with their exact counts, sketch estimates, and the per-row
    no-undercount bit — staged round 11 → fronts round 12 per the
    PARITY rotation ledger (pulled forward from its round-14 runway
    slot by the backlog fix); verified by tests/test_cms.py every
    pytest run."""
    from ..functions import sketch as SK

    return SK.cms_heavy_hitters(_docs(spark, sf_dir))


def _heavy_hitters_oracle() -> str:
    from ..functions import sketch as SK

    return SK.cms_heavy_hitters_sql()


def corpus_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-trigram counts per language: the exact
    count-distinct (the run-once certification path) next to the
    seeded-register HLL estimate and a 5%-relative-error bit —
    round-15 catalog admission candidate per the PARITY rotation
    ledger; until then verified by tests/test_hll.py every pytest run
    and measured through the catalog EXTRA_ENTRIES registry."""
    from ..functions import sketch as SK

    return SK.hll_distinct_grams(_docs(spark, sf_dir))


def _distinct_hll_oracle() -> str:
    from ..functions import sketch as SK

    return SK.hll_distinct_grams_sql()


def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training over the corpus (Sennrich et al. 2016):
    one distributed word-frequency shuffle capped to the top-V words,
    then the bounded driver-side greedy merge loop — the HF-tokenizers
    shape.  No SQL oracle (the merge loop is an iterative algorithm,
    the brief's rows-only class); cross-checked against a pure-Python
    reference in tests/test_bpe_learn.py every pytest run.  Staged
    round 11 → fronts round 12 per the rotation ledger; the APPLY side
    is `bpe_encode_stats` (r17 slot)."""
    from ..functions import text as TT

    return TT.bpe_learn(_docs(spark, sf_dir))


def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING of the corpus under its own trained merge table
    (the apply side of Sennrich et al. 2016 — turns token counting
    into real subword counts): train = one bounded word-frequency
    shuffle + the driver merge loop; encode = one Arrow-batched
    map-only pass with the bounded merge table as a closure constant.
    No SQL oracle (the encode loop is iterative, the brief's rows-only
    class); the subwords_md5 column is a per-doc determinism witness a
    pure-Python reference reproduces bit-for-bit every pytest run
    (tests/test_bpe_encode.py).  Round-17 admission candidate per the
    rotation ledger; measured through EXTRA_ENTRIES."""
    from ..functions import text as TT

    docs = _docs(spark, sf_dir)
    merges = TT.learn_bpe_merges(TT.word_frequencies(docs))
    return TT.bpe_encode(docs, merges)


def vocab_jaccard_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k set-similarity BETWEEN per-language vocabularies (Cohen
    & Kaplan 2007 / Broder 1997): the k-row-per-group element sketch
    makes the pairwise Jaccard estimate constant-cost regardless of set
    size; the exact Jaccard runs as the run-once certification side.
    Post-runway extension measured through the catalog EXTRA_ENTRIES
    registry; verified by tests/test_kmv_jaccard.py every pytest run."""
    from ..functions import sketch as SK

    return SK.kmv_group_jaccard(_docs(spark, sf_dir))


def _kmv_jaccard_oracle() -> str:
    from ..functions import sketch as SK

    return SK.kmv_group_jaccard_sql()


def doc_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken
    2003 — MOSS): per-window rightmost-minimum gram hashes with the
    shared-run detection guarantee the single-global-min
    ``doc_fingerprint`` cannot give.  One map pass, shuffle only for
    the final distinct.  Staged round 11 → fronts round 12 per the
    rotation ledger; verified by tests/test_winnowing.py every pytest
    run."""
    return T.winnow_fingerprints(D.spread_for_compute(_docs(spark, sf_dir)))


def _winnow_oracle() -> str:
    return T.winnow_fingerprints_sql()


def dedup_repeated_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/CCNet-style repeated-segment (boilerplate) removal: every
    document rewritten with its corpus-frequent k-token windows dropped
    (Raffel et al. 2020 §2.2 / Wenzek et al. 2020 — the rewrite sibling
    of the flag-only ``dedup_substring_ngram``).  One DF-count shuffle +
    one anti-join + one per-doc rebuild; output linear in corpus size.
    Post-runway extension measured through the catalog EXTRA_ENTRIES
    registry; verified by tests/test_segment_dedup.py every pytest
    run."""
    return D.repeated_segment_removal(_docs(spark, sf_dir))


def _repeated_segments_oracle() -> str:
    return D.repeated_segment_removal_sql()


def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity join with lossless prefix filtering
    (Bayardo et al. 2007): every document pair with shingle-set Jaccard
    >= PPJOIN_TAU (0.75 — the measured default in functions/dedup.py;
    the threshold is exact at any tau, tested down to 0.3), with the
    provably-complete candidate pruning the heuristic
    LSH/df-cap paths trade away — round-19 catalog admission candidate
    per the PARITY rotation ledger; until then verified by
    tests/test_prefix_join.py every pytest run and measured through the
    catalog EXTRA_ENTRIES registry."""
    return D.jaccard_prefix_join(_docs(spark, sf_dir))


def _jaccard_prefix_oracle() -> str:
    return D.jaccard_prefix_join_sql()


#: disjoint id space for the duplicated copy of the corpus (documents
#: doc_ids are dense small ints at every sf and on the 10x replica)
PREFIX_DUP_OFFSET = 1_000_000_000


def dedup_jaccard_prefix_collapsed(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """The composed exact-dedup → prefix-join form (VERDICT r9 #4) on a
    corpus WITH exact-duplicate multiplicity: the documents table
    doubled (copy ids offset into a disjoint range), so every text has
    multiplicity >= 2 — the regime the composition exists for.  The
    expensive tokenize/shingle/prefix machinery runs once per DISTINCT
    text; member pairs fan back out through two narrow hash joins.
    Output-identical to the raw :func:`~waimak_spark.functions.dedup.
    jaccard_prefix_join` over the same doubled corpus (locked in
    tests/test_prefix_join.py), so the raw SQL oracle certifies it
    verbatim."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    dup = docs.select(
        (F.col("doc_id") + F.lit(PREFIX_DUP_OFFSET)).alias("doc_id"),
        "text")
    return D.jaccard_prefix_join_collapsed(docs.unionByName(dup))


def _jaccard_prefix_collapsed_oracle() -> str:
    doubled = (f"(select doc_id, text from documents union all "
               f"select doc_id + {PREFIX_DUP_OFFSET}, text "
               f"from documents)")
    return D.jaccard_prefix_join_sql(table=doubled)


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval: the top-k documents per fixed query with
    rounded scores and per-query ranks — round-16 catalog admission
    candidate per the PARITY rotation ledger; until then verified by
    tests/test_bm25.py every pytest run and measured through the
    catalog EXTRA_ENTRIES registry."""
    from ..functions import retrieval as R

    return R.bm25_topk(_docs(spark, sf_dir))


def _bm25_oracle() -> str:
    from ..functions import retrieval as R

    return R.bm25_topk_sql()


# stored BM25 inverted index — build-once/probe-many (the stored-IVF
# recipe applied to lexical retrieval); bump on layout/kernel change
_BM25_IDX_VERSION = "v1"
#: corpus stats ride the postings table as properties (metadata lookup,
#: not a data collect; repr round-trips the double exactly)
_BM25_N_PROP = "wmk.bm25.n_docs"
_BM25_AVGDL_PROP = "wmk.bm25.avgdl"


def _bm25_index_name(sf_dir: str) -> tuple[str, str]:
    import os
    import re

    from .similarity import _dataset_fingerprint

    tag = re.sub(r"[^0-9A-Za-z]+", "_",
                 os.path.basename(os.path.normpath(sf_dir)))
    label = (f"bm25x_{tag}_"
             f"{_dataset_fingerprint(sf_dir, 'documents.parquet')}"
             f"_{_BM25_IDX_VERSION}")
    return tag, label


def drop_bm25_index(spark: SparkSession, sf_dir: str) -> None:
    """Drop ``sf_dir``'s stored BM25 postings so the next probe rebuilds
    (tools/scale_check.py times the one-time build separately)."""
    from .similarity import _IVF_IDX_DB

    _, label = _bm25_index_name(sf_dir)
    spark.sql(f"drop table if exists {_IVF_IDX_DB}.{label}")


def _bm25_index_table(spark: SparkSession, sf_dir: str) -> str:
    """Get-or-build the stored postings table: term-bucketed so a probe
    scans only its query terms' buckets; (n_docs, avgdl) stamped as
    table properties AFTER the write completes, so a property-less
    table is a crash leftover and is rebuilt (the LSH completion-
    property hygiene)."""
    from .. import Waimak
    from ..functions import retrieval as R
    from .similarity import _IVF_IDX_DB, _clear_superseded

    tag, label = _bm25_index_name(sf_dir)
    name = f"{_IVF_IDX_DB}.{label}"
    if spark.catalog.tableExists(name):
        props = {r["key"]: r["value"] for r in spark.sql(
            f"show tblproperties {name}").collect()}
        if _BM25_N_PROP in props:
            return name
        spark.sql(f"drop table if exists {name}")
    _clear_superseded(spark, f"bm25x_{tag}_", label)
    docs = _docs(spark, sf_dir)
    idx = R.bm25_postings_frame(docs)
    (Waimak.spark_flow(spark)
     .open(label, lambda c, df=idx: df)
     .write_bucketed_table(_IVF_IDX_DB, label, ["term"],
                           R.BM25_IDX_BUCKETS,
                           sort_cols=["term", "doc_id"])
     .execute())
    n_docs, avgdl = R.bm25_corpus_stats(docs)
    spark.sql(f"alter table {name} set tblproperties("
              f"'{_BM25_N_PROP}'='{n_docs}', "
              f"'{_BM25_AVGDL_PROP}'='{avgdl!r}')")
    return name


def bm25_probe_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k against the STORED term-bucketed postings table — the
    posture continuous retrieval runs at 100 TB: the corpus is
    tokenized and shuffled exactly once at build, each probe's scan
    prunes to its query terms' buckets, and the result is bit-identical
    to the inline :func:`~waimak_spark.functions.retrieval.bm25_topk`
    (asserted every pytest run — tests/test_bm25_stored.py — which is
    why this entry sits in the extras registry's permanent
    output-identity-sibling class: `bm25_search` holds the family's
    official driver row, r14 per the ledger)."""
    from ..functions import retrieval as R

    tbl = _bm25_index_table(spark, sf_dir)
    props = {r["key"]: r["value"] for r in spark.sql(
        f"show tblproperties {tbl}").collect()}
    return R.bm25_topk_from_postings(
        spark.table(tbl), int(props[_BM25_N_PROP]),
        float(props[_BM25_AVGDL_PROP]))


def _bm25_probe_stored_oracle() -> str:
    # the stored path is output-identical to the inline form, so the
    # inline oracle certifies it end-to-end (index build + probe)
    from ..functions import retrieval as R

    return R.bm25_topk_sql()


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid sparse+dense retrieval: BM25 and embedding-cosine ranked
    lists per fixed query, fused with Reciprocal Rank Fusion (Cormack
    et al. 2009) — round-18 catalog admission candidate per the PARITY
    rotation ledger; until then verified by tests/test_hybrid_rrf.py
    every pytest run and measured through the catalog EXTRA_ENTRIES
    registry."""
    from ..functions import retrieval as R

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return R.hybrid_topk(_docs(spark, sf_dir), emb)


def _hybrid_rrf_oracle() -> str:
    from ..functions import retrieval as R

    return R.hybrid_topk_sql()


ENTRIES = {
    "text_quality": {"fn": text_quality, "oracle": T.QUALITY_SQL},
    "unigram_logprob": {"fn": unigram_logprob,
                        "oracle": T.unigram_logprob_sql()},
    "bigram_logprob": {"fn": bigram_logprob,
                       "oracle": T.bigram_logprob_sql()},
    "lang_id": {"fn": lang_id, "oracle": T.lang_id_sql()},
    "token_counts": {"fn": token_counts, "oracle": TOKEN_COUNTS_ORACLE},
    "doc_fingerprint": {"fn": doc_fingerprint, "oracle": FINGERPRINT_ORACLE},
    "dedup_exact": {"fn": dedup_exact, "oracle": D.EXACT_DEDUP_SQL},
    "dedup_substring_ngram": {"fn": dedup_substring_ngram,
                              "oracle": D.substring_ngram_dedup_sql()},
    "dedup_lsh_candidates": {"fn": dedup_lsh_candidates,
                             "oracle": D.lsh_candidate_pairs_sql()},
    "dedup_simhash": {"fn": dedup_simhash, "oracle": D.simhash_sql()},
    "dedup_simhash_near_dups": {"fn": dedup_simhash_near_dups,
                                "oracle": D.simhash_near_dups_sql()},
    "dedup_ngram_jaccard": {"fn": dedup_ngram_jaccard,
                            "oracle": D.ngram_jaccard_pairs_sql()},
    "dedup_minhash_resolve": {"fn": dedup_minhash_resolve,
                              "oracle": D.minhash_dedup_resolve_sql()},
    "dedup_simhash_resolve": {"fn": dedup_simhash_resolve,
                              "oracle": D.simhash_dedup_resolve_sql()},
    "dedup_minhash_verified": {"fn": dedup_minhash_verified,
                               "oracle": D.minhash_verified_pairs_sql()},
    "dedup_minhash_verified_resolve": {
        "fn": dedup_minhash_verified_resolve,
        "oracle": D.minhash_verified_resolve_sql()},
    # round-11 STAGED admissions (front round 12 per the rotation ledger)
    "corpus_heavy_hitters": {"fn": corpus_heavy_hitters,
                             "oracle": _heavy_hitters_oracle()},
    # rows-only by design: the greedy merge loop is iterative (the
    # brief's non-SQL-expressible class); pure-Python reference lockstep
    # in tests/test_bpe_learn.py every pytest run
    "bpe_merges": {"fn": bpe_merges, "oracle": None},
    "doc_winnow_fingerprints": {"fn": doc_winnow_fingerprints,
                                "oracle": _winnow_oracle()},
    # round-12 STAGED admissions (front round 13 per the rotation ledger)
    "corpus_distinct_hll": {"fn": corpus_distinct_hll,
                            "oracle": _distinct_hll_oracle()},
    "dedup_repeated_segments": {"fn": dedup_repeated_segments,
                                "oracle": _repeated_segments_oracle()},
}
