"""BPE merge learning (Sennrich et al. 2016) — tokenizer training as
distributed word counts + a bounded driver-side greedy merge loop.  The
merge loop is an iterative algorithm (the brief's rows-only oracle
class), so correctness pins here: the paper's worked example, an
independent pure-Python implementation (different data structure — per-
word pair scans vs incremental), determinism, and tie/stop semantics."""

import pytest
from collections import Counter
from pyspark.sql import Row

from waimak_spark.functions.text import (
    BPE_EOW,
    bpe_learn,
    learn_bpe_merges,
    word_frequencies,
)


def _ref_bpe(word_freqs, n_merges):
    """Independent reference: same greedy rule, re-derived each round
    from scratch strings (no incremental state)."""
    vocab = {}
    for w, c in word_freqs:
        key = " ".join(list(w) + [BPE_EOW])
        vocab[key] = vocab.get(key, 0) + c
    out = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for key, c in vocab.items():
            sym = key.split(" ")
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), f = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if f < 2:
            break
        out.append((rank, l, r, f))
        nv = {}
        for key, c in vocab.items():
            sym = key.split(" ")
            res, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(sym[i])
                    i += 1
            k2 = " ".join(res)
            nv[k2] = nv.get(k2, 0) + c
        vocab = nv
    return out


class TestBpeLoop:
    def test_paper_worked_example(self):
        """Sennrich et al. §3.2's shape: with 'low'-family words the
        first merges build up the shared stem."""
        wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        merges = learn_bpe_merges(wf, 4)
        assert merges[0][:3] == (1, "e", "s")      # freq 9 (newest+widest)
        assert merges[1][:3] == (2, "es", "t")     # freq 9
        assert merges[2][:3] == (3, "est", BPE_EOW)
        assert merges[3][:3] == (4, "l", "o")      # freq 7 (low+lower)
        assert [m[3] for m in merges] == [9, 9, 9, 7]

    def test_matches_independent_reference(self):
        wf = [("banana", 7), ("bandana", 3), ("ananas", 5),
              ("nab", 2), ("a", 9)]
        assert learn_bpe_merges(wf, 12) == _ref_bpe(wf, 12)

    def test_tie_breaks_lexicographically(self):
        # 'ab' and 'cd' both occur twice; ('a','b') < ('c','d')
        wf = [("ab", 2), ("cd", 2)]
        merges = learn_bpe_merges(wf, 1)
        assert merges[0][:3] == (1, "a", "b")

    def test_stops_when_no_pair_repeats(self):
        wf = [("xy", 1), ("zq", 1)]
        assert learn_bpe_merges(wf, 10) == []
        wf = [("aa", 3)]
        merges = learn_bpe_merges(wf, 10)
        # ('a','</w>') and ('a','a') tie at freq 3; '<' sorts before 'a',
        # so the end-of-word pair merges first, then ('a', 'a</w>')
        assert [m[:3] for m in merges] == [(1, "a", BPE_EOW),
                                           (2, "a", "a" + BPE_EOW)]
        assert learn_bpe_merges(wf, 10) == _ref_bpe(wf, 10)


class TestBpeEntry:
    def test_catalog_entry_matches_reference(self, spark, sf_dir):
        from waimak_spark.catalog.text import bpe_merges

        got = [tuple(r) for r in bpe_merges(spark, sf_dir).collect()]
        wf = word_frequencies(
            spark.read.parquet(f"{sf_dir}/documents.parquet"))
        want = _ref_bpe(wf, 16)
        assert got == want
        assert len(got) == 16  # corpus is rich enough for all merges
        # frequencies are non-increasing only per-stem, but every
        # learned merge must occur at least twice
        assert all(m[3] >= 2 for m in got)

    def test_word_frequencies_cap_and_order(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="b b b a a c"),
             Row(doc_id=2, text="a c")])
        wf = word_frequencies(df, cap=2)
        assert wf == [("a", 3), ("b", 3)]  # freq desc, word asc tie-break

    def test_deterministic_across_runs(self, spark, sf_dir):
        from waimak_spark.catalog.text import bpe_merges

        a = [tuple(r) for r in bpe_merges(spark, sf_dir).collect()]
        b = [tuple(r) for r in bpe_merges(spark, sf_dir).collect()]
        assert a == b

    def test_param_validation(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text="a b")])
        with pytest.raises(ValueError, match="n_merges"):
            bpe_learn(df, n_merges=0)
