"""Similarity-search catalog entries over the ``embeddings`` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import similarity as S

QUERY_IDS = list(range(10))


def ann_brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.brute_force_topk(emb, QUERY_IDS, k=5)


# The `ann_lsh_pairs` catalog entry RETIRED in round 9 (PARITY rotation
# ledger): subsumed by `dedup_embedding_cosine`, which exercises the same
# `S.lsh_ann_pairs` machinery on the same embeddings; the operator itself
# stays in functions/similarity.py with its unit tests
# (tests/test_similarity_resolution.py).  Its slot admitted `dsir_select`.


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.ivf_topk(emb, QUERY_IDS, k=5)


def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF index against exact brute force, per query —
    the 'measure, don't guess' gate for the approximate path: a plan
    change that silently wrecks IVF recall turns this entry red (both
    sides are deterministic, so recall is a stable value, and the oracle
    recomputes the identical comparison in SQL)."""
    from pyspark.sql import functions as F

    k = 5
    bf = ann_brute_force_topk(spark, sf_dir).select("query_id", "neighbor_id")
    ivf = ann_ivf_topk(spark, sf_dir).select("query_id", "neighbor_id")
    m = (bf.join(ivf, ["query_id", "neighbor_id"])
         .groupBy("query_id").agg(F.count("*").alias("n")))
    return (bf.select("query_id").distinct()
            .join(m, "query_id", "left")
            .select("query_id",
                    F.round(F.coalesce(F.col("n"), F.lit(0)) / k, 4)
                    .alias("recall_at_k")))


def _recall_oracle() -> str:
    k = 5
    return f"""
        with bf as ({S.brute_force_topk_sql(QUERY_IDS, k=k)}),
        ivf as ({S.ivf_topk_sql(QUERY_IDS, k=k)}),
        m as (
            select bf.query_id, count(*) as n
            from bf join ivf using (query_id, neighbor_id)
            group by bf.query_id
        )
        select q.query_id, round(coalesce(n, 0) / {k}.0, 4) as recall_at_k
        from (select distinct query_id from bf) q
        left join m using (query_id)
    """


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.embedding_cosine_dedup(emb, min_cosine=0.0)


def dedup_embedding_cosine_fixpoint(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.embedding_cosine_dedup_fixpoint(emb, min_cosine=0.0)


def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deterministic Lloyd rounds over the embeddings table — the
    clustering stage a diversity-sampling / cluster-balanced-mixture
    pipeline runs before quota sampling.  Oracle: the identical rounds
    unrolled in SQL (same seed centroids, rounded averages, tie-breaks,
    empty-cluster carry)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.kmeans_clusters(emb)


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization audit (scale + exact integer
    code checksums) — the 4x-compression storage path for a 100 TB
    embedding corpus, certified bit-level against the SQL oracle."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.quantize_int8(emb)


def ann_int8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of int8-quantized cosine top-k against exact float top-k,
    per query — measures what 4x compression costs in retrieval quality
    (scale cancels in cosine, so the quantized side is exact integer
    arithmetic; same measure-don't-guess gate as ann_ivf_recall)."""
    from pyspark.sql import functions as F

    k = 5
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bf = ann_brute_force_topk(spark, sf_dir).select("query_id", "neighbor_id")
    q8 = (S.int8_topk(emb, QUERY_IDS, k=k)
          .select("query_id", "neighbor_id"))
    m = (bf.join(q8, ["query_id", "neighbor_id"])
         .groupBy("query_id").agg(F.count("*").alias("n")))
    return (bf.select("query_id").distinct()
            .join(m, "query_id", "left")
            .select("query_id",
                    F.round(F.coalesce(F.col("n"), F.lit(0)) / k, 4)
                    .alias("recall_at_k")))


def _int8_recall_oracle() -> str:
    k = 5
    return f"""
        with bf as ({S.brute_force_topk_sql(QUERY_IDS, k=k)}),
        q8 as ({S.int8_topk_sql(QUERY_IDS, k=k)}),
        m as (
            select bf.query_id, count(*) as n
            from bf join q8 using (query_id, neighbor_id)
            group by bf.query_id
        )
        select q.query_id, round(coalesce(n, 0) / {k}.0, 4) as recall_at_k
        from (select distinct query_id from bf) q
        left join m using (query_id)
    """



# ---------------------------------------------------------------------------
# "build once, probe many" stored IVF index
# ---------------------------------------------------------------------------

_IVF_IDX_DB_BASE = "wmk_ann_idx"


def _idx_db() -> str:
    """Per-PROCESS stored-index namespace (VERDICT r9 #3).

    The session catalog is per-process while the warehouse directory is
    shared, so under the old single shared database a sibling JVM (a
    measurement lap racing a pytest session) running
    :func:`_clear_superseded` would delete table FILES this process had
    registered and was actively reading — `keep`'s own directory is
    deliberately cleared when unregistered-here, because an
    unregistered leftover is untrustworthy (two stored-index tests
    failed exactly this way in round 9; the mitigation was a process
    rule, "run measurement strictly serially").  Keying the whole
    database on the pid makes cross-process deletion structurally
    impossible: a process only ever creates, drops, or clears inside
    its own namespace, and orphaned namespaces from DEAD pids are swept
    at first use (:func:`_sweep_orphan_idx_namespaces`) so the
    warehouse doesn't accumulate abandoned builds.  Cross-process index
    REUSE was never supported (the in-memory catalog can't see another
    process's registrations, so a fresh process always rebuilt anyway)
    — this trades nothing.  On a real cluster with a SHARED Hive
    metastore the registrations are globally visible and a production
    deployment would key on the dataset fingerprint alone behind the
    metastore's own locking; the pid key is the correct form wherever
    the catalog is process-local, which is every local[] session."""
    import os

    return f"{_IVF_IDX_DB_BASE}_p{os.getpid()}"


_IVF_IDX_DB = _idx_db()
_ORPHANS_SWEPT = False


def _refresh_idx_db_after_fork() -> None:
    """A process that forks AFTER this module imported would otherwise
    inherit the parent's pid-keyed namespace — and once the parent
    exits, the orphan sweep would read that pid as dead and delete the
    live child's files.  Re-key the namespace (and re-arm the sweep) in
    every fork child; ``catalog/curation.py`` imports ``_IVF_IDX_DB``
    inside its functions (late binding), so it picks the new value up.
    Residual caveat: code that did a module-top ``from similarity
    import _IVF_IDX_DB`` before the fork keeps the stale string — the
    library itself never does (tests do, but tests don't fork)."""
    global _IVF_IDX_DB, _ORPHANS_SWEPT
    _IVF_IDX_DB = _idx_db()
    _ORPHANS_SWEPT = False


import os as _os  # noqa: E402

_os.register_at_fork(after_in_child=_refresh_idx_db_after_fork)


def _pid_alive(pid: int) -> bool:
    import os

    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except OSError:
        # EPERM and friends: a process exists but isn't ours — alive
        return True
    return True


def _sweep_orphan_idx_namespaces(spark: SparkSession) -> None:
    """Delete stored-index namespaces whose owning pid is dead — run
    once per process, at first stored-index use.  A LIVE sibling's
    namespace is never touched (os.kill(pid, 0) liveness), which is the
    whole point; a dead pid's directory is garbage by construction
    (its registrations died with its session catalog).  The legacy
    shared `wmk_ann_idx.db` directory (pre-per-process layout) is
    deliberately NOT touched: a still-running pre-upgrade process could
    be registered in it, and deleting it here would reintroduce the
    exact cross-process race this namespace exists to close — it was
    removed once by hand at the upgrade commit and cannot reappear."""
    global _ORPHANS_SWEPT
    if _ORPHANS_SWEPT:
        return
    _ORPHANS_SWEPT = True
    import os
    import re

    from ..filesystem import FileOps

    fops = FileOps(spark)
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    for path in fops.glob(f"{wh}/{_IVF_IDX_DB_BASE}_p*.db"):
        m = re.search(r"_p(\d+)\.db/?$", path)
        if not m or int(m.group(1)) == os.getpid():
            continue
        if not _pid_alive(int(m.group(1))):
            fops.delete(path, recursive=True)


# bump when the index layout or the cell-assignment kernel changes: a
# table from an older build (the metastore persists across rounds) must
# not be trusted to match the current prober
_IVF_IDX_VERSION = "v1"


def _dataset_fingerprint(sf_dir: str,
                         fname: str = "embeddings.parquet") -> str:
    """Content-identity fingerprint of a testdata dataset — every
    stored index is keyed on one, so a driver-side regeneration of the
    testdata in place invalidates the index instead of silently serving
    stale content.  ADVICE r6: the old ``total_size + integer-second
    max(mtime)`` pair collided when a dataset was regenerated within the
    same second with identical total bytes — hash the full per-file
    listing (relative path, size, ``st_mtime_ns``) instead, so any file
    added/removed/renamed/resized/rewritten changes the key."""
    import hashlib
    import os

    path = f"{sf_dir}/{fname}"
    lines = []
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for fname in files:
                full = os.path.join(root, fname)
                st = os.stat(full)
                lines.append(f"{os.path.relpath(full, path)}:"
                             f"{st.st_size}:{st.st_mtime_ns}")
    else:
        st = os.stat(path)
        lines.append(f".:{st.st_size}:{st.st_mtime_ns}")
    digest = hashlib.md5("\n".join(sorted(lines)).encode()).hexdigest()
    return digest[:12]


def _embeddings_fingerprint(sf_dir: str) -> str:
    """The ANN indexes' key: :func:`_dataset_fingerprint` of the
    embeddings table (kept as a named helper — its behavior is
    regression-locked in tests/test_similarity_resolution.py)."""
    return _dataset_fingerprint(sf_dir)


def _ivf_index_name(sf_dir: str) -> tuple[str, str]:
    """(dataset tag, managed-table label) for ``sf_dir``'s stored index."""
    import os
    import re

    tag = re.sub(r"[^0-9A-Za-z]+", "_",
                 os.path.basename(os.path.normpath(sf_dir)))
    label = (f"ivf_cells_{tag}_{_embeddings_fingerprint(sf_dir)}"
             f"_{_IVF_IDX_VERSION}")
    return tag, label


def drop_ivf_index(spark: SparkSession, sf_dir: str) -> None:
    """Drop ``sf_dir``'s stored IVF index so the next probe rebuilds it.

    For harnesses that must time the one-time BUILD separately from the
    amortized warm probe (tools/scale_check.py — the operator's whole
    point is build-once/probe-many, so one conflated number misreads as
    a per-probe cost); also usable to reclaim the warehouse space."""
    _, label = _ivf_index_name(sf_dir)
    spark.sql(f"drop table if exists {_IVF_IDX_DB}.{label}")


def _ivf_index_table(spark: SparkSession, sf_dir: str) -> str:
    """Get-or-build the stored IVF index: ``ivf_index_frame`` persisted
    as a managed table BUCKETED by ``cell`` (one bucket per centroid)
    through the framework's ``write_bucketed_table`` — the shuffle is
    paid once at build, and every probe scans only its probed buckets.
    Builds of superseded fingerprints for the same dataset are dropped."""
    from .. import Waimak

    tag, label = _ivf_index_name(sf_dir)
    name = f"{_IVF_IDX_DB}.{label}"
    if not spark.catalog.tableExists(name):
        # two-pass stale cleanup shared with the IVF-PQ builder — see
        # _clear_superseded for why the warehouse pass clears the kept
        # label's own (unregistered, untrustworthy) directory too
        _clear_superseded(spark, f"ivf_cells_{tag}_", label)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        idx = S.ivf_index_frame(emb)
        (Waimak.spark_flow(spark)
         .open(label, lambda c, df=idx: df)
         .write_bucketed_table(_IVF_IDX_DB, label, ["cell"],
                               S.IVF_CENTROIDS,
                               sort_cols=["cell", "vec_id"])
         .execute())
    return name


def ann_ivf_probe_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k ANN against the STORED bucketed IVF index — the posture a
    100 TB vector store runs: the corpus's cell assignments and norms are
    computed and shuffled exactly once at build time; each probe prunes
    the scan to its probed buckets (plan-locked ``SelectedBucketsCount``)
    and broadcasts the tiny query side.  The oracle recomputes the whole
    index + probe in SQL, certifying the stored path end-to-end."""
    tbl = _ivf_index_table(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.ivf_topk_from_index(spark.table(tbl), emb, QUERY_IDS, k=5)


# ---------------------------------------------------------------------------
# incremental IVF index APPEND (round 9; round-13 admission candidate per
# the PARITY rotation ledger) — the maintenance path a 100 TB vector store
# needs between rebuilds: new batches land in the stored bucketed index
# WITHOUT touching the resident data.  Cell assignment is row-local (fixed
# seeded centroids), so index(A) ∪ index(B) == index(A ∪ B) exactly, and
# the probe over an appended index is bit-identical to a full build —
# which is what licenses reusing ann_ivf_topk's static full-corpus oracle.
# ---------------------------------------------------------------------------

#: batch split for the demo entry: vec_id % 5 == 0 is the "late batch"
#: appended after the initial build (a deterministic, data-independent
#: ~20% of the corpus)
_APPEND_BATCH_MOD = 5
#: table property stamped AFTER the append completes — a crash between
#: the build and the append leaves the property off, and the next caller
#: rebuilds instead of probing a corpus-minus-batch index
_APD_DONE_PROP = "wmk.append.done"
_IVF_APD_VERSION = "v1"


def _ivf_append_index_name(sf_dir: str) -> tuple[str, str]:
    import os
    import re

    tag = re.sub(r"[^0-9A-Za-z]+", "_",
                 os.path.basename(os.path.normpath(sf_dir)))
    label = (f"ivf_apd_{tag}_{_embeddings_fingerprint(sf_dir)}"
             f"_{_IVF_APD_VERSION}")
    return tag, label


def drop_ivf_append_index(spark: SparkSession, sf_dir: str) -> None:
    _, label = _ivf_append_index_name(sf_dir)
    spark.sql(f"drop table if exists {_IVF_IDX_DB}.{label}")


def ivf_index_append(spark: SparkSession, table_name: str,
                     new_rows, sf_dir: str | None = None) -> None:
    """Append a new batch's ``ivf_index_frame`` rows to an existing
    stored bucketed IVF index table.  Only the batch is scanned,
    featurized, and shuffled — the resident index files are untouched;
    Spark refuses a mismatched bucket spec, so co-location can't drift.
    The completion property is re-stamped by the CALLER once the whole
    batch sequence is done."""
    from .. import Waimak

    db, label = table_name.split(".", 1)
    idx = S.ivf_index_frame(new_rows)
    (Waimak.spark_flow(spark)
     .open(label, lambda c, df=idx: df)
     .write_bucketed_table(db, label, ["cell"], S.IVF_CENTROIDS,
                           sort_cols=["cell", "vec_id"], append=True)
     .execute())


def _ivf_appended_index_table(spark: SparkSession, sf_dir: str) -> str:
    """Get-or-build the append-demo index: initial build on the resident
    ~80% (``vec_id % 5 != 0``), then :func:`ivf_index_append` of the late
    batch, then the completion property.  A table found WITHOUT the
    property is a crash leftover (build done, append lost) and is rebuilt
    — the same stale-build hygiene as the fingerprint keying."""
    from .. import Waimak

    tag, label = _ivf_append_index_name(sf_dir)
    name = f"{_IVF_IDX_DB}.{label}"
    if spark.catalog.tableExists(name):
        props = {r["key"]: r["value"] for r in spark.sql(
            f"show tblproperties {name}").collect()}
        if props.get(_APD_DONE_PROP) == "1":
            return name
        spark.sql(f"drop table if exists {name}")
    _clear_superseded(spark, f"ivf_apd_{tag}_", label)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    resident = emb.where(F.col("vec_id") % _APPEND_BATCH_MOD != 0)
    batch = emb.where(F.col("vec_id") % _APPEND_BATCH_MOD == 0)
    idx = S.ivf_index_frame(resident)
    (Waimak.spark_flow(spark)
     .open(label, lambda c, df=idx: df)
     .write_bucketed_table(_IVF_IDX_DB, label, ["cell"],
                           S.IVF_CENTROIDS,
                           sort_cols=["cell", "vec_id"])
     .execute())
    ivf_index_append(spark, name, batch)
    spark.sql(f"alter table {name} "
              f"set tblproperties('{_APD_DONE_PROP}'='1')")
    return name


def ann_ivf_probe_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k ANN against a stored IVF index maintained by APPEND: the
    resident corpus is indexed once, the late batch lands via
    :func:`ivf_index_append` (batch-only scan, resident files untouched,
    bucket pruning preserved), and the probe must equal a full-corpus
    build bit-for-bit — certified by reusing ``ann_ivf_topk``'s static
    full-corpus oracle.  Round-13 admission candidate per the PARITY
    rotation ledger; until then verified by tests/test_ivf_append.py
    every pytest run and measured through the catalog EXTRA_ENTRIES
    registry."""
    tbl = _ivf_appended_index_table(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.ivf_topk_from_index(spark.table(tbl), emb, QUERY_IDS, k=5)


def _ivf_probe_appended_oracle() -> str:
    """Static oracle: append-then-probe must equal the full-corpus IVF
    top-k, so the oracle IS the full-corpus SQL."""
    return S.ivf_topk_sql(QUERY_IDS, k=5)


# ---------------------------------------------------------------------------
# "build once, probe many" stored IVF-PQ index (VERDICT r7 #3: the inline
# composed probe's 10x cost was dominated by the per-call re-featurize —
# the stored (id, cell, codes) frame plus the persisted codebooks make the
# probe a bucket-pruned scan of 32 single-byte codes per vector with zero
# corpus-side Python; round-10 catalog admission candidate per the ledger)
# ---------------------------------------------------------------------------

# v2 (round 9): the stored catalog index switched from FITTED Lloyd
# codebooks to the SEEDED data-independent init (pq_fit n_iters=0) so the
# round-10 admission can carry a STATIC SQL oracle — fitted books are
# data-dependent, and a static oracle string embedding them would be
# silently invalidated by a driver-side testdata regeneration (the
# decision PARITY's "Oracle design for the PQ entry" records).  Fitted
# books keep their recall/quality gates in tests/test_pq.py where the
# fit runs per-sf.  The version bump invalidates stale fitted indexes.
_IVF_PQ_IDX_VERSION = "v2"


def _ivf_pq_index_names(sf_dir: str) -> tuple[str, str, str]:
    """(dataset tag, cells-table label, books-table label) for ``sf_dir``'s
    stored IVF-PQ index — keyed on the same content fingerprint as the
    stored IVF table, so regenerated data invalidates both."""
    import os
    import re

    tag = re.sub(r"[^0-9A-Za-z]+", "_",
                 os.path.basename(os.path.normpath(sf_dir)))
    fp = _embeddings_fingerprint(sf_dir)
    return (tag,
            f"ivfpq_cells_{tag}_{fp}_{_IVF_PQ_IDX_VERSION}",
            f"ivfpq_books_{tag}_{fp}_{_IVF_PQ_IDX_VERSION}")


def drop_ivf_pq_index(spark: SparkSession, sf_dir: str) -> None:
    """Drop ``sf_dir``'s stored IVF-PQ pair so the next probe rebuilds it
    (tools/scale_check.py uses this to split the one-time BUILD from the
    amortized warm probe, like :func:`drop_ivf_index`)."""
    _, cells, books = _ivf_pq_index_names(sf_dir)
    for label in (cells, books):
        spark.sql(f"drop table if exists {_IVF_IDX_DB}.{label}")


def _clear_superseded(spark: SparkSession, prefix: str, keep: str) -> None:
    """Stale-build cleanup shared by the stored IVF-PQ builder (same two
    passes as :func:`_ivf_index_table`): drop REGISTERED tables of other
    fingerprints with this dataset's prefix, then clear EVERY warehouse
    directory under the prefix — including ``keep``'s own, because the
    session catalog is per-process while the warehouse persists: an
    unregistered leftover from an earlier process is not trustworthy and
    makes ``saveAsTable`` refuse with LOCATION_ALREADY_EXISTS.  Cleared
    through the Hadoop-FS abstraction so any warehouse scheme either
    works or fails loudly."""
    from ..filesystem import FileOps

    _sweep_orphan_idx_namespaces(spark)
    spark.sql(f"create database if not exists {_IVF_IDX_DB}")
    for t in spark.catalog.listTables(_IVF_IDX_DB):
        if t.name.startswith(prefix) and t.name != keep:
            spark.sql(f"drop table if exists {_IVF_IDX_DB}.{t.name}")
    fops = FileOps(spark)
    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    for stale in fops.glob(f"{wh}/{_IVF_IDX_DB}.db/{prefix}*"):
        fops.delete(stale, recursive=True)


def _ivf_pq_index_tables(spark: SparkSession,
                         sf_dir: str) -> tuple[str, str]:
    """Get-or-build the stored IVF-PQ pair: the ``(id, cell, codes)``
    frame persisted BUCKETED by ``cell`` (one bucket per centroid, the
    stored-IVF recipe — each probe scans only its probed buckets) plus
    the fitted codebooks as a tiny ``(s, c, w)`` table (m×k rows = 4096
    doubles) so a probe-only process never re-runs the Lloyd fit.  One
    corpus pass builds both: the fit's materialized base feeds the
    featurize."""
    from .. import Waimak

    tag, cells_label, books_label = _ivf_pq_index_names(sf_dir)
    cells_name = f"{_IVF_IDX_DB}.{cells_label}"
    books_name = f"{_IVF_IDX_DB}.{books_label}"
    if not (spark.catalog.tableExists(cells_name)
            and spark.catalog.tableExists(books_name)):
        # a PARTIAL build (crash between the two writes) may have left
        # one table registered: drop both registrations first, else the
        # warehouse pass below would delete a registered table's files
        # while its catalog entry survives and errorifexists refuses
        drop_ivf_pq_index(spark, sf_dir)
        _clear_superseded(spark, f"ivfpq_cells_{tag}_", cells_label)
        _clear_superseded(spark, f"ivfpq_books_{tag}_", books_label)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        # n_iters=0: seeded data-independent codebooks (see the
        # _IVF_PQ_IDX_VERSION note) — pq_fit still materializes the
        # normalized base the featurize pass reuses
        base, books = S.pq_fit(emb, n_iters=0)
        idx = S.ivf_pq_index_frame(emb, books, base=base)
        (Waimak.spark_flow(spark)
         .open(cells_label, lambda c, df=idx: df)
         .write_bucketed_table(_IVF_IDX_DB, cells_label, ["cell"],
                               S.IVF_CENTROIDS,
                               sort_cols=["cell", "vec_id"])
         .execute())
        from ..functions.util import local_rows_df

        rows = [(s + 1, c + 1, books[s][c])
                for s in range(len(books)) for c in range(len(books[s]))]
        (local_rows_df(spark, rows, "s int, c int, w array<double>")
         .coalesce(1)
         .write.mode("overwrite").saveAsTable(books_name))
    return cells_name, books_name


def _load_pq_books(spark: SparkSession,
                   books_name: str) -> list[list[list[float]]]:
    """Reload stored codebooks as the nested-list shape every PQ kernel
    takes.  Bounded collect: m×k rows carrying 4096 doubles total — the
    same size as the fit's own codebook collect."""
    rows = spark.table(books_name).collect()
    m = max(r["s"] for r in rows)
    k = max(r["c"] for r in rows)
    books: list[list[list[float]] | None] = [[None] * k for _ in range(m)]
    for r in rows:
        books[r["s"] - 1][r["c"] - 1] = list(r["w"])
    return books


def ann_ivf_pq_probe_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k ANN against the STORED bucketed IVF-PQ index: codebooks and
    the compressed ``(id, cell, codes)`` frame are built exactly once per
    dataset fingerprint; each probe reloads the 4096-double codebooks,
    prunes the scan to its probed buckets (``SelectedBucketsCount``,
    plan-locked in test_pq.py), broadcasts the per-query LUTs, and scores
    candidates fully JVM-side.  Output is identical to the inline
    :func:`waimak_spark.functions.similarity.ivf_pq_topk` over the same
    corpus with the same (seeded) codebooks (round-trip-locked).
    Round-10 catalog admission per the PARITY rotation ledger (retires
    `ann_int8_recall`, staged then fronted round 11); its static oracle
    is :func:`_pq_probe_stored_oracle`, lockstep-tested every pytest run
    (tests/test_pq.py) the way the round-9 DSIR admission was."""
    cells_name, books_name = _ivf_pq_index_tables(spark, sf_dir)
    books = _load_pq_books(spark, books_name)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.ivf_pq_topk_from_index(spark.table(cells_name), emb, books,
                                    QUERY_IDS, k=5)


def _pq_probe_stored_oracle() -> str:
    """Static DuckDB oracle for the stored IVF-PQ probe: the stored index
    uses SEEDED data-independent codebooks (``_pq_init`` — see the
    ``_IVF_PQ_IDX_VERSION`` note), so the exact codebook literals are
    computable here with no data in hand and the string never drifts
    from the stored tables' content."""
    books = S._pq_init(S.PQ_M, S.PQ_K, 64 // S.PQ_M)
    return S.ivf_pq_topk_sql(books, QUERY_IDS, k=5)


def sample_mmr_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximal-marginal-relevance selection trace (Carbonell &
    Goldstein 1998) — the relevance-aware member of the diverse-selection
    family (k-center is the pure-coverage member).  Since round 11 the
    greedy loop runs over the top-``MMR_POOL`` (4096) candidates by
    relevance (one distributed TakeOrderedAndProject pass — VERDICT r10
    #5), so each of the k argmax iterations scans a BOUNDED frame: 10×
    ratio 6.7 → 3.8, 1× unchanged.  The pool cut is deterministic and
    embedded in the SQL oracle, so the trace stays exactly
    oracle-checkable at any scale.  Staged round-11 → fronts round 12
    per the rotation ledger; verified by tests/test_mmr.py every pytest
    run."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.mmr_select(emb)


def _mmr_oracle() -> str:
    return S.mmr_select_sql()


def ann_ivf_pq_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage IVF-PQ retrieval with exact refinement (the FAISS
    RefineFlat pattern): ADC shortlist at k*refine_factor from the
    compressed codes, exact cosine re-rank on the shortlist only — the
    recall-recovery step quantization error makes necessary; the exact
    stage touches |queries|*k*rf raw vectors, never the corpus.  Uses
    the same static seeded codebooks as the stored-index entry so the
    oracle's literals are computable with no data in hand.  Post-runway
    extension measured through the catalog EXTRA_ENTRIES registry;
    verified by tests/test_pq_refine.py every pytest run."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = S._pq_init(S.PQ_M, S.PQ_K, 64 // S.PQ_M)
    return S.ivf_pq_refined_topk(emb, books, QUERY_IDS, k=5)


def _pq_refined_oracle() -> str:
    books = S._pq_init(S.PQ_M, S.PQ_K, 64 // S.PQ_M)
    return S.ivf_pq_refined_topk_sql(books, QUERY_IDS, k=5)


def embedding_kmeanspar_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means|| oversampling (Bahmani et al. 2012) — the distributed
    initialization the kmeans family needs at 100 TB: a constant number
    of rounds, each one map (running d2 vs the round's new centers) +
    one bounded top-l, then a weighting pass; the corpus never
    shuffles.  Post-runway extension measured through the catalog
    EXTRA_ENTRIES registry; verified by tests/test_kmeanspar.py every
    pytest run."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.kmeanspar_oversample(emb)


def _kmeanspar_oracle() -> str:
    return S.kmeanspar_oversample_sql()


def sample_kcenter_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center diverse sampling trace (Sener & Savarese 2018) —
    ADMITTED round 11 per the PARITY rotation ledger (pulled forward
    from its round-12 runway slot by the backlog fix, fronting in the
    slot freed by the `dedup_embedding_cosine` retirement); verified by
    tests/test_kcenter.py's lockstep + reference suite every pytest
    run."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.kcenter_select(emb)


def embedding_cluster_exemplars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster representative vectors (nearest-to-centroid top-3 after
    the k-means rounds) — the exemplar-selection step of a diversity
    curation pipeline."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.kmeans_exemplars(emb)


def dedup_semantic_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): k-means blocks
    the corpus, pairs are compared only within a cluster, and each
    near-duplicate group keeps its least-centroid-similar member.  Output
    is one verdict row per document (linear, not a pair listing)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.semantic_dedup(emb)


ENTRIES = {
    "embedding_kmeans": {
        "fn": embedding_kmeans,
        "oracle": S.kmeans_clusters_sql(),
    },
    "ann_brute_force_topk": {
        "fn": ann_brute_force_topk,
        "oracle": S.brute_force_topk_sql(QUERY_IDS, k=5),
    },
    "ann_ivf_topk": {
        "fn": ann_ivf_topk,
        "oracle": S.ivf_topk_sql(QUERY_IDS, k=5),
    },
    "ann_ivf_recall": {
        "fn": ann_ivf_recall,
        "oracle": _recall_oracle(),
    },
    "ann_ivf_probe_stored": {
        "fn": ann_ivf_probe_stored,
        # identical semantics to the inline path — the index stores
        # exactly ivf_index_frame, so the same SQL certifies the build
        "oracle": S.ivf_topk_sql(QUERY_IDS, k=5),
    },
    "embedding_cluster_exemplars": {
        "fn": embedding_cluster_exemplars,
        "oracle": S.kmeans_exemplars_sql(),
    },
    "embedding_quantize_int8": {
        "fn": embedding_quantize_int8,
        "oracle": S.quantize_int8_sql(),
    },
    # `ann_int8_recall` RETIRED round 10 per the PARITY rotation ledger
    # (subsumed by ann_ivf_pq_probe_stored's stronger compressed-scoring
    # recall story; the int8 operators keep their unit tests and
    # `embedding_quantize_int8` keeps the machinery officially covered)
    "ann_ivf_pq_probe_stored": {
        "fn": ann_ivf_pq_probe_stored,
        "oracle": _pq_probe_stored_oracle(),
    },
    "dedup_embedding_cosine": {
        "fn": dedup_embedding_cosine,
        "oracle": S.embedding_cosine_dedup_sql(min_cosine=0.0),
    },
    "dedup_embedding_cosine_fixpoint": {
        "fn": dedup_embedding_cosine_fixpoint,
        "oracle": S.embedding_cosine_dedup_fixpoint_sql(min_cosine=0.0),
    },
    "dedup_semantic_kmeans": {
        "fn": dedup_semantic_kmeans,
        "oracle": S.semantic_dedup_sql(),
    },
    # round-11 admission (PARITY rotation ledger): fronts round 11 in the
    # slot freed by the same-round `dedup_embedding_cosine` retirement
    # (`dedup_embedding_cosine_fixpoint` keeps the cosine-dedup machinery
    # officially covered — it composes the retired entry's kernel)
    "sample_kcenter_diverse": {
        "fn": sample_kcenter_diverse,
        "oracle": S.kcenter_select_sql(),
    },
    # round-11 STAGED admission (fronts round 12 per the rotation ledger)
    "sample_mmr_diverse": {
        "fn": sample_mmr_diverse,
        "oracle": _mmr_oracle(),
    },
    # round-12 STAGED admissions (front round 13 per the rotation ledger)
    "ivf_probe_appended": {
        "fn": ann_ivf_probe_appended,
        # index(A) ∪ index(B) == index(A ∪ B) exactly (union-commutes
        # test-locked), so the STATIC full-corpus probe SQL certifies the
        # appended index verbatim
        "oracle": _ivf_probe_appended_oracle(),
    },
    "embedding_kmeanspar_init": {
        "fn": embedding_kmeanspar_init,
        "oracle": _kmeanspar_oracle(),
    },
}
