"""Streaming catalog entries: Structured Streaming pipelines whose final
answer is deterministic, so they get a REAL DuckDB oracle (the same SQL as
the batch equivalent) instead of a rows-only check.

The entry runs the whole ``events`` table through a file stream with
``availableNow`` (bounded backfill — the production pattern for replaying
history through the same code that serves the live stream), a watermarked
tumbling-window aggregation, and a memory sink in complete mode, then
returns the sink table.

Scale notes (100 TB posture): the streaming plan is identical to the batch
window agg — partial aggregation per micro-batch, state bounded by the
watermark. The memory sink is for the correctness gate only (results are
window counts, ~thousands of rows); a production run writes the same query
to parquet/kafka with a checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.ops import watermarked_window_agg

NANOS = 1_000_000_000

# Streaming state-store partition count for the catalog's bounded
# backfills: sized to input VOLUME via state_partitions_for_backfill
# (each stateful operator creates one state store PER shuffle partition
# per side, and every micro-batch commits a delta file to each — at 32
# shuffle partitions the stream-stream join pays 64+ store commits for a
# pair set of a few thousand rows).  The rule's floor (4) applies at the
# gate's MB-scale inputs; a 100 TB backfill lands at the 2048 cap.  See
# streaming/ops.py:state_partitions_for_backfill for the full rationale
# and PARITY.md for the measured 1x/10x numbers with the rule applied.


class _stream_state_sizing:
    """Scoped shuffle-partition override for a streaming query start —
    the conf is read at first micro-batch planning and baked into the
    checkpoint, so it only needs to hold across start()+awaitTermination;
    the session value is restored for everything after.

    The streaming state-store partition count can ONLY come from
    ``spark.sql.shuffle.partitions`` (it is baked per-query at start), so
    unlike the batch fixpoint this override is irreducible — the catalog
    entries therefore apply it to a throwaway ``spark.newSession()``
    child (own SQLConf, shared SparkContext), never to the caller's
    session, so concurrently scheduled actions keep their defaults (see
    ``_run_session``).

    ``input_paths``: the backfill's source files OR directories (the
    normal Spark-written parquet layout is a directory); sizes are
    summed recursively — a cluster deployment would sum FileStatus sizes
    the same way."""

    def __init__(self, spark: SparkSession, input_paths: tuple = ()):
        self.spark = spark
        self.input_paths = input_paths

    def __enter__(self):
        import os

        from ..streaming.ops import state_partitions_for_backfill

        def _size(path: str) -> int:
            if os.path.isdir(path):
                return sum(_size(e.path) for e in os.scandir(path))
            return os.path.getsize(path)

        total = 0
        for p in self.input_paths:
            try:
                total += _size(p)
            except OSError:
                pass
        parts = state_partitions_for_backfill(total)
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(parts))

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)
        return False


def _run_session(spark: SparkSession) -> SparkSession:
    """A throwaway child session for one backfill run: own SQLConf (so
    the state-sizing override has zero blast radius on the caller's
    session — the parallel executor may be planning OTHER actions right
    now), shared SparkContext (no new JVM state).  The memory sink
    registers its table in the child; ``_collect_into_caller`` drains it
    back into the caller's session and drops the view so the child holds
    nothing once the entry returns."""
    return spark.newSession()


#: Above this many sink rows the drain stops round-tripping the answer
#: through the driver (pandas) and goes through a distributed parquet
#: write+read instead — same bounded-collect-with-distributed-fallback
#: rule as ``FIXPOINT_LOCAL_MAX_EDGES`` (functions/similarity.py).  A
#: complete-mode sink's size scales with the answer, not the corpus, but
#: a 10x backfill already put ~930k session rows (~30 MB) through the
#: driver and cost ~9 s + neighbor-visible GC pressure (measured,
#: PARITY round-7 deltas); production streams write parquet/kafka
#: directly and never hit this path at all.
DRAIN_LOCAL_MAX_ROWS = 100_000

#: Per-entry staging root for the large-sink drain: OVERWRITE per
#: entry name, so repeated bench/verify laps rewrite one answer-sized
#: folder instead of accumulating (entries never run concurrently with
#: themselves WITHIN a session; the fixed sink NAME already assumes
#: that).  The default is scoped by the caller's Spark application id
#: (VERDICT r7 #8: a fixed path shared by concurrent bench/verify
#: PROCESSES would let two simultaneous laps of the same entry race on
#: one folder).  Overridable via ``spark.waimak.streaming.drainDir``
#: because the default is node-local: on a real cluster the caller's
#: executors must read what the child's executors wrote, so point it at
#: a shared filesystem.
DRAIN_DIR_CONF = "spark.waimak.streaming.drainDir"
_DRAIN_DIR_DEFAULT = "/tmp/waimak_stream_drain"


def _drain_root(spark: SparkSession) -> str:
    override = spark.conf.get(DRAIN_DIR_CONF, None)
    if override:
        # a shared-FS override is caller-managed: never prune it
        return override
    _prune_stale_drain_dirs(exclude=spark.sparkContext.applicationId)
    root = f"{_DRAIN_DIR_DEFAULT}/{spark.sparkContext.applicationId}"
    # ADVICE r8: tie liveness to PROCESS ACTIVITY, not to the last
    # subdir create/delete — the large-sink drain hands back a lazy
    # spark.read.parquet over this folder, and a caller re-scanning that
    # frame past _DRAIN_STALE_S would otherwise see a sibling process
    # prune it mid-scan (mtime only moves on child churn).  Touching the
    # app dir on every _drain_root call means any session that keeps
    # draining keeps its folder's clock fresh.
    import os

    try:
        os.utime(root)
    except OSError:
        pass  # not created yet — mkdir time becomes the fresh mtime
    return root


#: age after which a sibling app-id drain folder is considered a dead
#: process's leftovers — a LIVE lap rewrites its folder far more often
_DRAIN_STALE_S = 6 * 3600


def _prune_stale_drain_dirs(exclude: str) -> None:
    """Best-effort local-FS prune of other applications' drain folders
    (the app-id scoping that stopped concurrent-lap races would
    otherwise leak one answer-sized folder per process forever).
    Age-gated so a concurrently RUNNING lap's folder is never touched —
    deleting only by name would reintroduce exactly the race the
    scoping fixed."""
    import os
    import shutil
    import time

    try:
        entries = os.listdir(_DRAIN_DIR_DEFAULT)
    except OSError:
        return
    now = time.time()
    for name in entries:
        if name == exclude:
            continue
        path = os.path.join(_DRAIN_DIR_DEFAULT, name)
        try:
            if now - os.path.getmtime(path) > _DRAIN_STALE_S:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            pass


def _sink_rows_from_progress(q, complete: bool,
                             run: SparkSession | None = None) -> int | None:
    """Row count of a finished memory sink from the query's own progress
    events — free metadata replacing a ``count()`` job whose fixed
    overhead (~0.15-0.25 s warmed, measured in the round-8 drain
    decomposition) rivaled the drain's actual data copy.  ``complete``
    mode: the final batch rewrites the whole answer, so its sink
    ``numOutputRows`` IS the table size; append mode: batches accumulate,
    so the counts sum.  Returns ``None`` (→ the caller falls back to one
    count job) whenever the history cannot vouch for the total: no
    events, an unreporting sink (-1), or an append history at the
    retention cap (``spark.sql.streaming.numRecentProgressUpdates``,
    read from the owning session — a LOWERED cap must lower the guard,
    else dropped events would undercount) where dropped events would
    undercount — an undercount must never route an oversized sink
    through the driver-local path."""
    try:
        counts = [p["sink"]["numOutputRows"] for p in q.recentProgress]
    except Exception:
        return None
    if not counts or any(c is None or c < 0 for c in counts):
        return None
    if complete:
        return counts[-1]
    cap = 100
    if run is not None:
        try:
            cap = int(run.conf.get(
                "spark.sql.streaming.numRecentProgressUpdates", "100"))
        except (TypeError, ValueError):
            pass
    if len(counts) >= cap:
        return None
    return sum(counts)


def _collect_into_caller(spark: SparkSession, run: SparkSession,
                         name: str, n_rows: int | None = None) -> DataFrame:
    """Drain a memory-sink table out of the throwaway child session.

    ADVICE r6: returning ``run.table(name)`` directly kept one child
    session + one in-memory sink result alive PER INVOCATION (repeated
    bench/verify laps accumulated them in the JVM).  The sink holds the
    final answer of a bounded backfill — window counts / sessions /
    distinct keys, the same rows the caller is about to collect anyway —
    so localize them into the CALLER's session and drop the child's sink
    view; the child then holds no state and is released deterministically.

    Two paths, chosen by answer size (``DRAIN_LOCAL_MAX_ROWS``):

    * small (gate/bench scale): Arrow-native round trip —
      ``sink.toArrow()`` → ``createDataFrame(table, schema)`` skips the
      pandas hop entirely (VERDICT r8 #6: the hop paid Arrow→pandas
      block consolidation + pandas→Arrow re-conversion per drain;
      isolated min-of-6 A/B on ``streaming_tumbling_counts`` at sf0.1:
      1.415 s pandas vs 1.185 s Arrow, −16%, closing the entry to ~1.0x
      its round-6 number — the residual the round-8 verdict left open).
      The explicit sink schema keeps the dtype round trip exact.  (The
      older Row-object path pickled and type-verified per row, ~0.5-1 s
      per larger sink — PARITY round-7 deltas.)
    * large: distributed parquet write from the child + read in the
      caller — the answer never transits the driver (a ~1M-row sink
      OOMs a default-sized driver and drags neighbor queries through
      GC), the write parallelism is the sink's own, and the fixed
      per-entry folder is overwritten per invocation so laps stay
      bounded on disk."""
    sink = run.table(name)
    try:
        if n_rows is None:
            n_rows = sink.count()
        if n_rows <= DRAIN_LOCAL_MAX_ROWS:
            tbl = sink.toArrow()
            return spark.createDataFrame(tbl, sink.schema)
        path = f"{_drain_root(spark)}/{name}"
        sink.write.mode("overwrite").parquet(path)
        return spark.read.schema(sink.schema).parquet(path)
    finally:
        run.catalog.dropTempView(name)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream over the events table with its RAW on-disk schema (a
    stream's declared schema must match the files — normalization happens
    inside the streaming plan, see ``_ts_ev``)."""
    from .events import _events_raw

    schema = _events_raw(spark, sf_dir).schema
    # the file-stream source wants a directory: stream the sf dir filtered
    # down to the events file
    return (spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir))


def _ts_ev(src: DataFrame) -> F.Column:
    """Event-time column (second precision TIMESTAMP) from whatever
    physical flavor ``ts`` arrived in, truncation-exact vs the nanos
    arithmetic the batch queries use."""
    from .events import epoch_nanos_expr

    nanos = epoch_nanos_expr(dict(src.dtypes).get("ts", ""))
    return F.expr(f"timestamp_seconds(({nanos}) div {NANOS})")


def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming replica of the batch ``tumbling_window_counts`` query —
    the oracle is the SAME SQL, proving the incremental path computes the
    identical answer.

    ``ts`` is normalized to epoch nanos; integer-div to seconds before
    the timestamp cast so bucket assignment is exact (floor(ns/300e9) ==
    floor((ns div 1e9)/300) — truncation composes)."""
    # the file-stream's declared schema must match the files, so take the
    # RAW on-disk schema and normalize ts inside the streaming plan
    run = _run_session(spark)
    src = _events_stream(run, sf_dir)
    with_ts = src.withColumn("ts_ev", _ts_ev(src))
    windowed = watermarked_window_agg(
        with_ts, "ts_ev", "5 minutes", "10 minutes",
        aggs=[F.count("*").alias("n"),
              F.round(F.sum("value"), 4).alias("sum_value")],
        group_cols=["event_type"],
    )
    out = windowed.select(
        F.col("window_start").cast("long").alias("window_start"),
        "event_type", "n", "sum_value")

    # FIXED sink name (a per-invocation uuid would leak one registered
    # memory-sink table per call); it registers in the CHILD session, so
    # it can never collide with a concurrent caller's run
    name = "stream_tumbling_counts_sink"
    with _stream_state_sizing(run, (f"{sf_dir}/events.parquet",)):
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination()
        q.stop()
    return _collect_into_caller(
        spark, run, name, _sink_rows_from_progress(q, complete=True,
                                                   run=run))


STREAMING_TUMBLING_ORACLE = """
    select (epoch_ns(ts) // 300000000000) * 300 as window_start,
           event_type,
           count(*) as n,
           round(sum(value), 4) as sum_value
    from events
    group by 1, 2
"""


def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING (overlapping) event-time windows — 10-minute windows
    every 5 minutes, so each event lands in exactly two windows: the
    overlap is what tumbling windows cannot express (rolling rates,
    smoothed counters).  Same incremental shape as the tumbling entry
    (watermarked window agg, complete-mode backfill); the oracle
    materializes each event's two candidate window starts and filters
    by containment — the definition Spark's F.window implements.
    Post-runway extension measured through the catalog EXTRA_ENTRIES
    registry; verified by tests/test_streaming.py every pytest run."""
    run = _run_session(spark)
    src = _events_stream(run, sf_dir)
    with_ts = src.withColumn("ts_ev", _ts_ev(src))
    windowed = watermarked_window_agg(
        with_ts, "ts_ev", "10 minutes", "10 minutes",
        aggs=[F.count("*").alias("n"),
              F.round(F.sum("value"), 4).alias("sum_value")],
        group_cols=["event_type"],
        slide="5 minutes",
    )
    out = windowed.select(
        F.col("window_start").cast("long").alias("window_start"),
        "event_type", "n", "sum_value")
    name = "stream_sliding_counts_sink"
    with _stream_state_sizing(run, (f"{sf_dir}/events.parquet",)):
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination()
        q.stop()
    return _collect_into_caller(
        spark, run, name, _sink_rows_from_progress(q, complete=True,
                                                   run=run))


STREAMING_SLIDING_ORACLE = """
    with ev as (
        select epoch_ns(ts) // 1000000000 as t, event_type, value
        from events
    ), w as (
        select unnest([(t // 300) * 300, (t // 300) * 300 - 300])
                   as window_start,
               event_type, value, t
        from ev
    )
    select window_start, event_type, count(*) as n,
           round(sum(value), 4) as sum_value
    from w
    where t >= window_start and t < window_start + 600
    group by 1, 2
"""


SESSION_GAP_S = 1800


def streaming_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ``session_window`` sessionization vs a gaps-and-islands
    SQL oracle: per-user sessions merge events closer than 30 minutes;
    ``session_end`` is last-event + gap (Spark session semantics — a new
    session starts when the inter-event gap is >= the gap, since a window
    starting exactly at the previous session's end does not overlap it).

    Runs in COMPLETE mode over an ``availableNow`` backfill (session
    windows reject update mode): at termination the sink holds every
    session in its final merged state however many micro-batches the
    backfill took, so the incremental operator is value-comparable to the
    batch answer. (Unbounded production streams would use append mode +
    watermark and only emit sessions the watermark has sealed; that
    path's cross-batch state carry is covered by test_streaming.py.)"""
    from ..streaming.ops import sessionize_stream

    run = _run_session(spark)
    src = _events_stream(run, sf_dir)
    with_ts = src.withColumn("ts_ev", _ts_ev(src))
    sess = sessionize_stream(with_ts, "ts_ev", f"{SESSION_GAP_S} seconds",
                             ["user_id"], watermark="1 hour")
    out = sess.select(
        "user_id",
        F.col("session_start").cast("long").alias("session_start"),
        F.col("session_end").cast("long").alias("session_end"),
        "n_events")
    name = "stream_session_counts_sink"
    with _stream_state_sizing(run, (f"{sf_dir}/events.parquet",)):
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination()
        q.stop()
    return _collect_into_caller(
        spark, run, name, _sink_rows_from_progress(q, complete=True,
                                                   run=run))


STREAMING_SESSION_ORACLE = f"""
    with e as (
        select user_id, (epoch_ns(ts) // 1000000000) as tsec from events
    ), marked as (
        select user_id, tsec,
               case when lag(tsec) over w is null
                         or tsec - lag(tsec) over w >= {SESSION_GAP_S}
                    then 1 else 0 end as new_s
        from e
        window w as (partition by user_id order by tsec)
    ), sess as (
        select user_id, tsec,
               sum(new_s) over (partition by user_id order by tsec
                                rows unbounded preceding) as sid
        from marked
    )
    select user_id,
           min(tsec) as session_start,
           max(tsec) + {SESSION_GAP_S} as session_end,
           count(*) as n_events
    from sess
    group by user_id, sid
"""


def streaming_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming stateful deduplication: first-seen (user_id, event_type)
    pairs through ``dropDuplicates`` — the streaming form of exact dedup
    (state keyed by the pair, one row emitted per key ever).

    Only the KEY COLUMNS are returned: which concrete row "wins" per key
    depends on micro-batch arrival order, but the emitted key set is the
    distinct set regardless — deterministic, so it gets a real oracle.

    Scale note: plain ``dropDuplicates`` keeps state per key forever —
    right for a bounded backfill (this gate) or genuinely finite key
    domains; an unbounded production stream bounds state with
    ``dropDuplicatesWithinWatermark`` at the cost of re-emitting keys
    that go quiet for longer than the watermark delay."""
    run = _run_session(spark)
    src = _events_stream(run, sf_dir)
    dd = (src.select("user_id", "event_type")
          .dropDuplicates(["user_id", "event_type"]))
    name = "stream_dedup_pairs_sink"
    with _stream_state_sizing(run, (f"{sf_dir}/events.parquet",)):
        q = (dd.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        q.stop()
    return _collect_into_caller(
        spark, run, name, _sink_rows_from_progress(q, complete=False,
                                                   run=run))


STREAMING_DEDUP_ORACLE = """
    select distinct user_id, event_type from events
"""


# --------------------------------------------------------------------------
# stream-stream interval join: trades (every 3rd event) joined to the
# quotes stream within a 5-minute lookback, per user — the two-sided
# stateful join class (state bounded by watermark + interval width).
# Inner joins emit on match (the watermark only evicts state), so the
# availableNow backfill emits the complete pair set and the batch join is
# an exact oracle.
# --------------------------------------------------------------------------

_SSJ_LOOKBACK_S = 300


def streaming_trade_quote_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.ops import stream_stream_interval_join

    run = _run_session(spark)

    def side(trades: bool) -> DataFrame:
        src = _events_stream(run, sf_dir)
        pred = (F.col("event_id") % 3 == 0 if trades
                else F.col("event_id") % 3 != 0)
        name = "trade" if trades else "quote"
        return (src.where(pred)
                .withColumn(f"{name}_ts", _ts_ev(src))
                .select(F.col("user_id"),
                        F.col("event_id").alias(f"{name}_id"),
                        f"{name}_ts"))

    # watermark=None (backfill-exact): the emitted pair set equals the
    # batch join no matter how the backfill is micro-batched — a delay
    # string would drop cross-batch pairs as late if the file source ever
    # split this into multiple batches (see stream_stream_interval_join)
    joined = stream_stream_interval_join(
        side(True), side(False), ["user_id"],
        "trade_ts", "quote_ts",
        lower=f"{_SSJ_LOOKBACK_S} seconds", upper="0 seconds",
        watermark=None)
    out = joined.select("user_id", "trade_id", "quote_id")
    name = "stream_trade_quote_join_sink"
    with _stream_state_sizing(run, (f"{sf_dir}/events.parquet",)):
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        q.stop()
    return _collect_into_caller(
        spark, run, name, _sink_rows_from_progress(q, complete=False,
                                                   run=run))


STREAMING_SSJ_ORACLE = f"""
    with e as (
        select user_id, event_id, epoch_ns(ts) // 1000000000 as tsec
        from events
    )
    select t.user_id, t.event_id as trade_id, q.event_id as quote_id
    from (select * from e where event_id % 3 = 0) t
    join (select * from e where event_id % 3 != 0) q
      on t.user_id = q.user_id
     and q.tsec >= t.tsec - {_SSJ_LOOKBACK_S}
     and q.tsec <= t.tsec
"""


# ---------------------------------------------------------------------------
# streaming HLL distinct counting (round 9; round-18 admission candidate
# per the PARITY rotation ledger) — the sketch-as-streaming-state demo:
# the register frame is a bounded streaming aggregation (≤ m rows per
# group REGARDLESS of stream length — the state an exact streaming
# count-distinct could never bound), and because register max is
# associative/commutative/idempotent the final state is EXACTLY the
# batch sketch however the micro-batches split, so the entry shares the
# BATCH oracle verbatim (the mergeability argument, proved end-to-end
# through Structured Streaming instead of a unionByName).
# ---------------------------------------------------------------------------


def streaming_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct-trigram certification with the HLL
    REGISTERS maintained as streaming state: a file stream over
    ``documents`` feeds the map-only gram/register expressions, a
    complete-mode streaming max holds ≤ 4096 rows per language, the
    drained final state is estimated caller-side, and the exact
    count-distinct certification runs batch-side (at 100 TB the exact
    side is the run-once path; the stream keeps only the sketch).
    Output and oracle are identical to the batch ``corpus_distinct_hll``
    entry.  Round-18 admission candidate per the PARITY rotation
    ledger; until then verified by tests/test_hll.py every pytest run
    and measured through the catalog EXTRA_ENTRIES registry."""
    from ..functions.sketch import (
        HLL_M,
        hll_estimate,
        hll_gram_stream,
        hll_registers,
        hll_report,
    )

    run = _run_session(spark)
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    src = (run.readStream.schema(schema)
           .option("pathGlobFilter", "documents.parquet")
           .parquet(sf_dir))
    # spread the interpreted tokenize/shingle work across the cluster's
    # cores INSIDE the streaming plan: the file-stream source yields one
    # partition per FILE, so without this a few big files cap the
    # CPU-heavy map at a few cores (isolated min-of-4 A/B on the 10×
    # replica: 11.4 s without → 3.0 s with); the round-robin exchange
    # carries raw text once per micro-batch, and the register agg still
    # shuffles into the state-sized partition count
    src = src.repartition(run.sparkContext.defaultParallelism)
    regs = hll_registers(hll_gram_stream(src, spread=False),
                         "gram", ("grp",))
    name = "stream_distinct_hll_sink"
    with _stream_state_sizing(run, (f"{sf_dir}/documents.parquet",)):
        q = (regs.writeStream.format("memory").queryName(name)
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination()
        q.stop()
    regs_local = _collect_into_caller(
        spark, run, name,
        _sink_rows_from_progress(q, complete=True, run=run))
    est = hll_estimate(regs_local, ("grp",))
    g = hll_gram_stream(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    exact = g.groupBy("grp").agg(
        F.countDistinct("gram").cast("bigint").alias("n_exact"))
    return hll_report(exact, est)


def _streaming_hll_oracle() -> str:
    """The BATCH oracle verbatim — register max is order/batching
    independent, so the streamed sketch equals the batch sketch
    exactly."""
    from ..functions.sketch import hll_distinct_grams_sql

    return hll_distinct_grams_sql()


def streaming_value_quantiles_kmv(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Per-event-type quantile certification with the KMV
    bucketed-minima sample maintained as STREAMING STATE: global
    bottom-k is a rank a stream cannot maintain incrementally, but the
    per-(group, bucket-hash) keyed MIN is associative/commutative/
    idempotent, so a complete-mode aggregation holds <= KMV_BUCKETS
    rows per event_type however the micro-batches split, and the
    drained state equals the batch :func:`~waimak_spark.functions.
    sketch.kmv_bucket_minima` BIT-FOR-BIT (test-locked) — which is what
    licenses sharing the batch oracle verbatim.  The estimate and the
    exact certification run caller-side on the drained <= B-row state
    (the run-once path), mirroring ``streaming_distinct_hll``.
    Post-runway extension measured through the catalog EXTRA_ENTRIES
    registry; verified by tests/test_kmv.py every pytest run."""
    from ..functions.sketch import (
        KMV_BUCKETS,
        KMV_QS,
        _kmv_full,
        _kmv_report,
        kmv_bucket_minima,
    )
    from .events import _events_raw

    run = _run_session(spark)
    src = _events_stream(run, sf_dir)
    minima = kmv_bucket_minima(src)
    name = "stream_kmv_minima_sink"
    with _stream_state_sizing(run, (f"{sf_dir}/events.parquet",)):
        q = (minima.writeStream.format("memory").queryName(name)
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination()
        q.stop()
    samp = _collect_into_caller(
        spark, run, name,
        _sink_rows_from_progress(q, complete=True, run=run))
    full = _kmv_full(_events_raw(spark, sf_dir), "value", "event_type",
                     "event_id")
    return _kmv_report(full, samp.select("g", "id", "v"), KMV_QS,
                       "event_type", 2.0 / (KMV_BUCKETS ** 0.5))


def streaming_heavy_hitters_cms(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Corpus heavy-hitter certification with the count-min sketch
    CELLS maintained as STREAMING STATE — the third member of the
    streaming sketch triad (HLL distinct, KMV quantiles, CMS
    frequency).  A file stream over ``documents`` feeds the map-only
    gram/probe expressions; the per-``(j, cell)`` keyed COUNT is
    associative/commutative, so a complete-mode aggregation holds at
    most ``depth × width`` rows (65 536 at the defaults) however the
    micro-batches split, and the drained state equals the batch
    :func:`~waimak_spark.functions.sketch.cms_sketch` BIT-FOR-BIT
    (test-locked) — which is what licenses sharing the batch oracle
    verbatim.  The exact top-k certification runs batch-side on the
    caller (the run-once path at 100 TB; the stream keeps only the
    sketch).  Output and oracle are identical to the batch
    ``corpus_heavy_hitters`` entry.  Post-runway extension measured
    through the catalog EXTRA_ENTRIES registry; verified by
    tests/test_cms.py every pytest run."""
    from ..functions.cache_registry import tracked_persist
    from ..functions.sketch import (
        cms_gram_stream,
        cms_heavy_hitters_from_sketch,
        cms_sketch_from_grams,
    )

    run = _run_session(spark)
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    src = (run.readStream.schema(schema)
           .option("pathGlobFilter", "documents.parquet")
           .parquet(sf_dir))
    # same partition-starvation fix as streaming_distinct_hll: the
    # file-stream source yields one partition per FILE, so the
    # CPU-heavy tokenize/shingle/probe map needs an explicit
    # round-robin exchange to reach the cluster's cores
    src = src.repartition(run.sparkContext.defaultParallelism)
    sketch = cms_sketch_from_grams(cms_gram_stream(src, spread=False))
    name = "stream_cms_sketch_sink"
    with _stream_state_sizing(run, (f"{sf_dir}/documents.parquet",)):
        q = (sketch.writeStream.format("memory").queryName(name)
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination()
        q.stop()
    sk_local = _collect_into_caller(
        spark, run, name,
        _sink_rows_from_progress(q, complete=True, run=run))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    g = tracked_persist(cms_gram_stream(docs))
    return cms_heavy_hitters_from_sketch(sk_local, g)


def streaming_running_totals_stateful(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """The CUSTOM-STATEFUL-API member of the streaming family: per-user
    running (count, sum) carried in explicit ``applyInPandasWithState``
    state (streaming/ops.py::stateful_running_totals) — the escape
    hatch for incremental semantics Spark's built-in aggregations can't
    express.  Update mode emits a user's cumulative totals every batch
    the user appears in; ``n_events`` STRICTLY INCREASES per emission,
    so the final answer is the max-``n_events`` row per user — a
    deterministic extraction under ANY micro-batch split.  The final
    totals equal the batch groupBy exactly (count) / to 4dp (float sum
    order differs per engine), which is what licenses the plain
    batch-SQL oracle.  Post-runway extension measured through the
    catalog EXTRA_ENTRIES registry; verified with the oracle every
    pytest run (tests/test_streaming.py)."""
    from ..streaming.ops import stateful_running_totals

    run = _run_session(spark)
    src = _events_stream(run, sf_dir)
    totals = stateful_running_totals(src, "user_id", "value")
    name = "stream_stateful_totals_sink"
    with _stream_state_sizing(run, (f"{sf_dir}/events.parquet",)):
        q = (totals.writeStream.format("memory").queryName(name)
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination()
        q.stop()
    rows = _collect_into_caller(
        spark, run, name,
        _sink_rows_from_progress(q, complete=False, run=run))
    return (rows.groupBy("user_id")
            .agg(F.max("n_events").cast("bigint").alias("n_events"),
                 F.round(F.max_by("total_value", "n_events"), 4)
                 .alias("total_value"))
            .orderBy("user_id"))


STREAMING_STATEFUL_TOTALS_ORACLE = """
    select user_id, count(*)::BIGINT as n_events,
           round(sum(value), 4) as total_value
    from events
    group by user_id
    order by user_id
"""


def _streaming_cms_oracle() -> str:
    """The BATCH oracle verbatim — keyed count is order/batching
    independent, so the streamed sketch equals the batch sketch
    exactly."""
    from ..functions.sketch import cms_heavy_hitters_sql

    return cms_heavy_hitters_sql()


def _streaming_kmv_oracle() -> str:
    """The BATCH bucketed-minima oracle verbatim — keyed min is
    order/batching independent, so the streamed sample equals the
    batch sample exactly."""
    from ..functions.sketch import kmv_bucket_quantiles_sql

    return kmv_bucket_quantiles_sql()
def streaming_quality_scores(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """STATELESS model serving: the NB quality model (fitted batch-side
    — the run-once path, bounded collects) rides the streaming plan as
    a folded ``buckets``-entry map literal, and every micro-batch
    scores its documents MAP-ONLY — per-row token aggregate, zero
    shuffle, zero state store (the query runs in APPEND mode, which
    Spark refuses for any stateful plan: statelessness is enforced by
    the engine, not asserted).  Output is identical to the batch
    ``quality_classifier_scores`` entry up to the 4dp round's
    summation-order absorption (identity test-locked), so the batch
    oracle certifies the streamed path verbatim and the entry sits in
    the extras registry's permanent output-identity-sibling class.
    Verified by tests/test_quality_classifier.py every pytest run and
    measured through the catalog EXTRA_ENTRIES registry."""
    from ..functions import classifier as QC
    from ..functions.curation import split_bucket

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    _labeled, _grams, llr_rows, lp = QC.nb_fit(docs)
    run = _run_session(spark)
    schema = docs.schema
    src = (run.readStream.schema(schema)
           .option("pathGlobFilter", "documents.parquet")
           .parquet(sf_dir))
    cols = QC.nb_score_columns(F.col("text"), llr_rows, lp)
    scored = src.select(
        F.col("doc_id"),
        cols["y"].alias("y"),
        (split_bucket(F.col("doc_id"), 1)
         < F.lit(QC.QC_TRAIN_PCT)).cast("int").alias("is_train"),
        cols["score"].alias("score")).withColumn(
            "pred", (F.col("score") >= F.lit(0.0)).cast("int"))
    name = "stream_quality_scores_sink"
    q = (scored.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    q.stop()
    return _collect_into_caller(
        spark, run, name,
        _sink_rows_from_progress(q, complete=False, run=run))


def _streaming_quality_oracle() -> str:
    """The batch oracle verbatim — the streamed scorer is
    output-identical to the batch entry (identity test-locked)."""
    from ..functions.classifier import quality_classifier_scores_sql

    return quality_classifier_scores_sql()


ENTRIES = {
    "streaming_tumbling_counts": {
        "fn": streaming_tumbling_counts,
        "oracle": STREAMING_TUMBLING_ORACLE,
    },
    "streaming_session_counts": {
        "fn": streaming_session_counts,
        "oracle": STREAMING_SESSION_ORACLE,
    },
    "streaming_dedup_pairs": {
        "fn": streaming_dedup_pairs,
        "oracle": STREAMING_DEDUP_ORACLE,
    },
    "streaming_trade_quote_join": {
        "fn": streaming_trade_quote_join,
        "oracle": STREAMING_SSJ_ORACLE,
    },
    # round-12 STAGED admission (fronts round 13 per the rotation ledger)
    "streaming_running_totals_stateful": {
        "fn": streaming_running_totals_stateful,
        "oracle": STREAMING_STATEFUL_TOTALS_ORACLE,
    },
}
