"""Streaming flow actions: ``readStream`` sources behind labels and sinks
that run the query with the ``availableNow`` trigger (process everything
currently available, then stop — incremental batch) or leave it live.

Streaming DataFrames flow through the ordinary action library: a
streaming label feeds ``transform``/``sql`` like any other entity; only
sources and sinks are streaming-specific.
"""

from __future__ import annotations

from typing import Optional

from ..dataflow.action import SimpleAction


def open_file_stream(flow, label: str, path: str, fmt: str = "parquet",
                     schema=None, options: Optional[dict] = None,
                     max_files_per_trigger: Optional[int] = None):
    """File-source stream: picks up files appearing under ``path``;
    ``max_files_per_trigger`` bounds per-micro-batch work."""

    def body(_i, c):
        reader = c.spark.readStream.format(fmt)
        if schema is not None:
            reader = reader.schema(schema)
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger",
                                   str(max_files_per_trigger))
        return [reader.load(path)]

    return flow.add_action(
        SimpleAction([], [label], body, name=f"openFileStream:{label}"))


def write_file_stream(flow, label: str, path: str, checkpoint: str,
                      fmt: str = "parquet", output_mode: str = "append",
                      available_now: bool = True):
    """Run the streaming query writing ``label`` to files. With
    ``available_now`` (default) the action blocks until all currently
    available input is processed, then the query stops — the incremental
    batch pattern; checkpoints make re-runs process only NEW files."""

    if not available_now:
        # a flow action can neither babysit a live query nor hand it back
        # through an (empty) output list — refusing beats a silent no-op
        raise NotImplementedError(
            "write_file_stream supports only available_now=True inside a "
            "flow; start live queries directly with df.writeStream")

    def body(i, _c):
        df = i.get(label)
        writer = (df.writeStream.format(fmt)
                  .outputMode(output_mode)
                  .option("path", path)
                  .option("checkpointLocation", checkpoint))
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return []

    return flow.add_action(
        SimpleAction([label], [], body, name=f"writeFileStream:{label}"))


def write_memory_stream(flow, label: str, query_name: str,
                        output_mode: str = "append"):
    """Sink to an in-memory table (tests/debug): runs with availableNow
    and registers ``query_name`` as a queryable temp table."""

    def body(i, _c):
        df = i.get(label)
        q = (df.writeStream.format("memory")
             .queryName(query_name)
             .outputMode(output_mode)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        return []

    return flow.add_action(
        SimpleAction([label], [], body, name=f"writeMemoryStream:{label}"))


def write_stream_to_audit_table(flow, label: str, storage_base_path: str,
                                table_name: str, checkpoint: str,
                                last_updated_col,
                                metadata_retrieval=None,
                                output_mode: str = "append",
                                available_now: bool = True):
    """Streaming ingestion into the hot/cold storage layer: every
    micro-batch lands as one hot region via ``foreachBatch`` — the
    streaming counterpart of ``extractToStorageFromRDBM`` (the reference's
    storage layer is batch-only; this wires the same audit-table kernels
    to a Structured Streaming source).

    Per-batch the table handle is REOPENED: audit-table mutators are
    single-shot per instance by design (AuditTableFile.scala:36-38), and
    reopening also picks up regions a concurrent compaction may have
    rewritten.  Hot-region proliferation (one per micro-batch) is the
    storage layer's normal operating mode; the compaction window trigger
    folds them into cold regions on schedule.

    Delivery guarantee: ``foreachBatch`` is AT-LEAST-ONCE — Spark may
    replay a batch whose handler ran but whose checkpoint commit did not.
    A per-batch marker file (written exclusively AFTER the append) makes
    replays of fully-committed batches no-ops; a crash in the window
    between append and marker still duplicates one hot region on replay.
    For PK-keyed tables ``snapshot`` dedups that case; exact-count
    consumers (``loadAll``/``allBetween``) must tolerate it or dedup
    downstream.
    """
    import hashlib

    if not available_now:
        raise NotImplementedError(
            "write_stream_to_audit_table supports only available_now=True "
            "inside a flow; start live queries directly with df.writeStream")
    ckpt_id = hashlib.md5(checkpoint.encode()).hexdigest()[:12]

    def body(i, _c):
        df = i.get(label)

        def handle_batch(batch_df, batch_id):
            if batch_df.isEmpty():
                return
            from ..storage.audit import get_or_create_tables
            from ..storage.file_ops import FileStorageOps

            ops = FileStorageOps(batch_df.sparkSession, storage_base_path)
            marker = (f"{storage_base_path}/{table_name}/.stream_batches/"
                      f"{ckpt_id}-{batch_id}")
            if ops.fops.exists(marker):
                return  # replay of a fully-committed batch
            [table] = get_or_create_tables(
                ops, [table_name], metadata_retrieval)
            table.append(batch_df, last_updated_col)
            ops.fops.write_string_exclusive(marker, "done")

        q = (df.writeStream.foreachBatch(handle_batch)
             .outputMode(output_mode)
             .option("checkpointLocation", checkpoint)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return []

    return flow.add_action(
        SimpleAction([label], [], body,
                     name=f"writeStreamToAuditTable:{table_name}"))
