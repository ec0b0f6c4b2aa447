"""Property-based storage-layer invariants (hypothesis): for ARBITRARY
interleavings of appends and compactions, the audit table's read kernels
must agree with a trivial in-memory model — snapshot() is latest-per-PK
of everything appended at-or-before the snapshot ts, and (with
retain_history) all_between(None, None) never loses a row.  Compaction
must be a pure LAYOUT operation: running it anywhere in the sequence
cannot change any read result.

Mirrors the scenario intent of the reference's TestAuditTableFile.scala
(waimak-storage) but generalizes the hand-picked sequences to generated
ones."""

import shutil
import tempfile
from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings, strategies as st

from waimak_spark.storage import AuditTableInfo, FileStorageOps
from waimak_spark.storage.audit import create_table

T0 = datetime(2018, 1, 1, 10, 0, 0)

# a step is either a compaction marker or an append batch: a list of
# distinct ids (rows within one batch share the batch timestamp, so
# distinct ids keep latest-per-PK tie-free and the model deterministic)
_batch = st.lists(st.integers(min_value=0, max_value=5),
                  min_size=1, max_size=4, unique=True)
_steps = st.lists(st.one_of(st.just("compact"), _batch),
                  min_size=1, max_size=6)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(steps=_steps, retain=st.booleans())
def test_reads_match_model_under_any_append_compact_interleaving(
        spark, steps, retain):
    root = tempfile.mkdtemp(prefix="wmk_storage_prop_")
    try:
        ops = FileStorageOps(spark, f"{root}/storage")
        t = create_table(ops, AuditTableInfo(
            "props", ["id"], {}, retain_history=retain))
        model = {}          # id -> (ts, value): latest-per-PK
        appended = 0        # total rows ever appended
        ts = T0
        for i, step in enumerate(steps):
            ts = T0 + timedelta(days=i + 1)
            if step == "compact":
                # compaction window must include "now": pass the current
                # sequence ts and force every region to count as small
                t = t.compact(ts, small_region_row_threshold=10**6)
                continue
            rows = [(doc_id, f"v{i}_{doc_id}", ts) for doc_id in step]
            df = spark.createDataFrame(
                rows, "id int, name string, updated timestamp")
            t, cnt = t.append(df, "updated", ts)
            assert cnt == len(rows)
            appended += len(rows)
            for doc_id in step:
                model[doc_id] = (ts, f"v{i}_{doc_id}")
        end = ts + timedelta(days=1)
        # snapshot()/all_between() are Optional: None on a region-less
        # table (the reference's Option contract) == empty model
        sdf = t.snapshot(end)
        snap = ({} if sdf is None else
                {r["id"]: r["name"]
                 for r in sdf.select("id", "name").collect()})
        assert snap == {k: v for k, (_, v) in model.items()}
        if retain:
            ab = t.all_between(None, None)
            assert (0 if ab is None else ab.count()) == appended
        # a mid-history snapshot must also respect the model's time
        # slice — but only with retain_history: without it, compaction
        # legitimately collapses older versions, so pre-compaction
        # timestamps are no longer reconstructable
        if retain and len(steps) >= 2:
            mid = T0 + timedelta(days=len(steps) // 2, hours=12)
            mid_model = {}
            for i, step in enumerate(steps):
                sts = T0 + timedelta(days=i + 1)
                if step == "compact" or sts > mid:
                    continue
                for doc_id in step:
                    mid_model[doc_id] = f"v{i}_{doc_id}"
            mdf = t.snapshot(mid)
            mid_snap = ({} if mdf is None else
                        {r["id"]: r["name"]
                         for r in mdf.select("id", "name").collect()})
            assert mid_snap == mid_model
    finally:
        shutil.rmtree(root, ignore_errors=True)
