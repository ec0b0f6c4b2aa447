"""Property-based checks for the RDBM SQL generation and the streaming
state-sizing rule — pure Python + DuckDB, no Spark session.

The split-predicate property evaluates the GENERATED SQL strings
verbatim against a key table (DuckDB), so it exercises the exact text a
JDBC scan would ship, not a Python re-implementation of its intent:
every key must fall in exactly one partition predicate, whatever the
split points are (the reference's SQLServerExtractor splits the PK range
the same way — RDBMExtractor.scala split-predicate path)."""

import duckdb
from hypothesis import given, settings, strategies as st

from waimak_spark.rdbm.sqlgen import (
    TableExtractionMetadata,
    escape_postgres,
    split_points_to_predicates,
)
from waimak_spark.streaming.ops import (
    STATE_MAX_PARTITIONS,
    STATE_MIN_PARTITIONS,
    state_partitions_for_backfill,
)

# keys: the quoting in split_points_to_predicates embeds the point
# between single quotes, so the safe domain is quote-free text (PKs in
# the ingestion path are identifiers/numbers; a quote in a PK would need
# driver-side parameterization, documented limitation shared with the
# reference's string-interpolated predicates)
_key = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")),
    min_size=1, max_size=8)

_META = TableExtractionMetadata("sch", "tbl", ["pk"], "updated")


@settings(max_examples=100, deadline=None)
@given(keys=st.lists(_key, min_size=1, max_size=40, unique=True),
       n_points=st.integers(min_value=1, max_value=10))
def test_split_predicates_partition_every_key_exactly_once(keys, n_points):
    """For ANY choice of (sorted, distinct) split points drawn from the
    key population, the generated predicates form a partition: each key
    matches exactly one predicate, so a JDBC scan reads every row once
    and no row twice."""
    points = sorted(set(keys))[:n_points]
    preds = split_points_to_predicates(points, _META, escape_postgres)
    assert preds is not None and len(preds) == len(points) + 1
    con = duckdb.connect()
    con.execute("create table t (pk varchar)")
    con.executemany("insert into t values (?)", [(k,) for k in keys])
    total = 0
    for pred in preds:
        total += con.execute(
            f'select count(*) from t where {pred}').fetchone()[0]
    assert total == len(keys)  # disjoint AND complete <=> counts sum to n
    # per-key: exactly one predicate true (catches overlap hiding behind
    # a compensating gap)
    whole = " union all ".join(
        f"select pk from t where {p}" for p in preds)
    per_key = con.execute(
        f"select pk, count(*) c from ({whole}) group by pk having c <> 1"
    ).fetchall()
    assert per_key == []


def test_split_predicates_none_when_no_points():
    assert split_points_to_predicates([], _META, escape_postgres) is None


@settings(max_examples=200, deadline=None)
@given(a=st.integers(min_value=0, max_value=2**50),
       b=st.integers(min_value=0, max_value=2**50))
def test_state_sizing_monotone_and_bounded(a, b):
    """More input never means fewer state partitions, and the result
    always respects the floor/cap — the documented sizing contract
    (streaming/ops.py rule)."""
    pa, pb = state_partitions_for_backfill(a), state_partitions_for_backfill(b)
    assert STATE_MIN_PARTITIONS <= pa <= STATE_MAX_PARTITIONS
    if a <= b:
        assert pa <= pb


@settings(max_examples=100, deadline=None)
@given(seconds=st.integers(min_value=0, max_value=10**6),
       latest=st.datetimes())
def test_watermark_offset_never_moves_forward(seconds, latest):
    """The safety offset can only move the watermark BACK (re-reading a
    sliver is safe; skipping rows is not), and clamping bounds it below."""
    from waimak_spark.rdbm.sqlgen import resolve_last_updated

    out = resolve_last_updated(latest, seconds)
    assert out <= latest
    clamped = resolve_last_updated(latest, seconds,
                                   clamp_lower="1900-01-01 00:00:00")
    from datetime import datetime

    floor = datetime(1900, 1, 1)
    assert clamped >= floor
    # the clamp may only move the watermark FORWARD up to the floor (a
    # pre-floor latest isn't representable in the column anyway); above
    # the floor the back-only rule holds
    assert clamped <= max(latest, floor)
