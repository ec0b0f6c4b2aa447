"""Session-hygiene registry for operator-internal ``persist()`` calls.

Several dedup/similarity operators persist an intermediate frame because
interpreted higher-order expressions get no common-subexpression
elimination — without the barrier the expensive upstream pipeline would be
re-evaluated once per downstream reference. The returned operator frame is
lazy, so the operator itself cannot unpersist (the caller hasn't collected
yet). Left alone, every invocation leaks one cached frame into the session
and a long-lived session (a bench run, a notebook) accumulates blocks
until the storage manager evicts under pressure.

``tracked_persist`` registers each such frame; callers (bench harnesses,
flows, tests) call ``release_tracked()`` after consuming an operator's
output to drop all operator-internal cache blocks in one call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register for later ``release_tracked()``."""
    df = df.persist()
    _LIVE.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked frame (blocking=False); returns how many."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session may already be stopped
    return n
