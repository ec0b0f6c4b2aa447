"""Small shared helpers for the functions package."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_rows_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """JVM-backed local DataFrame from a bounded list of driver rows.

    ``spark.createDataFrame(list, schema)`` parallelizes the rows into
    ``defaultParallelism`` PYTHON-evaluated slices: every downstream
    action (including a broadcast build over the frame) pays one Python
    worker round-trip per slice — measured ~0.7 s per action for an
    8-row frame on local[32], and 5+ s if the frame is coalesced (the
    single task then drains all slices SEQUENTIALLY through Python
    workers).  The Arrow path ships one record batch to the JVM at
    construction time and evaluates JVM-side afterwards (~0.17 s per
    action, measured).  Values are unchanged — the declared schema
    drives the type conversion on both paths; columns are built as
    dtype=object pandas Series so mixed int/None columns never pass
    through float64 (which would corrupt ids above 2^53).

    ``schema`` must be a simple comma-separated ``name type`` string
    whose types contain no top-level commas (``array<double>`` is fine,
    multi-field structs are not — no current caller uses one).
    """
    import pandas as pd

    rows = list(rows)
    names = [c.strip().split()[0] for c in schema.split(",")]
    pdf = pd.DataFrame(
        {n: pd.Series([r[i] for r in rows], dtype=object)
         for i, n in enumerate(names)})
    return spark.createDataFrame(pdf, schema)
