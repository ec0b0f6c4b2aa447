"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship flow (TPC-H-ish Q1 through the dataflow
machinery) on sf0.001; ``queries()``/``oracle_sql()`` expose the full
catalog (waimak_spark/catalog/) for the DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# Spark's Python WORKERS resolve cloudpickled UDFs by module name via
# PYTHONPATH, not the driver's sys.path — without this, a harness that
# imports this file from another cwd fails inside Arrow UDF stages with
# ModuleNotFoundError: waimak_spark.
if _REPO not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))

from waimak_spark import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + extensions."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return catalog.oracle_sql()
