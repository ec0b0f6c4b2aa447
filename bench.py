"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# representative of every operator family: relational (scan/join/agg/
# window/rollup), events (window/sessionize), dedup (minhash/lsh/simhash/
# jaccard), text analysis, similarity search
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "q6_revenue_delta",
    "top3_orders_per_customer",
    "rollup_quantity",
    "latest_event_per_user_type",
    "tumbling_window_counts",
    "sessions_per_user",
    "dedup_exact",
    "dedup_minhash_signature",
    "dedup_lsh_candidates",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "text_quality",
    "token_counts",
    "ann_brute_force_topk",
    "ann_lsh_pairs",
]


def main() -> None:
    from pyspark.sql import SparkSession

    from waimak_spark.catalog import queries

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("waimak_spark-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = queries()
    # JVM/codegen warmup on the smallest table
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
