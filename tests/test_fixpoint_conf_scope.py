"""The resolve fixpoint must not mutate session-global SQL conf.

The framework's parallel executor schedules CONCURRENT actions while a
fixpoint loop runs; those actions plan their shuffles from the session's
``spark.sql.shuffle.partitions``, so the loop's shuffle sizing has to be
scoped to the loop's own frames (repartition/coalesce), never a session
conf override.  The probe below runs genuinely MID-LOOP: ``_free_ckpt``
is invoked once per propagation round, and the wrapper plans a fresh
aggregate there, asserting it still shuffles at the session default.
"""

import re

from pyspark.sql import functions as F

import waimak_spark.functions.similarity as S

SHUFFLE_KEY = "spark.sql.shuffle.partitions"


def test_concurrent_plan_keeps_session_default_mid_loop(spark, monkeypatch):
    old = spark.conf.get(SHUFFLE_KEY)
    # raise the session default above the sizing floor (4) so the loop's
    # edge-derived sizing is ACTIVE (a tiny graph sizes to the floor)
    spark.conf.set(SHUFFLE_KEY, "32")
    try:
        probes = {"conf": [], "plans": [], "loop_parts": []}
        real = S._fixpoint_loop

        def probing_loop(ids, edges, max_iters, free, loop_parts=None):
            probes["loop_parts"].append(loop_parts)

            def probing_free(df):
                # one call per loop round — mid-fixpoint by construction
                probes["conf"].append(spark.conf.get(SHUFFLE_KEY))
                q = (spark.range(1000)
                     .groupBy((F.col("id") % 7).alias("k")).count())
                probes["plans"].append(
                    q._jdf.queryExecution().executedPlan().toString())
                free(df)

            return real(ids, edges, max_iters, probing_free, loop_parts)

        monkeypatch.setattr(S, "_fixpoint_loop", probing_loop)
        ids = spark.createDataFrame([(i,) for i in range(1, 8)], "id int")
        pairs = spark.createDataFrame([(i, i + 1) for i in range(1, 7)],
                                      "id_a int, id_b int")
        out = {r["id"]: r["canonical_id"]
               for r in S.resolve_duplicates_fixpoint(
                   ids, pairs, local_max_edges=0).collect()}
        assert out == {i: 1 for i in range(1, 8)}

        # the sizing path ran (32 -> floor of 4) ...
        assert probes["loop_parts"] == [4]
        # ... yet mid-loop the session conf is untouched ...
        assert probes["conf"] and all(c == "32" for c in probes["conf"])
        # ... and a concurrently planned aggregate shuffles at the
        # session default, not the loop's lowered count
        assert probes["plans"]
        for plan in probes["plans"]:
            assert re.search(r"hashpartitioning\(\w+#\d+L?, 32\)", plan), plan
    finally:
        spark.conf.set(SHUFFLE_KEY, old)


def test_unparseable_conf_skips_sizing_not_the_resolve(spark, monkeypatch):
    """Platforms where shuffle.partitions reads back non-numeric (e.g.
    Databricks 'auto') must still resolve — the sizing is skipped, not
    fatal.  OSS Spark rejects non-int values on set, so the unparseable
    READ is simulated by patching RuntimeConfig.get."""
    from pyspark.sql.conf import RuntimeConfig

    real_get = RuntimeConfig.get

    def fake_get(self, key, *args, **kwargs):
        if key == SHUFFLE_KEY:
            return "auto"
        # pass the default through untouched: RuntimeConfig.get uses a
        # no-value sentinel, so injecting default=None would change it
        return real_get(self, key, *args, **kwargs)

    monkeypatch.setattr(RuntimeConfig, "get", fake_get)
    seen = {}
    real = S._fixpoint_loop

    def probing_loop(ids, edges, max_iters, free, loop_parts=None):
        seen["loop_parts"] = loop_parts
        return real(ids, edges, max_iters, free, loop_parts)

    monkeypatch.setattr(S, "_fixpoint_loop", probing_loop)
    ids = spark.createDataFrame([(1,), (2,), (3,)], "id int")
    pairs = spark.createDataFrame([(1, 2)], "id_a int, id_b int")
    got = {r["id"]: r["canonical_id"]
           for r in S.resolve_duplicates_fixpoint(
               ids, pairs, local_max_edges=0).collect()}
    assert got == {1: 1, 2: 1, 3: 3}
    assert seen["loop_parts"] is None
