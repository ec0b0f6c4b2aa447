"""End-to-end mini-flows on local Spark — the reference's TestSparkDataFlow
tier: open → sql/transform → write, caching, commit protocol, named files."""

import pytest
from pyspark.sql import functions as F

from waimak_spark.dataflow import Waimak
from waimak_spark.operators import ParquetDataCommitter, date_based_snapshot_cleanup


@pytest.fixture()
def base_flow(spark, sf_dir, tmp_flow_dir):
    return (
        Waimak.spark_flow(spark, tmp_flow_dir)
        .open_file_parquet(f"{sf_dir}/lineitem.parquet", "lineitem")
        .open_file_parquet(f"{sf_dir}/orders.parquet", "orders")
    )


def test_open_transform_write(base_flow, tmp_path):
    out = str(tmp_path / "out")
    flow = (
        base_flow.transform(
            "lineitem",
            output="agg",
            fn=lambda df: df.groupBy("l_returnflag").agg(
                F.sum("l_quantity").alias("sum_qty")
            ),
        )
        .write_parquet(out, "agg")
    )
    executed, final = flow.execute()
    assert {a.name for a in executed} >= {"transform:agg", "writeParquet:agg"}
    result = base_flow.spark.read.parquet(f"{out}/agg")
    assert result.count() > 0
    assert set(result.columns) == {"l_returnflag", "sum_qty"}


def test_sql_action_with_join(base_flow):
    flow = base_flow.sql(
        "lineitem", "orders",
        output="joined",
        query="""
            select o.o_orderpriority, count(*) as n
            from lineitem l join orders o on l.l_orderkey = o.o_orderkey
            group by o.o_orderpriority
        """,
    )
    _, final = flow.execute()
    df = final.inputs.get("joined")
    assert df.count() == 5  # five order priorities


def test_sql_drop_columns(base_flow):
    flow = base_flow.sql(
        "orders", output="o2",
        query="select o_orderkey, o_orderstatus, o_totalprice from orders",
        drop_columns=["o_totalprice"],
    )
    _, final = flow.execute()
    assert final.inputs.get("o2").columns == ["o_orderkey", "o_orderstatus"]


def test_multi_input_transform(base_flow):
    flow = base_flow.transform(
        "lineitem", "orders",
        output="j",
        fn=lambda l, o: l.join(o, l.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "o_totalprice"
        ),
    )
    _, final = flow.execute()
    assert final.inputs.get("j").columns == ["l_orderkey", "o_totalprice"]


def test_alias_and_show(base_flow, capsys):
    flow = base_flow.alias("orders", "orders2").show("orders2", n=3)
    flow.execute()
    assert "o_orderkey" in capsys.readouterr().out


def test_partition_sort(base_flow):
    flow = base_flow.partition_sort(
        "lineitem", "ps", ["l_returnflag"], ["l_shipdate"]
    )
    _, final = flow.execute()
    df = final.inputs.get("ps")
    assert df.count() > 0


def test_cache_as_parquet_only_when_reused(base_flow, tmp_flow_dir, spark):
    # single consumer → cache skipped (no parquet under temp)
    flow = (
        base_flow.transform("lineitem", output="t1", fn=lambda df: df.limit(10))
        .cache_as_parquet("t1")
        .transform("t1", output="t2", fn=lambda df: df.limit(5))
    )
    _, final = flow.execute()
    assert final.inputs.get("t2").count() == 5


def test_cache_as_parquet_reused_label(base_flow, tmp_flow_dir, spark):
    flow = (
        base_flow.transform("lineitem", output="t1", fn=lambda df: df.limit(10))
        .cache_as_parquet("t1")
        .transform("t1", output="a", fn=lambda df: df.limit(5))
        .transform("t1", output="b", fn=lambda df: df.limit(3))
    )
    # disable temp cleanup so we can inspect
    spark.conf.set("spark.waimak.dataflow.removeTempAfterExecution", "false")
    try:
        _, final = flow.execute()
        assert final.inputs.get("a").count() == 5
        assert final.inputs.get("b").count() == 3
        files = spark.read.parquet(f"{tmp_flow_dir}/t1")
        assert files.count() == 10
    finally:
        spark.conf.unset("spark.waimak.dataflow.removeTempAfterExecution")


def test_spark_cache(base_flow):
    flow = (
        base_flow.transform("lineitem", output="t1", fn=lambda df: df.limit(10))
        .spark_cache("t1")
        .transform("t1", output="a", fn=lambda df: df.limit(5))
        .transform("t1", output="b", fn=lambda df: df.limit(3))
    )
    _, final = flow.execute()
    assert final.inputs.get("t1").is_cached


def test_in_place_transform(base_flow):
    flow = (
        base_flow.transform("orders", output="t1", fn=lambda df: df.limit(10))
        .in_place_transform("t1", lambda df: df.withColumn("x", F.lit(1)))
    )
    _, final = flow.execute()
    assert "x" in final.inputs.get("t1").columns


def test_write_csv_single_file(base_flow, tmp_path):
    out = str(tmp_path / "csvout")
    flow = (
        base_flow.transform("orders", output="small", fn=lambda df: df.limit(20))
        .write_csv(out, "small")
    )
    flow.execute()
    import glob

    parts = glob.glob(f"{out}/small/part-*")
    assert len(parts) == 1  # num_files defaults to 1


def test_write_as_named_files(base_flow, tmp_path):
    """Reference naming contract (TestWriteAsNamedFilesAction.scala:28-42):
    the full compound extension of the part file survives the rename."""
    out = str(tmp_path / "named")
    flow = (
        base_flow.transform("orders", output="small", fn=lambda df: df.limit(20))
        .write_as_named_files("small", out, 2, "mydata")
    )
    flow.execute()
    import os

    names = sorted(n for n in os.listdir(out) if not n.startswith("."))
    assert names == ["mydata.1.snappy.parquet", "mydata.2.snappy.parquet"]


def test_write_as_named_files_reference_cases(base_flow, tmp_path, spark):
    """The rest of the reference's naming matrix
    (TestWriteAsNamedFilesAction.scala:12-141): single file gets no
    number; ten files zero-pad to width 2; csv / gzip'd csv / text keep
    their real extensions; multiple text files are rejected up front;
    a part-count mismatch is a loud DataFlowException."""
    import os

    def run(n, prefix, fmt, options=None, rows=100):
        out = str(tmp_path / f"out_{prefix}")
        (base_flow
         .transform("orders", output=prefix, fn=lambda df: df.limit(rows))
         .write_as_named_files(prefix, out, n, prefix, fmt=fmt,
                               options=options or {})
         .execute())
        return sorted(x for x in os.listdir(out) if not x.startswith("."))

    assert run(1, "single", "parquet") == ["single.snappy.parquet"]
    assert run(10, "ten", "parquet") == [
        f"ten.{i:02d}.snappy.parquet" for i in range(1, 11)]
    assert run(1, "plain", "csv") == ["plain.csv"]
    assert run(2, "zipped", "csv", {"compression": "gzip"}) == [
        "zipped.1.csv.gz", "zipped.2.csv.gz"]

    text_flow = base_flow.transform(
        "orders", output="txt",
        fn=lambda df: df.selectExpr("cast(o_orderkey as string) as value"))
    assert "value"  # text format needs a single string column
    out = str(tmp_path / "out_txt")
    text_flow.write_as_named_files("txt", out, 1, "txt", fmt="text").execute()
    assert sorted(x for x in os.listdir(out)
                  if not x.startswith(".")) == ["txt.txt"]

    with pytest.raises(ValueError, match="only 1 file"):
        (base_flow
         .transform("orders", output="t2",
                    fn=lambda df: df.selectExpr("cast(o_orderkey as string) as value"))
         .write_as_named_files("t2", str(tmp_path / "o2"), 2, "t2", fmt="text")
         .execute())


def test_commit_push_snapshot_and_cleanup(base_flow, tmp_path, spark):
    out = str(tmp_path / "committed")

    def run(snap):
        flow = (
            Waimak.spark_flow(spark, str(tmp_path / f"tmp_{snap}"))
            .open_file_parquet(
                f"/root/testdata/sf0.001/orders.parquet", "orders"
            )
            .transform("orders", output="report", fn=lambda df: df.limit(10))
            .commit("daily", "report")
            .push("daily", ParquetDataCommitter(
                out, snapshot_folder=f"snapshot_ts={snap}",
                cleanup_strategy=date_based_snapshot_cleanup("snapshot_ts", 2),
            ))
        )
        flow.execute()

    for snap in ["20260101", "20260102", "20260103"]:
        run(snap)
    import os

    snaps = sorted(os.listdir(f"{out}/report"))
    assert snaps == ["snapshot_ts=20260102", "snapshot_ts=20260103"]
    df = spark.read.parquet(f"{out}/report/snapshot_ts=20260103")
    assert df.count() == 10


def test_date_based_cleanup_strategy_cases():
    """The reference's fine-grained strategy cases
    (TestParquetDataCommitter.scala:53-88): empty / below / exactly at
    keep-N return nothing; above keep-N the OLDEST go, regardless of
    input order; non-compliant names (wrong prefix, no '=', suffixed
    column name, marker files) never count toward N or get deleted."""
    strat = date_based_snapshot_cleanup("snapshotFolder", 5)
    days = [f"snapshotFolder=20181101_12300{i}_567" for i in range(8)]

    assert strat(None, "t", []) == []
    assert strat(None, "t", days[:1]) == []
    assert strat(None, "t", days[:5]) == []
    assert strat(None, "t", days[:6]) == [days[0]]
    assert strat(None, "t", list(reversed(days[:6]))) == [days[0]]
    assert strat(None, "t", list(reversed(days))) == days[:3]
    noise = ["_SUCCESS", "odd=file", "snapshotFolder",
             "snapshotFolder_1=20181101_123000_567"]
    assert strat(None, "t", list(reversed(days)) + noise) == days[:3]
    same_day = [f"snapshotFolder=20181101_123001_{m}" for m in
                ("567", "568", "569", "570", "571", "572", "573")]
    assert strat(None, "t", list(reversed(same_day))) == same_day[:2]


def test_interceptors_preserve_action_count_and_guid(base_flow):
    """TestSparkInterceptors.scala:28-56 — intercepting never adds
    actions; the wrapped action keeps its scheduling guid."""
    flow = base_flow.transform("orders", output="t1",
                               fn=lambda df: df.limit(10))
    n = len(flow.actions)
    guid = next(a for a in flow.actions if "t1" in a.output_labels).guid
    flow2 = flow.in_place_transform("t1", lambda df: df.select("o_orderkey"))
    assert len(flow2.actions) == n
    assert next(a for a in flow2.actions
                if "t1" in a.output_labels).guid == guid
    # cacheAsParquet schedules via the metadata extension — still no new
    # actions once prepared (two consumers so the cache is not skipped)
    flow3 = (flow2.transform("t1", output="a", fn=lambda df: df)
             .transform("t1", output="b", fn=lambda df: df)
             .cache_as_parquet("t1"))
    prepared = flow3.prepare_for_execution()
    assert len(prepared.actions) == n + 2


def test_downstream_sql_sees_intercepted_output(base_flow):
    """TestSparkInterceptors.scala:99-117 — an action consuming an
    intercepted label gets the POST-transform value."""
    flow = (base_flow
            .sql("orders", output="summary",
                 query="select o_orderkey from orders")
            .in_place_transform("summary", lambda df: df.limit(1))
            .sql("summary", output="cnt",
                 query="select count(*) as n from summary"))
    _, final = flow.execute()
    assert final.inputs.get("cnt").collect()[0].n == 1


def test_commit_without_push_fails(base_flow):
    flow = base_flow.commit("orphan", "orders")
    with pytest.raises(Exception, match="without pushes"):
        flow.execute()


def test_push_without_commit_fails(base_flow, tmp_path):
    """TestSparkCommitter.scala:46-64 — a push with no matching commit
    definition is a validation error naming the orphan pushes."""
    flow = (base_flow.commit("comm_1", "orders")
            .push("comm_1", ParquetDataCommitter(str(tmp_path / "d1")))
            .push("no_commit_1", ParquetDataCommitter(str(tmp_path / "d2")))
            .push("no_commit_2", ParquetDataCommitter(str(tmp_path / "d3"))))
    with pytest.raises(Exception) as exc:
        flow.execute()
    assert "no_commit_1" in str(exc.value) and "no_commit_2" in str(exc.value)


def test_commit_unproduced_label_names_the_commit(base_flow, tmp_path):
    """TestSparkCommitter.scala:169-185 — committing a label no action
    produces reports the commit → missing-label mapping, not a generic
    dangling-dependency error on a synthetic stage action."""
    flow = (base_flow.commit("comm_1", "orders", "ghost")
            .push("comm_1", ParquetDataCommitter(str(tmp_path / "dest"))))
    with pytest.raises(Exception, match=r"not produced by any action.*comm_1 -> \{ghost\}"):
        flow.execute()


def test_same_label_in_two_commits(base_flow, tmp_path):
    """TestSparkCommitter.scala:84-106 — one label may take part in two
    separate commits; both destinations receive it."""
    d1, d2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    flow = (base_flow
            .transform("orders", output="report", fn=lambda df: df.limit(7))
            .commit("comm_1", "report")
            .commit("with_duplicate", "report")
            .push("comm_1", ParquetDataCommitter(d1))
            .push("with_duplicate", ParquetDataCommitter(d2)))
    flow.execute()
    assert base_flow.spark.read.parquet(f"{d1}/report").count() == 7
    assert base_flow.spark.read.parquet(f"{d2}/report").count() == 7


def test_add_label_to_existing_commit(base_flow, tmp_path):
    """TestSparkCommitter.scala:190-210 — a second commit() with the same
    name extends the label set; one push commits them all."""
    dest = str(tmp_path / "dest")
    flow = (base_flow
            .transform("orders", output="report", fn=lambda df: df.limit(7))
            .transform("lineitem", output="items", fn=lambda df: df.limit(4))
            .commit("comm_1", "report")
            .commit("comm_1", "items")
            .push("comm_1", ParquetDataCommitter(dest)))
    flow.execute()
    assert base_flow.spark.read.parquet(f"{dest}/report").count() == 7
    assert base_flow.spark.read.parquet(f"{dest}/items").count() == 4


def test_commit_label_cached_and_consumed(base_flow, tmp_path):
    """TestSparkCommitter.scala:127-168 — a committed label that is also
    cacheAsParquet'd and consumed by another action commits exactly once
    with correct content (the one-cache-per-label guard)."""
    dest, wdest = str(tmp_path / "dest"), str(tmp_path / "write")
    flow = (base_flow
            .transform("orders", output="report", fn=lambda df: df.limit(7))
            .cache_as_parquet("report")
            .write_parquet(wdest, "report")
            .commit("report", "report")
            .push("report", ParquetDataCommitter(dest)))
    flow.execute()
    assert base_flow.spark.read.parquet(f"{dest}/report").count() == 7
    assert base_flow.spark.read.parquet(f"{wdest}/report").count() == 7


def test_parallel_executor_spark(base_flow):
    flow = base_flow
    for i in range(4):
        flow = flow.transform(
            "lineitem", output=f"s{i}",
            fn=lambda df, k=i: df.filter(F.col("l_linenumber") == k + 1)
            .groupBy("l_returnflag").count(),
        )
    executor = Waimak.spark_executor(max_parallel_actions=4)
    executed, final = executor.execute(flow)
    for i in range(4):
        assert final.inputs.get(f"s{i}").count() > 0


class TestCombineAndPartitionedCSV:
    def test_combine_merges_and_executes(self, spark, tmp_path):
        from waimak_spark.dataflow.spark_flow import Waimak

        df1 = spark.createDataFrame([(1,)], "a int")
        df2 = spark.createDataFrame([(2,)], "b int")
        f1 = Waimak.spark_flow(spark).open("one", lambda c: df1)
        f2 = Waimak.spark_flow(spark).open("two", lambda c: df2)
        merged = f1 + f2
        _, final = merged.execute()
        assert final.inputs.get("one").count() == 1
        assert final.inputs.get("two").count() == 1

    def test_combine_rejects_duplicate_labels(self, spark):
        from waimak_spark.dataflow.exceptions import FlowValidationException
        from waimak_spark.dataflow.spark_flow import Waimak

        df = spark.createDataFrame([(1,)], "a int")
        f1 = Waimak.spark_flow(spark).open("same", lambda c: df)
        f2 = Waimak.spark_flow(spark).open("same", lambda c: df)
        with pytest.raises(FlowValidationException):
            f1.combine(f2)

    def test_write_partitioned_csv(self, spark, tmp_path):
        import os

        from waimak_spark.dataflow.spark_flow import Waimak

        df = spark.createDataFrame(
            [(1, "x"), (2, "x"), (3, "y")], "id int, part string")
        out = str(tmp_path / "csvout")
        flow = (Waimak.spark_flow(spark, str(tmp_path / "tmp"))
                .open("t", lambda c: df)
                .write_partitioned_csv(out, "t", partition_cols=["part"]))
        flow.execute()
        dirs = sorted(d for d in os.listdir(f"{out}/t")
                      if d.startswith("part="))
        assert dirs == ["part=x", "part=y"]
        back = (spark.read.options(header=True, inferSchema=True)
                .csv(f"{out}/t"))
        assert back.count() == 3


def test_clustered_parquet_layout(base_flow, spark, sf_dir, tmp_path):
    out = str(tmp_path / "clustered")
    (base_flow.write_clustered_parquet(out, "orders",
                                       cluster_cols=["o_orderkey"],
                                       num_partitions=4)
     .execute())
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{out}/orders/part-*.parquet"))
    assert len(files) >= 2
    # cluster-by contract: per-file key ranges must not overlap, so a
    # point/range scan on the cluster key can skip whole files off
    # parquet min/max statistics
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # o_orderkey is first
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo, f"overlapping cluster ranges: {ranges}"
    # data survives intact
    back = spark.read.parquet(f"{out}/orders")
    assert back.count() == spark.read.parquet(
        f"{sf_dir}/orders.parquet").count()

    from waimak_spark.dataflow.exceptions import DataFlowException

    with pytest.raises(DataFlowException, match="cluster column"):
        base_flow.write_clustered_parquet(out, "orders", cluster_cols=[])


def test_json_roundtrip(base_flow, spark, tmp_path):
    out = str(tmp_path / "jsonout")
    flow = (
        base_flow.transform("orders", output="small",
                            fn=lambda df: df.select("o_orderkey", "o_orderstatus")
                                            .limit(20))
        .write_json(out, "small")
    )
    flow.execute()
    # read back through the first-class JSON opener with an explicit schema
    # (inference is a full extra pass — the opener supports both)
    flow2 = (
        Waimak.spark_flow(spark)
        .open_file_json(f"{out}/small", "reloaded",
                        schema="o_orderkey bigint, o_orderstatus string")
    )
    _, final = flow2.execute()
    got = final.inputs.get("reloaded")
    assert got.count() == 20
    assert set(got.columns) == {"o_orderkey", "o_orderstatus"}


def test_orc_roundtrip(base_flow, spark, tmp_path):
    out = str(tmp_path / "orcout")
    (base_flow.transform("orders", output="small",
                         fn=lambda df: df.select("o_orderkey", "o_totalprice")
                                         .limit(15))
     .write_orc(out, "small")
     .execute())
    flow2 = (Waimak.spark_flow(spark)
             .open_file_orc(f"{out}/small", "reloaded"))
    _, final = flow2.execute()
    got = final.inputs.get("reloaded")
    assert got.count() == 15
    assert set(got.columns) == {"o_orderkey", "o_totalprice"}


def test_actions_tag_spark_ui_job_group(base_flow):
    """Every action's Spark jobs must carry the action guid as the job
    group and the action description on the UI, per-thread in the parallel
    executor, cleared afterwards (SparkFlowContext.scala:24-26)."""
    from waimak_spark.dataflow.spark_flow import Waimak

    seen: dict[str, tuple] = {}

    def probing_transform(tag):
        def fn(df):
            sc = df.sparkSession.sparkContext
            seen[tag] = (sc.getLocalProperty("spark.jobGroup.id"),
                         sc.getLocalProperty("spark.job.description"),
                         sc.getLocalProperty("spark.scheduler.pool"))
            return df.groupBy("l_returnflag").count()
        return fn

    flow = base_flow
    for i in range(2):
        flow = flow.transform("lineitem", output=f"g{i}",
                              fn=probing_transform(f"g{i}"))

    def build_pooled(f):
        return f.transform("lineitem", output="pooled",
                           fn=probing_transform("pooled"))

    flow = flow.execution_pool("aux")(build_pooled)
    executor = Waimak.spark_executor(max_parallel_actions=3)
    executed, final = executor.execute(flow)

    guids = {a.guid: a for a in executed}
    assert set(seen) == {"g0", "g1", "pooled"}
    for tag, (group, desc, pool) in seen.items():
        assert group in guids, f"{tag}: job group is not an action guid"
        assert desc == guids[group].description
    assert seen["pooled"][2] == "aux"          # fair-scheduler pool set
    assert seen["g0"][2] in (None, "")          # default pool untouched
    # cleared after the flow: the driver thread has no lingering group
    sc = final.context.spark.sparkContext
    assert sc.getLocalProperty("spark.jobGroup.id") is None
