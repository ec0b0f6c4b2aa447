"""Conf-driven cache extensions — the reference's
TestCacheConfigurationExtension.scala matrix: no caching without the conf,
cacheLabels caches exactly the named labels, cacheAll caches every output
label; both the plan-cut parquet variant and the persist variant."""

import contextlib

import pytest

from waimak_spark.dataflow import Waimak
from waimak_spark.dataflow.exceptions import FlowValidationException


@contextlib.contextmanager
def _conf(spark, **pairs):
    keys = {
        "extensions": "spark.waimak.dataflow.extensions",
        "cap_labels": "spark.waimak.dataflow.extensions.cacheasparquet.cacheLabels",
        "cap_all": "spark.waimak.dataflow.extensions.cacheasparquet.cacheAll",
        "sc_labels": "spark.waimak.dataflow.extensions.sparkcache.cacheLabels",
        "sc_all": "spark.waimak.dataflow.extensions.sparkcache.cacheAll",
        "keep_temp": "spark.waimak.dataflow.removeTempAfterExecution",
    }
    try:
        for k, v in pairs.items():
            spark.conf.set(keys[k], v)
        yield
    finally:
        for k in pairs:
            spark.conf.unset(keys[k])


def _flow(spark, sf_dir, tmp_flow_dir):
    """Two aliased labels, each consumed twice (reused, so the
    cache-only-if-reused rule never masks the conf behavior). Two DISTINCT
    sources, like the reference's csv_1/csv_2 — aliases of one source share
    a plan, so caching one would make the other read as cached too."""
    flow = (
        Waimak.spark_flow(spark, tmp_flow_dir)
        .open_file_parquet(f"{sf_dir}/nation.parquet", "src")
        .open_file_parquet(f"{sf_dir}/region.parquet", "src_2")
        .alias("src", "purchases")
        .alias("src_2", "purchases_2")
    )
    for label in ("purchases", "purchases_2"):
        flow = (
            flow.transform(label, output=f"{label}_a", fn=lambda df: df.limit(5))
            .transform(label, output=f"{label}_b", fn=lambda df: df.limit(3))
        )
    return flow


def _parquet_exists(spark, path):
    try:
        spark.read.parquet(path).collect()
        return True
    except Exception:
        return False


def test_no_conf_no_caching(spark, sf_dir, tmp_flow_dir):
    with _conf(spark, keep_temp="false"):
        _, final = _flow(spark, sf_dir, tmp_flow_dir).execute()
    assert not _parquet_exists(spark, f"{tmp_flow_dir}/purchases")
    assert not _parquet_exists(spark, f"{tmp_flow_dir}/purchases_2")
    assert not final.inputs.get("purchases").is_cached
    assert not final.inputs.get("purchases_2").is_cached


def test_cacheasparquet_single_label(spark, sf_dir, tmp_flow_dir):
    with _conf(spark, extensions="cacheasparquet", cap_labels="purchases",
               keep_temp="false"):
        _, final = _flow(spark, sf_dir, tmp_flow_dir).execute()
    cached = spark.read.parquet(f"{tmp_flow_dir}/purchases")
    assert sorted(r.n_nationkey for r in cached.collect()) == sorted(
        r.n_nationkey
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    )
    assert not _parquet_exists(spark, f"{tmp_flow_dir}/purchases_2")


def test_cacheasparquet_cache_all(spark, sf_dir, tmp_flow_dir):
    with _conf(spark, extensions="cacheasparquet", cap_all="true",
               keep_temp="false"):
        _, final = _flow(spark, sf_dir, tmp_flow_dir).execute()
    assert _parquet_exists(spark, f"{tmp_flow_dir}/purchases")
    assert _parquet_exists(spark, f"{tmp_flow_dir}/purchases_2")
    # single-consumer outputs stay uncached even under cacheAll: the
    # cache-only-if-reused rule applies to conf-driven caching too
    assert not _parquet_exists(spark, f"{tmp_flow_dir}/purchases_a")


def test_sparkcache_single_label(spark, sf_dir, tmp_flow_dir):
    with _conf(spark, extensions="sparkcache", sc_labels="purchases"):
        _, final = _flow(spark, sf_dir, tmp_flow_dir).execute()
    try:
        assert final.inputs.get("purchases").is_cached
        assert not final.inputs.get("purchases_2").is_cached
    finally:
        final.inputs.get("purchases").unpersist()


def test_sparkcache_cache_all(spark, sf_dir, tmp_flow_dir):
    with _conf(spark, extensions="sparkcache", sc_all="true"):
        _, final = _flow(spark, sf_dir, tmp_flow_dir).execute()
    try:
        assert final.inputs.get("purchases").is_cached
        assert final.inputs.get("purchases_2").is_cached
    finally:
        final.inputs.get("purchases").unpersist()
        final.inputs.get("purchases_2").unpersist()


def test_both_extensions_compose(spark, sf_dir, tmp_flow_dir):
    with _conf(spark, extensions="cacheasparquet,sparkcache",
               cap_labels="purchases", sc_labels="purchases_2",
               keep_temp="false"):
        _, final = _flow(spark, sf_dir, tmp_flow_dir).execute()
    try:
        assert _parquet_exists(spark, f"{tmp_flow_dir}/purchases")
        assert final.inputs.get("purchases_2").is_cached
    finally:
        final.inputs.get("purchases_2").unpersist()


def test_conf_cache_composes_with_commit_autocache(spark, sf_dir,
                                                   tmp_flow_dir, tmp_path):
    """A conf-cached label that is ALSO committed (and reused, so the
    commit extension's auto-cache targets it too) caches exactly once —
    the one-cache-per-label guard prevents two stacked write+re-reads
    whose second overwrite would delete the files the first one's
    re-read plan points at."""
    from waimak_spark.operators import ParquetDataCommitter

    with _conf(spark, extensions="cacheasparquet", cap_labels="report",
               keep_temp="false"):
        flow = (
            Waimak.spark_flow(spark, tmp_flow_dir)
            .open_file_parquet(f"{sf_dir}/orders.parquet", "orders")
            .transform("orders", output="report", fn=lambda df: df.limit(7))
            .transform("report", output="x", fn=lambda df: df.limit(3))
            .transform("report", output="y", fn=lambda df: df.limit(2))
            .commit("c", "report")
            .push("c", ParquetDataCommitter(str(tmp_path / "dest")))
        )
        _, final = flow.execute()
    assert spark.read.parquet(f"{tmp_path}/dest/report").count() == 7
    assert final.inputs.get("x").count() == 3


def test_unknown_extension_key_raises(spark, sf_dir, tmp_flow_dir):
    with _conf(spark, extensions="nosuchext"):
        with pytest.raises(FlowValidationException, match="nosuchext"):
            _flow(spark, sf_dir, tmp_flow_dir).execute()
