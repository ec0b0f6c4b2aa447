"""Caching extensions: cacheAsParquet (plan-cut via write+re-read under the
temp folder) and sparkCache (persist + force).

Re-expresses SparkInterceptors.scala:31-65 and
CacheMetadataExtension.scala:9-82. The "cache only if reused" analysis —
skip the cache when <2 pending actions consume the label, governed by
``spark.waimak.dataflow.cacheOnlyReusedLabels`` (default true) — is the
reference's answer to repeated-subplan execution; write+re-read truncates
lineage, spills to disk, and survives executor loss, which at 100 TB is far
more robust than ``persist(MEMORY_AND_DISK)``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

from pyspark import StorageLevel
from pyspark.sql import DataFrame

from ..dataflow.flow import (
    CONF_EXTENSIONS,
    DataFlow,
    DataFlowConfigurationExtension,
    MetadataExtension,
    register_configuration_extension,
)
from ..dataflow.interceptor import PostActionInterceptor
from ..dataflow.spark_flow import CONF_CACHE_ONLY_REUSED


def _consumers(flow: DataFlow, label: str) -> int:
    return sum(1 for a in flow.actions for l in a.input_labels if l == label)


def _producer(flow: DataFlow, label: str):
    return next((a for a in flow.actions if label in a.output_labels), None)


def _mark_cached(flow: DataFlow, old_producer, label: str, attr: str) -> DataFlow:
    """Record on the (new) interceptor that ``label`` is already cached so a
    second cache request becomes a no-op — an explicit ``cache_as_parquet``
    plus the commit extension's auto-cache of reused committed labels would
    otherwise stack two write+re-read posts on one label: the second
    overwrite deletes the files the first one's re-read plan points at
    (self-overwrite read failure). One cache per label, like the reference."""
    new_producer = _producer(flow, label)
    marks = set(getattr(new_producer, attr, ()))
    marks |= set(getattr(old_producer, attr, ()))
    marks.add(label)
    setattr(new_producer, attr, frozenset(marks))
    return flow


class CacheAsParquetExtension(MetadataExtension):
    def __init__(self, label: str, partitions: int | None = None,
                 partition_cols: Sequence[str] | None = None,
                 repartition: bool = True):
        self.label = label
        self.partitions = partitions
        self.partition_cols = list(partition_cols or [])
        self.repartition = repartition

    def pre_execution(self, flow: DataFlow) -> DataFlow:
        flow = flow.without_extension(self)
        only_reused = flow.context.get_boolean(CONF_CACHE_ONLY_REUSED, True)
        if only_reused and _consumers(flow, self.label) < 2:
            return flow
        old_producer = _producer(flow, self.label)
        if self.label in getattr(old_producer, "parquet_cached_labels", ()):
            return flow  # already cached — never stack a second write+re-read

        ext = self

        def post(label: str, value, context):
            if value is None:
                return None
            if context.temp_folder is None:
                raise ValueError("cache_as_parquet requires a flow temp folder")
            path = f"{context.temp_folder}/{label}"
            df: DataFrame = value
            if ext.partitions is not None:
                df = df.repartition(ext.partitions)
            elif ext.partition_cols and ext.repartition:
                df = df.repartition(*[df[c] for c in ext.partition_cols])
            w = df.write
            if ext.partition_cols:
                w = w.partitionBy(*ext.partition_cols)
            w.mode("overwrite").parquet(path)
            return context.spark.read.parquet(path)

        flow = PostActionInterceptor.attach(flow, self.label, post)
        return _mark_cached(flow, old_producer, self.label,
                            "parquet_cached_labels")


class SparkCacheExtension(MetadataExtension):
    def __init__(self, label: str, storage_level: str = "MEMORY_AND_DISK"):
        self.label = label
        self.storage_level = storage_level

    def pre_execution(self, flow: DataFlow) -> DataFlow:
        flow = flow.without_extension(self)
        only_reused = flow.context.get_boolean(CONF_CACHE_ONLY_REUSED, True)
        if only_reused and _consumers(flow, self.label) < 2:
            return flow
        old_producer = _producer(flow, self.label)
        if self.label in getattr(old_producer, "spark_cached_labels", ()):
            return flow
        level = getattr(StorageLevel, self.storage_level)

        def post(_label: str, value, _context):
            if value is None:
                return None
            df: DataFrame = value.persist(level)
            df.head(1)  # cheap forcing action (vs rdd.isEmpty in the reference)
            return df

        flow = PostActionInterceptor.attach(flow, self.label, post)
        return _mark_cached(flow, old_producer, self.label,
                            "spark_cached_labels")


# ---------------------------------------------------------------------------
# Conf-driven cache extensions (CacheConfigurationExtension.scala:6-29):
# enabled by listing their key in ``spark.waimak.dataflow.extensions``;
# each parses ``spark.waimak.dataflow.extensions.<key>.{cacheAll,cacheLabels}``
# and routes through the same flow methods as the programmatic API, so the
# cache-only-if-reused rule and the one-cache-per-label guard apply equally.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _CacheExtensionConf:
    """CacheConfigurationExtensionConf (CacheConfigurationExtension.scala:29)."""

    cacheAll: bool = False
    cacheLabels: list[str] = dataclasses.field(default_factory=list)


class CacheConfigurationExtension(DataFlowConfigurationExtension):
    """Shared conf-parse + label-enumeration for the two cache extensions.

    With ``cacheAll`` every output label of every action is cached (the
    reference's ``flow.actions.flatMap(_.outputLabels)``); otherwise only
    the comma-separated ``cacheLabels``."""

    def _labels_to_cache(self, flow) -> list[str]:
        from ..app.config import parse_config

        conf = parse_config(
            _CacheExtensionConf, flow.context,
            f"{CONF_EXTENSIONS}.{self.extension_key}.")
        if conf.cacheAll:
            return [l for a in flow.actions for l in a.output_labels]
        return conf.cacheLabels

    def pre_execution_manipulation(self, flow):
        return self.cache_labels(flow, self._labels_to_cache(flow))

    def cache_labels(self, flow, labels):  # pragma: no cover - abstract
        raise NotImplementedError


@register_configuration_extension
class CacheAsParquetConfigurationExtension(CacheConfigurationExtension):
    extension_key = "cacheasparquet"

    def cache_labels(self, flow, labels):
        return flow.cache_as_parquet(*labels)


@register_configuration_extension
class SparkCacheConfigurationExtension(CacheConfigurationExtension):
    extension_key = "sparkcache"

    def cache_labels(self, flow, labels):
        return flow.spark_cache(*labels)
