"""Typed configuration: populate a dataclass from Spark conf (+ extra
maps and property providers), with prefixes, defaults, Optional/list
support and per-field separators.

Re-expresses CaseClassConfigParser
(waimak-core/.../configuration/CaseClassConfigParser.scala:199-285):
lookup order is additionalConf → spark conf → property providers (with
retries); a missing key without a dataclass default raises. Reflection on
Scala companions becomes plain ``dataclasses.fields`` + ``typing``
introspection.
"""

from __future__ import annotations

import dataclasses
import time
import typing
from typing import Any, Callable, Optional, Sequence, Type, TypeVar

CONFIG_PARAM_PREFIX = "spark.waimak.config"
PROPERTY_PROVIDER_GET_TIMEOUT_MS = (
    f"{CONFIG_PARAM_PREFIX}.propertyProviderGetTimeoutMs")
PROPERTY_PROVIDER_GET_TIMEOUT_MS_DEFAULT = 10_000
PROPERTY_PROVIDER_GET_RETRIES = (
    f"{CONFIG_PARAM_PREFIX}.propertyProviderGetRetries")
PROPERTY_PROVIDER_GET_RETRIES_DEFAULT = 3

T = TypeVar("T")


class ConfigException(Exception):
    pass


def separator(sep: str) -> dict:
    """Field metadata marker: ``field(metadata=separator(";"))`` overrides
    the default "," list separator (the @separator annotation)."""
    return {"waimak_separator": sep}


class PropertyProvider:
    """Pluggable secondary config source (secret stores etc.)."""

    def get(self, key: str) -> Optional[str]:
        raise NotImplementedError

    def get_with_retry(self, key: str, retries: int) -> Optional[str]:
        for attempt in range(retries + 1):
            try:
                return self.get(key)
            except Exception:
                if attempt == retries:
                    raise
                time.sleep(0.01 * (attempt + 1))
        return None


class JavaPropertiesPropertyProvider(PropertyProvider):
    """Wraps a plain dict (the java.util.Properties analogue)."""

    def __init__(self, properties: dict[str, str]):
        self.properties = dict(properties)

    def get(self, key: str) -> Optional[str]:
        return self.properties.get(key)


def _coerce(raw: str, tpe: Any, sep: str) -> Any:
    origin = typing.get_origin(tpe)
    if origin is typing.Union:  # Optional[X]
        args = [a for a in typing.get_args(tpe) if a is not type(None)]
        return _coerce(raw, args[0], sep)
    import collections.abc as _abc

    if origin in (list, tuple, _abc.Sequence):
        elem = (typing.get_args(tpe) or (str,))[0]
        items = [s for s in raw.split(sep)]
        vals = [_coerce(s.strip(), elem, sep) for s in items if s.strip()]
        return tuple(vals) if origin is tuple else vals
    if tpe is bool:
        if raw.lower() in ("true", "1", "yes"):
            return True
        if raw.lower() in ("false", "0", "no"):
            return False
        raise ConfigException(f"Cannot parse boolean from [{raw}]")
    if tpe is int:
        return int(raw)
    if tpe is float:
        return float(raw)
    return raw


def parse_config(cls: Type[T], context=None, prefix: str = "",
                 additional_conf: Optional[dict[str, str]] = None,
                 providers: Sequence[PropertyProvider] = ()) -> T:
    """Build ``cls`` (a dataclass) by resolving ``prefix + field_name``
    for every field. ``context`` is a SparkFlowContext / anything with a
    ``spark`` attribute, or None for map-only parsing."""
    if not dataclasses.is_dataclass(cls):
        raise ConfigException(f"{cls.__name__} is not a dataclass")
    conf = dict(additional_conf or {})
    retries = PROPERTY_PROVIDER_GET_RETRIES_DEFAULT
    if context is not None:
        retries = int(context.spark.conf.get(
            PROPERTY_PROVIDER_GET_RETRIES,
            str(PROPERTY_PROVIDER_GET_RETRIES_DEFAULT)))
    hints = typing.get_type_hints(cls)
    kwargs: dict[str, Any] = {}
    for f in dataclasses.fields(cls):
        key = f"{prefix}{f.name}"
        sep = f.metadata.get("waimak_separator", ",")
        raw: Optional[str] = conf.get(key)
        if raw is None and context is not None:
            raw = context.spark.conf.get(key, None)
        if raw is None:
            for p in providers:
                raw = p.get_with_retry(key, retries)
                if raw is not None:
                    break
        if raw is not None:
            kwargs[f.name] = _coerce(raw, hints[f.name], sep)
            continue
        has_default = (f.default is not dataclasses.MISSING
                       or f.default_factory is not dataclasses.MISSING)
        if not has_default:
            raise ConfigException(
                "No configuration value, no value in any property "
                f"providers or default value found for parameter {key}")
    return cls(**kwargs)
