"""Typed configuration: populate a dataclass from Spark conf (+ extra
maps and property providers), with prefixes, defaults, Optional/list
support and per-field separators.

Re-expresses CaseClassConfigParser
(waimak-core/.../configuration/CaseClassConfigParser.scala:199-285):
lookup order is additionalConf → spark conf → property providers (with
retries); a missing key without a dataclass default raises. Reflection on
Scala companions becomes plain ``dataclasses.fields`` + ``typing``
introspection.

Property providers can be registered declaratively via the
``spark.waimak.config.propertyProviderBuilderObjects`` conf (a comma
list of dotted ``module.ClassName`` paths, the
CONFIG_PROPERTY_PROVIDER_BUILDER_MODULES mechanism of
CaseClassConfigParser.scala:159-166). Concrete secret-store providers
ship for environment variables and mounted secret files — the
public-infrastructure equivalents of the reference's Databricks secret
scopes (DatabricksSecretsPropertyProviderBuilder.scala:20-60), with the
same key-sanitization and scope-search behavior.
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
PROPERTY_PROVIDER_BUILDER_MODULES = (
    f"{CONFIG_PARAM_PREFIX}.propertyProviderBuilderObjects")
PROPERTIES_FILE_URI = f"{CONFIG_PARAM_PREFIX}.propertiesFileURI"
#: comma list of env-var prefixes to try (empty → the bare key only)
ENV_SECRET_PREFIXES = f"{CONFIG_PARAM_PREFIX}.envSecretPrefixes"
#: directory whose files are secrets (key → file name, value → contents)
SECRET_FILES_DIR = f"{CONFIG_PARAM_PREFIX}.secretFilesDir"
#: replace non [a-zA-Z0-9-] characters in keys before secret lookup
REPLACE_SPECIAL_CHARACTERS_IN_KEY = (
    f"{CONFIG_PARAM_PREFIX}.replaceSpecialCharactersInKey")
REPLACE_SPECIAL_CHARACTERS_IN_KEY_DEFAULT = True
#: comma list of Databricks secret scopes to search (empty → all scopes)
DATABRICKS_SECRET_SCOPES = (
    f"{CONFIG_PARAM_PREFIX}.databricksSecretScopes")
#: Databricks-specific sanitization toggle — the reference reads this key
#: (CONFIG_DATABRICKS_REPLACE_SPECIAL_CHARACTERS_IN_KEY), so a config
#: written for it must work here; falls back to the generic key above
DATABRICKS_REPLACE_SPECIAL_CHARACTERS_IN_KEY = (
    f"{CONFIG_PARAM_PREFIX}.databricksReplaceSpecialCharactersInKey")

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


# ---------------------------------------------------------------------------
# provider builders (PropertyProviderBuilder trait +
# CONFIG_PROPERTY_PROVIDER_BUILDER_MODULES, CaseClassConfigParser.scala:159-166)
# ---------------------------------------------------------------------------


class PropertyProviderBuilder:
    """Constructs a :class:`PropertyProvider` from the flow context —
    registered by dotted class path in the
    ``propertyProviderBuilderObjects`` Spark conf."""

    def get_property_provider(self, context) -> PropertyProvider:
        raise NotImplementedError


def _spark_conf_get(context, key: str, default: Optional[str] = None):
    if context is None:
        return default
    return context.spark.conf.get(key, default)


def _sanitize_key(context, key: str, replacement: str = "-",
                  conf_keys: tuple = (REPLACE_SPECIAL_CHARACTERS_IN_KEY,)
                  ) -> str:
    """Replace characters secret stores commonly reject
    (DatabricksSecretsPropertyProviderBuilder.replaceSpecialKeyCharacters).
    ``conf_keys``: toggle confs tried in order, first one set wins — lets
    the Databricks provider honor its store-specific key name while
    falling back to the generic one."""
    raw = None
    for ck in conf_keys:
        raw = _spark_conf_get(context, ck)
        if raw is not None:
            break
    enabled = (REPLACE_SPECIAL_CHARACTERS_IN_KEY_DEFAULT if raw is None
               else raw.lower() == "true")
    if not enabled:
        return key
    import re

    return re.sub(r"[^a-zA-Z0-9-]", replacement, key)


class PropertiesFilePropertyProviderBuilder(PropertyProviderBuilder):
    """java-style ``.properties`` file named by the ``propertiesFileURI``
    conf (PropertiesFilePropertyProviderBuilder of the reference)."""

    def get_property_provider(self, context) -> PropertyProvider:
        uri = _spark_conf_get(context, PROPERTIES_FILE_URI)
        if not uri:
            raise ConfigException(
                f"{PROPERTIES_FILE_URI} must be set to use "
                "PropertiesFilePropertyProviderBuilder")
        props: dict[str, str] = {}
        content = context.file_ops.read_string(uri)
        for line in content.splitlines():
            line = line.strip()
            if not line or line.startswith(("#", "!")):
                continue
            # split at the FIRST separator of either kind, like
            # java.util.Properties — preferring '=' regardless of position
            # would split `endpoint: https://h/p?a=b` at the '=' inside
            # the value and register the wrong key
            cut = min((i for i in (line.find("="), line.find(":"))
                       if i >= 0), default=-1)
            if cut >= 0:
                props[line[:cut].strip()] = line[cut + 1:].strip()
        return JavaPropertiesPropertyProvider(props)


class EnvSecretsPropertyProviderBuilder(PropertyProviderBuilder):
    """Environment-variable-backed secrets — the public-infrastructure
    stand-in for the reference's Databricks secret scopes
    (DatabricksSecretsPropertyProviderBuilder.scala:20-60): optional
    prefixes play the role of scopes (searched in order), and keys are
    sanitized to the character set env vars allow (``_`` instead of the
    Databricks ``-``)."""

    def get_property_provider(self, context) -> PropertyProvider:
        prefixes_raw = _spark_conf_get(context, ENV_SECRET_PREFIXES, "")
        prefixes = [p.strip() for p in prefixes_raw.split(",") if p.strip()] \
            or [""]
        sanitized = lambda key: _sanitize_key(context, key, "_").replace(
            "-", "_")

        class _EnvProvider(PropertyProvider):
            def get(self, key: str) -> Optional[str]:
                import os

                name = sanitized(key)
                for prefix in prefixes:
                    val = os.environ.get(f"{prefix}{name}")
                    if val is not None:
                        return val
                return None

        return _EnvProvider()


class SecretFilesPropertyProviderBuilder(PropertyProviderBuilder):
    """Mounted-secret-files directory (the Kubernetes/HashiCorp pattern):
    ``secretFilesDir`` names a directory where each secret is one file —
    file name = sanitized key, file contents = value."""

    def get_property_provider(self, context) -> PropertyProvider:
        base = _spark_conf_get(context, SECRET_FILES_DIR)
        if not base:
            raise ConfigException(
                f"{SECRET_FILES_DIR} must be set to use "
                "SecretFilesPropertyProviderBuilder")
        ctx = context

        class _FileProvider(PropertyProvider):
            def get(self, key: str) -> Optional[str]:
                path = f"{base.rstrip('/')}/{_sanitize_key(ctx, key)}"
                if not ctx.file_ops.exists(path):
                    return None
                return ctx.file_ops.read_string(path).strip()

        return _FileProvider()


class DatabricksSecretsPropertyProviderBuilder(PropertyProviderBuilder):
    """Databricks secret-scope-backed secrets
    (DatabricksSecretsPropertyProviderBuilder.scala:20-60): searches the
    scopes named by ``databricksSecretScopes`` (all available scopes when
    unset) in order, sanitizing keys to ``[a-zA-Z0-9-]`` per the
    ``replaceSpecialCharactersInKey`` conf (default true — secret stores
    backed by repositories reject special characters), and returns the
    first scope that holds the key.

    ``dbutils`` is resolved LAZILY at provider-build time via the public
    ``pyspark.dbutils.DBUtils`` entry point (present only on Databricks
    runtimes), so importing this module costs nothing elsewhere;
    ``secrets_api`` is injectable for tests and non-Databricks secret
    services with the same list-scopes/get shape."""

    def __init__(self, secrets_api=None):
        self._secrets_api = secrets_api

    def _resolve_secrets(self, context):
        if self._secrets_api is not None:
            return self._secrets_api
        try:  # public Databricks runtime entry point
            from pyspark.dbutils import DBUtils  # noqa: WPS433

            return DBUtils(context.spark).secrets
        except Exception as e:
            raise ConfigException(
                "DatabricksSecretsPropertyProviderBuilder needs a "
                "Databricks runtime (pyspark.dbutils) or an injected "
                f"secrets_api: {e}")

    def get_property_provider(self, context) -> PropertyProvider:
        secrets = self._resolve_secrets(context)
        scopes_raw = _spark_conf_get(context, DATABRICKS_SECRET_SCOPES, "")
        names = [s.strip() for s in scopes_raw.split(",") if s.strip()]
        sanitize = lambda key: _sanitize_key(
            context, key, "-",
            conf_keys=(DATABRICKS_REPLACE_SPECIAL_CHARACTERS_IN_KEY,
                       REPLACE_SPECIAL_CHARACTERS_IN_KEY))

        class _DatabricksProvider(PropertyProvider):
            def get(self, key: str) -> Optional[str]:
                scopes = names or [getattr(s, "name", s)
                                   for s in secrets.listScopes()]
                name = sanitize(key)
                for scope in scopes:
                    try:
                        return secrets.get(scope, name)
                    except Exception:
                        continue  # key absent in this scope — try the next
                return None

        return _DatabricksProvider()


def resolve_property_providers(context) -> list[PropertyProvider]:
    """Instantiate the builders named (dotted paths) in the
    ``propertyProviderBuilderObjects`` conf and collect their providers
    (CaseClassConfigParser.getPropertyProviders, :159-166)."""
    raw = _spark_conf_get(context, PROPERTY_PROVIDER_BUILDER_MODULES, "")
    providers = []
    for dotted in (s.strip() for s in raw.split(",") if s.strip()):
        import importlib

        module_name, _, cls_name = dotted.rpartition(".")
        try:
            cls = getattr(importlib.import_module(module_name), cls_name)
        except (ImportError, AttributeError, ValueError) as e:
            raise ConfigException(
                f"Could not load property provider builder [{dotted}]: {e}")
        builder = cls()
        if not isinstance(builder, PropertyProviderBuilder):
            raise ConfigException(
                f"[{dotted}] is not a PropertyProviderBuilder")
        providers.append(builder.get_property_provider(context))
    return providers


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
    if tpe is str:
        return raw
    # CaseClassConfigParser.scala:221-251: an unsupported field type is a
    # loud configuration-definition error, never a silent string passthrough
    raise ConfigException(f"Unsupported config field type {tpe!r}")


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
        # conf-registered secret-store providers come AFTER any explicitly
        # passed ones (CaseClassConfigParser.scala:203 ordering)
        providers = list(providers) + resolve_property_providers(context)
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
            # a value that fails coercion reports WHICH parameter, like the
            # reference's parsing errors (TestCaseClassConfigParser
            # "wrong type should throw a parsing error")
            try:
                kwargs[f.name] = _coerce(raw, hints[f.name], sep)
            except ConfigException as e:
                raise ConfigException(f"{e} (parameter {key})") from e
            except (ValueError, TypeError) as e:
                raise ConfigException(
                    f"Cannot parse value [{raw}] as {hints[f.name]} "
                    f"for parameter {key}") from e
            continue
        has_default = (f.default is not dataclasses.MISSING
                       or f.default_factory is not dataclasses.MISSING)
        if not has_default:
            raise ConfigException(
                "No configuration value, no value in any property "
                f"providers or default value found for parameter {key}")
    return cls(**kwargs)
