"""App layer: config parsing matrix, env templates, SparkApp/WaimakApp
lifecycle, multi-app dependency ordering — scenarios modeled on
TestCaseClassConfigParser.scala / TestMultiAppRunner.scala."""

from dataclasses import dataclass, field
from typing import Optional, Sequence

import pytest

from waimak_spark.app import (
    BaseEnv,
    ConfigException,
    HiveEnv,
    JavaPropertiesPropertyProvider,
    MultiAppRunner,
    SparkApp,
    WaimakApp,
    parse_config,
    separator,
)


@dataclass(frozen=True)
class DemoConf:
    name: str
    count: int = 5
    ratio: float = 0.5
    enabled: bool = True
    tags: Sequence[str] = field(default_factory=tuple,
                                metadata=separator(";"))
    comment: Optional[str] = None


class TestConfigParser:
    def test_types_and_defaults_from_map(self):
        conf = parse_config(DemoConf, None, "app.",
                            {"app.name": "x", "app.count": "7",
                             "app.ratio": "0.25", "app.enabled": "false",
                             "app.tags": "a; b;c"})
        assert conf == DemoConf("x", 7, 0.25, False, ["a", "b", "c"], None)

    def test_missing_required_raises(self):
        with pytest.raises(ConfigException, match="app.name"):
            parse_config(DemoConf, None, "app.", {})

    def test_defaults_applied(self):
        conf = parse_config(DemoConf, None, "app.", {"app.name": "x"})
        assert (conf.count, conf.ratio, conf.enabled) == (5, 0.5, True)

    def test_spark_conf_lookup(self, spark):
        from waimak_spark.dataflow.spark_flow import SparkFlowContext

        spark.conf.set("t.app.name", "from_spark")
        try:
            conf = parse_config(DemoConf, SparkFlowContext(spark), "t.app.")
            assert conf.name == "from_spark"
        finally:
            spark.conf.unset("t.app.name")

    def test_additional_conf_wins_over_spark(self, spark):
        from waimak_spark.dataflow.spark_flow import SparkFlowContext

        spark.conf.set("t2.app.name", "spark_val")
        try:
            conf = parse_config(DemoConf, SparkFlowContext(spark), "t2.app.",
                                {"t2.app.name": "map_val"})
            assert conf.name == "map_val"
        finally:
            spark.conf.unset("t2.app.name")

    def test_property_provider_fallback(self):
        provider = JavaPropertiesPropertyProvider({"app.name": "secret"})
        conf = parse_config(DemoConf, None, "app.", {}, providers=[provider])
        assert conf.name == "secret"

    def test_bad_boolean_raises(self):
        with pytest.raises(ConfigException, match="boolean"):
            parse_config(DemoConf, None, "app.",
                         {"app.name": "x", "app.enabled": "maybe"})

    def test_property_provider_retry_semantics(self):
        """TestPropertyProviderTrait.scala:8-22: transient provider
        failures are retried up to the budget (succeed on the third
        attempt with 2 failures queued); a zero budget propagates the
        first failure."""
        from waimak_spark.app.config import PropertyProvider

        class Flaky(PropertyProvider):
            def __init__(self, n_failures):
                self.n = n_failures

            def get(self, key):
                if self.n:
                    self.n -= 1
                    raise RuntimeError("transient")
                return "no exception"

        assert Flaky(2).get_with_retry("k", 3) == "no exception"
        with pytest.raises(RuntimeError, match="transient"):
            Flaky(1).get_with_retry("k", 0)

    def test_wrong_type_raises_with_parameter_name(self):
        """A value that fails coercion must surface as a ConfigException
        naming the offending parameter (TestCaseClassConfigParser "wrong
        type should throw a parsing error"), never a bare ValueError."""
        with pytest.raises(ConfigException, match=r"app\.count"):
            parse_config(DemoConf, None, "app.",
                         {"app.name": "x", "app.count": "not-a-number"})
        # the boolean branch's own message also gains the parameter name
        with pytest.raises(ConfigException, match=r"app\.enabled"):
            parse_config(DemoConf, None, "app.",
                         {"app.name": "x", "app.enabled": "maybe"})

    def test_unsupported_field_type_raises(self):
        """An unsupported field type is a loud configuration-definition
        error, not a silent string passthrough
        (TestCaseClassConfigParser "unsupported type should throw")."""
        import dataclasses as dc

        @dc.dataclass
        class BadConf:
            mapping: dict

        with pytest.raises(ConfigException, match="Unsupported"):
            parse_config(BadConf, None, "b.", {"b.mapping": "k=v"})

    def test_roundtrip_property(self):
        """Hypothesis: any value set encoded to conf strings parses back
        to the original dataclass — ints/floats via repr, bools via
        true/false, lists of ints through a custom separator."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        import dataclasses as dc

        from waimak_spark.app.config import separator

        @dc.dataclass
        class RtConf:
            name: str
            count: int
            ratio: float
            enabled: bool
            nums: list = dc.field(metadata=separator(";"),
                                  default_factory=list)

        # redeclare with a typed list for get_type_hints
        RtConf.__annotations__["nums"] = list[int]

        @settings(max_examples=80, deadline=None)
        @given(name=st.text(min_size=0, max_size=30).filter(
                   lambda s: s.strip() == s),
               count=st.integers(),
               ratio=st.floats(allow_nan=False, allow_infinity=False),
               enabled=st.booleans(),
               nums=st.lists(st.integers(), max_size=8))
        def roundtrip(name, count, ratio, enabled, nums):
            conf = {"rt.name": name, "rt.count": str(count),
                    "rt.ratio": repr(ratio),
                    "rt.enabled": "true" if enabled else "false",
                    "rt.nums": ";".join(str(n) for n in nums)}
            got = parse_config(RtConf, None, "rt.", conf)
            assert (got.name, got.count, got.enabled) == (
                name, count, enabled)
            assert got.ratio == ratio or (got.ratio != got.ratio
                                          and ratio != ratio)
            assert got.nums == nums

        roundtrip()


class TestEnv:
    def test_base_env_paths(self):
        env = BaseEnv("file:///tmp/envtest", "dev", "My-Project", "Feature/ABC")
        assert env.base_path == "file:///tmp/envtest/data/dev/my_project/feature_abc"
        assert env.tmp_dir.endswith("/tmp")

    def test_prod_drops_branch(self):
        env = BaseEnv("hdfs://nn", "PROD", "proj", "whatever")
        assert env.base_path == "hdfs://nn/data/prod/proj"

    def test_hive_env_db_names(self):
        env = HiveEnv("file:///tmp/x", "dev", "proj", "br",
                      base_database_location="/tmp/x/dbs",
                      extra_dbs=("Staging",))
        assert env.base_db_name == "dev_proj_br"
        assert env.all_dbs == ["dev_proj_br_staging", "dev_proj_br"]

    def test_create_cleanup_roundtrip(self, spark, tmp_path):
        env = BaseEnv(f"file://{tmp_path}", "dev", "p", "b")
        env.create(spark)
        import os

        assert os.path.isdir(f"{tmp_path}/data/dev/p/b")
        env.cleanup(spark)
        assert not os.path.exists(f"{tmp_path}/data/dev/p/b")


class _CountingApp(WaimakApp):
    env_cls = BaseEnv

    def __init__(self):
        self.ran_with: list = []

    def conf_defaults(self, env):
        return {"my.app.default": "defval"}

    def flow(self, empty_flow, env):
        self.ran_with.append(env)
        df = empty_flow.spark.range(3)
        return empty_flow.open("numbers", lambda c: df).alias("numbers", "out")


def _set_env_conf(spark, prefix, tmp_path):
    spark.conf.set(f"{prefix}uri", f"file://{tmp_path}")
    spark.conf.set(f"{prefix}environment", "dev")
    spark.conf.set(f"{prefix}project", "proj")
    spark.conf.set(f"{prefix}branch", "b1")


class TestApps:
    def test_waimak_app_runs_flow(self, spark, tmp_path):
        app = _CountingApp()
        _set_env_conf(spark, "spark.waimak.environment.one.", tmp_path)
        app.run_spark_app(spark, "spark.waimak.environment.one.")
        assert len(app.ran_with) == 1
        assert app.ran_with[0].base_path == f"file://{tmp_path}/data/dev/proj/b1"
        assert spark.conf.get("my.app.default") == "defval"

    def test_user_conf_wins_over_default(self, spark, tmp_path):
        app = _CountingApp()
        _set_env_conf(spark, "spark.waimak.environment.two.", tmp_path)
        spark.conf.set("my.app.default", "uservalue")
        app.run_spark_app(spark, "spark.waimak.environment.two.")
        assert spark.conf.get("my.app.default") == "uservalue"

    def test_multi_app_runner_dependency_order(self, spark, tmp_path):
        order: list[str] = []

        class _Recorder(SparkApp):
            env_cls = BaseEnv

            def __init__(self, tag):
                self.tag = tag

            def run(self, spark, env):
                order.append(self.tag)

        for name in ("first", "second"):
            _set_env_conf(spark, f"spark.waimak.environment.{name}.", tmp_path)
        spark.conf.set("spark.waimak.apprunner.apps", "second,first")
        spark.conf.set("spark.waimak.apprunner.first.appName", "a1")
        spark.conf.set("spark.waimak.apprunner.second.appName", "a2")
        spark.conf.set("spark.waimak.apprunner.second.dependencies", "first")
        try:
            MultiAppRunner({"a1": _Recorder("first"),
                            "a2": _Recorder("second")}).run_all(spark)
        finally:
            for k in ("spark.waimak.apprunner.apps",
                      "spark.waimak.apprunner.first.appName",
                      "spark.waimak.apprunner.second.appName",
                      "spark.waimak.apprunner.second.dependencies"):
                spark.conf.unset(k)
        assert order == ["first", "second"]


class TestEnvironmentManager:
    def test_create_and_cleanup_actions(self, spark, tmp_path):
        from waimak_spark.app.runner import EnvironmentManager

        calls = []

        class App(WaimakApp):
            def create_env(self, spark, prefix):
                calls.append(("create", prefix))

            def cleanup_env(self, spark, prefix):
                calls.append(("cleanup", prefix))

        mgr = EnvironmentManager({"demo": App()})
        spark.conf.set(EnvironmentManager.CONF_APP, "demo")
        try:
            spark.conf.set(EnvironmentManager.CONF_ACTION, "create")
            mgr.perform_env_action(spark)
            spark.conf.set(EnvironmentManager.CONF_ACTION, "cleanup")
            mgr.perform_env_action(spark)
        finally:
            spark.conf.unset(EnvironmentManager.CONF_APP)
            spark.conf.unset(EnvironmentManager.CONF_ACTION)
        assert calls == [("create", "spark.waimak.environment."),
                         ("cleanup", "spark.waimak.environment.")]

    def test_unknown_app_or_action_raise(self, spark):
        from waimak_spark.app.runner import EnvironmentManager

        mgr = EnvironmentManager({})
        spark.conf.set(EnvironmentManager.CONF_APP, "nope")
        try:
            with pytest.raises(KeyError):
                mgr.perform_env_action(spark)
        finally:
            spark.conf.unset(EnvironmentManager.CONF_APP)

        mgr2 = EnvironmentManager({"demo": WaimakApp()})
        spark.conf.set(EnvironmentManager.CONF_APP, "demo")
        spark.conf.set(EnvironmentManager.CONF_ACTION, "destroy")
        try:
            with pytest.raises(ValueError, match="destroy"):
                mgr2.perform_env_action(spark)
        finally:
            spark.conf.unset(EnvironmentManager.CONF_APP)
            spark.conf.unset(EnvironmentManager.CONF_ACTION)


class TestLogAndReturn:
    def test_passthrough_and_message(self, caplog):
        import logging

        from waimak_spark.log import log_and_return

        with caplog.at_level(logging.INFO, logger="waimak_spark"):
            assert log_and_return(41, "static message") == 41
            assert log_and_return(42, lambda v: f"value={v}") == 42
        assert "static message" in caplog.text
        assert "value=42" in caplog.text

    def test_lazy_message_not_built_below_level(self, caplog):
        import logging

        from waimak_spark.log import log_and_return

        boom = lambda v: (_ for _ in ()).throw(AssertionError("built"))  # noqa: E731
        with caplog.at_level(logging.ERROR, logger="waimak_spark"):
            assert log_and_return(7, boom, level=logging.DEBUG) == 7


class TestSecretProviders:
    """Provider-builder registry + concrete secret stores (the pattern of
    DatabricksSecretsPropertyProviderBuilder.scala:20-60, against public
    infrastructure: env vars, secret files, properties files)."""

    @dataclass(frozen=True)
    class SecretConf:
        api_token: str

    def _ctx(self, spark, tmp_path):
        from waimak_spark.dataflow.spark_flow import SparkFlowContext

        return SparkFlowContext(spark, str(tmp_path / "tmp"))

    def test_env_secrets_provider_chain(self, spark, tmp_path, monkeypatch):
        from waimak_spark.app.config import (
            ENV_SECRET_PREFIXES,
            PROPERTY_PROVIDER_BUILDER_MODULES,
        )

        ctx = self._ctx(spark, tmp_path)
        # the key "myapp.api_token" sanitizes to env-safe "myapp_api_token";
        # the APP1_ prefix plays the role of a secret scope
        monkeypatch.setenv("APP1_myapp_api_token", "s3cr3t")
        spark.conf.set(PROPERTY_PROVIDER_BUILDER_MODULES,
                       "waimak_spark.app.config."
                       "EnvSecretsPropertyProviderBuilder")
        spark.conf.set(ENV_SECRET_PREFIXES, "APP0_,APP1_")
        try:
            conf = parse_config(self.SecretConf, ctx, prefix="myapp.")
            assert conf.api_token == "s3cr3t"
        finally:
            spark.conf.unset(PROPERTY_PROVIDER_BUILDER_MODULES)
            spark.conf.unset(ENV_SECRET_PREFIXES)

    def test_secret_files_provider(self, spark, tmp_path):
        from waimak_spark.app.config import (
            PROPERTY_PROVIDER_BUILDER_MODULES,
            SECRET_FILES_DIR,
        )

        ctx = self._ctx(spark, tmp_path)
        secrets = tmp_path / "secrets"
        secrets.mkdir()
        # "myapp.api_token" sanitizes to "myapp-api-token" (Databricks-style)
        (secrets / "myapp-api-token").write_text("from-file\n")
        spark.conf.set(PROPERTY_PROVIDER_BUILDER_MODULES,
                       "waimak_spark.app.config."
                       "SecretFilesPropertyProviderBuilder")
        spark.conf.set(SECRET_FILES_DIR, str(secrets))
        try:
            conf = parse_config(self.SecretConf, ctx, prefix="myapp.")
            assert conf.api_token == "from-file"
        finally:
            spark.conf.unset(PROPERTY_PROVIDER_BUILDER_MODULES)
            spark.conf.unset(SECRET_FILES_DIR)

    def test_properties_file_provider(self, spark, tmp_path):
        from waimak_spark.app.config import (
            PROPERTIES_FILE_URI,
            PROPERTY_PROVIDER_BUILDER_MODULES,
        )

        ctx = self._ctx(spark, tmp_path)
        pfile = tmp_path / "app.properties"
        pfile.write_text("# comment\nmyapp.api_token = from-props\n")
        spark.conf.set(PROPERTY_PROVIDER_BUILDER_MODULES,
                       "waimak_spark.app.config."
                       "PropertiesFilePropertyProviderBuilder")
        spark.conf.set(PROPERTIES_FILE_URI, str(pfile))
        try:
            conf = parse_config(self.SecretConf, ctx, prefix="myapp.")
            assert conf.api_token == "from-props"
        finally:
            spark.conf.unset(PROPERTY_PROVIDER_BUILDER_MODULES)
            spark.conf.unset(PROPERTIES_FILE_URI)

    def test_spark_conf_wins_over_providers(self, spark, tmp_path,
                                            monkeypatch):
        from waimak_spark.app.config import (
            PROPERTY_PROVIDER_BUILDER_MODULES,
        )

        ctx = self._ctx(spark, tmp_path)
        monkeypatch.setenv("myapp_api_token", "from-env")
        spark.conf.set(PROPERTY_PROVIDER_BUILDER_MODULES,
                       "waimak_spark.app.config."
                       "EnvSecretsPropertyProviderBuilder")
        spark.conf.set("myapp.api_token", "from-conf")
        try:
            conf = parse_config(self.SecretConf, ctx, prefix="myapp.")
            assert conf.api_token == "from-conf"
        finally:
            spark.conf.unset(PROPERTY_PROVIDER_BUILDER_MODULES)
            spark.conf.unset("myapp.api_token")

    def test_unknown_builder_raises(self, spark, tmp_path):
        from waimak_spark.app.config import (
            PROPERTY_PROVIDER_BUILDER_MODULES,
        )

        ctx = self._ctx(spark, tmp_path)
        spark.conf.set(PROPERTY_PROVIDER_BUILDER_MODULES, "no.such.Builder")
        try:
            with pytest.raises(ConfigException, match="no.such.Builder"):
                parse_config(self.SecretConf, ctx, prefix="myapp.")
        finally:
            spark.conf.unset(PROPERTY_PROVIDER_BUILDER_MODULES)


class TestPropertiesSeparators:
    def test_first_separator_wins(self, spark, tmp_path):
        """java.util.Properties splits at the FIRST '=' or ':' — a ':'
        line whose value contains '=' must not be split at the '='."""
        from waimak_spark.app.config import (
            PROPERTIES_FILE_URI, PropertiesFilePropertyProviderBuilder)
        from waimak_spark.dataflow.spark_flow import Waimak

        f = tmp_path / "app.properties"
        f.write_text("endpoint: https://host/path?a=b\n"
                     "plain=value\n"
                     "weird=colon:in:value\n")
        flow = Waimak.spark_flow(spark)
        ctx = flow.context
        ctx.spark.conf.set(PROPERTIES_FILE_URI, str(f))
        try:
            p = PropertiesFilePropertyProviderBuilder().get_property_provider(ctx)
            assert p.get("endpoint") == "https://host/path?a=b"
            assert p.get("plain") == "value"
            assert p.get("weird") == "colon:in:value"
        finally:
            ctx.spark.conf.unset(PROPERTIES_FILE_URI)


class TestDatabricksSecretsProvider:
    """DatabricksSecretsPropertyProviderBuilder
    (DatabricksSecretsPropertyProviderBuilder.scala:20-60): scope search
    order, key sanitization, all-scopes fallback — exercised through an
    injected secrets API with the dbutils.secrets shape (the real
    dbutils exists only on Databricks runtimes)."""

    class FakeSecrets:
        def __init__(self, scopes: dict[str, dict[str, str]]):
            self.scopes = scopes
            self.gets: list[tuple[str, str]] = []

        def listScopes(self):
            import types

            return [types.SimpleNamespace(name=n) for n in self.scopes]

        def get(self, scope: str, key: str) -> str:
            self.gets.append((scope, key))
            try:
                return self.scopes[scope][key]
            except KeyError:
                raise Exception(f"Secret does not exist: {scope}/{key}")

    def _ctx(self, spark, tmp_path):
        from waimak_spark.dataflow.spark_flow import SparkFlowContext

        return SparkFlowContext(spark, str(tmp_path / "tmp"))

    def test_scope_order_and_key_sanitization(self, spark, tmp_path):
        from waimak_spark.app.config import (
            DATABRICKS_SECRET_SCOPES,
            DatabricksSecretsPropertyProviderBuilder,
        )

        # "myapp.api_token" sanitizes to "myapp-api-token"
        api = self.FakeSecrets({"a": {}, "b": {"myapp-api-token": "tok"}})
        spark.conf.set(DATABRICKS_SECRET_SCOPES, "a,b")
        try:
            provider = DatabricksSecretsPropertyProviderBuilder(
                api).get_property_provider(self._ctx(spark, tmp_path))
            assert provider.get("myapp.api_token") == "tok"
            # searched scope a first (miss), then b (hit)
            assert api.gets == [("a", "myapp-api-token"),
                                ("b", "myapp-api-token")]
            assert provider.get("absent.key") is None
        finally:
            spark.conf.unset(DATABRICKS_SECRET_SCOPES)

    def test_databricks_specific_sanitization_conf_honored(self, spark,
                                                           tmp_path):
        # ADVICE r6: the reference reads a Databricks-specific toggle
        # (databricksReplaceSpecialCharactersInKey) — a config written
        # for it that disables sanitization must not be silently ignored
        from waimak_spark.app.config import (
            DATABRICKS_REPLACE_SPECIAL_CHARACTERS_IN_KEY,
            DatabricksSecretsPropertyProviderBuilder,
        )

        api = self.FakeSecrets({"s": {"raw.key_name": "v"}})
        spark.conf.set(DATABRICKS_REPLACE_SPECIAL_CHARACTERS_IN_KEY,
                       "false")
        try:
            provider = DatabricksSecretsPropertyProviderBuilder(
                api).get_property_provider(self._ctx(spark, tmp_path))
            assert provider.get("raw.key_name") == "v"
            assert api.gets == [("s", "raw.key_name")]  # unsanitized
        finally:
            spark.conf.unset(DATABRICKS_REPLACE_SPECIAL_CHARACTERS_IN_KEY)

    def test_unset_scopes_searches_all_available(self, spark, tmp_path):
        from waimak_spark.app.config import (
            DatabricksSecretsPropertyProviderBuilder,
        )

        api = self.FakeSecrets({"s1": {}, "s2": {"k": "v"}})
        provider = DatabricksSecretsPropertyProviderBuilder(
            api).get_property_provider(self._ctx(spark, tmp_path))
        assert provider.get("k") == "v"

    def test_parse_config_through_dotted_path(self, spark, tmp_path):
        import dataclasses
        import sys
        import types

        from waimak_spark.app.config import (
            DATABRICKS_SECRET_SCOPES,
            PROPERTY_PROVIDER_BUILDER_MODULES,
            DatabricksSecretsPropertyProviderBuilder,
            parse_config,
        )

        api = self.FakeSecrets({"prod": {"myapp-api-token": "dbx-secret"}})

        class FakeDbxBuilder(DatabricksSecretsPropertyProviderBuilder):
            def __init__(self):
                super().__init__(api)

        mod = types.ModuleType("_dbx_secrets_test_mod")
        mod.FakeDbxBuilder = FakeDbxBuilder
        sys.modules["_dbx_secrets_test_mod"] = mod

        @dataclasses.dataclass
        class SecretConf:
            api_token: str

        spark.conf.set(PROPERTY_PROVIDER_BUILDER_MODULES,
                       "_dbx_secrets_test_mod.FakeDbxBuilder")
        spark.conf.set(DATABRICKS_SECRET_SCOPES, "prod")
        try:
            conf = parse_config(SecretConf, self._ctx(spark, tmp_path),
                                prefix="myapp.")
            assert conf.api_token == "dbx-secret"
        finally:
            spark.conf.unset(PROPERTY_PROVIDER_BUILDER_MODULES)
            spark.conf.unset(DATABRICKS_SECRET_SCOPES)
            del sys.modules["_dbx_secrets_test_mod"]

    def test_without_runtime_or_injection_fails_loudly(self, spark,
                                                       tmp_path):
        import pytest as _pt

        from waimak_spark.app.config import (
            ConfigException,
            DatabricksSecretsPropertyProviderBuilder,
        )

        with _pt.raises(ConfigException) as e:
            DatabricksSecretsPropertyProviderBuilder(
            ).get_property_provider(self._ctx(spark, tmp_path))
        assert "Databricks" in str(e.value)
